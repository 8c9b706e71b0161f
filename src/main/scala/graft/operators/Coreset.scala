package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-center-greedy coreset selection (farthest-point traversal, Gonzalez
  * 1985) — the data-selection primitive behind coreset-based training-set
  * pruning (Sener & Savarese 2018 run exactly this rule over embedding
  * space): pick the point farthest from everything already picked, k times.
  * The selected set is a provable 2-approximation of the optimal k-center
  * cover, and the per-iteration max-min distance IS the coverage radius —
  * a quality curve a curation run reports alongside the selection.
  *
  * Distances are exact integer micros² over micro-quantized embeddings
  * (the catalog-wide convention — see SimilarityQueries), evaluated by the
  * native codegen `vec_l2sq`, so every greedy choice is bit-free exact and
  * DuckDB-reproducible.
  *
  * Execution shape: the greedy loop is k−1 DISTRIBUTED max-reductions —
  * each iteration one scan computing min-distance-to-chosen (chosen centers
  * are ≤k literal vectors, broadcast inside the plan as constants) feeding
  * a TakeOrdered(1). Only the single winning row crosses to the driver per
  * iteration (k·dim longs total driver state — the same bound as KMeans'
  * documented centroid collection). Nothing corpus-sized is ever collected.
  *
  * Scale (100 TB): cost is O(k) passes × O(N·k·dim) distance work as
  * written — the right plan for the reporting-sized k this catalog runs
  * (k ≤ a few hundred). For coreset sizes in the 10⁴–10⁶ range a
  * production variant maintains a running min-distance COLUMN updated
  * against only the newest center (O(N·dim) per pass, O(N·k·dim) total)
  * with a localCheckpoint every few iterations to cap lineage, and selects
  * batches of b centers per pass (GonzalezFP over-selection) to amortize
  * job-launch latency; both keep the identical greedy semantics per batch.
  */
object Coreset {

  /** One selected center: `iter` is selection order (0 = seed),
    * `radiusMicros2` the max-min distance at selection time (the coverage
    * radius of the PREVIOUS set; None for the seed, which covers nothing
    * yet). */
  final case class Center(iter: Int, id: Long, vec: Array[Long],
      radiusMicros2: Option[Long])

  /** Greedy selection. `points(idCol: long, vecCol: array<long>)`; the seed
    * is the minimum id (deterministic, side-effect-free); ties on equal
    * max-min distance break toward the smaller id — both choices mirrored
    * exactly by the DuckDB oracle's recursive CTE. */
  def kCenterGreedy(points: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[Center] = {
    require(k >= 1, s"k must be >= 1, got $k")
    graft.plans.GraftExtensions.register(points.sparkSession)
    val id = col(idCol)
    val v = col(vecCol)

    def vecOf(row: org.apache.spark.sql.Row, i: Int): Array[Long] =
      row.getSeq[Long](i).toArray

    val seedRows = points.orderBy(id.asc).limit(1).select(id, v).collect()
    require(seedRows.nonEmpty, "kCenterGreedy on an empty input")
    val seed = seedRows(0)
    var chosen = Vector(Center(0, seed.getLong(0), vecOf(seed, 1), None))

    while (chosen.size < k) {
      val minDist: Column = chosen
        .map(c => call_function("vec_l2sq", v, typedlit(c.vec.toSeq)))
        .reduce(least(_, _))
      val winners = points
        .filter(!id.isin(chosen.map(_.id): _*))
        .select(id.as("_id"), v.as("_v"), minDist.as("_mind"))
        .orderBy(col("_mind").desc, col("_id").asc)
        .limit(1)
        .collect()
      require(winners.nonEmpty,
        s"k = $k exceeds the input's distinct point count (${chosen.size} selected)")
      val winner = winners(0)
      chosen = chosen :+ Center(chosen.size, winner.getLong(0),
        vecOf(winner, 1), Some(winner.getLong(2)))
    }
    chosen
  }

  /** Incremental (running-min) greedy — the scale form the naive loop's
    * scaladoc points at for coreset sizes past a few hundred: instead of
    * re-scoring each point against ALL chosen centers every iteration
    * (O(N·k·dim) per pass, O(N·k²·dim) total), maintain a min-distance
    * COLUMN and tighten it against only the NEWEST center (O(N·dim) per
    * pass, O(N·k·dim) total). A scope-owned eager `localCheckpoint` every
    * `checkpointEvery` picks truncates the growing `least(...)` lineage —
    * without it, iteration j's plan re-evaluates all j distance columns,
    * which is exactly the quadratic work this form exists to avoid — and
    * each superseded checkpoint's blocks are freed as soon as the next one
    * lands ([[CacheScope.freeCheckpoint]]), so the working set stays one
    * (id, vec, mind) table. All distances are the same integer micros², so
    * every pick, radius, and tie-break is IDENTICAL to [[kCenterGreedy]] —
    * OperatorSpec pins the equality and `emb_coreset_inc` hash-gates this
    * path against the same DuckDB oracle. */
  def kCenterGreedyIncremental(points: DataFrame, idCol: String, vecCol: String,
      k: Int, scope: CacheScope = CacheScope.Unmanaged,
      checkpointEvery: Int = 4): Seq[Center] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    graft.plans.GraftExtensions.register(points.sparkSession)
    val id = col(idCol)
    val v = col(vecCol)

    def vecOf(row: org.apache.spark.sql.Row, i: Int): Array[Long] =
      row.getSeq[Long](i).toArray

    val seedRows = points.orderBy(id.asc).limit(1).select(id, v).collect()
    require(seedRows.nonEmpty, "kCenterGreedyIncremental on an empty input")
    val seed = seedRows(0)
    var chosen = Vector(Center(0, seed.getLong(0), vecOf(seed, 1), None))

    var state = points.select(id.as("_id"), v.as("_v"))
      .withColumn("_mind",
        call_function("vec_l2sq", col("_v"), typedlit(chosen.head.vec.toSeq)))
    var lastCkpt: Option[DataFrame] = None
    var sinceCkpt = 0

    while (chosen.size < k) {
      val winners = state
        .filter(!col("_id").isin(chosen.map(_.id): _*))
        .orderBy(col("_mind").desc, col("_id").asc)
        .limit(1)
        .collect()
      require(winners.nonEmpty,
        s"k = $k exceeds the input's distinct point count (${chosen.size} selected)")
      val winner = winners(0)
      val c = Center(chosen.size, winner.getLong(0), vecOf(winner, 1),
        Some(winner.getLong(2)))
      chosen = chosen :+ c
      if (chosen.size < k) {
        state = state.withColumn("_mind",
          least(col("_mind"),
            call_function("vec_l2sq", col("_v"), typedlit(c.vec.toSeq))))
        sinceCkpt += 1
        if (sinceCkpt >= checkpointEvery) {
          val ck = scope.checkpoint(state)
          lastCkpt.foreach(CacheScope.freeCheckpoint)
          lastCkpt = Some(ck)
          state = ck
          sinceCkpt = 0
        }
      }
    }
    lastCkpt.foreach(CacheScope.freeCheckpoint)
    chosen
  }

  /** Nearest-center assignment populations: `(center_id, n_assigned)`.
    * The argmin over ≤k literal centers is a single map-side `array_min`
    * over (d2, center_id) structs — no join, no window, no shuffle except
    * the ≤k-row final aggregation (partial count combines map-side). Ties
    * on equal distance assign to the smaller center id, mirroring the
    * oracle's `ORDER BY d2, center`. */
  def assignCounts(points: DataFrame, idCol: String, vecCol: String,
      centers: Seq[Center]): DataFrame = {
    require(centers.nonEmpty)
    graft.plans.GraftExtensions.register(points.sparkSession)
    val best = array_min(array(centers.map(c =>
      struct(
        call_function("vec_l2sq", col(vecCol), typedlit(c.vec.toSeq)).as("d2"),
        lit(c.id).as("cid"))): _*))
    points
      .select(best.getField("cid").as("center_id"))
      .groupBy("center_id")
      .agg(count(lit(1)).as("n_assigned"))
  }
}
