package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster-
  * resolution step behind `dedup_clusters` (LSH pairs only say "a≈b";
  * picking one canonical doc per transitive duplicate group needs the
  * component).
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris,
  * Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
  * MapReduce and Beyond", SoCC'14 — the same algorithm GraphFrames ships).
  * Each round rewires edges toward neighborhood minima:
  *
  *   large-star: for every node u with doubled neighborhood Γ(u) and
  *     m = min(Γ(u) ∪ {u}), emit (v, m) for each v ∈ Γ(u), v > u;
  *   small-star: direct edges large→small, and per node u with
  *     m = min(Γ(u) ∪ {u}), emit (v, m) for each v ∈ Γ(u) ∪ {u}, v ≠ m.
  *
  * Both steps preserve connectivity and never raise a node's reachable
  * minimum; the fixpoint is a star forest whose centers are the component
  * MINIMA — exactly the label the naive min-propagation loop reaches, in
  * O(log diameter) rounds instead of O(diameter) (a planted 64-node chain
  * converges in 5 rounds vs 63 propagation rounds — OperatorSpec pins both
  * numbers).
  *
  * Scale shape: each round is two passes over the CURRENT edge set, which
  * CONTRACTS as stars collapse (the naive loop re-joins the full original
  * graph every round). Each star step computes its neighborhood minimum as
  * a WINDOW aggregate over the same hash-partitioning the step already
  * needs — `min(v) OVER (PARTITION BY u)` — instead of a groupBy + self
  * join: the per-key minimum rides the ONE exchange of its step, where the
  * join form shuffles the aggregate table a second time and sorts both
  * join sides (guide rule: a window partitioned like the preceding
  * aggregation needs no second shuffle). Per-round `localCheckpoint`s
  * truncate lineage so analysis/codegen cost stays constant per round; the
  * checkpoint is LAZY and the convergence-guard `count()` materializes it,
  * so each round costs one action, not a materialize-then-count pair.
  * Superseded checkpoint blocks are freed eagerly. On a real cluster,
  * reliable checkpointing (or a table write) replaces localCheckpoint for
  * executor-loss tolerance.
  */
object ConnectedComponents {

  /** @param pairs edge list; `srcCol`/`dstCol` must be long-typed ids
    * @param scope cache owner for the RETURNED labels' checkpoint blocks —
    *        intermediates are freed eagerly inside the loop, but the final
    *        `localCheckpoint` lives at the RDD level where neither
    *        `clearCache()` nor driver GC promptly reclaims it; a library
    *        caller should pass a scope and release() after materializing
    * @return (labels DataFrame `(id, label)` — every node of the graph with
    *         its component minimum — and the number of star rounds run) */
  def run(pairs: DataFrame, srcCol: String = "doc_a", dstCol: String = "doc_b",
      scope: CacheScope = CacheScope.Unmanaged): (DataFrame, Int) = {
    // frees a superseded round's checkpoint blocks immediately instead of
    // waiting for ContextCleaner GC (clearCache() does not cover them)
    import CacheScope.freeCheckpoint

    // canonical pointer form: src > dst, self-loops dropped, distinct
    def canon(e: DataFrame): DataFrame =
      e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()

    // lazy checkpoint: the count() just below materializes the blocks, so
    // the canon pass runs once and costs one action instead of two
    val edges0 = canon(pairs.select(col(srcCol).as("u"), col(dstCol).as("v")))
      .localCheckpoint(false)
    // the node set is consumed exactly ONCE (the final labels join), so it
    // stays a lazy plan over the checkpointed edges — an eager checkpoint
    // here would pay a materialization job for no reuse
    val nodes = edges0.select(col("u").as("id"))
      .union(edges0.select(col("v").as("id")))
      .distinct()

    // per-star-step neighborhood minimum as a window over the step's key
    val minOverU = Window.partitionBy("u")

    var cur = edges0
    var curCount = cur.count()
    var rounds = 0
    var converged = false
    // termination: the paper bounds two-phase at O(log² n) rounds; the cap is
    // a pure runaway backstop (the oracle's recursive CTE has no cap, so a
    // low cap would be a Spark-vs-oracle crash divergence on long chains)
    while (!converged && rounds < 1000) {
      rounds += 1
      // large-star — over the DOUBLED neighborhood; emitted (v, m) has
      // v > u ≥ m, so the output is already in pointer form. The min must
      // be computed over the FULL neighborhood, so the v > u filter sits
      // AFTER the window.
      val doubled = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      // NO distinct here (round-19): large-star emits exactly one row per
      // canonical edge (the doubled set filtered to v > u), so duplicates
      // are only coincidental (v, m) collisions across source nodes — the
      // small-star window min is unaffected by duplicate rows and `next`'s
      // distinct dedupes the round's OUTPUT set, so the mid-round distinct
      // was a full exchange + hash aggregation of the edge set per round
      // that changed nothing downstream (next, rounds, labels all
      // identical by construction; OperatorSpec's planted-chain pins hold)
      val ls = doubled
        .withColumn("mn", min(col("v")).over(minOverU))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
      // small-star — edges already point large→small, so min(Γ(u)) < u and
      // every emitted (s, m) with s ≠ m has s > m: pointer form again
      val next = ls
        .withColumn("m", min(col("v")).over(minOverU))
        .select(explode(array(col("v"), col("u"))).as("s"), col("m"))
        .filter(col("s") =!= col("m"))
        .select(col("s").as("u"), col("m").as("v"))
        .distinct()
        .localCheckpoint(false)
      // both sets are distinct + canonical: equal counts AND next\cur = ∅
      // ⇒ next = cur ⇒ fixpoint (stars map to themselves under both steps)
      val nextCount = next.count()
      converged = nextCount == curCount && next.except(cur).isEmpty
      if (cur ne edges0) freeCheckpoint(cur)
      cur = next
      curCount = nextCount
    }
    require(converged, s"star contraction did not converge in $rounds rounds")

    // fixpoint is a star forest centered on component minima: every non-root
    // node appears as src exactly once; roots (and only roots) never do
    val labels = scope.checkpoint(nodes
      .join(cur.select(col("u").as("id"), col("v").as("star")), Seq("id"), "left")
      .select(col("id"), coalesce(col("star"), col("id")).as("label")))
    freeCheckpoint(cur)
    freeCheckpoint(edges0)
    (labels, rounds)
  }
}
