package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * the diversity-aware top-k a retrieval stack runs AFTER candidate
  * generation: greedily pick the item maximizing
  *
  *   λ·rel(d, q) − (1−λ)·max_{s ∈ picked} sim(d, s)
  *
  * so the result set trades pure relevance for coverage (for a training-
  * data pipeline: the "don't fill the batch with near-identical passages"
  * selection rule, the retrieval-side cousin of SemDeDup).
  *
  * Arithmetic is EXACT INTEGER end-to-end (the catalog-wide convention):
  * relevance and pairwise similarity are dot products over micro-quantized
  * vectors (micros² units), and λ = 7/10 enters as the x10-scaled
  * `7·rel − 3·maxsim` — no floats, so every greedy pick is deterministic
  * and DuckDB-reproducible (ties break toward the smaller id).
  *
  * Execution shape — the TWO-STAGE production form:
  *   1. candidate generation is DISTRIBUTED: one scan scoring dot(q, ·)
  *     into a TakeOrdered(poolN) — the brute-force top-N of
  *     `sim_cosine_topk` (or any ANN family upstream);
  *   2. the re-rank runs DRIVER-SIDE over the ≤poolN-row pool (poolN·dim
  *     longs — the KMeans-centroid bound class). This is not a shortcut:
  *     re-rankers operate on retrieved candidates by definition, and the
  *     greedy is O(poolN·k·dim) — pool sizes are 10²–10³ in every
  *     production retrieval stack, never corpus-sized. Nothing
  *     corpus-sized is ever collected.
  */
object Mmr {

  /** One re-ranked pick: `iter` is selection order (0 = pure-relevance
    * seed), `relMicros2` the query dot product, `maxSimMicros2` the
    * similarity to the closest already-picked item at pick time, `mmrX10`
    * the x10-scaled objective. SEED CONVENTION: the first pick is argmax
    * relevance by definition, so its penalty term is identically zero —
    * the seed row carries `maxSimMicros2 = 0` and `mmrX10 = 7·rel` (the
    * objective with an empty picked set), keeping every output cell
    * NULL-free and the oracle comparison total. */
  final case class Pick(iter: Int, id: Long, relMicros2: Long,
      maxSimMicros2: Long, mmrX10: Long)

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** @param points `(idCol: long, vecCol: array<long>)` micro-quantized
    * @param queryVec the query vector (micros)
    * @param excludeId id never returned (the query's own row, when the
    *        query is drawn from the corpus)
    * @param poolN candidate-generation cut (distributed top-N by dot)
    * @param k picks returned (k <= poolN) */
  def rerank(points: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Long], excludeId: Long, poolN: Int, k: Int): Seq[Pick] = {
    require(k >= 1 && k <= poolN, s"need 1 <= k <= poolN, got k=$k poolN=$poolN")
    graft.plans.GraftExtensions.register(points.sparkSession)
    val id = col(idCol)
    // stage 1 — distributed: score + TakeOrderedAndProject(poolN); only the
    // pool crosses to the driver
    val pool: Array[(Long, Array[Long], Long)] = points
      .filter(id =!= excludeId)
      .select(id.as("_id"), col(vecCol).as("_v"),
        call_function("vec_dotl", col(vecCol), typedlit(queryVec.toSeq)).as("_rel"))
      .orderBy(col("_rel").desc, col("_id").asc)
      .limit(poolN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))
    // fail loud on a degenerate corpus (the dedup_contrastive convention):
    // a pool below k would silently return a partial pick list while a
    // fixed-k oracle replay yields zero rows — a rows_match divergence
    // with no error. Re-rankers are configured with poolN >= k by
    // definition; a pool that can't fill k picks is a data problem.
    require(pool.length >= k,
      s"MMR candidate pool has ${pool.length} items, need >= k=$k")

    // stage 2 — driver-side greedy over the bounded pool. Each candidate
    // carries a RUNNING max-similarity tightened against only the NEWEST
    // pick per round (max over picks is monotone in the pick set — the
    // Coreset.kCenterGreedyIncremental running-min pattern, max-flavored),
    // which is what makes the documented O(poolN·k·dim) bound true.
    val remaining = scala.collection.mutable.LinkedHashMap(
      pool.map(p => p._1 -> p): _*)
    val runningMax = scala.collection.mutable.Map.empty[Long, Long]
    val seed = pool.maxBy(p => (p._3, -p._1)) // max rel, tie smaller id
    var picked = Vector(Pick(0, seed._1, seed._3, 0L, 7L * seed._3))
    var newestVec = seed._2
    remaining.remove(seed._1)
    while (picked.size < k && remaining.nonEmpty) {
      val scored = remaining.valuesIterator.map { case (pid, pv, rel) =>
        val d = dot(pv, newestVec)
        val maxSim = runningMax.get(pid) match {
          case Some(prev) if prev >= d => prev
          case _ => runningMax(pid) = d; d
        }
        (pid, rel, maxSim, 7L * rel - 3L * maxSim)
      }
      val best = scored.maxBy(t => (t._4, -t._1))
      picked = picked :+ Pick(picked.size, best._1, best._2,
        best._3, best._4)
      newestVec = remaining(best._1)._2
      remaining.remove(best._1)
      runningMax.remove(best._1)
    }
    picked
  }
}
