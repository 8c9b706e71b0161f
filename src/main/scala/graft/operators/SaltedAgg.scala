package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-phase salted aggregation: the explicit answer to hot-key skew at
  * 100 TB (SURVEY.md §7.4 — the reference's `all` user group is a universal
  * hot key that every row feeds).
  *
  * Phase 1 groups by (key, salt) — the hot key's rows spread over
  * `saltBuckets` reducers; phase 2 merges the per-salt partials. Correct for
  * any decomposable aggregate (sum/count/min/max). AQE's skew handling can
  * do this adaptively for sort-merge joins, but aggregation skew on a known
  * hot key is cheapest handled structurally like this.
  */
object SaltedAgg {

  private def salt(n: Int): Column =
    pmod(monotonically_increasing_id(), lit(n.toLong)).as("_salt")

  /** COUNT(*) and SUM(value) per key, skew-spread over `saltBuckets`.
    * The salt value is nondeterministic per row but the merged result is
    * exact for any decomposable aggregate. */
  def countSumSalted(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int): DataFrame =
    df.groupBy(key.as("k"), salt(saltBuckets))
      .agg(count(lit(1)).as("_pc"), sum(value).as("_ps"))
      .groupBy(col("k"))
      .agg(sum(col("_pc")).as("cnt"), sum(col("_ps")).as("total"))
}
