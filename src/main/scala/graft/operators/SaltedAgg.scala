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

  /** Deterministic salt: hash of the hashable input columns + the partition
    * id, mod n. Stable under task retries and speculative execution
    * (monotonically_increasing_id is not — a retried task re-ids its rows,
    * which double-counts partials if a stage is recomputed on top of a
    * cached partial; spark_partition_id is the task's partition index, so a
    * retry reproduces it). Mixing in the partition id spreads even
    * byte-identical hot rows across buckets BY PARTITION — and map-side
    * combine collapses within-partition duplicates before the shuffle, so
    * per-reducer load is bounded by #partitions/n partials either way.
    * MapType columns are excluded (Spark's hash() rejects maps). */
  private def salt(df: DataFrame, n: Int): Column = {
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType,
      StructType, VariantType}
    // hash() rejects maps/variants at ANY nesting depth (HashExpression
    // checks recursively), so the filter must recurse too
    def unhashable(dt: DataType): Boolean = dt match {
      case _: MapType | _: VariantType => true
      case s: StructType => s.fields.exists(f => unhashable(f.dataType))
      case a: ArrayType => unhashable(a.elementType)
      case _ => false
    }
    val cols = df.schema.fields.filterNot(f => unhashable(f.dataType))
      .map(f => col(f.name))
    pmod(hash((cols :+ spark_partition_id()): _*), lit(n)).as("_salt")
  }

  /** COUNT(*) and SUM(value) per key, skew-spread over `saltBuckets`.
    * The merged result is exact for any decomposable aggregate. */
  def countSumSalted(df: DataFrame, key: Column, value: Column,
      saltBuckets: Int): DataFrame =
    df.groupBy(key.as("k"), salt(df, saltBuckets))
      .agg(count(lit(1)).as("_pc"), sum(value).as("_ps"))
      .groupBy(col("k"))
      .agg(sum(col("_pc")).as("cnt"), sum(col("_ps")).as("total"))
}
