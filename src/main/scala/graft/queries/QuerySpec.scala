package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark-native query plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL the driver hash-compares against.
  *
  * Contract (SparkEntry): column names AND row order must match the oracle —
  * every query ends in a full-tie-break orderBy mirrored by the SQL's
  * ORDER BY, and every computed column is aliased identically on both sides.
  */
final case class QuerySpec(
    name: String,
    doc: String,
    oracle: Option[String],
    build: (SparkSession, String) => DataFrame)

object Tables {
  import org.apache.spark.sql.functions.{col, expr}
  import org.apache.spark.sql.types.LongType

  /** Load a corpus table (TESTDATA.md): `spark.read.parquet(s"$dir/$name.parquet")`.
    *
    * `events.ts` is Parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; read it as nanos-since-epoch and truncate to micros — exactly
    * what DuckDB does when it loads the same file, so the oracle agrees. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.schema.exists(f => f.name == "ts" && f.dataType == LongType))
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
