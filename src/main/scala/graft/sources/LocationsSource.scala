package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-validated reader for `locations`-shaped inputs (FIXTURES.md §A:
  * latitude, longitude, source, user_id, timestamp).
  *
  * The reference hardcodes its source: a Cassandra table at a fixed IP or a
  * CosmosDB collection chosen by a Python `if` (heatmap.py:131–147 — its
  * entire "planner"). Here the connector is genuinely configuration: any
  * DSv2 format string, with the contract enforced at load:
  *   - required columns present (fail fast with a readable error),
  *   - numeric/timestamp coercions applied (connectors disagree about
  *     long-vs-timestamp epoch columns; epoch millis are accepted),
  *   - extra columns pruned so downstream plans stay narrow.
  */
object LocationsSource {

  val schema: StructType = StructType(Seq(
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("source", StringType),
    StructField("user_id", StringType),
    StructField("timestamp", TimestampType)))

  def read(spark: SparkSession, path: String, format: String = "parquet"): DataFrame = {
    val raw = spark.read.format(format).load(path)
    // case-insensitive like Spark's own resolution (caseSensitive=false
    // default): 'Latitude' must not fail a check the select would pass
    val have = raw.columns.map(_.toLowerCase).toSet
    val missing = schema.map(_.name).filterNot(n => have.contains(n.toLowerCase))
    require(missing.isEmpty,
      s"locations input at $path is missing column(s): ${missing.mkString(", ")}; " +
        s"found: ${raw.columns.mkString(", ")}")
    val ts = raw.schema.find(_.name.equalsIgnoreCase("timestamp")).get.dataType match {
      // ALL numeric carriers are epoch MILLIS (the wire convention): a bare
      // cast-to-timestamp would interpret them as epoch SECONDS -- silently
      // off by 1000x for a DOUBLE/DECIMAL ms column
      case _: NumericType => timestamp_millis(col("timestamp").cast(LongType))
      case _ => col("timestamp").cast(TimestampType)
    }
    raw.select(
      col("latitude").cast(DoubleType).as("latitude"),
      col("longitude").cast(DoubleType).as("longitude"),
      col("source").cast(StringType).as("source"),
      col("user_id").cast(StringType).as("user_id"),
      ts.as("timestamp"))
  }
}
