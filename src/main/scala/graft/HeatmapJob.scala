package graft

import org.apache.spark.sql.SparkSession
import graft.operators.HeatmapPipeline

/** CLI equivalent of the reference's batchMain (heatmap.py:152–158): read a
  * `locations`-shaped table (latitude, longitude, source, user_id,
  * timestamp — FIXTURES.md §A), run the pipeline, append the `heatmaps`
  * output shape (id, heatmap JSON) to a parquet sink. Any DSv2 source/sink
  * substitutes for the reference's hardcoded Cassandra endpoints
  * (heatmap.py:131–150).
  *
  * Usage: runMain graft.HeatmapJob <locationsPath> <outPath>
  *          [--timespans] [--format <fmt>]
  * `--format graft-locations` reads through the custom DSv2 connector
  * ([[graft.sources.GraftLocationsProvider]]); default is parquet.
  */
object HeatmapJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: HeatmapJob <locationsPath> <outPath> [--timespans] [--format <fmt>]")
    val Array(in, out) = args.take(2)
    val timespans = args.contains("--timespans")
    val format = args.sliding(2).collectFirst {
      case Array("--format", f) => f
    }.getOrElse("parquet")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val locations = graft.sources.LocationsSource.read(spark, in, format)
    val blobs = HeatmapPipeline.run(locations,
      HeatmapPipeline.Config(timespans = timespans))
    // the reference appends (heatmap.py:150); same semantics here
    blobs.write.mode("append").parquet(out)

    val n = spark.read.parquet(out).count()
    println(s"""{"heatmap_rows":$n,"out":"$out"}""")
    spark.stop()
  }
}
