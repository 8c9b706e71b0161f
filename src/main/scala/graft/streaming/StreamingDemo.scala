package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.HeatmapQueries

/** End-to-end streaming run of the heatmap pipeline against the parquet
  * corpus via the file source: readStream → quantize/fan-out → watermarked
  * windowed aggregation → in-memory sink, processed with an AvailableNow
  * trigger (batch-equivalent semantics, incremental execution).
  *
  * Usage: runMain graft.streaming.StreamingDemo [sfDir]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // ansi pinned as in Verify/Bench: one documented overflow semantics
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the file source requires a directory: stage the corpus NORMALIZED
    // through the gate's ONE staged-events contract (StreamingQueries
    // owns the write and the schema, so the demo cannot fork from it)
    val stageDir = graft.TempDirs.create("graft-stream-in")
    graft.queries.StreamingQueries
      .normalizedEventsWrite(spark, sfDir, stageDir.resolve("events"))

    val raw = spark.readStream
      .schema(graft.queries.StreamingQueries.StagedEventsSchema)
      .option("recursiveFileLookup", "true")
      .parquet(stageDir.toString)

    val heat = StreamingOps.streamingHeatmap(raw, zoom = 10,
      dropFilter = HeatmapQueries.sourceFilter,
      lat = HeatmapQueries.latCol, lon = HeatmapQueries.lonCol,
      perUser = HeatmapQueries.perUserCol, window_ = "1 day", watermark = "1 hour")

    // exactly-once parquet sink: append mode + checkpoint. The aggregation
    // needs the watermark to close windows; AvailableNow processes the
    // backlog and commits through the checkpoint (re-running resumes, does
    // not duplicate).
    val outDir = graft.TempDirs.create("graft-stream-out")
    val q = heat.writeStream
      .format("parquet")
      .option("path", outDir.toString)
      .option("checkpointLocation", outDir.resolve("_checkpoint").toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // a second complete-mode pass into memory for the summary (append only
    // emits watermark-closed windows; the corpus is bounded so we also show
    // the full aggregate)
    val q2 = heat.writeStream.format("memory").queryName("heat")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()

    val sunk = spark.read.parquet(outDir.toString).count()
    val n = spark.table("heat").count()
    val top = spark.table("heat").orderBy(col("cnt").desc, col("tile_id")).limit(3).collect()
    println(s"""{"streaming_rows":$n,"parquet_sink_rows":$sunk,"top":"${top.mkString("; ")}"}""")
    spark.stop()
  }
}
