package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Writes one `<outDir>/<query>.txt` formatted physical plan per catalog
  * query matching the regex — the per-query twin of [[ExplainDump]] (which
  * concatenates a curated headline list into EXPLAIN.md). Used by the
  * optimization rounds to snapshot `plans/rNN/<query>_before.txt` /
  * `_after.txt` evidence files.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <nameRegex> [suffix]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val rx = args(2)
    val suffix = args.drop(3).headOption.getOrElse("")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      // static plans are the review target; AQE re-plans at runtime
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.specs.filter(_.name.matches(rx)).foreach { spec =>
      try {
        val plan = spec.build(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${spec.name}$suffix.txt"), plan)
        println(s"[plandump] wrote ${spec.name}$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] ${spec.name} failed: $e")
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
