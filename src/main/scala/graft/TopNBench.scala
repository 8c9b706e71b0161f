package graft

import org.apache.spark.sql.functions._

/** Measured benefit of the connector's `SupportsPushDownTopN` (round-6
  * feature): a 4M-row `.loc` store paged with ORDER BY + LIMIT, once with
  * the pushdown active (bounded per-file heap, scan surfaces ≤ n rows per
  * file) and once defeated via an expression sort key (identical ordering
  * semantics, but the scan must surface every row to the engine's
  * TakeOrdered). Both paths parse every line — the delta isolates what the
  * pushdown saves: per-row type conversion, InternalRow allocation, and
  * rows crossing the DSv2 boundary. On a real cluster the same delta is
  * network + memory pressure on the scan→sort edge, growing with
  * rows-per-file. Results recorded in CHANGES.md. Run:
  *   sbt "runMain graft.TopNBench"
  */
object TopNBench {

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

  private def timed(label: String)(body: => Long): Double = {
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      require(n > 0, s"$label returned no rows")
      dt
    }.sorted
    val med = times(1)
    println(s"[topnbench] $label: ${fmt(med)}s (runs: ${times.map(fmt).mkString(", ")})")
    med
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // ansi pinned as in Verify/Bench: one documented overflow semantics
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = sys.env.getOrElse("SPARK_GRAFT_TOPN_ROWS", "4000000").toLong
    val dir = TempDirs.create("graft-stream-topnbench")
    try {
      spark.range(rows).select(
          (col("id") % 1800 / 10.0 - 89.9).as("latitude"),
          (col("id") % 3600 / 10.0 - 179.9).as("longitude"),
          when(col("id") % 5 === 0, "background").otherwise("gps").as("source"),
          concat(lit("u"), col("id")).as("user_id"),
          timestamp_millis(lit(1700000000000L) + col("id") * 7919 % 100000000).as("timestamp"))
        .repartition(32)
        .write.format("graft-locations").mode("append").save(dir.toString)

      val df = spark.read.format("graft-locations").load(dir.toString)

      val pushedQ = df.orderBy(col("timestamp"), col("user_id")).limit(100)
      // identical ordering semantics, but an expression key is unpushable —
      // the scan must surface all rows and the engine TakeOrdereds them
      val enginQ = df.orderBy((col("timestamp") + expr("INTERVAL 0 SECONDS")).asc,
        col("user_id")).limit(100)
      val pPlan = pushedQ.queryExecution.executedPlan.toString
      val ePlan = enginQ.queryExecution.executedPlan.toString
      require(pPlan.contains("PushedTopN"), s"TopN must push:\n$pPlan")
      require(!ePlan.contains("PushedTopN"), s"control must NOT push:\n$ePlan")

      val want = pushedQ.collect().map(_.toString).toSeq
      require(enginQ.collect().map(_.toString).toSeq == want,
        "both paths must return the identical page")

      val p = timed("pushed per-file TopN heap")(pushedQ.collect().length.toLong)
      val e = timed("engine-side TakeOrdered (pushdown defeated)")(enginQ.collect().length.toLong)
      println(f"[topnbench] rows=$rows files=32 speedup=${e / p}%.2fx " +
        s"(scan surfaces ${100 * 32} candidate rows pushed vs $rows engine-side)")
    } finally {
      TempDirs.delete(dir)
      spark.stop()
    }
  }
}
