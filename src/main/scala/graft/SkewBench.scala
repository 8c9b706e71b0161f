package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-skew measurement harness (VERDICT r4 §5): the repo's skew story
  * (phase-1 pyramid keys include the fine tile; SaltedJoin/SaltedAgg for
  * residual skew; AQE skew-split pinned in PlanSpec) was argued and
  * unit-pinned but never MEASURED. This main plants the canonical skew
  * shapes and records wall-clock + whether AQE's skew split actually fires:
  *
  *   A. join skew — a fact table with 50% of rows on ONE key joined to a
  *      non-broadcastable dim: plain SMJ (one straggler task) vs AQE
  *      skew-split vs deterministic SaltedJoin;
  *   B. aggregation skew — the same hot key under groupBy().sum(): partial
  *      (map-side) aggregation makes the hot key invisible, measured
  *      against a uniform-key control;
  *   C. pyramid skew — sf0.1 events with 50% of rows reassigned to one hot
  *      user: phase-1 keys include the fine tile, so the hot group spreads
  *      across reducers by construction, measured against stock events.
  *
  * Results are recorded in CHANGES.md. Run:
  *   sbt "runMain graft.SkewBench"   (SPARK_GRAFT_SF_DIR to override corpus)
  */
object SkewBench {

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
    println(s"[skewbench] $label: ${fmt(med)}s (runs: ${times.map(fmt).mkString(", ")})")
    med
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // ansi pinned as in Verify/Bench: one documented overflow semantics
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = graft.TempDirs.create("graft-stream-skewbench")

    // ---- fixture: 20M-row fact, 50% of rows on key 0, tail uniform over
    // 100k keys; 100k-row dim (too big to broadcast in a real deployment —
    // broadcast thresholds disabled below to model that)
    val nFact = 20000000L
    spark.range(nFact)
      .select(
        when(col("id") % 2 === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(100000L))).as("k"),
        (col("id") % 1000).as("v"))
      .write.mode("overwrite").parquet(s"$work/fact.parquet")
    spark.range(100000).select(col("id").as("k"), (col("id") * 7 % 97).as("dim"))
      .write.mode("overwrite").parquet(s"$work/dim.parquet")
    val fact = spark.read.parquet(s"$work/fact.parquet")
    val dim = spark.read.parquet(s"$work/dim.parquet")

    def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
      val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val noBroadcast = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

    // ---- A. join skew
    println(s"[skewbench] fact=${nFact} rows (50% on one key), dim=100000 rows")
    withConfs(noBroadcast :+
      ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      timed("A1 join, skew-split OFF (hot partition = one straggler task)") {
        fact.join(dim, "k").groupBy("dim").agg(sum("v")).count()
      }
    }
    withConfs(noBroadcast ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // sf-scale shuffle partitions are MBs, not the 256MB default
      // threshold — lower it so the demo exercises the same code path a
      // 100TB hot partition hits
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m"): _*) {
      val joined = fact.join(dim, "k").groupBy("dim").agg(sum("v"))
      timed("A2 join, AQE skew-split ON") { joined.count() }
      val plan = joined.queryExecution.executedPlan.toString
      val fired = plan.toLowerCase.contains("skew")
      println(s"[skewbench] A2 final plan shows skew handling: $fired")
      require(fired, "expected AQE skew split in the final plan")
    }
    withConfs(noBroadcast :+
      ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      timed("A3 join via deterministic SaltedJoin (buckets=32)") {
        graft.operators.SaltedJoin.inner(fact, dim, Seq("k"), buckets = 32)
          .groupBy("dim").agg(sum("v")).count()
      }
    }

    // ---- B. aggregation skew: partial aggregation defuses the hot key
    timed("B1 groupBy.sum on 50%-hot keys (partial agg defuses)") {
      fact.groupBy("k").agg(sum("v"), count(lit(1))).count()
    }
    val uniform = spark.range(nFact)
      .select(pmod(xxhash64(col("id")), lit(100000L)).as("k"), (col("id") % 1000).as("v"))
    timed("B2 groupBy.sum on uniform keys (control)") {
      uniform.groupBy("k").agg(sum("v"), count(lit(1))).count()
    }

    // ---- C. pyramid under a hot user: 50% of sf0.1 events on one user_id
    // (Tables handles the TIMESTAMP(NANOS) quirk; the rewritten copy lands
    // as micros, which Tables passes through unchanged)
    val events = graft.queries.Tables(spark, sfDir, "events")
    events.withColumn("user_id",
        when(col("event_id") % 2 === 0, lit(42L)).otherwise(col("user_id")))
      .write.mode("overwrite").parquet(s"$work/skewed/events.parquet")
    timed("C1 hm_pyramid on stock sf0.1 events") {
      graft.queries.HeatmapQueries.hmPyramid.build(spark, sfDir).count()
    }
    timed("C2 hm_pyramid on 50%-hot-user events") {
      graft.queries.HeatmapQueries.hmPyramid.build(spark, s"$work/skewed").count()
    }

    // best-effort cleanup (the graft-stream prefix makes leftovers sweepable)
    graft.TempDirs.delete(work) // prompt cleanup; shutdown hook is the backstop
    spark.stop()
  }
}
