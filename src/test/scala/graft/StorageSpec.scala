package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Tables

/** Storage-layout features that carry the 100 TB story: bucketed co-located
  * joins (shuffle-free SMJ), partitioned writes with partition pruning, and
  * multi-format source/sink round-trips (the reference hardcodes Cassandra;
  * this engine is DSv2-agnostic). */
class StorageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfSmoke

  test("bucketed tables join without any exchange (co-located SMJ)") {
    // warehouse dir is a static conf, set at session creation (TestSpark)
    val orders = Tables(spark, sf, "orders")
    val customer = Tables(spark, sf, "customer")
    orders.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    customer.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the join itself must not shuffle either side: only the final
      // aggregation exchange is allowed
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"bucketed join must be exchange-free below the join:\n$plan")
      // correctness: same result as the unbucketed join
      val expect = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").count()
      assert(joined.orderBy("c_mktsegment").collect().toSeq ==
        expect.orderBy("c_mktsegment").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("partitioned write + partition pruning reaches the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables(spark, sf, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val read = spark.read.parquet(dir).filter(col("day") === "2024-01-05")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-05"),
      s"day filter must prune partitions:\n$plan")
    // pruned read matches a post-hoc filter of the full table
    val full = Tables(spark, sf, "events")
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(read.count() == full)
  }

  test("LocationsSource validates schema and coerces epoch-ms timestamps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-loc").toString
    Seq((47.6, -122.3, "gps", "alice", 1700000000000L))
      .toDF("latitude", "longitude", "source", "user_id", "timestamp")
      .write.mode("overwrite").parquet(dir)
    val got = graft.sources.LocationsSource.read(spark, dir)
    assert(got.schema == graft.sources.LocationsSource.schema)
    assert(got.count() == 1)
    // missing column fails fast with a readable message
    val badDir = java.nio.file.Files.createTempDirectory("graft-badloc").toString
    Seq((1.0, 2.0)).toDF("latitude", "longitude").write.mode("overwrite").parquet(badDir)
    val e = intercept[IllegalArgumentException] {
      graft.sources.LocationsSource.read(spark, badDir)
    }
    assert(e.getMessage.contains("missing column(s)"))
  }

  test("ParquetCompactor merges fragmented files without changing data") {
    val frag = java.nio.file.Files.createTempDirectory("graft-frag").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    Tables(spark, sf, "events").repartition(37).write.mode("overwrite").parquet(frag)
    val before = new java.io.File(frag).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 37)
    graft.sources.ParquetCompactor.compact(spark, frag, out, targetFileMB = 256)
    val after = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < before, s"expected fewer files, got $after")
    assert(spark.read.parquet(out).count() == Tables(spark, sf, "events").count())
  }

  test("custom DSv2 graft-locations connector: parallel read, pruning, LocationsSource seam") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsv2").toFile
    // two files → two input partitions; one null field; one empty line
    java.nio.file.Files.writeString(new java.io.File(dir, "a.loc").toPath,
      "47.6,-122.3,gps,alice,1700000000000\n40.7,-74.0,gps,bob,1700000001000\n")
    java.nio.file.Files.writeString(new java.io.File(dir, "b.loc").toPath,
      "51.5,-0.1,background,,1700000002000\n\n")
    new java.io.File(dir, "ignored.txt").createNewFile() // non-.loc skipped

    val df = spark.read.format("graft-locations").load(dir.toString)
    assert(df.schema == graft.sources.GraftLocationsTable.tableSchema)
    assert(df.rdd.getNumPartitions == 2, "one partition per .loc file")
    val rows = df.orderBy("user_id").collect()
    assert(rows.length == 3)
    assert(rows(2).getString(3) == "bob" &&
      rows(2).getTimestamp(4).getTime == 1700000001000L)
    assert(rows(0).isNullAt(3), "empty user_id field reads as null")

    // column pruning reaches the DSv2 scan: only requested fields survive
    val pruned = df.select("latitude").queryExecution.executedPlan.toString
    assert(pruned.contains("[latitude]") && !pruned.contains("user_id"),
      s"scan must prune to latitude only:\n$pruned")

    // the LocationsSource contract seam accepts the custom format string
    val viaSeam = graft.sources.LocationsSource.read(
      spark, dir.toString, "graft-locations")
    assert(viaSeam.schema == graft.sources.LocationsSource.schema)
    assert(viaSeam.count() == 3)
  }

  test("round-trips through parquet, json, csv, and orc sinks/sources") {
    val base = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val n = base.count()
    Seq("parquet", "json", "csv", "orc").foreach { fmt =>
      val dir = java.nio.file.Files.createTempDirectory(s"graft-$fmt").toString
      base.write.mode("overwrite").option("header", "true").format(fmt).save(dir)
      val back = spark.read.option("header", "true").option("inferSchema", "true")
        .format(fmt).load(dir)
      assert(back.count() == n, s"$fmt row count")
      assert(back.columns.toSet == base.columns.toSet, s"$fmt schema")
    }
  }
}
