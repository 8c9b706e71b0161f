package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HeatmapPipeline

/** End-to-end semantics of the reference-shaped pipeline on real lat/lon
  * input, including the golden row documented in FIXTURES.md §A (from the
  * survey's mock-RDD execution of the reference):
  * `alice|alltime|10_357_164` → {"15_11443_5249": 2.0}. */
class HeatmapPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def locations = {
    import spark.implicits._
    Seq(
      // two alice points in the same z21 tile (Seattle)
      (47.6062, -122.3321, "gps", "alice", 1700000000000L),
      (47.6062, -122.3321, "gps", "alice", 1700000001000L),
      // bob nearby
      (47.6162, -122.3421, "gps", "bob", 1700000002000L),
      // x-prefixed user: counted in 'all' but gets no per-user group
      (47.6062, -122.3321, "gps", "xsecret", 1700000003000L),
      // rt- user collapses into 'route'
      (40.7128, -74.0060, "gps", "rt-7", 1700000004000L),
      // background rows are dropped entirely
      (47.6062, -122.3321, "background", "alice", 1700000005000L)
    ).toDF("latitude", "longitude", "source", "user_id", "timestamp")
      .withColumn("timestamp", timestamp_millis(col("timestamp")))
  }

  test("golden: alice's z10 result-set blob matches the reference fixture") {
    val out = HeatmapPipeline.run(locations).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("alice|alltime|10_357_164") == """{"15_11443_5249":2.0}""")
  }

  test("x-users count in 'all' but have no per-user group; rt- becomes route") {
    val obs = HeatmapPipeline.observations(locations)
    val groups = obs.select("user_group").distinct().collect().map(_.getString(0)).toSet
    assert(groups == Set("all", "alice", "bob", "route"))
    // 'all' includes the xsecret point: 5 non-background rows
    assert(obs.filter(col("user_group") === "all").count() == 5)
  }

  test("pyramid-sum invariant holds for every group at every zoom") {
    val pyr = HeatmapPipeline.pyramid(HeatmapPipeline.observations(locations))
    val totals = pyr.groupBy("user_group", "zoom").agg(sum("count").as("t"))
      .groupBy("user_group").agg(countDistinct("t").as("n"), first("t").as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(totals("all") == (1L, 5.0))
    assert(totals("alice") == (1L, 2.0))
    assert(totals("route") == (1L, 1.0))
  }

  test("blob ids carry result-set tiles exactly detailZoomDelta above content") {
    HeatmapPipeline.run(locations).collect().foreach { r =>
      val rsZoom = r.getString(0).split("\\|")(2).split("_")(0).toInt
      // every content tile in the JSON must be rsZoom + 5
      "\"(\\d+)_".r.findAllMatchIn(r.getString(1)).foreach { m =>
        assert(m.group(1).toInt == rsZoom + 5, s"row $r")
      }
    }
  }

  test("mergeBlobs: a 3-way period fold is byte-identical to the full recompute") {
    // the incremental-maintenance contract: split locations into arbitrary
    // disjoint periods, run the pipeline per period, fold the blob tables —
    // the result must equal run() on everything, byte for byte (same ids,
    // same JSON key order, same rendered counts). Period 2 is EMPTY to
    // exercise the identity case.
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
      df.collect().map(r => r.getString(0) -> r.getString(1)).toSeq.sorted
    val p1 = locations.filter(col("timestamp") < timestamp_millis(lit(1700000002000L)))
    val p2 = locations.filter(lit(false))
    val p3 = locations.filter(col("timestamp") >= timestamp_millis(lit(1700000002000L)))
    val folded = Seq(p2, p3).foldLeft(HeatmapPipeline.run(p1)) { (acc, p) =>
      HeatmapPipeline.mergeBlobs(acc, HeatmapPipeline.run(p))
    }
    assert(canon(folded) == canon(HeatmapPipeline.run(locations)))
    // commutativity: delta-first fold gives the same table
    val reversed = HeatmapPipeline.mergeBlobs(HeatmapPipeline.run(p3),
      HeatmapPipeline.run(p1))
    assert(canon(reversed) == canon(HeatmapPipeline.run(locations)))
  }

  test("mergeBlobs: a malformed blob fails the job instead of vanishing") {
    import spark.implicits._
    val good = Seq(("g|alltime|7_1_1", """{"12_32_32":1.0}""")).toDF("id", "heatmap")
    val corrupt = Seq(("g|alltime|7_1_1", """{"12_32_32":""")).toDF("id", "heatmap")
    val ex = intercept[Exception] {
      HeatmapPipeline.mergeBlobs(good, corrupt).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("malformed blob JSON"))), s"got: $ex")
  }
}
