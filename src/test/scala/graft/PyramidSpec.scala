package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.HeatmapQueries

/** Semantic invariants of the heatmap pyramid (SURVEY.md §5):
  * every zoom level's totals must equal the raw per-group counts — the
  * property that catches the reference's exponential `all`-group
  * double-count (SURVEY.md §2.11.2: the reference emits 2^(22-z)-1 at
  * zoom z for a single point; the intended semantics emit 1 at every z). */
class PyramidSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pyramid-sum invariant: per (group, timespan), every zoom level has the same total") {
    val pyr = HeatmapQueries.hmPyramid.build(spark, TestSpark.sfSmoke).cache()
    try {
      val perLevel = pyr.groupBy("user_group", "timespan", "zoom")
        .agg(sum("cnt").as("total"))
      val distinctTotals = perLevel.groupBy("user_group", "timespan")
        .agg(countDistinct("total").as("nTotals"), count(lit(1)).as("nLevels"))
      val bad = distinctTotals.filter(col("nTotals") =!= 1 || col("nLevels") =!= 16)
      assert(bad.isEmpty, s"groups with unequal level totals: ${bad.collect().mkString(",")}")
    } finally pyr.unpersist()
  }

  test("pyramid 'all' group total equals filtered raw event count at every zoom") {
    val pyr = HeatmapQueries.hmPyramid.build(spark, TestSpark.sfSmoke)
    val raw = graft.queries.Tables(spark, TestSpark.sfSmoke, "events")
      .filter(col("event_type") =!= "view").count()
    val allAlltime = pyr.filter(col("user_group") === "all" && col("timespan") === "alltime")
      .groupBy("zoom").agg(sum("cnt").as("total")).collect()
    assert(allAlltime.length == 16)
    allAlltime.foreach(r => assert(r.getLong(1) == raw, s"zoom ${r.get(0)}"))
  }

  test("blob JSON is well-formed and keyed by 5-zoom-coarser result-set tiles") {
    val blobs = HeatmapQueries.hmBlobs.build(spark, TestSpark.sfSmoke).collect()
    assert(blobs.nonEmpty)
    blobs.foreach { r =>
      val id = r.getString(0); val hm = r.getString(1)
      val Array(_, _, rsTile) = id.split("\\|", 3)
      assert(rsTile.startsWith("7_"), s"result-set tile must be z7: $id")
      assert(hm.startsWith("{") && hm.endsWith("}"))
      assert(hm.contains("\"12_"), s"content tiles must be z12: $hm")
    }
  }

  test("entry() returns non-empty flagship result") {
    assert(graft.SparkEntry.entry(spark).limit(5).count() > 0)
  }
}
