package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TileFunctions
import graft.plans.GraftExtensions
import graft.tiles.TileMath

/** The three tile-math paths — pure Scala, built-in-function composition,
  * and the native codegen Expression — must agree bit-for-bit, in both
  * codegen and interpreted evaluation. */
class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sampleDf = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    Seq.fill(2000)((rnd.nextDouble() * 170 - 85, rnd.nextDouble() * 360 - 180,
      1 + rnd.nextInt(21))).toDF("lat", "lon", "zoom")
  }

  test("native expression == built-in composition == pure Scala, all zooms") {
    GraftExtensions.register(spark)
    sampleDf.createOrReplaceTempView("pts")
    val rows = spark.sql(
      """SELECT lat, lon, zoom, tile_row(lat, zoom) AS er, tile_col(lon, zoom) AS ec,
        |       tile_id(lat, lon, zoom) AS eid
        |FROM pts""".stripMargin).collect()
    assert(rows.length == 2000)
    rows.foreach { r =>
      val (lat, lon, z) = (r.getDouble(0), r.getDouble(1), r.getInt(2))
      assert(r.getLong(3) == TileMath.rowFromLatitude(lat, z), s"row @($lat,$z)")
      assert(r.getLong(4) == TileMath.columnFromLongitude(lon, z), s"col @($lon,$z)")
      assert(r.getString(5) == TileMath.tileIdFromLatLon(lat, lon, z))
    }
  }

  test("fixed-zoom Column composition matches the native expression") {
    GraftExtensions.register(spark)
    val df = sampleDf.filter(col("zoom") === 12)
    val both = df.select(
      TileFunctions.tileId(col("lat"), col("lon"), 12).as("composed"),
      expr("tile_id(lat, lon, 12)").as("native"))
    assert(both.filter(col("composed") =!= col("native")).isEmpty)
  }

  test("interpreted (non-codegen) eval matches codegen eval") {
    GraftExtensions.register(spark)
    sampleDf.createOrReplaceTempView("pts")
    val q = "SELECT sum(tile_row(lat, zoom) * 31 + tile_col(lon, zoom)) AS chk FROM pts"
    val codegen = spark.sql(q).collect()(0).getLong(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = spark.sql(q).collect()(0).getLong(0)
      assert(interpreted == codegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("nulls propagate") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT tile_id(CAST(NULL AS DOUBLE), 1.0, 5) AS x").collect()(0)
    assert(r.isNullAt(0))
  }
}
