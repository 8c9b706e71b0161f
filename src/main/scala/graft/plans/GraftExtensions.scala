package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** SQL-surface registration for the native tile expressions: with this
  * installed, `spark.sql("SELECT tile_id(lat, lon, 12) ...")` plans the
  * codegen'd Catalyst expressions from [[TileExpressions]].
  *
  * Two installation paths:
  *   - config: `spark.sql.extensions=graft.plans.GraftExtensions`
  *   - runtime: `GraftExtensions.register(spark)` on a live session
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => TileAlgebra)
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.plans.TileExpressions", null, name, usage, "")

  // explicit casts at build time stand in for ExpectsInputTypes' implicit
  // coercion (numeric literals and decimals coerce; strings fail analysis)
  private def d(e: Expression) = if (e.dataType == DoubleType) e else Cast(e, DoubleType)
  private def i(e: Expression) = if (e.dataType == IntegerType) e else Cast(e, IntegerType)
  private def l(e: Expression) = if (e.dataType == LongType) e else Cast(e, LongType)

  // arity-checked builder: without this, extra arguments were silently
  // dropped (es(0..n-1) indexed) and missing ones surfaced as a raw
  // IndexOutOfBoundsException instead of an analysis error
  private def nargs(name: String, n: Int)(b: Seq[Expression] => Expression): Builder =
    es => {
      require(es.length == n, s"$name requires $n argument(s), got ${es.length}")
      b(es)
    }

  val definitions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("tile_row", info("tile_row", "tile_row(lat, zoom) - Web-Mercator tile row"),
      nargs("tile_row", 2)(es => TileExpressions.TileRow(d(es(0)), i(es(1))))),
    ("tile_col", info("tile_col", "tile_col(lon, zoom) - Web-Mercator tile column"),
      nargs("tile_col", 2)(es => TileExpressions.TileCol(d(es(0)), i(es(1))))),
    ("tile_id", info("tile_id", "tile_id(lat, lon, zoom) - \"z_row_col\" tile id"),
      nargs("tile_id", 3)(es => TileExpressions.TileId(d(es(0)), d(es(1)), i(es(2))))),
    ("tile_parent", info("tile_parent", "tile_parent(id) - quadtree parent tile id"),
      nargs("tile_parent", 1)(es => TileExpressions.TileParent(es(0)))),
    ("tile_decode", info("tile_decode",
      "tile_decode(id) - struct(zoom, row, col, north, south, west, east, center_lat, center_lon)"),
      nargs("tile_decode", 1)(es => TileExpressions.TileDecode(es(0)))),
    ("tile_ancestors", info("tile_ancestors",
      "tile_ancestors(id) - all strict ancestor ids, zoom-1 down to 1"),
      nargs("tile_ancestors", 1)(es => TileExpressions.TileAncestors(es(0)))),
    ("tile_children", info("tile_children",
      "tile_children(id) - the 4 child ids one zoom finer"),
      nargs("tile_children", 1)(es => TileExpressions.TileChildren(es(0)))),
    ("tile_morton", info("tile_morton",
      "tile_morton(row, col) - Z-order (Morton) spatial layout key"),
      nargs("tile_morton", 2)(es => TileExpressions.TileMorton(l(es(0)), l(es(1))))),
    ("vec_l2sq", info("vec_l2sq",
      "vec_l2sq(a, b) - exact squared-L2 distance between two array<bigint> vectors"),
      nargs("vec_l2sq", 2)(es => VectorExpressions.VecL2Sq(es(0), es(1)))),
    ("vec_dot", info("vec_dot",
      "vec_dot(a, b) - dot product of two array<float> vectors (double, left-to-right)"),
      nargs("vec_dot", 2)(es => VectorExpressions.VecDotF(es(0), es(1)))),
    ("vec_dotl", info("vec_dotl",
      "vec_dotl(a, b) - exact integer dot product of two array<bigint> vectors"),
      nargs("vec_dotl", 2)(es => VectorExpressions.VecDotL(es(0), es(1)))),
    ("gram_products", info("gram_products",
      "gram_products(v) - flattened upper-triangle self-products v[i]*v[j] (i <= j) of an array<bigint> vector"),
      nargs("gram_products", 1)(es => VectorExpressions.GramProducts(es(0)))),
    ("pos_mindist", info("pos_mindist",
      "pos_mindist(pa, pb) - min |a-b| over two sorted array<int> position lists (two-pointer merge)"),
      nargs("pos_mindist", 2)(es => VectorExpressions.PosMinDist(es(0), es(1)))),
    ("pos_within", info("pos_within",
      "pos_within(pa, pb, slop) - count of pairs |a-b| <= slop over two sorted array<int> position lists"),
      nargs("pos_within", 3)(es =>
        VectorExpressions.PosWithin(es(0), es(1), i(es(2))))))

  /** Register on an already-running session (functions + optimizer rule). */
  def register(spark: SparkSession): Unit = {
    definitions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(TileAlgebra))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TileAlgebra
  }
}
