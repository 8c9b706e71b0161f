package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression,
  GreaterThanOrEqual, If, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** Algebraic rewrite over the native tile expressions:
  *
  *   tile_parent(tile_id(lat, lon, z))
  *     ==>  IF(row/col in [0, 2^z), tile_id(lat, lon, z - 1), NULL)
  *
  * For in-domain points the quadtree ancestor of a quantization IS the
  * coarser quantization (proved by TileMathSpec's "ancestors equal center
  * re-quantization" property; it is the identity the reference exploits
  * procedurally at tile.py:60–64), and the rewrite removes a string
  * format→parse→shift→format round trip per row — domain algebra Catalyst
  * cannot know on its own, injected as a standard optimizer rule
  * (SparkSessionExtensions.injectOptimizerRule).
  *
  * The IF guard repeats decode's range check (TileMath.decode rejects
  * row/col outside [0, 2^z)) so OUT-of-domain inputs — lat beyond ±85.0511°,
  * lon = 180 — still yield NULL exactly as the unrewritten plan does; an
  * unguarded rewrite would return a non-null id for those inputs and make
  * results depend on whether the rule fired (TileAlgebraSpec pins lat=90 /
  * lon=180 agreement). The guard evaluates TileRow/TileCol with the *same*
  * Math ops decode's path uses, so the two plans agree bit-for-bit; the
  * branch re-quantizes at z-1, still far cheaper than the string round
  * trip. Zoom 0 is left untouched (its parent is null at runtime, per the
  * reference's silent-None semantics); lat/lon must be deterministic since
  * the rewrite duplicates them.
  */
object TileAlgebra extends Rule[LogicalPlan] {
  import TileExpressions.{TileCol, TileId, TileParent, TileRow}

  private def usableZoom(e: Expression): Boolean =
    e.foldable && (e.eval() match {
      case z: java.lang.Integer => z >= 1 && z <= 62 // shift-safe
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case TileParent(TileId(lat, lon, zoomExpr))
          if usableZoom(zoomExpr) && lat.deterministic && lon.deterministic =>
        val z = zoomExpr.eval().asInstanceOf[java.lang.Integer].intValue
        val row = TileRow(lat, Literal(z, IntegerType))
        val col = TileCol(lon, Literal(z, IntegerType))
        val n = Literal(1L << z, LongType)
        val zero = Literal(0L, LongType)
        val inRange = And(
          And(GreaterThanOrEqual(row, zero), LessThan(row, n)),
          And(GreaterThanOrEqual(col, zero), LessThan(col, n)))
        If(inRange, TileId(lat, lon, Literal(z - 1, IntegerType)),
          Literal(null, StringType))

      // chained parents collapse THROUGH the guard on later fixed-point
      // iterations: tile_parent(IF(g, tile_id(.., z), NULL)) ==>
      // IF(g, tile_id(.., z-1), NULL). Sound because g (in-range at the
      // original zoom) implies in-range at every coarser zoom, and
      // tile_parent(NULL) is NULL; so tile_parent(tile_parent(tile_id(.., z)))
      // still ends as a single guarded tile_id(.., z-2).
      case TileParent(If(guard, TileId(lat, lon, zoomExpr), Literal(null, StringType)))
          if usableZoom(zoomExpr) =>
        val z = zoomExpr.eval().asInstanceOf[java.lang.Integer].intValue
        If(guard, TileId(lat, lon, Literal(z - 1, IntegerType)),
          Literal(null, StringType))
    }
}
