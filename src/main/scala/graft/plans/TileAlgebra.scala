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
  * results depend on whether the rule fired (ExpressionSpec pins lat=90 /
  * lon=180 agreement). The guard evaluates TileRow/TileCol with the *same*
  * Math ops decode's path uses, so the two plans agree bit-for-bit; the
  * branch re-quantizes at z-1, still far cheaper than the string round
  * trip. Zoom 0 is left untouched (its parent is null at runtime, per the
  * reference's silent-None semantics); lat/lon must be deterministic since
  * the rewrite duplicates them.
  *
  * Chained parents collapse THROUGH the guard on later fixed-point
  * iterations — but ONLY through a guard this rule itself built
  * (structurally matched by [[InRangeGuard]], over the same lat/lon at a
  * zoom ≥ the inner tile_id's). Matching any user-written
  * `IF(p, tile_id(..), NULL)` would be unsound: an arbitrary predicate p
  * does not imply in-domain coordinates, so collapsing under it would
  * return non-null ids where the unrewritten tile_parent yields NULL.
  */
object TileAlgebra extends Rule[LogicalPlan] {
  import TileExpressions.{TileCol, TileId, TileParent, TileRow}

  private def usableZoom(e: Expression): Boolean =
    e.foldable && (e.eval() match {
      case z: java.lang.Integer => z >= 1 && z <= 62 // shift-safe
      case _ => false
    })

  private def inRangeGuard(lat: Expression, lon: Expression, z: Int): Expression = {
    val row = TileRow(lat, Literal(z, IntegerType))
    val col = TileCol(lon, Literal(z, IntegerType))
    val n = Literal(1L << z, LongType)
    val zero = Literal(0L, LongType)
    And(
      And(GreaterThanOrEqual(row, zero), LessThan(row, n)),
      And(GreaterThanOrEqual(col, zero), LessThan(col, n)))
  }

  /** Recognizes EXACTLY the guard shape built by [[inRangeGuard]], yielding
    * (lat, lon, zoom). Anything else — in particular user-written
    * predicates — must not be treated as an in-domain proof. */
  private object InRangeGuard {
    def unapply(e: Expression): Option[(Expression, Expression, Int)] = e match {
      case And(
          And(GreaterThanOrEqual(TileRow(lat1, Literal(z1: Integer, IntegerType)),
                Literal(0L, LongType)),
              LessThan(TileRow(lat2, Literal(z2: Integer, IntegerType)),
                Literal(n1: Long, LongType))),
          And(GreaterThanOrEqual(TileCol(lon1, Literal(z3: Integer, IntegerType)),
                Literal(0L, LongType)),
              LessThan(TileCol(lon2, Literal(z4: Integer, IntegerType)),
                Literal(n2: Long, LongType))))
          if z1 == z2 && z1 == z3 && z1 == z4 &&
            z1 >= 1 && z1 <= 62 && n1 == (1L << z1.intValue) && n2 == n1 &&
            lat1.semanticEquals(lat2) && lon1.semanticEquals(lon2) =>
        Some((lat1, lon1, z1.intValue))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case TileParent(TileId(lat, lon, zoomExpr))
          if usableZoom(zoomExpr) && lat.deterministic && lon.deterministic =>
        val z = zoomExpr.eval().asInstanceOf[java.lang.Integer].intValue
        If(inRangeGuard(lat, lon, z), TileId(lat, lon, Literal(z - 1, IntegerType)),
          Literal(null, StringType))

      // collapse a chained parent through OUR OWN guard: in-range at guard
      // zoom gz implies in-range at every coarser zoom (row>>k stays in
      // [0, 2^(gz-k))), and the guard zoom is always ≥ the inner tile_id's
      // zoom in a chain built by the rule above
      case TileParent(If(g @ InRangeGuard(glat, glon, gz),
            TileId(lat, lon, zoomExpr), Literal(null, StringType)))
          if usableZoom(zoomExpr) &&
            gz >= zoomExpr.eval().asInstanceOf[java.lang.Integer].intValue &&
            glat.semanticEquals(lat) && glon.semanticEquals(lon) =>
        val z = zoomExpr.eval().asInstanceOf[java.lang.Integer].intValue
        If(g, TileId(lat, lon, Literal(z - 1, IntegerType)),
          Literal(null, StringType))
    }
}
