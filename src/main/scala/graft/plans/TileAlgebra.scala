package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Algebraic rewrite over the native tile expressions:
  *
  *   tile_parent(tile_id(lat, lon, z))  ==>  tile_id(lat, lon, z - 1)
  *
  * The equivalence is exact for every point and zoom ≥ 1 — the quadtree
  * ancestor of a quantization IS the coarser quantization (proved by
  * TileMathSpec's "ancestors equal center re-quantization" property; it is
  * the identity the reference exploits procedurally at tile.py:60–64).
  *
  * The rewrite removes a string format→parse→shift→format round trip per
  * row — domain algebra Catalyst cannot know on its own, injected as a
  * standard optimizer rule (SparkSessionExtensions.injectOptimizerRule).
  * The optimizer runs it to fixed point, so chained parents collapse:
  * tile_parent(tile_parent(tile_id(.., z))) → tile_id(.., z-2). Zoom 0 is
  * left untouched (its parent is null at runtime, per the reference's
  * silent-None semantics).
  */
object TileAlgebra extends Rule[LogicalPlan] {
  import TileExpressions.{TileId, TileParent}

  private def zoomAtLeastOne(e: Expression): Boolean =
    e.foldable && (e.eval() match {
      case z: java.lang.Integer => z >= 1
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case TileParent(TileId(lat, lon, zoomExpr)) if zoomAtLeastOne(zoomExpr) =>
        val z = zoomExpr.eval().asInstanceOf[java.lang.Integer]
        TileId(lat, lon, Literal(z - 1, IntegerType))
    }
}
