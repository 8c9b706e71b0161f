package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen expressions for integer-vector math — the (b)-tier
  * extension mechanism applied to the similarity hot path: Spark's
  * higher-order `aggregate(zip_with(...))` lambdas evaluate INTERPRETED per
  * element, which is the dominant cost of within-cluster pairing in
  * `dedup_semantic` (millions of pairs × 64 dims). `vec_l2sq` inlines a
  * primitive long loop into codegen instead — no lambda dispatch, no
  * boxing, no per-element virtual calls. Bit-identical to the lambda form
  * (ExpressionSpec asserts it) and CODEGEN_ONLY-covered like every other
  * native expression in this package.
  */
object VectorExpressions {

  /** vec_l2sq(a, b): exact squared-L2 distance Σ (a_i − b_i)² between two
    * long-array vectors (integer micros in the catalog). Null arrays →
    * null; a LENGTH MISMATCH throws (a silent zip-truncate would
    * under-count distance and corrupt near-dup decisions); null ELEMENTS
    * are not supported (the micro-quantization never produces them).
    * Overflow contract (same as KMeans): the caller keeps
    * |element| ≤ 2^(30.5 − log₂(dim)/2) — ~2²⁵ at dim 1024 — or the long
    * accumulator wraps silently. */
  case class VecL2Sq(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(LongType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "vec_l2sq"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) throw new IllegalArgumentException(
        s"vec_l2sq: vector length mismatch ($n vs ${y.numElements()})")
      var acc = 0L
      var i = 0
      while (i < n) {
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "vec_l2sq: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
           |}
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  long $d = $a.getLong($i) - $b.getLong($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecL2Sq =
      copy(left = l, right = r)
  }

  /** vec_dot(a, b): dot product of two float- or double-array vectors
    * (each side's element type independent — embeddings are float, derived
    * hyperplanes/reconstructions are double), accumulated in double
    * LEFT-TO-RIGHT — the exact evaluation order of the
    * `aggregate(zip_with(cast, cast))` lambda form it replaces, so results
    * are bit-identical (the similarity oracles compare doubles by shortest
    * round-trip repr, and float addition does not commute). Same null and
    * length-mismatch contract as [[VecL2Sq]]. */
  case class VecDotF(left: Expression, right: Expression) extends BinaryExpression {
    import org.apache.spark.sql.types.{DoubleType, FloatType}

    private def elem(t: DataType): Option[DataType] = t match {
      case ArrayType(FloatType, _) => Some(FloatType)
      case ArrayType(DoubleType, _) => Some(DoubleType)
      case _ => None
    }

    override def checkInputDataTypes(): TypeCheckResult =
      if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) throw new IllegalArgumentException(
        s"vec_dot: vector length mismatch ($n vs ${y.numElements()})")
      val xf = elem(left.dataType).contains(FloatType)
      val yf = elem(right.dataType).contains(FloatType)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        def get(arr: String, t: DataType) =
          if (elem(t).contains(FloatType)) s"((double) $arr.getFloat($i))"
          else s"$arr.getDouble($i)"
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "vec_dot: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
           |}
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += ${get(a, left.dataType)} * ${get(b, right.dataType)};
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotF =
      copy(left = l, right = r)
  }

  /** vec_dotl(a, b): EXACT integer dot product Σ a_i·b_i between two
    * long-array vectors (micro-quantized embeddings — the MMR relevance /
    * diversity kernel, where every comparison must be bit-free exact and
    * DuckDB-reproducible; contrast [[VecDotF]], whose float accumulation
    * contract serves the float-similarity oracles). Same null and
    * length-mismatch contract as [[VecL2Sq]]; overflow contract: the
    * caller keeps dim·max|a_i·b_i| < 2⁶³ — micros (≤10⁶) at dim ≤ 10⁴
    * leaves 10³× headroom. */
  case class VecDotL(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(LongType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "vec_dotl"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (n != y.numElements()) throw new IllegalArgumentException(
        s"vec_dotl: vector length mismatch ($n vs ${y.numElements()})")
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += x.getLong(i) * y.getLong(i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  throw new IllegalArgumentException(
           |    "vec_dotl: vector length mismatch (" + $n + " vs " + $b.numElements() + ")");
           |}
           |long $acc = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotL =
      copy(left = l, right = r)
  }
}
