package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

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

  /** gram_products(v): the upper-triangle self-products of one quantized
    * long vector, flattened row-major — out[i·d − i·(i−1)/2 + (j − i)] =
    * v[i]·v[j] for 0 ≤ i ≤ j < d, length d(d+1)/2. This is the map-side
    * Gramian expansion of `emb_gram` / `emb_pca_power` lowered from the
    * nested `transform(sequence, …)` lambda pair, which evaluates
    * INTERPRETED per element (two lambda dispatches + a boxed struct per
    * product — the dominant per-row cost of the triangle build; round-18
    * "not yet optimized" item 3). One primitive long loop writing a
    * primitive long[] instead: no lambda dispatch, no boxing, and the
    * downstream aggregation keys on the SINGLE int position (posexplode)
    * rather than the (i, j) pair — the consumer derives (i, j) back from
    * the position over the d(d+1)/2-row AGGREGATED table, never per input
    * row.
    *
    * Contract: null array → null; null ELEMENT throws (the quantization
    * `transform(floor(x·scale))` never produces one, and the lambda form
    * would have silently emitted a null product that `sum` skips while
    * `count` still counts — reproducing that silently would corrupt n);
    * each product is `Math.multiplyExact` so overflow throws exactly like
    * the ANSI-mode multiply in the lambda form it replaces. */
  case class GramProducts(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> argument, got ${t.simpleString}")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "gram_products"

    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val d = v.numElements()
      var i = 0
      while (i < d) {
        if (v.isNullAt(i)) throw new IllegalArgumentException(
          "gram_products: vector contains a null element")
        i += 1
      }
      val out = new Array[Long](d * (d + 1) / 2)
      var k = 0
      i = 0
      while (i < d) {
        val vi = v.getLong(i)
        var j = i
        while (j < d) {
          out(k) = Math.multiplyExact(vi, v.getLong(j))
          k += 1
          j += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val d = ctx.freshName("d")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val k = ctx.freshName("k")
        val vi = ctx.freshName("vi")
        val out = ctx.freshName("out")
        s"""
           |int $d = $v.numElements();
           |for (int $i = 0; $i < $d; $i++) {
           |  if ($v.isNullAt($i)) {
           |    throw new IllegalArgumentException(
           |      "gram_products: vector contains a null element");
           |  }
           |}
           |long[] $out = new long[$d * ($d + 1) / 2];
           |int $k = 0;
           |for (int $i = 0; $i < $d; $i++) {
           |  long $vi = $v.getLong($i);
           |  for (int $j = $i; $j < $d; $j++) {
           |    $out[$k++] = java.lang.Math.multiplyExact($vi, $v.getLong($j));
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
           |  .fromPrimitiveArray($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): GramProducts =
      copy(child = c)
  }

  /** The input guard [[PosMinDist]]/[[PosWithin]] share: both two-pointer
    * laws are only correct on ascending inputs, and a builder that ever
    * emitted unsorted positions would silently corrupt proximity
    * ranking — so each eval validates BOTH arrays upfront (one full
    * linear pass; the pointer walks alone can terminate before reaching
    * an unsorted tail that would have changed the answer) and fails
    * loudly. NULL elements are rejected in the same pass: `getInt` would
    * silently read a null slot as position 0 (a phantom position — or a
    * misleading "not sorted" error), and the positional lake never
    * produces them, so an ad-hoc SQL caller passing one gets the loud
    * failure the contract promises (review finding). */
  private def requireSorted(name: String, side: String, a: ArrayData): Unit = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$name: $side position array contains a null element")
      if (i > 0 && a.getInt(i - 1) > a.getInt(i)) throw new IllegalArgumentException(
        s"$name: $side position array is not sorted ascending")
      i += 1
    }
  }

  /** Codegen twin of [[requireSorted]]. */
  private def sortedCheckCode(ctx: CodegenContext, name: String, side: String,
      arr: String, n: String): String = {
    val i = ctx.freshName("si")
    s"""
       |for (int $i = 0; $i < $n; $i++) {
       |  if ($arr.isNullAt($i)) {
       |    throw new IllegalArgumentException(
       |      "$name: $side position array contains a null element");
       |  }
       |  if ($i > 0 && $arr.getInt($i - 1) > $arr.getInt($i)) {
       |    throw new IllegalArgumentException(
       |      "$name: $side position array is not sorted ascending");
       |  }
       |}
     """.stripMargin
  }

  /** pos_mindist(pa, pb): minimum |a − b| over all pairs drawn from two
    * SORTED-ascending int position arrays (the positional index's
    * per-(doc, word) layout) — the classic two-pointer merge, O(|pa|+|pb|)
    * time and O(1) extra space, replacing the O(|pa|·|pb|) materialized
    * pair grid that an adversarial repeated-token document (tf_a ≈ tf_b ≈
    * dl ≈ 10⁵) would blow up into a 10¹⁰-element in-row array (round-16
    * verdict, scale-killer #2). Null array → null; EMPTY array → null
    * (the array_min-of-empty-grid convention of the fold it replaces);
    * unsorted input throws (a silent wrong minimum would corrupt ranking).
    * Values are int positions, so |a − b| fits long with no overflow
    * question. */
  case class PosMinDist(left: Expression, right: Expression) extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      def ok(t: DataType) = t match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      }
      if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<int> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "pos_mindist"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val nx = x.numElements()
      val ny = y.numElements()
      if (nx == 0 || ny == 0) return null
      requireSorted(prettyName, "left", x)
      requireSorted(prettyName, "right", y)
      var i = 0
      var j = 0
      var best = Long.MaxValue
      while (i < nx && j < ny) {
        val xv = x.getInt(i).toLong
        val yv = y.getInt(j).toLong
        val d = math.abs(xv - yv)
        if (d < best) best = d
        // advance the smaller head: the discarded element can only be
        // FARTHER from every remaining element of the other side
        if (xv <= yv) i += 1 else j += 1
      }
      best
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val best = ctx.freshName("best")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        val d = ctx.freshName("d")
        s"""
           |int $nx = $a.numElements();
           |int $ny = $b.numElements();
           |if ($nx == 0 || $ny == 0) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${sortedCheckCode(ctx, "pos_mindist", "left", a, nx)}
           |  ${sortedCheckCode(ctx, "pos_mindist", "right", b, ny)}
           |  int $i = 0; int $j = 0;
           |  long $best = Long.MAX_VALUE;
           |  while ($i < $nx && $j < $ny) {
           |    long $xv = (long) $a.getInt($i);
           |    long $yv = (long) $b.getInt($j);
           |    long $d = $xv >= $yv ? $xv - $yv : $yv - $xv;
           |    if ($d < $best) $best = $d;
           |    if ($xv <= $yv) $i++; else $j++;
           |  }
           |  ${ev.value} = $best;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): PosMinDist =
      copy(left = l, right = r)
  }

  /** pos_within(pa, pb, slop): COUNT of pairs (a, b) with |a − b| ≤ slop
    * over two SORTED-ascending int position arrays — the proximity
    * ranking's density tie-break, computed by the sliding-window
    * two-pointer (for each a ascending, the qualifying b's form a window
    * [a−slop, a+slop] whose bounds only move forward), O(|pa|+|pb|) time
    * and O(1) space where the materialized pair grid was O(|pa|·|pb|).
    * The COUNT itself may be quadratic in magnitude (that is the answer,
    * not a blowup — it rides a long). Null array → null; empty array →
    * 0 (no pairs — matches size(filter(empty))); negative slop → 0;
    * unsorted input throws. */
  case class PosWithin(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = {
      def arr(t: DataType) = t match {
        case ArrayType(IntegerType, _) => true
        case _ => false
      }
      if (arr(first.dataType) && arr(second.dataType) &&
          third.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<int>, int) arguments, got " +
          s"${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
          s"${third.dataType.simpleString}")
    }
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "pos_within"

    override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val slop = c.asInstanceOf[Int].toLong
      val nx = x.numElements()
      val ny = y.numElements()
      requireSorted(prettyName, "left", x)
      requireSorted(prettyName, "right", y)
      var lo = 0
      var hi = 0
      var cnt = 0L
      var i = 0
      while (i < nx) {
        val xv = x.getInt(i).toLong
        while (lo < ny && y.getInt(lo).toLong < xv - slop) lo += 1
        while (hi < ny && y.getInt(hi).toLong <= xv + slop) hi += 1
        if (hi > lo) cnt += (hi - lo).toLong
        i += 1
      }
      cnt
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b, c) => {
        val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val i = ctx.freshName("i")
        val lo = ctx.freshName("lo")
        val hi = ctx.freshName("hi")
        val cnt = ctx.freshName("cnt")
        val xv = ctx.freshName("xv")
        val slop = ctx.freshName("slop")
        s"""
           |int $nx = $a.numElements();
           |int $ny = $b.numElements();
           |long $slop = (long) $c;
           |${sortedCheckCode(ctx, "pos_within", "left", a, nx)}
           |${sortedCheckCode(ctx, "pos_within", "right", b, ny)}
           |int $lo = 0; int $hi = 0;
           |long $cnt = 0L;
           |for (int $i = 0; $i < $nx; $i++) {
           |  long $xv = (long) $a.getInt($i);
           |  while ($lo < $ny && (long) $b.getInt($lo) < $xv - $slop) $lo++;
           |  while ($hi < $ny && (long) $b.getInt($hi) <= $xv + $slop) $hi++;
           |  if ($hi > $lo) $cnt += (long) ($hi - $lo);
           |}
           |${ev.value} = $cnt;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression): PosWithin = copy(first = f, second = s, third = t)
  }
}
