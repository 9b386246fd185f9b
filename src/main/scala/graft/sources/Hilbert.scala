package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index: the locality-preserving alternative to the
  * Morton/Z interleave for multi-dimensional layout. The Hilbert curve
  * never takes the Z curve's long diagonal jumps, so consecutive index
  * ranges map to tighter boxes — file min/max envelopes get smaller
  * and a stats pruner reads fewer files for the same box predicate
  * (measured in LayoutCurveSpec; the classic xy2d walk, e.g.
  * Hamilton's compact Hilbert indices or the Wikipedia formulation).
  *
  * `index` is a static, JIT-friendly loop so the Catalyst expression's
  * generated code is a single call — same pattern as
  * [[graft.core.FnvHash31]]. */
object HilbertCurve {

  /** Map (x, y) in [0, 2^order)² to its distance along the order-`order`
    * Hilbert curve. Iterative top-down quadrant walk with rotation. */
  def index(xIn: Long, yIn: Long, order: Int): Long = {
    var x = xIn
    var y = yIn
    var d = 0L
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) { // rotate the quadrant so the walk stays contiguous
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** N-DIMENSIONAL Hilbert index via Skilling's transpose algorithm
  * ("Programming the Hilbert curve", AIP Conf. Proc. 707, 2004 — the
  * standard public formulation): undo-excess-work pass, Gray decode,
  * then interleave the transposed bits MSB-across-axes. Generalizes
  * [[HilbertCurve.index]] (whose 2-D curve is a reflection of this
  * one — same locality, different labeling). `n·bits ≤ 63`. */
object HilbertN {

  def index(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val X = java.util.Arrays.copyOf(coords, n)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < n) {
        if ((X(i) & q) != 0) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    var i = 1
    while (i < n) { X(i) ^= X(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) {
      if ((X(n - 1) & q) != 0) t ^= q - 1
      q >>= 1
    }
    i = 0
    while (i < n) { X(i) ^= t; i += 1 }
    // transposed → scalar: bit b of axis j lands at b·n + (n-1-j)
    var d = 0L
    var b = 0
    while (b < bits) {
      var j = 0
      while (j < n) {
        d |= ((X(j) >>> b) & 1L) << (b * n + (n - 1 - j))
        j += 1
      }
      b += 1
    }
    d
  }
}

/** `hilbert_index(x, y)`: codegen'd Catalyst expression over two long
  * columns (callers cast; Layout.hilbertValue does). Stays inside
  * whole-stage codegen, so curve clustering costs one static call per
  * row at write time. */
case class HilbertIndex(left: Expression, right: Expression, order: Int = 21)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires (bigint, bigint), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertCurve.index(l.asInstanceOf[Long], r.asInstanceOf[Long], order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.sources.HilbertCurve.index($a, $b, $order)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_index"
}

/** `hilbert_index_n(x1, …, xn)`: the N-ary curve key as a codegen'd
  * Catalyst expression — one static [[HilbertN.index]] call per row,
  * coords gathered into a stack array in generated code. */
case class HilbertNIndex(children: Seq[Expression], bits: Int)
    extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.nonEmpty && children.forall(_.dataType == LongType) &&
        children.length * bits <= 63)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index_n requires 1..${63 / bits} bigint columns at $bits bits, " +
          s"got ${children.map(_.dataType).mkString(", ")}")

  override def eval(input: InternalRow): Any = {
    val arr = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      arr(i) = v.asInstanceOf[Long]
      i += 1
    }
    HilbertN.index(arr, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = children.length
    val evals = children.map(_.genCode(ctx))
    val arr = ctx.freshName("coords")
    val anyNull =
      if (nullable) evals.map(e => s"${e.isNull}").mkString(" || ") else "false"
    val fill = evals.zipWithIndex
      .map { case (e, i) => s"$arr[$i] = ${e.value};" }.mkString("\n")
    ev.copy(code = code"""
      ${evals.map(_.code).fold(EmptyBlock)(_ + _)}
      boolean ${ev.isNull} = $anyNull;
      long ${ev.value} = 0L;
      if (!${ev.isNull}) {
        long[] $arr = new long[$n];
        $fill
        ${ev.value} = graft.sources.HilbertN.index($arr, $bits);
      }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertNIndex =
    copy(children = newChildren)

  override def prettyName: String = "hilbert_index_n"
}
