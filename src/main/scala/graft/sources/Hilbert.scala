package graft.sources

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
