package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin polynomial rolling hash of a string's UTF-8 bytes:
  * h = Σ (b_i+1) · 257^i  (mod 1e9+7), as a native Catalyst
  * [[Expression]] with whole-stage codegen — the document
  * fingerprinting primitive that stays inside Tungsten (a Scala UDF
  * here would break the codegen span on the hot scan path).
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.RollingHash.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Mod = 1000000007L
  final val Base = 257L

  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < bytes.length) {
      h = (h + ((bytes(i) & 0xff) + 1L) * pow) % Mod
      pow = (pow * Base) % Mod
      i += 1
    }
    h
  }

  /** Column-level API. */
  def rolling_hash(c: Column): Column = bridge.column(RollingHash(bridge.expression(c)))
}
