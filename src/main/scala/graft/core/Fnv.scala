package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 32-bit hash masked to 31 bits — bit-exact parity with the
  * reference's shuffle-partitioning hash `ihash`
  * (`src/mr/worker.go:32-38`, Go `hash/fnv` New32a). Only needed when
  * per-bucket output parity with the reference matters; content parity
  * does not need it (SURVEY §2.1 E3).
  *
  * Implemented as a native Catalyst Expression with codegen so it stays
  * inside whole-stage codegen when used as a partitioning / bucketing
  * expression at scale.
  */
case class FnvHash31(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fnv_hash31 requires string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    FnvHash31.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.FnvHash31.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): FnvHash31 =
    copy(child = newChild)

  override def prettyName: String = "fnv_hash31"
}

/** RDD-level partitioner with bit-exact reference bucket assignment:
  * partition = ihash(key) % numPartitions (`src/mr/worker.go:140`) —
  * for when per-FILE output parity with the reference matters, not
  * just content parity (SURVEY §2.1 E3). */
class FnvPartitioner(override val numPartitions: Int)
    extends org.apache.spark.Partitioner {
  override def getPartition(key: Any): Int =
    FnvHash31.hash(key.toString.getBytes("UTF-8")) % numPartitions
  override def equals(other: Any): Boolean = other match {
    case p: FnvPartitioner => p.numPartitions == numPartitions
    case _ => false
  }
  override def hashCode: Int = numPartitions
}

object FnvHash31 {
  /** FNV-1a over UTF-8 bytes, & 0x7fffffff, as Go's
    * `fnv.New32a().Write(key); h.Sum32() & 0x7fffffff`. */
  def hash(bytes: Array[Byte]): Int = {
    var h = 0x811c9dc5 // FNV offset basis
    var i = 0
    while (i < bytes.length) {
      h = h ^ (bytes(i) & 0xff)
      h = h * 0x01000193 // FNV prime
      i += 1
    }
    h & 0x7fffffff
  }
}
