package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator for the reference's holistic reducer: values
  * copied, sorted, space-joined — the deterministic order-insensitive
  * group-concat of `src/mrapps/crash.go:45-55` / `nocrash.go:39-46`.
  *
  * This is the explicit custom-aggregation path (SURVEY §4.2: "the one
  * genuinely custom operator family" alongside the KV fold); the
  * declarative equivalent is `concat_ws(" ", sort_array(collect_list))`
  * and both must agree — `q_profile_udaf` shares `q_profile`'s oracle.
  *
  * Scale: the buffer is the group's value set (holistic aggregate —
  * irreducible); partial buffers merge associatively so map-side
  * combine still bounds shuffle rows at one buffer per partition. */
object SortedConcat extends Aggregator[String, List[String], String] {
  override def zero: List[String] = Nil
  override def reduce(b: List[String], a: String): List[String] = a :: b
  override def merge(b1: List[String], b2: List[String]): List[String] = b1 ::: b2
  override def finish(r: List[String]): String = r.sorted.mkString(" ")
  override def bufferEncoder: Encoder[List[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
