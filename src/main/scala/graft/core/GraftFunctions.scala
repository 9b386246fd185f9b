package graft.core

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for graft's native Catalyst expressions, so
  * `spark.sql("SELECT fnv_hash31(key), rolling_hash(text) ...")` works
  * alongside the Column APIs. Idempotent.
  *
  * Every builder validates arity up front and raises a standard
  * `WRONG_NUM_ARGS` AnalysisException — without the check, a call like
  * `hilbert_index(x)` would die with an IndexOutOfBoundsException deep
  * in resolution instead of a proper analysis error. */
object GraftFunctions {

  private def arity(name: String, expected: String, exprs: Seq[Expression],
      ok: Boolean): Unit =
    if (!ok) throw new AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> expected,
        "actualNum" -> exprs.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "fnv_hash31", exprs => {
        arity("fnv_hash31", "1", exprs, exprs.length == 1)
        FnvHash31(exprs.head)
      }, "built-in")
    registry.createOrReplaceTempFunction(
      "rolling_hash", exprs => {
        arity("rolling_hash", "1", exprs, exprs.length == 1)
        graft.text.RollingHash(exprs.head)
      }, "built-in")
    registry.createOrReplaceTempFunction(
      "hilbert_index", exprs => {
        arity("hilbert_index", "2", exprs, exprs.length == 2)
        graft.sources.HilbertIndex(exprs(0), exprs(1))
      }, "built-in")
    registry.createOrReplaceTempFunction(
      "hilbert_index_n", // arity-adaptive resolution: n·bits must fit a long
      exprs => {
        arity("hilbert_index_n", "1+", exprs, exprs.nonEmpty)
        graft.sources.HilbertNIndex(exprs, 63 / math.max(1, exprs.length))
      }, "built-in")
  }
}
