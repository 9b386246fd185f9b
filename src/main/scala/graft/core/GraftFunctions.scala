package graft.core

import org.apache.spark.sql.SparkSession

/** SQL registration for graft's native Catalyst expressions, so
  * `spark.sql("SELECT fnv_hash31(key), rolling_hash(text) ...")` works
  * alongside the Column APIs. Idempotent. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "fnv_hash31", exprs => FnvHash31(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "rolling_hash", exprs => graft.text.RollingHash(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "hilbert_index",
      exprs => graft.sources.HilbertIndex(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "hilbert_index_n", // arity-adaptive resolution: n·bits must fit a long
      exprs => graft.sources.HilbertNIndex(exprs, 63 / math.max(1, exprs.length)),
      "built-in")
  }
}
