package graft.core

import org.apache.spark.sql.SparkSession

/** SQL-surface bootstrap: registers the driver's tables as temp views
  * and graft's native functions, so the whole engine is reachable from
  * `spark.sql(...)` — e.g.
  * `SELECT fnv_hash31(word) % 10, count(*) FROM documents ...`. */
object GraftCatalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").createOrReplaceTempView(t)
    }

  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    registerTables(spark, sfDir)
    GraftFunctions.register(spark)
  }
}
