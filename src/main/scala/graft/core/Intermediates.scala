package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Debug-parity materialization of intermediate KV runs as JSON-lines —
  * the reference's `mr-M-R` files (`src/mr/worker.go:148-165`,
  * streaming `json.Decoder` read-back `:182-190`). Spark's shuffle
  * replaces these in normal operation (SURVEY §1.3); this exists so a
  * pipeline stage can be snapshotted and re-ingested for debugging,
  * with the same record shape the reference used. */
object Intermediates {

  private val schema = StructType(Seq(
    StructField("Key", StringType, nullable = false),
    StructField("Value", StringType, nullable = false)))

  /** One JSON object per KV pair, Go-style field names {"Key","Value"},
    * `numPartitions` output files hash-partitioned by key (the
    * reference's reduce-bucket layout). */
  def write(kv: Dataset[KeyValue], dir: String, numPartitions: Int = 10): Unit =
    kv.toDF("Key", "Value")
      .repartition(numPartitions, org.apache.spark.sql.functions.col("Key"))
      .write.mode("overwrite").json(dir)

  def read(spark: SparkSession, dir: String): Dataset[KeyValue] = {
    import spark.implicits._
    spark.read.schema(schema).json(dir)
      .select(org.apache.spark.sql.functions.col("Key").as("key"),
        org.apache.spark.sql.functions.col("Value").as("value"))
      .as[KeyValue]
  }
}
