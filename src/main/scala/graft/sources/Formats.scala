package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink format breadth: the engine's canonical tables can be
  * ingested from parquet (primary), CSV, or JSON-lines with identical
  * downstream semantics, and written back out partitioned for
  * partition-pruned reads.
  *
  * Scale notes: parquet is the only sane 100 TB format (columnar,
  * predicate/projection pushdown, splittable); CSV/JSON exist for
  * ingestion edges. `writeDatePartitioned` is the layout lever that
  * turns time-range scans into directory pruning (PartitionFilters),
  * independent of file-format pushdown. */
object Formats {

  /** Read a table from `dir/name.{parquet,csv,json}` by `format`,
    * enforcing the given schema (never infer in production paths —
    * inference scans the data once and can drift). */
  def readAs(spark: SparkSession, format: String, path: String,
      schema: StructType): DataFrame = format match {
    case "parquet" => spark.read.schema(schema).parquet(path)
    case "csv" => spark.read.schema(schema)
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
    case "json" => spark.read.schema(schema).json(path)
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  /** Fault-tolerant JSON ingestion: malformed records are captured in
    * `_corrupt_record` instead of failing the job (PERMISSIVE mode) —
    * at 100 TB some records WILL be broken and a pipeline must
    * quarantine rather than crash. Returns (good, quarantined). */
  def readJsonQuarantined(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // Spark requires caching before filtering on _corrupt_record
    val good = raw.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    (good, bad)
  }

  /** Write `df` partitioned by a derived date column — the layout that
    * makes day-ranged queries prune at the directory level. */
  def writeDatePartitioned(df: DataFrame, tsMicros: org.apache.spark.sql.Column,
      outDir: String): Unit =
    df.withColumn("p_day", date_format(timestamp_micros(tsMicros), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("p_day").parquet(outDir)
}
