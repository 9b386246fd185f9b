package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data subsampling operators. Random sampling is inherently
  * engine-specific, so there is no SQL oracle — but every sample here
  * is DETERMINISTIC for a fixed seed (reruns of a pipeline must
  * reproduce their corpus), which the specs pin.
  *
  * For hash-based sampling the unit is the DOCUMENT (hash of a stable
  * id), never the row position: position-based samples change under
  * repartitioning; id-hash samples are stable across any layout —
  * the property that matters at 100 TB where partitioning is fluid. */
object Sampling {

  /** Deterministic ~fraction sample by stable id hash — layout-
    * independent and joinable (the same doc is in/out everywhere). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Long = 42L): DataFrame =
    df.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)) <
      lit((fraction * 1000000L).toLong))

  /** Stratified sample: per-stratum fractions (e.g. downweight a
    * dominant language), same id-hash determinism. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)).cast("double") <
      frac * 1000000.0)
  }

  /** documents sample query (rows-only gate): 20% global + language
    * stratification keeping half the English share. */
  def sampleDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.1, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.2, "zh" -> 0.2))
      .select(col("doc_id"), col("lang"))
  }
}
