package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FormatsSpec extends SparkSpec {

  test("documents round-trip identically through parquet, csv, json") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val schema = docs.schema
    val base = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    docs.write.mode("overwrite").parquet(s"$base/p")
    docs.write.mode("overwrite")
      .option("header", "true").option("quote", "\"").option("escape", "\"")
      .csv(s"$base/c")
    docs.write.mode("overwrite").json(s"$base/j")
    def wcOver(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(explode(split(col("text"), "[^\\p{L}]+")).as("w"))
        .filter(length(col("w")) > 0)
        .groupBy("w").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fromParquet = wcOver(Formats.readAs(spark, "parquet", s"$base/p", schema))
    val fromCsv = wcOver(Formats.readAs(spark, "csv", s"$base/c", schema))
    val fromJson = wcOver(Formats.readAs(spark, "json", s"$base/j", schema))
    assert(fromCsv === fromParquet)
    assert(fromJson === fromParquet)
  }

  test("malformed JSON records are quarantined, not fatal") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-bad")
    java.nio.file.Files.writeString(dir.resolve("a.json"),
      """{"doc_id": 1, "text": "good record"}
        |{"doc_id": oops not json
        |{"doc_id": 3, "text": "another good one"}
        |garbage line
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val (good, bad) = Formats.readJsonQuarantined(spark, dir.toString, schema)
    assert(good.count() === 2)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    assert(bad.count() === 2)
    assert(bad.collect().map(_.getString(0)).exists(_.contains("garbage")))
  }

  test("date-partitioned layout prunes partitions for day filters") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val raw = spark.read.parquet(s"${sf()}/events.parquet")
    val events = raw
      .select(col("event_id"), EventTime.tsUs(raw).as("us"), col("event_type"))
    Formats.writeDatePartitioned(events, col("us"), out)
    val pruned = spark.read.parquet(out).filter(col("p_day") === "2024-01-02")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(p_day"), plan)
    // only one day's directory is read
    val scanned = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan).get
    assert(scanned.contains("p_day"), scanned)
    assert(pruned.count() > 0)
    val total = spark.read.parquet(out).count()
    assert(pruned.count() < total)
  }
}
