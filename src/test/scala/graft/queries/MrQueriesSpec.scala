package graft.queries

import graft.SparkSpec

class MrQueriesSpec extends SparkSpec {

  test("q_wc totals equal whole-corpus token count") {
    import org.apache.spark.sql.functions._
    val wc = MrQueries.wordCount(spark, sf())
    val total = wc.agg(sum("cnt")).head().getLong(0)
    val direct = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(explode(split(col("text"), "[^\\p{L}]+")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(total === direct)
    assert(wc.columns.toSeq === Seq("word", "cnt"))
  }

  test("q_indexer: n_docs equals docs-list cardinality, docs sorted") {
    val idx = MrQueries.invertedIndex(spark, sf()).collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val docs = r.getAs[String]("docs").split(",")
      assert(docs.length.toLong === r.getAs[Long]("n_docs"))
      assert(docs.toSeq === docs.toSeq.sorted)
      assert(docs.distinct.length === docs.length)
    }
  }

  test("q_profile: 4 keys; 'c' profile sums to total corpus chars") {
    val prof = MrQueries.scalarProfile(spark, sf()).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("profile")).toMap
    assert(prof.keySet === Set("a", "b", "c", "d"))
    val nDocs = spark.read.parquet(s"${sf()}/documents.parquet").count()
    assert(prof("d") === Seq.fill(nDocs.toInt)("xyzzy").mkString(" "))
    val cSum = prof("c").split(" ").map(_.toLong).sum
    val direct = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("sum(length(text))").head().getLong(0)
    assert(cSum === direct)
  }

  test("q_filecount covers every non-empty document") {
    val fc = MrQueries.perFileCount(spark, sf())
    val nDocs = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter("length(text) > 0").count()
    assert(fc.count() === nDocs)
  }
}
