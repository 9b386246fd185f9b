package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkSpec {

  test("clean scrubs URLs and emails, collapses whitespace") {
    import spark.implicits._
    val rows = Seq(
      (1L, "see https://example.com/a?b=c#d and http://t.co now"),
      (2L, "mail bob.smith+x@sub.example.org  or\tALICE@EX.AM.PLE.io today"),
      (3L, "  spaced    out \n lines  "),
      (4L, "no noise here")
    ).toDF("doc_id", "text")
    val got = Cleaning.cleanText(rows).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "see <url> and <url> now")
    assert(got(2L) === "mail <email> or <email> today")
    assert(got(3L) === "spaced out lines")
    assert(got(4L) === "no noise here")
  }

  test("clean byte accounting and corpus no-op invariance") {
    val out = Cleaning.clean(spark, sf()).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("bytes_out") ===
        r.getAs[String]("clean_text").getBytes("UTF-8").length.toLong)
      assert(r.getAs[Long]("bytes_out") <= r.getAs[Long]("bytes_in"))
    }
  }

  test("contamination: benchmark docs excluded, hits bounded, planted dups detected") {
    val out = Cleaning.contamination(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 37 !== 0L)
      val (n, hit) = (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hit"))
      assert(hit >= 0L && hit <= n)
      assert(r.getAs[Int]("contaminated") === (if (hit * 100 >= n * 10) 1 else 0))
    }
    assert(Cleaning.contamination(spark, sf()).columns.toSeq ===
      Seq("doc_id", "n_shingles", "n_hit", "contaminated"))
  }

  test("contamination of a planted benchmark copy flags 100% overlap") {
    import spark.implicits._
    // direct unit check of the plan shape on synthetic data: doc 0 is
    // benchmark (0 % 37 == 0); doc 5 repeats its text verbatim; doc 7
    // shares nothing
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val rows = Seq(
      (0L, base),
      (5L, base),
      (7L, "one two three four five six seven eight nine ten"),
      (9L, "too short for any shingle")
    ).toDF("doc_id", "text")
    rows.write.mode("overwrite").parquet("/tmp/graft_cleaning_docs/documents.parquet")
    val out = Cleaning.contamination(spark, "/tmp/graft_cleaning_docs")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(5L)._3 === 1 && out(5L)._1 === out(5L)._2) // full overlap
    assert(out(7L)._2 === 0L && out(7L)._3 === 0)          // no overlap
    // short docs stay represented as evaluated-and-clean, not dropped
    assert(out(9L) === ((0L, 0L, 0)))
  }

  test("piiProfile counts and redacts emails, ipv4s, phones in order") {
    import spark.implicits._
    val rows = Seq(
      (1L, "write to jane.doe+spam@mail.example.co.uk today"),
      (2L, "server at 192.168.0.1 and 10.0.255.7, call 555-123-4567"),
      (3L, "version 1.2 of 3.4.5 is not an ip; 12-34-5678 no phone"),
      (4L, "clean text only")
    ).toDF("doc_id", "text")
    val got = Cleaning.piiProfile(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((1L, 0L, 0L)))
    assert(got(2L) === ((0L, 2L, 1L)))
    assert(got(3L) === ((0L, 0L, 0L)))
    assert(got(4L) === ((0L, 0L, 0L)))
    // redaction text-level check (md5 in the profile keeps the gate
    // small; here assert on the actual replaced string)
    val red = rows.select(col("doc_id"), Cleaning.redactPii(col("text")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) === "write to <email> today")
    assert(red(2L) === "server at <ip> and <ip>, call <phone>")
    assert(red(3L) === rows.collect().find(_.getLong(0) == 3L).get.getString(1))
  }

  test("pii gate query plants one of each PII kind per document") {
    val out = Cleaning.pii(spark, sf()).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_emails") >= 1L)
      assert(r.getAs[Long]("n_ips") >= 1L)
      assert(r.getAs[Long]("n_phones") >= 1L)
      assert(r.getAs[String]("red_md5").length === 32)
    }
  }

  test("Bloom decontamination equals the exact broadcast-set operator") {
    // Equality is BY CONSTRUCTION (Bloom prefilter never drops a real
    // member; the verify join kills false positives), so this is a
    // regression tripwire for the prune/verify plumbing, not a
    // probabilistic claim — text_decontam_bloom shares the exact SQL
    // oracle on the strength of it.
    for (d <- Seq("sf0.001", "sf0.01")) {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      val exact = rows(Cleaning.contamination(spark, sf(d)))
      val bloom = rows(Cleaning.contaminationBloom(spark, sf(d)))
      assert(bloom === exact, s"bloom decontamination diverged at $d")
    }
  }

  test("Bloom prefilter actually prunes the verify join's input") {
    // The operator's reason to exist: suspects (true hits + false
    // positives) must be a small fraction of all corpus shingles —
    // otherwise the shuffle saving is imaginary. On the gate corpus
    // only near-duplicates of benchmark docs share 8-gram shingles.
    import org.apache.spark.sql.functions._
    val out = Cleaning.contamination(spark, sf()).agg(
      sum(col("n_shingles")).as("total"), sum(col("n_hit")).as("hits")).head()
    val total = out.getLong(0); val hits = out.getLong(1)
    // suspects ≈ hits + E[FP] (≈0 at fpp 1e-9); assert the honest bound
    assert(hits * 5 < total,
      s"suspect fraction too high for pruning to pay: $hits of $total")
  }
}
