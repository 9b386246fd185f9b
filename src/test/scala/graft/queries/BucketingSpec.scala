package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB co-location lever: bucketed tables let repeated fact⋈fact
  * joins on the bucket key skip the exchange entirely (both sides are
  * pre-hash-partitioned on disk). Demonstrated at sf0.001 with
  * lineitem⋈orders on the order key. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without an Exchange") {
    // warehouse dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped with the database below
    val db = "graft_bucketing_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // at sf0.001 broadcast would win and bypass the bucketed path; the
    // scenario modeled is a fact⋈fact join where neither side broadcasts
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.read.parquet(s"${sf()}/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"$db.li_b")
      spark.read.parquet(s"${sf()}/orders.parquet")
        .select("o_orderkey", "o_orderdate")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.ord_b")
      val joined = spark.table(s"$db.li_b")
        .join(spark.table(s"$db.ord_b"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the same rows as the unbucketed join
      val unbucketed = spark.read.parquet(s"${sf()}/lineitem.parquet")
        .join(spark.read.parquet(s"${sf()}/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() === unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
