package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime-adaptivity levers for the 100 TB posture, demonstrated at
  * toy scale by lowering the trigger thresholds: AQE skew-join
  * splitting and runtime bloom-filter join pruning. */
class AdaptiveSpec extends SparkSpec {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition (Zipfian hot key)") {
    import spark.implicits._
    // hot key: 200k rows of one key vs 50 rows each for the rest
    // NOTE no explicit repartition: a user REPARTITION_BY_NUM exchange
    // is contractual and AQE will not rewrite it — skew splitting only
    // applies to ENSURE_REQUIREMENTS exchanges
    val skewed = spark.range(200000).select(lit("hot").as("k"), col("id"))
      .unionAll(spark.range(1000)
        .select(concat(lit("k"), col("id") % 20).as("k"), col("id")))
    val dim = (Seq("hot") ++ (0 until 20).map(i => s"k$i")).toDF("k")
      .withColumn("payload", lit(1L))
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = skewed.join(dim, "k")
      // collect (not write) so the action runs THIS Dataset's
      // QueryExecution and the adaptive plan is finalized on it
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"), s"no skew split in final plan:\n${plan.take(3000)}")
    }
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = spark.read.parquet(s"${sf("sf0.01")}/orders.parquet")
        .filter(col("o_totalprice") > 500000) // selective build side
        .select(col("o_orderkey"))
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${optimized.take(3000)}")
    }
  }
}
