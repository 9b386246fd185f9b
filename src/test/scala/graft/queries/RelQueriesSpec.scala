package graft.queries

import graft.SparkSpec

class RelQueriesSpec extends SparkSpec {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pricing summary: filter pushed to parquet scan, partial aggregation") {
    val df = RelQueries.pricingSummary(spark, sf())
    val plan = physicalPlan(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$plan")
    assert(plan.contains("HashAggregate"), "expected hash aggregation")
    assert(df.queryExecution.optimizedPlan.toString.contains("partial_sum") ||
      plan.contains("partial_sum") || plan.toLowerCase.contains("partial"),
      "expected map-side partial aggregation")
  }

  test("shipping priority: customer side broadcast, no shuffle of the dim") {
    val plan = physicalPlan(RelQueries.shippingPriority(spark, sf()))
    assert(plan.contains("BroadcastHashJoin"), s"customer join not broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), "top-10 should avoid global sort")
  }

  test("local supplier volume: every dimension join is broadcast") {
    val plan = physicalPlan(RelQueries.localSupplierVolume(spark, sf()))
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(nBroadcast >= 4, s"expected >=4 broadcast joins, got $nBroadcast:\n$plan")
    // the single allowed shuffle join: lineitem ⋈ orders on orderkey
    val nShuffleJoin = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).length
    assert(nShuffleJoin <= 1, s"more than one shuffled join:\n$plan")
  }

  test("top orders uses TakeOrderedAndProject (no global sort)") {
    val plan = physicalPlan(RelQueries.topOrders(spark, sf()))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange rangepartitioning"), s"global sort shuffle present:\n$plan")
  }

  test("column pruning: pricing scan reads only needed columns") {
    val plan = physicalPlan(RelQueries.pricingSummary(spark, sf()))
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      s"scan reads unused columns: $readSchema")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
  }

  test("events daily: ns→µs conversion is integer-exact at e18 scale") {
    import spark.implicits._
    // 2024-01-30T23:59:59.999999999 in ns; float division would land on
    // the wrong microsecond (2^53 < 1.7e18)
    val ns = 1706659199999999999L
    val got = Seq(ns).toDF("ts")
      .selectExpr("timestamp_micros(ts div 1000) AS t")
      .selectExpr("date_format(t, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS s")
      .head().getString(0)
    assert(got === "2024-01-30 23:59:59.999999")
  }

  test("approx distinct users within 5% of exact") {
    val exact = RelQueries.distinctUsers(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    RelQueries.approxDistinctUsers(spark, sf()).collect().foreach { r =>
      val e = exact(r.getString(0)).toDouble
      val a = r.getLong(1).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("rollup: grand total row equals sum of leaf rows") {
    val rows = RelQueries.pricingRollup(spark, sf()).collect()
    val grand = rows.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    val leaves = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    assert(leaves.map(_.getAs[Long]("sum_qty")).sum === grand.getAs[Long]("sum_qty"))
    assert(leaves.map(_.getAs[Long]("n")).sum === grand.getAs[Long]("n"))
  }

  test("cube: all four grouping sets present; grand total matches orders count") {
    val rows = RelQueries.orderPriorityCube(spark, sf()).collect()
    val nOrders = spark.read.parquet(s"${sf()}/orders.parquet").count()
    val grand = rows.find(r => r.getString(0) == "ALL" && r.getLong(1) == -1L).get
    assert(grand.getAs[Long]("n") === nOrders)
    // priority-only subtotals sum to the grand total, as do year-only
    val byPriority = rows.filter(r => r.getString(0) != "ALL" && r.getLong(1) == -1L)
    val byYear = rows.filter(r => r.getString(0) == "ALL" && r.getLong(1) != -1L)
    assert(byPriority.map(_.getAs[Long]("n")).sum === nOrders)
    assert(byYear.map(_.getAs[Long]("n")).sum === nOrders)
    assert(byPriority.map(_.getAs[Long]("total_cents")).sum ===
      grand.getAs[Long]("total_cents"))
  }

  test("changelog snapshot keeps exactly the keys whose last op is not a delete") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
    val lastOps = ev.withColumn("rn",
        row_number().over(Window.partitionBy("user_id").orderBy(col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), (col("event_type") === "error").as("deleted"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val snap = RelQueries.changelogSnapshot(spark, sf()).collect()
      .map(_.getLong(0)).toSet
    assert(snap === lastOps.filterNot(_._2).keySet)
  }

  test("changelog snapshot plan uses partial aggregation, not a window sort") {
    val plan = RelQueries.changelogSnapshot(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("partial_max_by") || plan.contains("partial_maxby") ||
      plan.toLowerCase.contains("partial"), plan.take(2000))
  }

  test("approx median/quantiles: rank error within sketch bound, no window sort") {
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"${sf()}/events.parquet")
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val groups = ev.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rank of each approx value inside its group vs the target rank:
    // percentile_approx(accuracy=10000) guarantees error <= n/10000;
    // assert a 10x-slack band (n/1000) to stay robust to ties
    def rankOf(tpe: String, v: Long): Long =
      ev.filter(col("event_type") === tpe && col("cents") <= v).count()
    RelQueries.medianValueApprox(spark, sf()).collect().foreach { r =>
      val (tpe, v) = (r.getString(0), r.getLong(1))
      val n = groups(tpe)
      assert(math.abs(rankOf(tpe, v) - n / 2.0) <= math.max(1.0, n / 1000.0),
        s"$tpe: approx median $v at rank ${rankOf(tpe, v)} of $n")
    }
    RelQueries.valueQuantilesApprox(spark, sf()).collect().foreach { r =>
      val (tpe, q, v) = (r.getString(0), r.getLong(1), r.getLong(2))
      val n = groups(tpe)
      assert(math.abs(rankOf(tpe, v) - n * q / 100.0) <= math.max(1.0, n / 1000.0),
        s"$tpe p$q: approx $v at rank ${rankOf(tpe, v)} of $n")
    }
    // the scale property: a sketch aggregation, not a per-group sort
    for (df <- Seq(RelQueries.medianValueApprox(spark, sf()),
        RelQueries.valueQuantilesApprox(spark, sf()))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), plan.take(2000))
      assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate") ||
        plan.contains("HashAggregate"), plan.take(2000))
      assert(plan.toLowerCase.contains("partial"), plan.take(2000))
    }
  }

  test("banded approx gates: exact columns equal the exact twins, verdicts all true") {
    // the driver-checkable form of the error-band contract: the gate
    // emits (exact, within_band); the DuckDB oracle pins the exact twin
    // and asserts TRUE — here we pin the same two claims engine-side,
    // plus the verdict's falsifiability hinge: within_band is computed
    // from the REAL sketch output, not hard-coded (the plan must
    // contain the sketch aggregate)
    val bm = RelQueries.medianApproxBanded(spark, sf()).collect()
    val em = RelQueries.medianValue(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bm.map(r => r.getString(0) -> r.getLong(1)).toMap === em)
    assert(bm.forall(_.getBoolean(2)), bm.mkString(", "))
    val bq = RelQueries.quantilesApproxBanded(spark, sf()).collect()
    val eq = RelQueries.valueQuantiles(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(bq.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap === eq)
    assert(bq.forall(_.getBoolean(3)), bq.mkString(", "))
    val bu = RelQueries.approxDistinctUsersBanded(spark, sf()).collect()
    val eu = RelQueries.distinctUsers(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bu.map(r => r.getString(0) -> r.getLong(1)).toMap === eu)
    assert(bu.forall(_.getBoolean(2)), bu.mkString(", "))
    for (df <- Seq(RelQueries.medianApproxBanded(spark, sf()),
        RelQueries.quantilesApproxBanded(spark, sf()))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("percentile_approx"),
        s"verdict not derived from the sketch:\n${plan.take(2000)}")
    }
    val planU = RelQueries.approxDistinctUsersBanded(spark, sf())
      .queryExecution.executedPlan.toString
    assert(planU.contains("approx_count_distinct") || planU.contains("hyperloglog"),
      s"verdict not derived from the HLL sketch:\n${planU.take(2000)}")
  }

  test("bandVerdict accepts a wide tie run containing the target (ADVICE r8)") {
    // tie-heavy distributions are exactly the bounded-domain data the
    // histogram path targets: a modal value covering far more than the
    // band that CONTAINS the true median must still pass, because the
    // approx value IS the exact median. The verdict checks the value's
    // full rank interval [rank_of − cnt_of + 1, rank_of], not just the
    // upper rank.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // (n, rank_of, cnt_of, expected) with target = n/2, band = max(1, n/1000)
    val cases = Seq(
      // modal value: 1000 tied rows straddling the median of n=10000
      (10000L, 5500L, 1000L, true),
      // upper rank 11 past target (outside the ±10 band) but the run
      // covers the median — the old upper-rank-only check rejected
      // this correct answer
      (10000L, 5011L, 1000L, true),
      // run entirely below the band → reject
      (10000L, 4980L, 10L, false),
      // run entirely above the band → reject
      (10000L, 5600L, 10L, false),
      // singleton exactly at target → accept
      (10000L, 5000L, 1L, true),
      // singleton just outside the band → reject
      (10000L, 5012L, 1L, false))
    val df = cases.toDF("n", "rank_of", "cnt_of", "expected")
    val got = df.select(col("expected"),
      RelQueries.bandVerdict(col("n") / lit(2.0)).as("got")).collect()
    got.foreach(r => assert(r.getBoolean(1) === r.getBoolean(0), r.toString))
  }

  test("histogram median/quantiles equal the exact operators; window runs post-aggregation") {
    val exactM = RelQueries.medianValue(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val histM = RelQueries.medianValueHist(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(histM === exactM)
    val exactQ = RelQueries.valueQuantiles(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val histQ = RelQueries.valueQuantilesHist(spark, sf()).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(histQ === exactQ)
    // the scale property: the window's input is the per-group VALUE
    // histogram (hash aggregation below the window), so partition size
    // is bounded by the value domain, not the fact-table row count
    val plan = RelQueries.medianValueHist(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && plan.contains("Window"), plan.take(2000))
    val histRows = spark.read.parquet(s"${sf()}/events.parquet")
      .selectExpr("event_type", "cast(round(value * 100) as long) as cents")
      .distinct().count()
    val factRows = spark.read.parquet(s"${sf()}/events.parquet").count()
    assert(histRows < factRows, "fixture domain must be smaller than the fact table")
  }

  test("checked sum: exact at the long boundary, raises past it") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the hot aggregates rely on the ANSI-on default to make plain
    // sum(long) fail loudly on overflow — pin that assumption here
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true")
    // exactly Long.MaxValue: must succeed and equal the true total
    val atMax = Seq(Long.MaxValue - 10, 7L, 3L).toDF("v")
      .agg(RelQueries.sumLongChecked(col("v")).as("s")).head().getLong(0)
    assert(atMax === Long.MaxValue)
    // one past the boundary: the checked sum raises with a clear message
    // in BOTH ANSI modes (Spark 4's ANSI-on default makes plain sum(long)
    // throw on intermediate overflow too, but the decimal accumulation
    // only fails when the FINAL total is out of range, and keeps failing
    // loudly in sessions that run with ansi off)
    val e = intercept[Exception] {
      Seq(Long.MaxValue, 1L).toDF("v")
        .agg(RelQueries.sumLongChecked(col("v")).as("s")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("overflow")), msgs(e).mkString(" | "))
    // negative boundary, and seeded randoms agree with plain sum in range
    val atMin = Seq(Long.MinValue + 5, -5L).toDF("v")
      .agg(RelQueries.sumLongChecked(col("v")).as("s")).head().getLong(0)
    assert(atMin === Long.MinValue)
    val rnd = new scala.util.Random(42)
    val vs = Seq.fill(1000)(rnd.nextLong() >> 20)
    val both = vs.toDF("v")
      .agg(sum(col("v")).as("a"), RelQueries.sumLongChecked(col("v")).as("b"))
      .head()
    assert(both.getLong(0) === both.getLong(1))
  }

  test("asof query folds the customer count into one plan (no side action)") {
    val df = RelQueries.eventOrderAsof(spark, sf())
    val plan = df.queryExecution.executedPlan.toString
    // the count appears as a broadcast single-row join, not a collected literal
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
      plan.take(2000))
    assert(df.count() > 0)
  }

  test("SCD2 history: windows chain, one current version per live key") {
    import org.apache.spark.sql.functions._
    val hist = RelQueries.scd2History(spark, sf()).cache()
    try {
      // exactly one open window per key, and it is the max version
      val open = hist.filter(col("valid_to") === -1L)
      assert(open.groupBy(col("user_id")).count()
        .filter(col("count") =!= 1L).count() === 0L)
      // windows chain: every non-open valid_to is another version of the
      // same key, and intervals never overlap (valid_to > version)
      assert(hist.filter(col("valid_to") =!= -1L &&
        col("valid_to") <= col("version")).count() === 0L)
      val chained = hist.filter(col("valid_to") =!= -1L).alias("a")
        .join(hist.alias("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.valid_to") === col("b.version"), "left_anti")
      assert(chained.count() === 0L, "dangling valid_to pointer")
      // is_current ⇔ open window and not a delete
      assert(hist.filter(
        (col("is_current") === 1) =!=
          (col("valid_to") === -1L && col("is_delete") === 0)).count() === 0L)
      // the current rows are exactly the SCD1 snapshot (rel_upsert twin)
      val snap = RelQueries.changelogSnapshot(spark, sf())
        .select(col("user_id"), col("version"), col("value_cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val cur = hist.filter(col("is_current") === 1)
        .select(col("user_id"), col("version"), col("value_cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(cur === snap)
    } finally { hist.unpersist(); () }
  }

  test("JSON props extraction: coverage totals and a driver cross-check") {
    import org.apache.spark.sql.functions._
    val out = RelQueries.jsonPropsStats(spark, sf()).collect()
    assert(out.nonEmpty)
    val totalEvents = out.map(_.getAs[Long]("n_events")).sum
    // driver cross-check of one aggregate via a plain string parse
    val expected = spark.read.parquet(s"${sf()}/events.parquet")
      .select(col("event_type"), col("props")).collect()
      .map(r => (r.getString(0),
        """"k":\s*(-?\d+)""".r.findFirstMatchIn(r.getString(1)).map(_.group(1).toLong)))
    assert(totalEvents === expected.length)
    val sumByType = expected.groupBy(_._1).view
      .mapValues(g => (g.length.toLong, g.flatMap(_._2).sum)).toMap
    out.foreach { r =>
      val (n, s) = sumByType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") === n)
      assert(r.getAs[Long]("sum_k") === s)
      assert(r.getAs[Long]("n_with_k") === n, "every event carries props.k")
      assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k"))
    }
  }

  test("rel query results are non-empty and well-typed at sf0.001") {
    val qs = Seq(
      RelQueries.pricingSummary(spark, sf()),
      RelQueries.shippingPriority(spark, sf()),
      RelQueries.localSupplierVolume(spark, sf()),
      RelQueries.topOrders(spark, sf()),
      RelQueries.firstOrdersPerCustomer(spark, sf()),
      RelQueries.eventsDaily(spark, sf()),
      RelQueries.distinctUsers(spark, sf()))
    qs.foreach(df => assert(df.count() > 0, df.columns.mkString(",")))
  }
}
