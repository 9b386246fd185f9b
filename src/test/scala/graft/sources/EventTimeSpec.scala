package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-timestamp portability pin (round-7 regression class).
  *
  * The same logical instants are written under all three encodings a
  * lakehouse writer can produce — raw int64 nanos, TIMESTAMP (instant,
  * isAdjustedToUTC=true), TIMESTAMP_NTZ (wall clock) — and every
  * event-time consumer must read them identically. A future fixture
  * drift should fail HERE, in one targeted spec, not across four
  * suites. */
class EventTimeSpec extends SparkSpec {

  /** Tiny shared fixture derived from the real events table: (µs,
    * event_type, value) rows — whatever encoding the driver's fixture
    * currently carries, `tsUs` canonicalizes it first. */
  private lazy val rows: DataFrame = {
    val real = spark.read.parquet(s"${sf()}/events.parquet")
    real.select(EventTime.tsUs(real).as("us"), col("event_type"), col("value"))
      .limit(500).localCheckpoint()
  }

  /** Writes `rows` as an events table under encoding `mode` and
    * returns the sf-style directory containing events.parquet. */
  private def writeFixture(mode: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-ts-$mode").toString
    val ts = mode match {
      case "ns"  => col("us") * 1000L
      case "tsi" => timestamp_micros(col("us"))
      // wall clock pinned to UTC explicitly — NOT a session-zone cast
      case "ntz" => convert_timezone(lit("UTC"), timestamp_micros(col("us")))
    }
    rows.select(ts.as("ts"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val fixtures: Map[String, String] =
    Seq("ns", "tsi", "ntz").map(m => m -> writeFixture(m)).toMap

  test("tsUs reads identical microseconds from all three physical encodings") {
    val expectedTypes = Map[String, DataType](
      "ns" -> LongType, "tsi" -> TimestampType, "ntz" -> TimestampNTZType)
    val expected = rows.select("us").collect().map(_.getLong(0)).sorted.toSeq
    fixtures.foreach { case (mode, dir) =>
      val df = spark.read.parquet(s"$dir/events.parquet")
      // the fixture must actually exercise the branch it claims to
      assert(df.schema("ts").dataType === expectedTypes(mode),
        s"$mode fixture did not round-trip its encoding")
      val got = df.select(EventTime.tsUs(df).as("us"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got === expected, s"tsUs mismatch under $mode encoding")
    }
  }

  test("NTZ and instant paths are independent of spark.sql.session.timeZone") {
    // ADVICE r7: an implicit NTZ→TIMESTAMP cast would shift event time
    // by the session zone; tsUs must not. Pin by recomputing under a
    // zone with a large offset and DST.
    val expected = rows.select("us").collect().map(_.getLong(0)).sorted.toSeq
    val prev = spark.conf.getOption("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      for (mode <- Seq("ntz", "tsi")) {
        val df = spark.read.parquet(s"${fixtures(mode)}/events.parquet")
        val got = df.select(EventTime.tsUs(df).as("us"))
          .collect().map(_.getLong(0)).sorted.toSeq
        assert(got === expected, s"$mode path shifted under non-UTC session zone")
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.session.timeZone", v)
      case None => spark.conf.unset("spark.sql.session.timeZone")
    }
  }

  test("eventsDaily is encoding-portable (two-fixture query equivalence)") {
    val results = fixtures.map { case (mode, dir) =>
      mode -> graft.queries.RelQueries.eventsDaily(spark, dir)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Long]("n"), r.getAs[Long]("value_cents"))).toMap
    }
    assert(results("ns").nonEmpty)
    assert(results("tsi") === results("ns"), "TIMESTAMP vs int64-ns daily rollup")
    assert(results("ntz") === results("ns"), "TIMESTAMP_NTZ vs int64-ns daily rollup")
  }

  test("tsDay is independent of the session zone (UTC calendar pinned)") {
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${fixtures("ntz")}/events.parquet")
    val utcDays = df.select(EventTime.tsDay(df).as("d"))
      .collect().map(_.getString(0)).sorted.toSeq
    // a DST-fold instant: 2024-11-03 01:30 EST exists twice in
    // America/New_York — the case where a timestamp-rendering
    // formulation (cast through the session zone) is ambiguous
    val foldUs = 1730615400000000L // 2024-11-03T05:50:00Z
    val fold = spark.range(1).select((lit(foldUs) * 1000L).as("ts"))
    val prev = spark.conf.getOption("spark.sql.session.timeZone")
    try {
      for (zone <- Seq("Asia/Tokyo", "America/New_York")) {
        spark.conf.set("spark.sql.session.timeZone", zone)
        val got = df.select(EventTime.tsDay(df).as("d"))
          .collect().map(_.getString(0)).sorted.toSeq
        assert(got === utcDays, s"tsDay drifted under session zone $zone")
        assert(fold.select(EventTime.tsDay(fold).as("d")).head.getString(0)
          === "2024-11-03", s"DST-fold instant shifted under $zone")
      }
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.session.timeZone", v)
      case None => spark.conf.unset("spark.sql.session.timeZone")
    }
  }

  test("pre-epoch ns values floor like the timestamp branches (ADVICE r8)") {
    // −1 ns is inside microsecond −1 ([−1000 ns, 0)), so tsUs must be
    // −1, not the toward-zero 0 — truncating division would disagree
    // with the TIMESTAMP/NTZ branches and tsDay's pmod floor on every
    // pre-epoch instant off a µs boundary.
    import spark.implicits._
    val nsVals = Seq(-1L, -999L, -1000L, -1001L, -86400000000001L,
      0L, 1L, 999L, 1000L)
    val ns = nsVals.toDF("ts")
    val got = ns.select(EventTime.tsUs(ns).as("us"))
      .collect().map(_.getLong(0)).toSeq
    val expected = nsVals.map(v => Math.floorDiv(v, 1000L))
    assert(got === expected)
    // cross-encoding: the same pre-epoch instants written as TIMESTAMP
    // read back the identical microseconds
    val tsi = ns.select(timestamp_micros(expr("ts div 1000") -
      when(pmod(col("ts"), lit(1000L)) =!= 0 && col("ts") < 0, 1L)
        .otherwise(0L)).as("ts"))
    assert(tsi.select(EventTime.tsUs(tsi).as("us"))
      .collect().map(_.getLong(0)).toSeq === expected)
    // tsDay floors pre-epoch days the same way
    val day = ns.select(EventTime.tsDay(ns).as("d")).collect().map(_.getString(0))
    val expDay = nsVals.map(v =>
      java.time.LocalDate.ofEpochDay(
        Math.floorDiv(Math.floorDiv(v, 1000L), 86400000000L)).toString)
    assert(day.toSeq === expDay)
  }

  test("an unsupported encoding fails loudly, not silently") {
    import spark.implicits._
    val bad = Seq("2024-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException](EventTime.tsUs(bad))
    assert(e.getMessage.contains("unsupported event-time encoding"))
  }
}
