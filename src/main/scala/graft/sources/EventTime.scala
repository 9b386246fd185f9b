package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-timestamp portability for event time.
  *
  * A lakehouse `events` table's `ts` column arrives in whatever
  * physical encoding its writer chose:
  *
  *  - raw `int64` nanoseconds (or parquet TIMESTAMP(NANOS), which
  *    Spark surfaces as `LongType` ns under
  *    `spark.sql.legacy.parquet.nanosAsLong=true` — Spark has no
  *    nanosecond timestamp type),
  *  - parquet TIMESTAMP(MICROS/MILLIS) with `isAdjustedToUTC=true`
  *    → Spark `TimestampType` (an absolute instant),
  *  - parquet TIMESTAMP(MICROS/MILLIS) with `isAdjustedToUTC=false`
  *    → Spark `TimestampNTZType` (a wall-clock reading).
  *
  * An engine that hard-codes one of these breaks the moment the
  * fixture's writer changes (round-7 regression: `expr("ts div 1000")`
  * vs a `timestamp[us]` file fails analysis). `tsUs` inspects the
  * column's resolved type and emits the right codegen-friendly
  * conversion to a single canonical representation: BIGINT
  * microseconds since the epoch.
  *
  * TZ-NEUTRALITY (round-7 ADVICE): the NTZ branch deliberately avoids
  * `unix_micros(ntz)` — that relies on an implicit NTZ→TIMESTAMP cast
  * through `spark.sql.session.timeZone`, so a session pinned to
  * anything but UTC would shift every event day. Instead it takes the
  * wall-clock microsecond difference from the NTZ epoch literal via
  * `timestampdiff`, which never consults the session zone: the NTZ
  * wall-clock is read *as UTC*, matching both the nanos fixture and
  * DuckDB's `epoch_us(ts)` on the same file. `EventTimeSpec` pins all
  * three encodings against each other and pins the NTZ path under a
  * non-UTC session zone.
  */
object EventTime {

  /** Event time of `colName` as BIGINT µs since the epoch, adapted to
    * the column's physical encoding (LongType = raw ns;
    * Timestamp/TimestampNTZ = µs-precision instants). Integer `div`
    * for the ns path, NOT `/`: float division of an ~1.7e18 ns value
    * exceeds double's 2^53 integer precision and corrupts timestamps. */
  def tsUs(df: DataFrame, colName: String = "ts"): Column =
    df.schema(colName).dataType match {
      case LongType =>
        // FLOOR division, not `div` (which truncates toward zero): a
        // pre-epoch ns value off a µs boundary must round down to
        // agree with the TIMESTAMP/NTZ branches and tsDay's pmod
        // floor. pmod's non-negative remainder makes the subtraction
        // land on an exact multiple, so the final div is exact.
        expr(s"(`$colName` - pmod(`$colName`, 1000)) div 1000")
      case TimestampType =>
        // an instant; unix_micros is zone-free by definition
        unix_micros(col(colName))
      case TimestampNTZType =>
        // wall-clock µs since the NTZ epoch — no session-zone cast
        expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `$colName`)")
      case other =>
        throw new IllegalArgumentException(
          s"unsupported event-time encoding for column '$colName': $other " +
            "(expected int64 nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
    }

  /** Event day as an ISO `yyyy-MM-dd` string (UTC calendar), built on
    * [[tsUs]] so it is portable across the same three encodings and
    * engine-neutral in hash compares. Computed as pure integer
    * calendar arithmetic — floor(µs / 86 400 000 000) days added to
    * the epoch date, then a date→string cast — with NO timestamp
    * rendering anywhere, so no session-zone dependence exists even in
    * a DST fold hour (a `convert_timezone`/`date_format` formulation
    * is only zone-free outside the session zone's ambiguous hours).
    * Floor division is built from `pmod` (non-negative remainder) and
    * an exact decimal divide: µs-scale longs exceed double's 2^53
    * integer range, so float division is never safe here. */
  def tsDay(df: DataFrame, colName: String = "ts"): Column = {
    val dayUs = 86400000000L
    val us = tsUs(df, colName)
    val idx = ((us - pmod(us, lit(dayUs))).cast("decimal(38,0)") / lit(dayUs))
      .cast("int")
    date_add(to_date(lit("1970-01-01")), idx).cast("string")
  }
}
