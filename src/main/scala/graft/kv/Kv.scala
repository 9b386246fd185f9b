package graft.kv

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One operation of the reference's KV service op log.
  *
  * Reference semantics (`src/models/kv.go:40-54`): per-key value is the
  * ordered fold of the operation log — get ⇒ output = state;
  * put ⇒ state := value; append ⇒ state := state + value. Exactly-once:
  * duplicate client requests (same clientId, clientSeq) must apply once
  * (`src/kvraft/test_test.go:138-179`).
  *
  * @param seq       global apply order (reference: Raft log index)
  * @param clientId  issuing client (dedup-ledger key)
  * @param clientSeq per-client op number (exactly-once check)
  */
final case class KvOp(seq: Long, clientId: Long, clientSeq: Long,
    op: String, key: String, value: String)

final case class KvState(key: String, state: String)
final case class KvGet(key: String, seq: Long, observed: String)

object Kv {

  /** key → shard exactly as the reference: `int(key[0]) % NShards`,
    * NShards = 10 (`src/shardkv/client.go:20-27`,
    * `src/shardctrler/common.go:21`). Stays inside whole-stage codegen
    * (pure built-in functions). Empty keys → shard 0, matching Go's
    * behavior of indexing "" being impossible (clerk keys are nonempty);
    * we coalesce for totality. */
  def key2shard(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(coalesce(ascii(substring(key, 1, 1)), lit(0)), lit(10))

  /** Deterministic projection of the driver's `events` table onto the
    * KV op-log schema (FIXTURES.md §2): event semantics choose the op
    * kind — views/errors read, purchases/signups overwrite, clicks
    * append. */
  def opsFromEvents(spark: SparkSession, sfDir: String): Dataset[KvOp] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        col("event_id").as("seq"),
        col("user_id").as("clientId"),
        col("event_id").as("clientSeq"),
        expr("CASE event_type WHEN 'click' THEN 'append' " +
          "WHEN 'purchase' THEN 'put' WHEN 'signup' THEN 'put' " +
          "ELSE 'get' END").as("op"),
        concat(lit("u"), pmod(col("user_id"), lit(97))).as("key"),
        concat(lit("v"), col("event_id"), lit(";")).as("value"))
      .as[KvOp]
  }

  /** Exactly-once ledger: keep only the FIRST (lowest-seq) occurrence
    * of each (clientId, clientSeq) — the duplicate suppression the lab
    * demands of its server (`src/kvraft/test_test.go:138-179`).
    * One shuffle on the ledger key; min_by keeps the earliest apply. */
  def dedupExactlyOnce(ops: Dataset[KvOp]): Dataset[KvOp] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(o => (o.clientId, o.clientSeq))
      .reduceGroups((a, b) => if (a.seq <= b.seq) a else b)
      .map(_._2)
  }

  /** Batch replay: final state per key.
    *
    * Spark-first formulation: one shuffle on `key`, then
    * `flatMapSortedGroups(seq)` — Spark's sort-based shuffle delivers
    * each group ordered by seq, so the fold is a streaming O(1)-state
    * scan (no per-group buffering), spill-safe at 100 TB. This is the
    * "ordered per-key fold" SURVEY §4.2 flags as the one genuinely
    * custom operator family. */
  def replay(ops: Dataset[KvOp], exactlyOnce: Boolean = false): Dataset[KvState] = {
    import ops.sparkSession.implicits._
    val deduped = if (exactlyOnce) dedupExactlyOnce(ops) else ops
    deduped.groupByKey(_.key)
      .flatMapSortedGroups(col("seq")) { (key, it) =>
        var state = ""
        it.foreach { o =>
          o.op match {
            case "put"    => state = o.value
            case "append" => state = state + o.value
            case _        => () // get: read-only
          }
        }
        Iterator.single(KvState(key, state))
      }
  }

  /** Get-observation log: the value each `get` op observes, i.e. the
    * running state at its position in the log — the linearizability
    * check's expected outputs (`src/models/kv.go:44-46`). Same
    * sorted-group streaming fold, emitting one row per get. */
  def getLog(ops: Dataset[KvOp]): Dataset[KvGet] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.key)
      .flatMapSortedGroups(col("seq")) { (key, it) =>
        var state = ""
        it.flatMap { o =>
          o.op match {
            case "put"    => state = o.value; Iterator.empty
            case "append" => state = state + o.value; Iterator.empty
            case _        => Iterator.single(KvGet(key, o.seq, state))
          }
        }
      }
  }

  /** Shard routing table for a key population: distinct keys with their
    * reference shard assignment (K4). */
  def shardAssignment(df: DataFrame, keyCol: String): DataFrame =
    df.select(col(keyCol).as("key")).distinct()
      .select(col("key"), key2shard(col("key")).cast("int").as("shard"))

  /** K9 — reconfig-aware routing: each op joins the config epoch active
    * at its position in the log and routes to the group owning its
    * shard there (the data-follows-shards semantics of
    * `src/shardkv/client.go:62-122`, re-expressed as a broadcast join
    * against the config history instead of client retry loops).
    *
    * The log is partitioned into equal-length config epochs
    * (`epochLen` ops per config, the deterministic stand-in for "the
    * reconfiguration happened at log position N"). Config history rows
    * are tiny (numConfigs × 10 shards) → always broadcast; the fact
    * stream never shuffles. */
  def routeOps(ops: Dataset[KvOp], history: DataFrame, epochLen: Long): DataFrame = {
    // empty history → no epochs: clamp every op to config 0 (getInt on
    // the null max would NPE); cast tolerates int- or long-typed nums
    val maxNum = Option(history.agg(max(col("config_num")).cast("long")).head().get(0))
      .fold(0L)(_.asInstanceOf[Long])
    ops.toDF()
      .select(col("seq"), col("key"), key2shard(col("key")).cast("int").as("shard"),
        // integer div, not `/`: float division corrupts log positions
        // beyond 2^53 (same rule as RelQueries.eventDay)
        least(expr(s"seq div $epochLen"), lit(maxNum)).cast("int").as("config_num"))
      .join(broadcast(history), Seq("config_num", "shard"), "left")
      .select(col("seq"), col("key"), col("shard"), col("config_num"), col("gid"))
  }
}
