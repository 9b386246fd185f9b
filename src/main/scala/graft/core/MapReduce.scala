package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The single record type of the reference engine: untyped string
  * key/value pairs (reference: `src/mr/worker.go:19-22`). Numbers and
  * lists are encoded as strings by the applications, exactly as the
  * reference's apps do (`src/mrapps/wc.go:39`, `src/mrapps/indexer.go:38`).
  */
final case class KeyValue(key: String, value: String)

/** Generic MapReduce dataflow re-expressed Spark-first.
  *
  * Reference pipeline (WHAT, not HOW): whole-file scan → user Map
  * (flatMap to KV pairs) → hash partition by key → per-partition sort →
  * sort-based group-by → user Reduce (fold over grouped values) → sorted
  * text sink (`src/mr/worker.go:131-221`, `src/main/mrsequential.go:28-90`).
  *
  * Spark mapping: the scheduler, heartbeats, phase barrier, shuffle
  * files, retries and atomic output commit of the reference
  * (`src/mr/coordinator.go`) are Spark's DAGScheduler / shuffle service /
  * FileOutputCommitter — deliberately NOT reimplemented. What remains is
  * the user-visible dataflow below.
  *
  * Scale notes (100 TB posture):
  *  - `run` is the fully-general holistic path: one shuffle on `key`,
  *    sort-based grouping inside `groupByKey` — Spark spills, unlike the
  *    reference's in-memory `sort.Sort` (`src/mr/worker.go:193`).
  *  - Algebraic reducers (count/sum/min/max) should NOT go through
  *    `run`; use the DataFrame formulations in `graft.queries` which get
  *    map-side partial aggregation — the reference has no combiner at
  *    all (`src/mrapps/wc.go` shuffles one pair per word occurrence).
  */
object MapReduce {

  /** Fully-general MapReduce: mirrors the reference's plugin contract
    * `mapf(filename, contents) []KeyValue` / `reducef(key, values) string`
    * (`src/main/mrworker.go:35-52`).
    *
    * @param input          one row per file: (name, contents)
    * @param numPartitions  reduce fan-out (reference nReduce); output
    *                       CONTENT must be invariant to it — the implicit
    *                       invariant of `src/main/test-mr.sh:103`.
    *
    * IMPORTANT ordering contract: `reducef` receives the group's values
    * in an unspecified order, exactly like the reference (map output
    * order across tasks is nondeterministic there too). Deterministic
    * reducers must sort internally (as `src/mrapps/crash.go:45-55` does).
    */
  def run(
      spark: SparkSession,
      input: Dataset[(String, String)],
      mapf: (String, String) => IterableOnce[KeyValue],
      reducef: (String, Iterator[String]) => String,
      numPartitions: Int = 10): Dataset[KeyValue] = {
    import spark.implicits._
    input
      .flatMap { case (name, contents) => mapf(name, contents) }
      .groupByKey(_.key)
      .mapGroups { (k, rows) => KeyValue(k, reducef(k, rows.map(_.value))) }
      .repartition(numPartitions, $"key")
  }

  /** Whole-file text source: one record per file, never split —
    * reference E1 (`src/mr/worker.go:243-254`). */
  def wholeTextFiles(spark: SparkSession, path: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path)
      .select(input_file_name().as("_1"), col("value").as("_2"))
      .as[(String, String)]
  }

  /** The `documents` table presented through the reference's
    * (filename, contents) lens: doc_id stands in for the file name
    * (FIXTURES.md §1). */
  def documentsAsFiles(spark: SparkSession, sfDir: String): Dataset[(String, String)] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string").as("_1"), col("text").as("_2"))
      .as[(String, String)]
  }

  /** Text sink with reference output contract: per-partition key-sorted
    * `"key value"` lines, one file per partition, job-commit atomicity —
    * reference E8 (`src/mr/worker.go:195-220`). Spark's
    * FileOutputCommitter provides the same temp-file+rename semantics as
    * the reference's `os.Rename` (`src/mr/worker.go:150-163`).
    */
  def writeTextSink(kv: Dataset[KeyValue], outDir: String, numPartitions: Int = 10): Unit = {
    kv.repartition(numPartitions, col("key"))
      .sortWithinPartitions("key")
      .select(concat_ws(" ", col("key"), col("value")))
      .write.mode("overwrite").text(outDir)
  }

  /** Text sink with PER-FILE parity: output file R holds exactly the
    * keys with `ihash(key) % nReduce == R`, key-sorted — the
    * `mr-out-R` bucket layout itself (`src/mr/worker.go:140, 219`),
    * for byte-level diffing of individual output files against a
    * reference run. Uses the RDD path because file↔partition identity
    * must be pinned to the FNV partitioner, which DataFrame exchanges
    * do not expose. */
  def writeTextSinkFnvParity(kv: Dataset[KeyValue], outDir: String,
      numPartitions: Int = 10): Unit =
    kv.rdd.map(r => r.key -> r.value)
      .partitionBy(new FnvPartitioner(numPartitions))
      .mapPartitions(
        it => it.toVector.sortBy(_._1).iterator.map { case (k, v) => s"$k $v" },
        preservesPartitioning = true)
      .saveAsTextFile(outDir)

  /** Sequential oracle: the semantic definition of a job, mirroring
    * `src/main/mrsequential.go:28-90` (read all → flatMap → global sort →
    * adjacent-group fold → one output). Pure Scala, no Spark — used by
    * tests as an independent differential oracle. */
  def sequentialOracle(
      files: Seq[(String, String)],
      mapf: (String, String) => IterableOnce[KeyValue],
      reducef: (String, Iterator[String]) => String): Seq[KeyValue] = {
    val intermediate = files.iterator
      .flatMap { case (n, c) => mapf(n, c) }
      .toVector
      .sortBy(_.key)
    val out = Vector.newBuilder[KeyValue]
    var i = 0
    while (i < intermediate.length) {
      var j = i
      while (j < intermediate.length && intermediate(j).key == intermediate(i).key) j += 1
      val values = intermediate.slice(i, j).map(_.value)
      out += KeyValue(intermediate(i).key, reducef(intermediate(i).key, values.iterator))
      i = j
    }
    out.result()
  }
}
