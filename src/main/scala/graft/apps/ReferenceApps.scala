package graft.apps

import graft.core.{KeyValue, MapReduce}
import org.apache.spark.sql.{Dataset, SparkSession}

/** The reference's MR app library as reusable (Map, Reduce) pairs —
  * the exact plugin contract of `src/main/mrworker.go:35-52`, so a
  * user of the reference can port an app by transliterating two
  * functions and calling [[MrJob.run]]. The DataFrame formulations in
  * `graft.queries.MrQueries` are the optimized declarative equivalents
  * (partial aggregation etc.); these generic forms exist for arbitrary
  * user code and are differential-tested against both the sequential
  * oracle and the declarative plans. */
object ReferenceApps {

  /** wc (`src/mrapps/wc.go`). */
  val wcMap: (String, String) => IterableOnce[KeyValue] =
    (_, contents) =>
      contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty).map(KeyValue(_, "1"))
  val wcReduce: (String, Iterator[String]) => String =
    (_, values) => values.size.toString

  /** indexer (`src/mrapps/indexer.go`): distinct words per doc on the
    * map side; reduce = "<count> <doc1,doc2,...>" with docs sorted. */
  val indexerMap: (String, String) => IterableOnce[KeyValue] =
    (doc, contents) =>
      contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
        .toSet[String].iterator.map(w => KeyValue(w, doc))
  val indexerReduce: (String, Iterator[String]) => String =
    (_, values) => {
      val docs = values.toVector.sorted
      s"${docs.size} ${docs.mkString(",")}"
    }

  /** crash/nocrash payload (`src/mrapps/nocrash.go:17-47`). */
  val profileMap: (String, String) => IterableOnce[KeyValue] =
    (name, contents) => Seq(
      KeyValue("a", name), KeyValue("b", name.length.toString),
      KeyValue("c", contents.length.toString), KeyValue("d", "xyzzy"))
  val profileReduce: (String, Iterator[String]) => String =
    (_, values) => values.toVector.sorted.mkString(" ")

  /** early_exit (`src/mrapps/early_exit.go:19-36`). */
  val fileCountMap: (String, String) => IterableOnce[KeyValue] =
    (name, _) => Seq(KeyValue(name, "1"))
  val fileCountReduce: (String, Iterator[String]) => String =
    (_, values) => values.size.toString
}

/** One-call facade matching the reference's job submission shape
  * (`mrcoordinator files...` + `mrworker app.so`, nReduce=10):
  * read whole files → run the app → sorted text sink. */
final case class MrJob(
    mapf: (String, String) => IterableOnce[KeyValue],
    reducef: (String, Iterator[String]) => String,
    nReduce: Int = 10) {

  def run(spark: SparkSession, inputGlob: String, outDir: String): Unit =
    MapReduce.writeTextSink(
      MapReduce.run(spark, MapReduce.wholeTextFiles(spark, inputGlob),
        mapf, reducef, nReduce),
      outDir, nReduce)

  /** In-memory variant for tests / composition. */
  def dataset(spark: SparkSession, input: Dataset[(String, String)]): Dataset[KeyValue] =
    MapReduce.run(spark, input, mapf, reducef, nReduce)
}
