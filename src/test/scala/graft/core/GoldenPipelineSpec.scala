package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The test-mr.sh analogue: the full E1→E8 pipeline (whole-file scan →
  * Map → shuffle → sorted fold → text sink) against both independent
  * oracles — the pure-Scala sequential fold (mrsequential parity) and
  * the declarative DataFrame formulation. */
class GoldenPipelineSpec extends SparkSpec {

  private val wcMap: (String, String) => IterableOnce[KeyValue] =
    (_, contents) =>
      contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty).map(KeyValue(_, "1"))
  private val wcReduce: (String, Iterator[String]) => String =
    (_, values) => values.size.toString

  test("wc over documents: MR engine == sequential oracle == DataFrame plan") {
    import spark.implicits._
    val input = MapReduce.documentsAsFiles(spark, sf())
    // 1. the generic MR engine
    val engine = MapReduce.run(spark, input, wcMap, wcReduce, numPartitions = 7)
      .collect().map(kv => kv.key -> kv.value.toLong).toMap
    // 2. the sequential oracle (single-threaded pure Scala)
    val oracle = MapReduce.sequentialOracle(input.collect().toSeq, wcMap, wcReduce)
      .map(kv => kv.key -> kv.value.toLong).toMap
    // 3. the declarative plan the engine's queries use
    val df = graft.queries.MrQueries.wordCount(spark, sf())
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(engine === oracle)
    assert(engine === df)
  }

  test("text sink output: sorted, atomic-committed, cat|sort-stable across nReduce") {
    import spark.implicits._
    val input = MapReduce.documentsAsFiles(spark, sf())
    def sinkLines(n: Int): Seq[String] = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-golden-$n").toString
      MapReduce.writeTextSink(MapReduce.run(spark, input, wcMap, wcReduce, n), dir, n)
      spark.read.text(dir).as[String].collect().toSeq.sorted
    }
    // the implicit invariant of test-mr.sh:103: sort(cat mr-out*) is
    // independent of the reduce fan-out
    assert(sinkLines(3) === sinkLines(10))
  }

  test("FnvPartitioner: bit-exact reference bucket assignment on RDDs") {
    val rdd = spark.sparkContext
      .parallelize(Seq("the" -> 1, "a" -> 2, "xyzzy" -> 3, "b" -> 4))
      .partitionBy(new FnvPartitioner(10))
    val placed = rdd.mapPartitionsWithIndex { (pid, it) =>
      it.map { case (k, _) => k -> pid }
    }.collect().toMap
    for ((k, pid) <- placed)
      assert(pid === FnvHash31.hash(k.getBytes("UTF-8")) % 10, k)
  }
}
