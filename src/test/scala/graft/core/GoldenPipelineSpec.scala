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

  test("FNV-parity sink: file R holds exactly the ihash%R bucket, sorted") {
    import spark.implicits._
    val kv = MapReduce.run(spark,
      MapReduce.documentsAsFiles(spark, sf()), wcMap, wcReduce, 4)
    val out = java.nio.file.Files.createTempDirectory("graft-fnv").toString + "/o"
    MapReduce.writeTextSinkFnvParity(kv, out, numPartitions = 4)
    val parts = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length === 4)
    parts.zipWithIndex.foreach { case (f, r) =>
      val lines = scala.io.Source.fromFile(f).getLines().toVector
      val keys = lines.map(_.split(" ")(0))
      assert(keys === keys.sorted, s"file $r not key-sorted")
      keys.foreach(k =>
        assert(FnvHash31.hash(k.getBytes("UTF-8")) % 4 === r, s"$k in wrong bucket $r"))
    }
    // content parity with the DataFrame sink
    val allLines = parts.flatMap(f => scala.io.Source.fromFile(f).getLines()).sorted
    val dfOut = java.nio.file.Files.createTempDirectory("graft-dfsink").toString + "/o"
    MapReduce.writeTextSink(kv, dfOut, 4)
    val dfLines = spark.read.text(dfOut).as[String].collect().sorted
    assert(allLines.toSeq === dfLines.toSeq)
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
