package graft.apps

import graft.SparkSpec
import graft.core.{FnvHash31, KeyValue, MapReduce}

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Golden parity on the reference's OWN corpus: the 8 Gutenberg texts at
  * `/root/reference/src/main/pg-…txt` (3.3 MB), under the exact contract of
  * `src/main/test-mr.sh:81-112` — run the app through the distributed
  * engine, `sort(cat mr-out-R for all R)`, and demand byte-equality with
  * the sequential oracle (`src/main/mrsequential.go`). This converts
  * "matches our oracle on synthetic fixtures" into "matches the reference
  * definition of correctness on the reference's real inputs", including
  * tokenizer parity (Go `unicode.IsLetter` vs `\p{L}` — SURVEY §7 risk a)
  * and per-bucket FNV-1a file layout (`src/mr/worker.go:140`).
  *
  * The corpus is verified pure ASCII, so a synthetic non-ASCII case is
  * included to exercise the Unicode-letter boundary the corpus cannot.
  */
class GoldenCorpusSpec extends SparkSpec {

  private val corpusDir = "/root/reference/src/main"
  private val nReduce = 10

  // static so Dataset closures don't capture the (non-serializable) suite
  import GoldenCorpusSpec.basename

  /** The corpus as (basename, contents), decoded as UTF-8 exactly like
    * Spark's text reader and Go's string handling. */
  private lazy val corpus: Seq[(String, String)] =
    Files.list(Paths.get(corpusDir)).iterator().asScala
      .filter(p => p.getFileName.toString.matches("pg-.*\\.txt"))
      .toVector.sortBy(_.toString)
      .map(p => p.getFileName.toString -> new String(Files.readAllBytes(p), UTF_8))

  /** Oracle output lines, in test-mr.sh's `sort mr-out-0` form. */
  private def oracleLines(
      mapf: (String, String) => IterableOnce[KeyValue],
      reducef: (String, Iterator[String]) => String): Seq[String] =
    MapReduce.sequentialOracle(corpus, mapf, reducef)
      .map(kv => s"${kv.key} ${kv.value}").sorted

  /** Engine output lines: run MrJob over the real files with the
    * per-file-FNV-parity sink, then `sort(cat mr-out*)`. Returns the
    * sorted lines plus the per-bucket file contents for layout checks. */
  private def engineRun(
      mapf: (String, String) => IterableOnce[KeyValue],
      reducef: (String, Iterator[String]) => String): (Seq[String], Map[Int, Seq[String]]) = {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-golden").toString + "/out"
    val input = MapReduce.wholeTextFiles(spark, s"$corpusDir/pg-*.txt")
      .map { case (uri, contents) => (basename(uri), contents) }
    MapReduce.writeTextSinkFnvParity(
      MapReduce.run(spark, input, mapf, reducef, nReduce), out, nReduce)
    val parts = Files.list(Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toVector
    val byBucket = parts.map { p =>
      val r = p.getFileName.toString.stripPrefix("part-").toInt
      r -> Files.readAllLines(p, UTF_8).asScala.toSeq
    }.toMap
    (byBucket.values.flatten.toVector.filter(_.nonEmpty).sorted, byBucket)
  }

  private def goldenCheck(
      mapf: (String, String) => IterableOnce[KeyValue],
      reducef: (String, Iterator[String]) => String): Unit = {
    val golden = oracleLines(mapf, reducef)
    val (lines, byBucket) = engineRun(mapf, reducef)
    assert(lines.length === golden.length)
    // byte equality, line by line, exactly `cmp` on the sorted concatenation
    assert(lines === golden)
    // per-FILE parity: bucket R holds exactly the keys with ihash(key)%n == R,
    // key-sorted within the file (`src/mr/worker.go:140,219`)
    assert(byBucket.keySet === (0 until nReduce).toSet)
    byBucket.foreach { case (r, fileLines) =>
      val keys = fileLines.map(_.takeWhile(_ != ' '))
      assert(keys === keys.sorted, s"bucket $r not key-sorted")
      keys.foreach { k =>
        assert(FnvHash31.hash(k.getBytes(UTF_8)) % nReduce === r,
          s"key '$k' in wrong bucket $r")
      }
    }
  }

  test("wc over the reference Gutenberg corpus is byte-equal to the sequential oracle") {
    goldenCheck(ReferenceApps.wcMap, ReferenceApps.wcReduce)
  }

  test("indexer over the reference Gutenberg corpus is byte-equal to the sequential oracle") {
    goldenCheck(ReferenceApps.indexerMap, ReferenceApps.indexerReduce)
  }

  test("profile (nocrash payload) over the reference corpus is byte-equal to the sequential oracle") {
    goldenCheck(ReferenceApps.profileMap, ReferenceApps.profileReduce)
  }

  test("wc output is invariant to nReduce on the real corpus (test-mr.sh:103 invariant)") {
    import spark.implicits._
    val input = MapReduce.wholeTextFiles(spark, s"$corpusDir/pg-*.txt")
      .map { case (uri, contents) => (basename(uri), contents) }
    val a = MapReduce.run(spark, input, ReferenceApps.wcMap, ReferenceApps.wcReduce, 3)
      .collect().map(kv => kv.key -> kv.value).sorted.toSeq
    val golden = oracleLines(ReferenceApps.wcMap, ReferenceApps.wcReduce)
    assert(a.map { case (k, v) => s"$k $v" }.sorted === golden)
  }

  test("tokenizer parity holds beyond ASCII (Unicode letters vs digits/punct)") {
    // Go `unicode.IsLetter` and Java `\p{L}` both mean Unicode category L;
    // the real corpus is pure ASCII, so exercise the boundary synthetically.
    val text = "café naïve 世界 123 élève_x αβ"
    val toks = ReferenceApps.wcMap("f", text).iterator.map(_.key).toVector
    assert(toks === Vector("café", "naïve", "世界",
      "élève", "x", "αβ"))
  }
}

object GoldenCorpusSpec {
  def basename(p: String): String = p.substring(p.lastIndexOf('/') + 1)
}
