package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Blocked-Levenshtein near-dup: blocking recall by edit position,
  * threshold and cap semantics, normalization parity, and the banded
  * DP ≡ full DP equivalence on the gate corpus. */
class EditDedupSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def pairs(rows: Seq[(Long, String)], cap: Int = 64) =
    EditDedup.editPairsOf(docs(rows), cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // a long shared carrier so length buckets and keys are stable
  private val base = ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
    "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua").trim

  test("edits in the middle, head, and tail are all caught; far pairs are not") {
    val headEdit = "XXXXX YYYYY" + base.drop(11) // breaks the prefix key
    val tailEdit = base.dropRight(11) + "zzzzz qqqqq" // breaks the suffix key
    val midEdit = base.patch(60, "REPLACEMENT", 11)
    val far = base.split(" ").reverse.mkString(" ") + " extra words here now"
    val got = pairs(Seq(1L -> base, 2L -> headEdit, 3L -> tailEdit,
      4L -> midEdit, 5L -> far))
    val ids = got.map(t => (t._1, t._2))
    assert(ids.contains((1L, 2L)), "head edit must be caught via the suffix key")
    assert(ids.contains((1L, 3L)), "tail edit must be caught via the prefix key")
    assert(ids.contains((1L, 4L)), "middle edit keeps both keys")
    assert(!ids.exists(p => p._1 == 5L || p._2 == 5L),
      "a reversed-word doc is not an edit near-dup")
    // distances are the real Levenshtein distances (normalized text)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def norm(s: String) =
      s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
    got.foreach { case (a, b, dist) =>
      val texts = Map(1L -> base, 2L -> headEdit, 3L -> tailEdit,
        4L -> midEdit, 5L -> far)
      assert(dist === lev(norm(texts(a)), norm(texts(b))).toLong)
    }
  }

  test("threshold: relative 10% of mean length, absolute ceiling 64") {
    // two short docs, edit distance 3, lengths ~20 -> 10% of mean = 2:
    // OVER the relative threshold, must be dropped
    val a = "abcde fghij klmno pq"
    val b = "abcde fghij klmno xyz" // dist 3 (q->x? recompute: 'pq' vs 'xyz')
    val got = pairs(Seq(1L -> a, 2L -> b))
    assert(got.forall { case (_, _, d) => d * 20 <= (a.length + b.length) },
      s"kept a pair over the relative threshold: $got")
    // the same relative edit on a long carrier passes (10% of ~120 = 12)
    val c = base.patch(40, "abc", 3)
    assert(pairs(Seq(1L -> base, 2L -> c)).nonEmpty)
  }

  test("df-cap: a degenerate block key is dropped whole") {
    // 70 identical docs share every key; cap=64 drops the keys whole
    val many = (1L to 70L).map(i => i -> base)
    assert(pairs(many, cap = 64).isEmpty)
    // under the cap the same corpus pairs up fully: C(60,2) pairs
    val fewer = (1L to 60L).map(i => i -> base)
    assert(pairs(fewer, cap = 64).size === 60 * 59 / 2)
  }

  test("normalization: case, punctuation and non-ASCII collapse before distance") {
    val plain = base
    val noisy = base.toUpperCase.replace(" ", " -- ") + "!!! é"
    val got = pairs(Seq(1L -> plain, 2L -> noisy))
    assert(got === Set((1L, 2L, 0L)),
      "case/punct-only variants must be distance-0 pairs")
  }

  test("clusters: edit variants collapse transitively; non-dups stay singletons") {
    // head-edit and tail-edit both pair with base but not (necessarily)
    // with each other: the cluster must still unite all three
    val headEdit = "XXXXX YYYYY" + base.drop(11)
    val tailEdit = base.dropRight(11) + "zzzzz qqqqq"
    val far = base.split(" ").reverse.mkString(" ") + " extra words here now"
    val dir = java.nio.file.Files
      .createTempDirectory("graft_editclust").toString
    import spark.implicits._
    Seq(1L -> base, 2L -> headEdit, 3L -> tailEdit, 5L -> far)
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = EditDedup.editClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 1L && got(2L) === 1L && got(3L) === 1L,
      "the edit-variant clique must collapse to the min doc_id")
    assert(got(5L) === 5L, "a non-dup stays its own singleton cluster")
  }

  test("family report: counts equal the operators' own pair sets; empty corpus is a zero row") {
    val row = EditDedup.familyReport(spark, sf()).collect()
    assert(row.length === 1)
    val (nG, nE, nB, nU) = (row(0).getLong(0), row(0).getLong(1),
      row(0).getLong(2), row(0).getLong(3))
    val g = Dedup.ngramJaccard(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = EditDedup.editPairs(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nG === g.size.toLong && nE === e.size.toLong)
    assert(nB === (g intersect e).size.toLong)
    assert(nU === (g union e).size.toLong)
    assert(nB <= math.min(nG, nE) && nU === nG + nE - nB)
    // empty corpus: a single all-zero row, not nulls or a throw
    val dir = java.nio.file.Files
      .createTempDirectory("graft_famempty").toString
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val empty = EditDedup.familyReport(spark, dir).collect()
    assert(empty.length === 1 &&
      (0 to 3).forall(i => empty(0).getLong(i) === 0L))
  }

  test("gate corpus: banded DP equals the full-matrix reference") {
    val rows = spark.read.parquet(s"${sf()}/documents.parquet")
    val got = EditDedup.editPairsOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // full-matrix reference over the same blocking, driver-side
    val texts = rows.selectExpr("doc_id",
        "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')) AS nt")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def keys(nt: String) = {
      val lb = nt.length / 64
      Seq(s"p:$lb:${nt.take(12)}", s"p:${lb + 1}:${nt.take(12)}",
        s"s:$lb:${nt.takeRight(12)}", s"s:${lb + 1}:${nt.takeRight(12)}")
    }
    val byKey = texts.flatMap { case (id, nt) => keys(nt).map(_ -> (id, nt)) }
      .groupBy(_._1).filter(_._2.length <= 64)
    def lev(a: String, b: String): Int = {
      var prev = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        val cur = new Array[Int](b.length + 1)
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
      prev(b.length)
    }
    val expected = byKey.values.flatMap { g =>
      val m = g.map(_._2).toSeq
      for {
        (a, na) <- m; (b, nb) <- m if a < b
        d = lev(na, nb)
        if d <= math.min(64, (na.length + nb.length) / 20)
      } yield (a, b, d.toLong)
    }.toSet
    assert(got === expected)
    assert(got.nonEmpty, "gate corpus should contain edit near-dups")
  }
}
