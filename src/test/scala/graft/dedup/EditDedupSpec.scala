package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Blocked-Levenshtein near-dup: q-chunk pigeonhole blocking recall
  * (structural 1.0 — including the scattered multi-site edits the r11
  * prefix/suffix blocking missed by contract), threshold and cap
  * semantics, normalization parity, empty-doc reachability, the
  * both-endpoint output cap, and the banded DP ≡ full DP equivalence
  * against an ALL-PAIRS driver reference on the gate corpus. */
class EditDedupSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def pairs(rows: Seq[(Long, String)], cap: Int = 1000) =
    EditDedup.editPairsOf(docs(rows), cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // a long shared carrier so length buckets and keys are stable
  private val base = ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
    "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua").trim

  private def lev(a: String, b: String): Int = {
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

  private def norm(s: String) =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim

  test("edits at head, tail, middle AND scattered multi-site are all caught") {
    val headEdit = "XXXXX YYYYY" + base.drop(11)
    val tailEdit = base.dropRight(11) + "zzzzz qqqqq"
    val midEdit = base.patch(60, "REPLACEMENT", 11)
    // edits in BOTH 12-char end windows at once — the rewrite shape
    // the r11 prefix/suffix blocking documented as out-of-contract;
    // the q-chunk pigeonhole must catch it (some interior chunk
    // survives untouched)
    val scattered = "QQ" + base.drop(2).dropRight(2) + "ZZ"
    val far = base.split(" ").reverse.mkString(" ") + " extra words here now"
    val texts = Map(1L -> base, 2L -> headEdit, 3L -> tailEdit,
      4L -> midEdit, 5L -> far, 6L -> scattered)
    val got = pairs(texts.toSeq)
    val ids = got.map(t => (t._1, t._2))
    assert(ids.contains((1L, 2L)), "head edit must be caught")
    assert(ids.contains((1L, 3L)), "tail edit must be caught")
    assert(ids.contains((1L, 4L)), "middle edit must be caught")
    assert(ids.contains((1L, 6L)),
      "scattered head+tail edits must be caught by the interior chunks")
    assert(!ids.exists(p => p._1 == 5L || p._2 == 5L),
      "a reversed-word doc is not an edit near-dup")
    // distances are the real Levenshtein distances (normalized text)
    got.foreach { case (a, b, dist) =>
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

  test("empty documents pair with each other at distance 0") {
    val got = pairs(Seq(1L -> "", 2L -> "!!!", 3L -> base))
    // "" and "!!!" both normalize to the empty string -> dist 0 within
    // theta = 0; the sentinel key makes the pair reachable
    assert(got === Set((1L, 2L, 0L)))
  }

  test("exact-duplicate collapse: identical docs pair at dist 0 regardless of cap") {
    // byte-identical texts collapse to one representative BEFORE
    // blocking, so a clique of identical docs is found through the
    // within-group expansion — the df-cap cannot lose it (the truth
    // the uncapped oracle states)
    val many = (1L to 70L).map(i => i -> base)
    assert(pairs(many, cap = 2).size === 70 * 69 / 2)
    assert(pairs(many, cap = 2).forall(_._3 === 0L))
    // one distinct text -> one rep -> every block key has df 1
    assert(EditDedup.blockingDrops(docs(many), cap = 2).isEmpty)
  }

  test("dup fixture: the collapse ENGAGES (groups up to 3) and the result equals brute force") {
    // a tiny corpus with near-dup texts, fed through the gate's own
    // dupFixture — byte-identical copies must pair within-group at
    // dist 0 and inherit their representative's cross-group verdicts
    val tiny = docs(Seq(
      0L -> base,
      2L -> (base.dropRight(3) + "zzz"), // near-dup of 0
      4L -> "completely different short text here",
      6L -> base)) // byte-identical to 0 BEFORE replication too
    val fix = EditDedup.dupFixture(tiny)
    val rows = fix.collect().map(r => (r.getLong(0), r.getString(1)))
    // collapse precondition: strictly fewer distinct texts than rows
    assert(rows.map(_._2).distinct.length < rows.length,
      "the fixture must make the exact-duplicate collapse bite")
    // ids 0 and 6 share a text: copies of BOTH originals form one group
    val got = EditDedup.editPairsOf(fix).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force reference over the fixture
    val want = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      d = lev(norm(ta), norm(tb))
      th = math.min(64, (norm(ta).length + norm(tb).length) / 20)
      if d <= th
    } yield (ia, ib, d.toLong)).toSet
    assert(got === want)
    // and within-group dist-0 pairs are actually present
    assert(got.exists(_._3 == 0L), "collapse expansion must emit dist-0 pairs")
  }

  test("residue pipeline: stage 1 keeps min-id per text, stage 2 pairs only the residue") {
    val tiny = docs(Seq(
      0L -> base,
      2L -> (base.dropRight(3) + "zzz"),
      4L -> "completely different short text here",
      6L -> base))
    val fix = EditDedup.dupFixture(tiny)
    val rows = fix.collect().map(r => (r.getLong(0), r.getString(1)))
    val keepers = rows.groupBy(_._2).map(_._2.map(_._1).min).toSet
    val got = {
      import spark.implicits._
      val residue = fix
        .withColumn("gid", org.apache.spark.sql.functions.min($"doc_id")
          .over(org.apache.spark.sql.expressions.Window.partitionBy($"text")))
        .filter($"doc_id" === $"gid").select("doc_id", "text")
      EditDedup.editPairsOf(residue).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    // every emitted id is a keeper, and no dist-0 pairs remain (the
    // residue has no byte-identical texts by construction)
    assert(got.forall(p => keepers(p._1) && keepers(p._2)))
    assert(got.nonEmpty && got.forall(_._3 > 0L))
  }

  test("df-cap: a degenerate DISTINCT-text block key is dropped whole; drops observable") {
    // 70 DISTINCT single-substitution variants of one ~600-char
    // carrier (variant i flips position 8*i to '7'): every pair is a
    // true dist-2 match, but each untouched chunk key is shared by
    // ~69 variants — over cap=64 every shared key drops whole and the
    // blocked path finds nothing (no identical texts, so the exact
    // collapse cannot rescue it); the audit must surface the drops
    val carrier = Iterator.continually(base).take(6).mkString(" ").take(600)
    val variants = (0 until 70).map { i =>
      (i + 1).toLong -> carrier.updated(8 * i, '7')
    }
    assert(pairs(variants, cap = 64).isEmpty)
    assert(EditDedup.blockingDrops(docs(variants), cap = 64).count() > 0,
      "cap-dropped keys must surface in the blockingDrops audit")
    // with the cap above the clique size the full pair set appears,
    // every distance the real 2-substitution Levenshtein
    val full = pairs(variants, cap = 1000)
    assert(full.size === 70 * 69 / 2)
    assert(full.forall(_._3 === 2L), s"unexpected distances: ${full.take(3)}")
  }

  test("gate corpus: the df-cap provably does not bite (all-pairs oracle precondition)") {
    val rows = spark.read.parquet(s"${sf()}/documents.parquet")
    assert(EditDedup.blockingDrops(rows).isEmpty,
      "the gate cap must not bite on the fixture, or the uncapped " +
        "all-pairs oracle could diverge from the engine")
  }

  test("normalization: case, punctuation and non-ASCII collapse before distance") {
    val plain = base
    val noisy = base.toUpperCase.replace(" ", " -- ") + "!!! é"
    val got = pairs(Seq(1L -> plain, 2L -> noisy))
    assert(got === Set((1L, 2L, 0L)),
      "case/punct-only variants must be distance-0 pairs")
  }

  test("capped pairs: both-endpoint rank bound, deterministic tie-break") {
    // star: doc 1 pairs with 2 and 3 (dist 0 each); docs 2,3 pair with
    // each other too — k=1 keeps exactly one pair per endpoint, ties
    // broken by partner id: (1,2) survives; (1,3) loses at endpoint 1,
    // (2,3) loses at both
    val dir = java.nio.file.Files
      .createTempDirectory("graft_editcap").toString
    import spark.implicits._
    Seq(1L -> base, 2L -> base, 3L -> base)
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = EditDedup.editPairsCapped(spark, dir, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 0L)))
    // k=2 keeps everything (3 pairs, each within rank 2 at both ends)
    val k2 = EditDedup.editPairsCapped(spark, dir, k = 2).count()
    assert(k2 === 3L)
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

  test("gate corpus: blocked engine equals the ALL-PAIRS banded-DP reference") {
    val rows = spark.read.parquet(s"${sf()}/documents.parquet")
    val got = EditDedup.editPairsOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // all-pairs reference, driver-side: every length-compatible pair
    // through a BANDED DP (band MaxDist+1, same as the engine's 3-arg
    // levenshtein) — no blocking, so this also pins blocking recall
    val texts = rows.selectExpr("doc_id",
        "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')) AS nt")
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    def banded(a: String, b: String, band: Int): Int = {
      if (math.abs(a.length - b.length) > band) return -1
      var prev = Array.tabulate(b.length + 1)(j => if (j <= band) j else Int.MaxValue / 2)
      for (i <- 1 to a.length) {
        val lo = math.max(1, i - band)
        val hi = math.min(b.length, i + band)
        val cur = Array.fill(b.length + 1)(Int.MaxValue / 2)
        if (i - band <= 0) cur(0) = i
        for (j <- lo to hi)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
      if (prev(b.length) > band) -1 else prev(b.length)
    }
    val expected = (for {
      ((a, na), ai) <- texts.zipWithIndex.iterator
      (b, nb) <- texts.drop(ai + 1).iterator
      theta = math.min(64, (na.length + nb.length) / 20)
      if math.abs(na.length - nb.length) <= theta
      d = banded(na, nb, 64)
      if d >= 0 && d <= theta
    } yield (a, b, d.toLong)).toSet
    assert(got === expected)
    assert(got.nonEmpty, "gate corpus should contain edit near-dups")
  }
}
