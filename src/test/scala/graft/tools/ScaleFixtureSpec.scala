package graft.tools

import graft.SparkSpec

class ScaleFixtureSpec extends SparkSpec {

  test("replicaText is a pure function of (doc_id, replica, inputs)") {
    val a = ScaleFixture.replicaText(42L, 2, "the quick brown fox jumps over the lazy dog", "partner text here")
    val b = ScaleFixture.replicaText(42L, 2, "the quick brown fox jumps over the lazy dog", "partner text here")
    assert(a === b)
    // distinct replicas of the same doc differ
    val c = ScaleFixture.replicaText(42L, 4, "the quick brown fox jumps over the lazy dog", "partner text here")
    assert(a !== c)
  }

  test("concat replicas (r % 3 == 0) contain both source texts verbatim") {
    val t = ScaleFixture.replicaText(7L, 3, "alpha beta gamma", "delta epsilon")
    assert(t === "alpha beta gamma delta epsilon")
  }

  test("mutation replicas keep long shared runs (span-dedup has real work)") {
    // 60 distinct words; rotation keeps contiguous runs, substitution
    // hits ~1/23 of positions — so a >= 10-word untouched run from the
    // original must survive somewhere in the mutant
    val words = (0 until 60).map(i => s"tok${('a' + i / 26).toChar}${('a' + i % 26).toChar}").toArray
    val mutant = ScaleFixture.replicaText(3L, 1, words.mkString(" "), "")
    val mwords = mutant.split(" ")
    assert(mwords.length === words.length)
    // longest run of consecutive-in-original words inside the mutant
    val pos = words.zipWithIndex.toMap
    var best = 0; var cur = 0; var prev = -2
    mwords.foreach { w =>
      pos.get(w) match {
        case Some(p) if p == prev + 1 => cur += 1; prev = p
        case Some(p) => cur = 1; prev = p
        case None => cur = 0; prev = -2
      }
      best = math.max(best, cur)
    }
    assert(best >= 10, s"expected a shared run >= 10 words, got $best")
  }

  test("scaledDocs: factor x rows, distinct ids, replica-0 rows byte-identical") {
    import spark.implicits._
    val dir = "/tmp/graft_scale_fixture_in"
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web", 45L),
      (1L, "uno dos tres cuatro cinco seis siete ocho", "es", "web", 41L),
      (2L, "eins zwei drei vier fuenf sechs sieben acht", "de", "book", 43L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = ScaleFixture.scaledDocs(spark, dir, factor = 4).collect()
    assert(out.length === 12)
    assert(out.map(_.doc_id).distinct.length === 12)
    val originals = out.filter(_.doc_id < ScaleFixture.IdStride).sortBy(_.doc_id)
    assert(originals.map(d => (d.doc_id, d.text)).toSeq === Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "uno dos tres cuatro cinco seis siete ocho"),
      (2L, "eins zwei drei vier fuenf sechs sieben acht")))
    // n_chars recomputed for every derived row
    out.foreach(d => assert(d.n_chars === d.text.length.toLong))
    // determinism: a second build is identical
    val again = ScaleFixture.scaledDocs(spark, dir, factor = 4).collect()
    assert(out.map(d => (d.doc_id, d.text)).sortBy(_._1).toSeq ===
      again.map(d => (d.doc_id, d.text)).sortBy(_._1).toSeq)
  }
}
