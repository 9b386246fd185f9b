package graft.text

import graft.SparkSpec

class ChunkingSpec extends SparkSpec {

  private def writeFixture(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("chunk counts, boundaries and coverage on controlled token counts") {
    val dir = "/tmp/graft_chunk_fixture"
    val w = 64; val s = 48
    def doc(n: Int): String = (0 until n).map(i => s"t${('a' + i % 26).toChar}x").mkString(" ")
    // token counts straddling every boundary of the count rule
    val counts = Seq(0, 1, s, w, w + 1, w + s, w + s + 1, 2 * w, 300)
    writeFixture(dir, counts.zipWithIndex.map { case (n, i) => (i.toLong, doc(n)) })
    val out = Chunking.chunks(spark, dir, w, s).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1)
    counts.zipWithIndex.foreach { case (n, i) =>
      val chunks = out.getOrElse(i.toLong, Array.empty).sortBy(_._2)
      val expected =
        if (n == 0) 0
        else if (n <= w) 1
        else 1 + (n - w + s - 1) / s
      assert(chunks.length === expected, s"doc with $n tokens: ${chunks.length} chunks")
      chunks.zipWithIndex.foreach { case ((_, cid, start, nt, text), idx) =>
        assert(cid === idx.toLong)
        assert(start === idx.toLong * s)
        assert(nt === math.min(w, n - idx * s).toLong)
        assert(text.split(' ').length === nt, s"chunk token count mismatch")
      }
      if (n >= 1) {
        // coverage: last chunk must reach the final token
        val last = chunks.last
        assert(last._3 + last._4 === n.toLong, "last chunk must end at the last token")
        // every chunk beyond the first adds ≥1 new token
        chunks.sliding(2).foreach {
          case Array(a, b) =>
            assert(b._3 + b._4 > a._3 + a._4, "chunk adds no new tokens")
          case _ => ()
        }
      }
    }
  }

  test("the chunking plan is map-only: no Exchange, pruned scan") {
    val qe = Chunking.chunks(spark, sf()).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "chunking must not shuffle — it is a per-document explode")
    // column pruning must reach the parquet scan: only doc_id + text
    val scan = qe.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("doc_id") && scan.contains("text"))
    assert(!scan.contains("n_chars"),
      "scan reads columns the query never uses")
  }

  test("id-stream chunks cover every position with the right membership and reassemble exactly") {
    val out = Chunking.chunkIds(spark, sf(), 64, 48).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val ids = graft.text.Bpe.encodeIds(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byDoc = ids.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val w = 64; val s = 48
    out.groupBy(_._1).foreach { case (doc, rows) =>
      val seq = byDoc(doc); val n = seq.length
      val expectedChunks = if (n <= w) 1 else 1 + (n - w + s - 1) / s
      val chunks = rows.groupBy(_._2)
      assert(chunks.keySet === (0L until expectedChunks.toLong).toSet,
        s"doc $doc: chunk ids ${chunks.keySet} vs $expectedChunks expected")
      chunks.foreach { case (cid, members) =>
        val start = cid.toInt * s
        val len = math.min(w, n - start)
        val got = members.sortBy(_._3)
        assert(got.map(_._3.toInt) === (0 until len).toSeq,
          s"doc $doc chunk $cid positions")
        // reassembly: chunk members are exactly the global slice
        assert(got.map(_._4).toSeq === seq.slice(start, start + len).toSeq,
          s"doc $doc chunk $cid ids diverge from the global stream")
      }
    }
    // every doc with ids produced chunks
    assert(out.map(_._1).toSet === byDoc.filter(_._2.nonEmpty).keySet)
  }

  test("streaming ingest: foreachBatch chunking equals the batch operator") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, String)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (ds: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.synchronized {
          acc ++= Chunking.chunksOf(ds).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
              r.getString(4)))
        }
        ()
      }.start()
    try {
      docs.grouped(120).foreach { g => input.addData(g.toSeq); q.processAllAvailable() }
    } finally q.stop()
    val batch = Chunking.chunks(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sorted.toSeq
    assert(acc.sorted.toSeq === batch,
      "micro-batched chunking must equal the one-shot operator")
  }

  test("overlapping regions agree between consecutive chunks on the corpus") {
    val out = Chunking.chunks(spark, sf(), 64, 48).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
      .groupBy(_._1).values
    var checked = 0
    out.foreach { chunks =>
      val byId = chunks.sortBy(_._2).map(_._3.split(' ').toSeq).toSeq
      byId.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val (a, b) = (pair(0), pair(1))
          // a covers [i*48, i*48+64); b starts at (i+1)*48 → overlap 16
          if (a.length == 64) {
            assert(a.drop(48) === b.take(16), "overlap tokens disagree")
            checked += 1
          }
        }
      }
    }
    info(s"checked $checked overlapping boundaries")
    assert(checked > 0, "corpus produced no overlapping chunk pairs")
  }
}
