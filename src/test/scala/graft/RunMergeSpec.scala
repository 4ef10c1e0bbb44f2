package graft

import graft.core.Varint
import graft.spark.{DocTextRow, IndexBuilder, PostingBlockRow, TermDocRow}
import graft.text.Analyzer
import org.scalatest.funsuite.AnyFunSuite

/** The run-combine build path (combineRuns → sort runs → mergeRuns) must
  * be decode-equivalent to the reference per-(term,doc) path (TermDocRow →
  * sort → encodeBlocks): same postings, same meta, same dl strips, same
  * block invariants — only block BOUNDARIES may differ (runs merge at run
  * granularity). Exercised across flush budgets and block caps.
  */
class RunMergeSpec extends AnyFunSuite {

  private val an = Analyzer()

  /** deterministic small corpus: repeated vocabulary so terms span docs. */
  private def docs(n: Int): Seq[DocTextRow] = {
    val words = Seq("harbor", "gull", "ledger", "tide", "lantern", "kelp",
      "mooring", "quay", "beacon", "trawler")
    (0 until n).map { i =>
      val body = (0 until 12 + i % 9).map(j => words((i + j * j) % words.length)).mkString(" ")
      DocTextRow(i.toLong * 3 + 1, s"web:doc$i", "", body) // gappy docIds
    }
  }

  /** old path: per-doc TermDocRows, sorted, encodeBlocks. */
  private def oldBlocks(ds: Seq[DocTextRow], bits: Int, cap: Int): Seq[PostingBlockRow] = {
    val cache = new graft.core.DocTokenizer.CodeCache(an)
    val rows = ds.flatMap { d =>
      val di = graft.core.DocTokenizer.indexGrouped(an, d.header,
        IndexBuilder.pagesOf(d.body, 0, formFeed = false), cache)
      val byTerm = scala.collection.mutable.LinkedHashMap.empty[String, graft.core.LongVec]
      di.terms.zipWithIndex.foreach { case (t, i) =>
        byTerm.getOrElseUpdate(t, new graft.core.LongVec(8)) += di.coords(i)
      }
      val bucket = (d.docId >> bits).toInt
      TermDocRow(IndexBuilder.MetaTerm, bucket, d.docId, 0, di.docLen,
        IndexBuilder.encodeMetaPayload(d.name, di.pageIds, di.pageEnds)) +:
        byTerm.toSeq.map { case (t, v) =>
          val arr = v.toArray
          TermDocRow(t, bucket, d.docId, arr.length, di.docLen, Varint.encode(arr))
        }
    }
    IndexBuilder.encodeBlocks(
      rows.sortBy(r => (r.term, r.bucket, r.docId)).iterator, cap).toSeq
  }

  /** new path: combineRuns per "partition", runs sorted, mergeRuns. */
  private def newBlocks(parts: Seq[Seq[DocTextRow]], bits: Int, cap: Int): Seq[PostingBlockRow] = {
    val runs = parts.flatMap(p =>
      IndexBuilder.combineRuns(p.iterator, an, 0, formFeed = false, bits, cap).toSeq)
    IndexBuilder.mergeRuns(
      runs.sortBy(r => (r.term, r.bucket, r.firstDocId)).iterator, cap).toSeq
  }

  /** decode a block seq into per-(term,bucket) full posting state. */
  private def decoded(blocks: Seq[PostingBlockRow])
  : Map[(String, Int), (Seq[Long], Seq[Long], Seq[Seq[Long]], Seq[Long])] = {
    blocks.groupBy(b => (b.term, b.bucket)).view.mapValues { bs =>
      val sorted = bs.sortBy(_.firstDocId)
      val docIds = Seq.newBuilder[Long]
      val tfs = Seq.newBuilder[Long]
      val positions = Seq.newBuilder[Seq[Long]]
      val dls = Seq.newBuilder[Long]
      sorted.foreach { b =>
        val ids = Varint.decode(b.docDeltas, b.nDocs)
        docIds ++= ids
        if (b.term == IndexBuilder.DlStripTerm) {
          val r = new Varint.Reader(b.dls)
          (0 until b.nDocs).foreach(_ => dls += r.nextRaw())
        } else if (b.term == IndexBuilder.MetaTerm) {
          val lr = new Varint.Reader(b.tfs)
          val lens = (0 until b.nDocs).map(_ => lr.nextRaw())
          tfs ++= lens
          val dr = new Varint.Reader(b.dls)
          (0 until b.nDocs).foreach(_ => dls += dr.nextRaw())
          // meta payload slices per doc
          var off = 0
          lens.foreach { l =>
            positions += b.posDeltas.slice(off, off + l.toInt).map(_.toLong).toSeq
            off += l.toInt
          }
          assert(off == b.posDeltas.length, s"meta payload length drift in ${b.term}")
        } else {
          val tr = new Varint.Reader(b.tfs)
          val tfVals = (0 until b.nDocs).map(_ => tr.nextRaw())
          tfs ++= tfVals
          val pr = new Varint.Reader(b.posDeltas)
          tfVals.foreach { tf =>
            pr.rebase(0L)
            positions += (0 until tf.toInt).map(_ => pr.next())
          }
          // block invariants
          assert(b.nPostings == tfVals.sum, s"nPostings drift for ${b.term}")
          assert(b.maxTf == tfVals.max, s"maxTf drift for ${b.term}")
        }
      }
      (docIds.result(), tfs.result(), positions.result(), dls.result())
    }.toMap
  }

  private def check(n: Int, bits: Int, cap: Int, parts: Int,
                    flushBytes: Option[Long] = None): Unit = {
    val ds = docs(n)
    val grouped = ds.grouped(math.max(1, ds.size / parts)).toSeq
    val old = oldBlocks(ds, bits, cap)
    val neu = flushBytes match {
      case Some(fb) =>
        sys.props("graft.runflush.maxbytes") = fb.toString
        try newBlocks(grouped, bits, cap)
        finally sys.props.remove("graft.runflush.maxbytes")
      case None => newBlocks(grouped, bits, cap)
    }
    val a = decoded(old)
    val b = decoded(neu)
    assert(a.keySet == b.keySet, "term/bucket key sets differ")
    a.keySet.foreach { k =>
      assert(a(k) == b(k), s"decoded state differs for $k")
    }
    // block caps hold on the merged side too (strips exempt, as in the old path)
    neu.filterNot(_.term == IndexBuilder.DlStripTerm)
      .foreach(bl => assert(bl.nDocs <= cap, s"block over cap: ${bl.term} ${bl.nDocs}"))
  }

  test("run merge == encodeBlocks: single partition, one bucket") {
    check(n = 30, bits = 10, cap = 1 << 14, parts = 1)
  }

  test("run merge == encodeBlocks: multi-partition, multi-bucket") {
    check(n = 120, bits = 4, cap = 1 << 14, parts = 5)
  }

  test("run merge == encodeBlocks: tiny block cap forces splits and merges") {
    check(n = 120, bits = 6, cap = 4, parts = 3)
  }

  test("run merge == encodeBlocks: forced tiny flush budget (many runs per bucket)") {
    check(n = 120, bits = 5, cap = 1 << 14, parts = 2, flushBytes = Some(1L))
  }

  test("run merge == encodeBlocks: bucket boundary straddles partitions") {
    // partition split right inside a bucket: runs for one (term,bucket)
    // arrive from two partitions and must splice in firstDocId order
    val ds = docs(64)
    val grouped = Seq(ds.take(21), ds.slice(21, 43), ds.drop(43))
    val old = oldBlocks(ds, 5, 1 << 14)
    val neu = newBlocks(grouped, 5, 1 << 14)
    assert(decoded(old) == decoded(neu))
  }

  test("merge throws on out-of-order runs (delta-stream corruption guard)") {
    val ds = docs(20)
    val runs = IndexBuilder.combineRuns(ds.iterator, an, 0, formFeed = false, 10).toSeq
    val shuffled = runs.sortBy(r => (r.term, r.bucket, -r.firstDocId)) // descending
    val dup = runs.filter(_.term != IndexBuilder.MetaTerm)
    if (dup.size >= 2 || runs.size >= 2) {
      // force two runs of the same (term,bucket) in the wrong order by
      // splitting the corpus and sorting firstDocId DESC
      val two = Seq(ds.take(10), ds.drop(10)).flatMap(p =>
        IndexBuilder.combineRuns(p.iterator, an, 0, formFeed = false, 10).toSeq)
      val sameKey = two.groupBy(r => (r.term, r.bucket)).values.find(_.size >= 2)
      sameKey.foreach { rs =>
        val bad = rs.sortBy(-_.firstDocId)
        assertThrows[IllegalStateException] {
          IndexBuilder.mergeRuns(bad.iterator, 1 << 14).toSeq
        }
      }
      assert(sameKey.nonEmpty, "fixture must produce a mergeable key")
    }
    assert(shuffled.nonEmpty)
  }
}
