package graft

import graft.llm.{Curation, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking: the boundary stream must be LOCAL (a prefix
  * edit re-aligns after one gear window — the property that makes CDC
  * dedup catch shifted duplicates), the plan must replay the naive
  * per-doc reference exactly, and the dedup profile must mark exact
  * copies as fully duplicated.
  */
class CdcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def tok(text: String): Vector[String] =
    text.toLowerCase.split("\\W+").filterNot(_.isEmpty).toVector

  /** Naive reference: the [[Curation.hash60]] kernel re-derived via
    * MessageDigest, the gear recursion run SEQUENTIALLY (h = 2h + g mod
    * 2^bits) — so agreement proves the closed-form window in the plan IS
    * the recursion. */
  private def gear(t: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(("cdc:" + t).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) & ((1L << Dedup.CdcMaskBits) - 1)
  }

  private def naiveChunks(w: Vector[String]): Seq[(Long, Long, String)] = {
    val m = (1L << Dedup.CdcMaskBits) - 1
    // the sequential recursion h_i = 2*h_{i-1} + g_i mod 2^bits over
    // i = 1..n, cutting after i whenever h_i = 0 (interior cuts only)
    var h = 0L
    val bounds = collection.mutable.ArrayBuffer(0)
    w.indices.foreach { i0 =>
      h = (2 * h + gear(w(i0))) & m
      if (h == 0 && i0 + 1 < w.size) bounds += (i0 + 1)
    }
    bounds += w.size
    bounds.zip(bounds.tail).zipWithIndex.map { case ((lo, hi), k) =>
      val text = w.slice(lo, hi).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hash = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (k + 1L, (hi - lo).toLong, hash)
    }.toSeq
  }

  test("cdcChunks matches the sequential gear recursion on random corpora") {
    val rnd = new scala.util.Random(77)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val rows = (0L until 30L).map { id =>
      (id, (0 until (1 + rnd.nextInt(90)))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val got = Dedup.cdcChunks(mkDocs(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(c => (c._2, c._3, c._4)).toSeq).toMap
    rows.foreach { case (id, text) =>
      val want = naiveChunks(tok(text)).map { case (k, n, h) => (k, n, h) }
      assert(got(id) == want, s"doc $id text=$text")
    }
    // non-degenerate: some doc actually split
    assert(got.values.exists(_.size > 1), "fixture must produce interior cuts")
  }

  test("CDC chunking is local: a prefix insertion preserves every chunk past one window") {
    val rnd = new scala.util.Random(5)
    val vocab = Vector("k", "l", "m", "n", "o", "p", "q", "r")
    val body = (0 until 400).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val shifted = "x1 x2 x3 x4 x5 x6 x7 " + body // 7-token insertion
    val df = mkDocs(Seq((1L, body), (2L, shifted)))
    val ch = Dedup.cdcChunks(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val a = ch.filter(_._1 == 1L).sortBy(_._2)
    val b = ch.filter(_._1 == 2L).map(_._4).toSet
    // chunks of the original that start at token >= CdcMaskBits (the gear
    // window has fully re-aligned) must ALL reappear in the shifted doc
    val starts = a.scanLeft(0L)((acc, c) => acc + c._3).dropRight(1)
    val aligned = a.zip(starts).collect {
      case (c, st) if st >= Dedup.CdcMaskBits => c._4
    }
    assert(aligned.nonEmpty, "fixture must have chunks past the first window")
    assert(aligned.forall(b.contains),
      s"${aligned.count(!b.contains(_))} of ${aligned.size} aligned chunks lost")
    // the contrast: fixed-stride windows shift by 7 and share NOTHING
    val strideHashes = Curation.chunk(df).collect()
      .map(r => (r.getLong(0), r.getString(3)))
    val sa = strideHashes.filter(_._1 == 1L).map(_._2).toSet
    val sb = strideHashes.filter(_._1 == 2L).map(_._2).toSet
    assert(sa.intersect(sb).isEmpty,
      "stride chunking must miss the shifted duplicate (the case CDC exists for)")
  }

  test("cdcDedupAgainst: history copies gate, intra-snapshot dups do not") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    def text() = (0 until 150).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val histTexts = (0 until 4).map(_ => text())
    val hist = mkDocs(histTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    val incoming = mkDocs(Seq(
      (100L, histTexts.head), // exact copy of history doc 0
      (101L, text()),         // fresh
      (102L, "zz " * 80 + "yy"), (103L, "zz " * 80 + "yy"))) // intra-snapshot pair
    val out = Dedup.cdcDedupAgainst(Dedup.cdcChunks(hist), incoming).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    assert(out(100L)._3 == 10000L, s"history copy must gate fully: $out")
    assert(out(101L)._3 == 0L, s"fresh doc must pass clean: $out")
    // incremental semantics: dups WITHIN the snapshot are the batch
    // keep-one's job, not the history gate's
    assert(out(102L)._3 == 0L && out(103L)._3 == 0L,
      s"intra-snapshot dups must not gate against history: $out")
  }

  test("cdcHotChunks: thrice-planted chunks report count 3, 3 docs, first occurrence doc 5") {
    val rnd = new scala.util.Random(31)
    // wide vocab so random docs do not share chunk content by accident
    val vocab = (0 until 200).map(i => s"hw$i")
    def text() = (0 until 130).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val planted = text()
    val rows = Seq((5L, planted), (9L, planted), (12L, planted)) ++
      (20L until 26L).map(id => (id, text()))
    val hot = Dedup.cdcHotChunks(mkDocs(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(hot.nonEmpty && hot.forall(_._2 >= 2))
    // the planted text's chunks: 3 occurrences across 3 docs, first in doc 5
    val plantedRows = hot.filter(_._2 == 3L)
    assert(plantedRows.nonEmpty, s"planted chunks must surface: ${hot.toSeq}")
    assert(plantedRows.forall(h => h._3 == 3L && h._4 == 5L && h._5 >= 1L),
      s"planted chunks must carry (3 docs, first_doc 5): ${plantedRows.toSeq}")
  }

  test("cdcDedup: an exact copy is fully duplicated, the original fully clean") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("s", "t", "u", "v", "w")
    val texts = (0 until 6).map(i =>
      (0 until 120).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (100L, texts.head) // exact copy of doc 0
    val out = Dedup.cdcDedup(mkDocs(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(5))).toMap
    assert(out(100L)._2 == out(100L)._1, s"copy must dup every chunk: $out")
    assert(out(100L)._3 == 10000L)
    assert(out(0L)._2 == 0L && out(0L)._3 == 0L,
      s"the first occurrence keeps every chunk: ${out(0L)}")
  }
}
