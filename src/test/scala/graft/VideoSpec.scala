package graft

import graft.llm.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The RIFF/AVI parse must read the REAL bytes (not replay the fixture
  * arithmetic), survive adversarial containers, and the frame sampler
  * must point at genuine movi chunk data.
  */
class VideoSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("aviMeta reads the avih fields off the real bytes") {
    val blob = Multimodal.videoBlob(37L, "hello world tokens".getBytes("UTF-8"))
    // id=37: w=37%16+1=6, h=37%12+1=2, nf=37%7+1=3, uspf=20000+2*10000=40000
    assert(Multimodal.aviMeta(blob).contains((6L, 2L, 3L, 40000L, 1L)))
  }

  test("aviMeta rejects adversarial containers instead of wrapping") {
    val good = Multimodal.videoBlob(5L, "abc def".getBytes("UTF-8"))
    assert(Multimodal.aviMeta("RIFFxxxxWAVE".getBytes("UTF-8")) == None)
    assert(Multimodal.aviMeta(good.take(60)) == None) // truncated mid-hdrl
    // corrupt LIST size: walk stops, no crash, no garbage meta
    val corrupt = good.clone()
    corrupt(16) = 0xff.toByte; corrupt(17) = 0xff.toByte
    corrupt(18) = 0xff.toByte; corrupt(19) = 0x7f.toByte
    assert(Multimodal.aviMeta(corrupt) == None)
    assert(Multimodal.aviFrameChunks(corrupt).isEmpty)
  }

  test("frame chunks carry the real offsets and the sampler checksums real bytes") {
    val payload = "the quick brown fox jumps".getBytes("UTF-8")
    val id = 100L // w=5, h=5, nf=3, stride=((15+3)/4)*4=16, fsz=80
    val blob = Multimodal.videoBlob(id, payload)
    val frames = Multimodal.aviFrameChunks(blob)
    assert(frames.map(_._1) == List(0, 1, 2))
    assert(frames.map(_._2) == List(108, 108 + 88, 108 + 176),
      s"offsets must match the pure-arithmetic layout: $frames")
    assert(frames.forall(_._3 == 80))
    // the sampled checksum equals the cycled-payload hand computation
    val out = Multimodal.videoFrameSample(mkDocs(Seq((id, new String(payload, "UTF-8")))))
      .collect().map(r => r.getLong(1) -> r.getLong(4)).toMap
    def want(f: Int): Long = (0 until 80).map { j =>
      (j + 1L) * (payload(((f * 80 + j) % payload.length)) & 0xff)
    }.sum
    assert(out.keySet == Set(0L, 1L, 2L)) // nf=3 < k=4: stride 1, all frames
    (0 to 2).foreach(f => assert(out(f.toLong) == want(f), s"frame $f"))
  }

  test("frame ordinals skip non-frame movi chunks (JUNK padding does not shift frame_idx)") {
    // hand-build a movi list of [JUNK, 00db, 00db] — legal, common padding
    val fsz = 8
    val junk = 12
    val moviSz = 4 + (8 + junk) + 2 * (8 + fsz)
    val total = 12 + (8 + 4 + 8 + 56) + 8 + moviSz
    val bb = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(total - 8).put("AVI ".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(4 + 8 + 56).put("hdrl".getBytes("US-ASCII"))
    bb.put("avih".getBytes("US-ASCII")).putInt(56)
      .putInt(40000).putInt(0).putInt(0).putInt(0).putInt(2).putInt(0).putInt(1).putInt(0)
      .putInt(2).putInt(1).putInt(0).putInt(0).putInt(0).putInt(0)
    bb.put("LIST".getBytes("US-ASCII")).putInt(moviSz).put("movi".getBytes("US-ASCII"))
    bb.put("JUNK".getBytes("US-ASCII")).putInt(junk).put(new Array[Byte](junk))
    bb.put("00db".getBytes("US-ASCII")).putInt(fsz).put(Array.fill(fsz)(1.toByte))
    bb.put("00db".getBytes("US-ASCII")).putInt(fsz).put(Array.fill(fsz)(2.toByte))
    val frames = Multimodal.aviFrameChunks(bb.array())
    assert(frames.map(_._1) == List(0, 1),
      s"JUNK must not shift frame ordinals: $frames")
    assert(frames.map(f => bb.array()(f._2)) == List(1.toByte, 2.toByte),
      "offsets must point at the frame chunks, not the padding")
  }

  test("video phash: exact copies dedup at d=0; banding is EXACT vs brute force") {
    import graft.llm.SimHash
    val rnd = new scala.util.Random(3)
    val vocab = Vector("p", "q", "r", "s", "t", "u", "v", "w")
    def text() = (0 until 60).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    // ids congruent mod 16*12*7*5 share geometry/timing; copies share text
    val base = text()
    val rows = (0L until 40L).map(i => (i, text())) :+
      (100L, base) :+ (100L + 6720L, base) // same id-derived geometry, same text
    val docs = mkDocs(rows)
    val prints = Multimodal.videoPhash(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(prints.length == rows.size)
    val pm = prints.toMap
    assert(pm(100L) == pm(6820L), "identical geometry+payload must print equal")
    val verdicts = Multimodal.videoPhashDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(verdicts.exists(v => v._1 == 6820L && v._2 == 100L && v._3 == 0L),
      s"planted copy must dedup at d=0: ${verdicts.toSeq}")
    // 4th-consumer pigeonhole check: banding == brute force on these prints
    val brute = (for {
      (a, pa) <- prints; (b, pb) <- prints if b < a
      d = java.lang.Long.bitCount(pa ^ pb) if d <= 2
    } yield (a, b, d)).groupBy(_._1).map { case (id, cs) =>
      val best = cs.minBy(c => (c._3, c._2)); (id, best._2, best._3.toLong)
    }.toSet
    assert(verdicts.toSet == brute, "banding must equal brute force")
  }

  test("video phash: prints respond to frame content, not only geometry") {
    // same doc_id-derived geometry (ids equal mod 6720), different text —
    // random word streams so the cell/mean relations genuinely differ
    // (periodic fixtures with the same period can alias to one print)
    val rnd = new scala.util.Random(9)
    val vocab = ('a' to 'z').map(_.toString)
    def text() = (0 until 80).map(_ =>
      vocab(rnd.nextInt(vocab.length)) * (1 + rnd.nextInt(4))).mkString(" ")
    val rows = Seq((11L, text()), (11L + 6720L, text()))
    val pm = Multimodal.videoPhash(mkDocs(rows)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(pm(11L) != pm(6731L),
      "different payloads under the same geometry must differ")
  }

  test("sampling stride: many frames cut to k spaced indices, few frames keep all") {
    import org.apache.spark.sql.functions._
    // doc_id 6: nf = 7 -> s = 7 div 4 = 1 -> frames 0,1,2,3 (capped at k)
    // doc_id 0: nf = 1 -> frame 0 only
    val out = Multimodal.videoFrameSample(mkDocs(Seq((6L, "x y z"), (0L, "x"))))
      .groupBy("doc_id").agg(collect_set(col("frame_idx")).as("fs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(out(6L) == Set(0L, 1L, 2L, 3L))
    assert(out(0L) == Set(0L))
  }
}
