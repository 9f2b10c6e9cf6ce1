package graft

import graft.functions.Log2Fix
import graft.llm.{Dedup, Mining}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential tests: each mining operator vs a naive
  * driver-side Scala reference on small random corpora (tiny vocab, doc
  * lengths 0..12 so empty/one-token/short-doc edges are hit constantly).
  * The references re-implement the SPEC (same integer arithmetic, same
  * Log2Fix kernel, same tie-breaks) with none of the distributed plan
  * machinery — so a divergence is a plan bug, not a formula choice.
  */
class MiningFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tok(text: String): Vector[String] =
    text.toLowerCase.split("\\W+").filterNot(_.isEmpty).toVector

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** The signed-log2 reference — mirrors VectorExpressions.slog2_fix's
    * sign convention (the ONE definition both engines replay). */
  private def slog(num: Long, den: Long): Long =
    if (num >= den) Log2Fix.eval(num, den) else -Log2Fix.eval(den, num)

  /** Random docs with planted copies (some docs repeat an earlier doc's
    * text verbatim, the substrate for dup spans / collocation mass). */
  private def corpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val n = 4 + rnd.nextInt(20)
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until n).foreach { i =>
      if (i > 0 && rnd.nextInt(4) == 0) texts += texts(rnd.nextInt(i))
      else texts += (0 until rnd.nextInt(13))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq
  }

  test("collocations matches the naive reference on random corpora") {
    for (seed <- 1 to 6) {
      val rows = corpus(seed)
      val toks = rows.map { case (_, t) => tok(t) }
      val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bigrams = toks.flatMap(w => w.zip(w.drop(1)).map { case (x, y) => s"$x $y" })
      val bcnt = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val nTok = toks.map(_.size.toLong).sum
      val nBig = toks.map(w => math.max(w.size - 1, 0).toLong).sum
      val want = bcnt.toSeq
        .filter(_._2 >= Mining.CollocMinCount)
        .map { case (g, cxy) =>
          val Array(x, y) = g.split(" ")
          (g, cxy, slog(cxy * nTok, uni(x) * uni(y)) + Log2Fix.eval(nTok, nBig))
        }
        .sortBy { case (g, _, p) => (-p, g) }
        .take(Mining.CollocTopK)
      val got = Mining.collocations(mkDocs(rows)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"seed=$seed rows=$rows")
    }
  }

  test("lm2Score matches the naive reference on random corpora") {
    for (seed <- 11 to 16) {
      val rows = corpus(seed)
      val toks = rows.map { case (id, t) => id -> tok(t) }.toMap
      val uni = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val allBg = toks.values.flatMap(w => w.zip(w.drop(1)).map { case (x, y) => s"$x $y" })
      val bcnt = allBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val v = uni.size.toLong
      // hapax pre-filter spec: grams below HapaxMin fall to the add-one
      // floor den = 1 (c12 treated as 0)
      def nll(g: String): Long = {
        val c1 = uni(g.split(" ")(0))
        val den = if (bcnt(g) >= Mining.HapaxMin) bcnt(g) + 1 else 1L
        (Log2Fix.eval(c1 + v, den) * Log2Fix.Ln2E6) >> 20
      }
      val want = toks.toSeq.flatMap { case (id, w) =>
        val bg = w.zip(w.drop(1)).map { case (x, y) => s"$x $y" }
        if (bg.isEmpty) None
        else Some((id, bg.size.toLong, bg.map(nll).sum / bg.size))
      }.sortBy(_._1)
      val df = mkDocs(rows)
      val got = Mining.lm2Score(df, Mining.gramCounts(df)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed rows=$rows")
    }
  }

  test("knScore matches the naive reference on random corpora") {
    for (seed <- 41 to 46) {
      val rows = corpus(seed)
      val toks = rows.map { case (id, t) => id -> tok(t) }.toMap
      val uni = toks.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val allBg = toks.values.flatMap(w => w.zip(w.drop(1)).map { case (x, y) => s"$x $y" })
      val kept = allBg.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= Mining.HapaxMin).toMap
      val n1u = kept.keys.toSeq.groupBy(_.split(" ")(0)).view.mapValues(_.size.toLong).toMap
      val n1w = kept.keys.toSeq.groupBy(_.split(" ")(1)).view.mapValues(_.size.toLong).toMap
      val v = uni.size.toLong
      val cc = kept.size.toLong + v
      if (uni.nonEmpty) {
        val maxc = uni.values.max
        def bl(x: Long) = 63 - java.lang.Long.numberOfLeadingZeros(x)
        val sh = math.max(bl(4 * maxc) + bl(cc) - 60, 0)
        val cq = math.max(cc >> sh, 1L)
        def nll(g: String): Long = {
          val Array(x, y) = g.split(" ")
          val a = math.max(4 * kept.getOrElse(g, 0L) - 3, 0L)
          val back = (3L * (n1u.getOrElse(x, 0L) + 1) * (n1w.getOrElse(y, 0L) + 1)) >> sh
          val num = math.max(a * cq + back, 1L)
          val den = 4L * uni(x) * cq
          if (den >= num) (Log2Fix.eval(den, num) * Log2Fix.Ln2E6) >> 20 else 0L
        }
        val want = toks.toSeq.flatMap { case (id, w) =>
          val bg = w.zip(w.drop(1)).map { case (x, y) => s"$x $y" }
          if (bg.isEmpty) None
          else Some((id, bg.size.toLong, bg.map(nll).sum / bg.size))
        }.sortBy(_._1)
        val df = mkDocs(rows)
        val got = Mining.knScore(df, Mining.gramCounts(df)).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
        assert(got == want, s"seed=$seed rows=$rows")
      }
    }
  }

  test("heavyTokens is exact on skewed corpora with vocab far above k (the MG prune engages)") {
    for (seed <- 51 to 56) {
      val rnd = new scala.util.Random(seed)
      val k = 8
      // zipf-ish: a few hot words + a long hapax tail, vocab >> k so the
      // per-partition MG state genuinely evicts
      val hot = Vector("h1", "h2", "h3")
      val rows = (0L until 40L).map { id =>
        val words = (0 until 30).map { _ =>
          if (rnd.nextInt(3) > 0) hot(rnd.nextInt(hot.length))
          else s"rare${rnd.nextInt(500)}"
        }
        (id, words.mkString(" "))
      }
      val all = rows.flatMap { case (_, t) => tok(t) }
      val n = all.size.toLong
      val want = all.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > n }.toMap
      assert(want.nonEmpty, "fixture must have heavy hitters")
      val got = Mining.heavyTokens(mkDocs(rows), k).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"seed=$seed n=$n")
    }
  }

  test("dupSpans matches the naive reference on random corpora with planted copies") {
    val L = Mining.SpanGram
    for (seed <- 21 to 26) {
      val rows = corpus(seed)
      val toks = rows.map { case (id, t) => id -> tok(t) }
      val grams = toks.flatMap { case (id, w) =>
        w.sliding(L).filter(_.size == L).zipWithIndex
          .map { case (g, i) => (id, i + 1L, g.mkString(" ")) }
      }
      val cnt = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val want = toks.flatMap { case (id, w) =>
        val starts = grams.filter(g => g._1 == id && cnt(g._3) >= 2).map(_._2).sorted
        if (starts.isEmpty) None
        else {
          // merge contiguous coverage [p, p+L-1]
          val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          starts.foreach { p =>
            if (spans.nonEmpty && p <= spans.last._2 + 1)
              spans(spans.length - 1) = (spans.last._1, math.max(spans.last._2, p + L - 1))
            else spans += ((p, p + L - 1))
          }
          val dupTok = spans.map { case (s, e) => e - s + 1 }.sum
          val n = w.size.toLong
          Some((id, spans.size.toLong, dupTok, n,
            math.floor(dupTok * 1e4 / n + 0.5).toLong))
        }
      }.sortBy(_._1)
      val got = Mining.dupSpans(mkDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed rows=$rows")
    }
  }

  test("dupSpanCut matches the naive keep-one reference on random corpora") {
    // the naive reference marks covered positions directly (coverage
    // union == merged-interval union, so the merge machinery is not
    // re-implemented — a divergence is a plan bug, not a merge choice)
    val L = Mining.SpanGram
    for (seed <- 31 to 36) {
      val rows = corpus(seed)
      val toks = rows.map { case (id, t) => id -> tok(t) }
      val grams = toks.flatMap { case (id, w) =>
        w.sliding(L).filter(_.size == L).zipWithIndex
          .map { case (g, i) => (id, i + 1L, g.mkString(" ")) }
      }
      val cnt = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val owner = grams.filter(g => cnt(g._3) >= 2).groupBy(_._3)
        .view.mapValues(os => os.map(o => (o._1, o._2)).min).toMap
      val want = toks.map { case (id, w) =>
        val covered = Array.fill(w.size)(false)
        grams.foreach { case (d, p, g) =>
          if (d == id && cnt(g) >= 2 && owner(g) != ((d, p)))
            (p.toInt - 1 until p.toInt - 1 + L).foreach(covered(_) = true)
        }
        val kept = w.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        (id, w.size.toLong, (w.size - kept.size).toLong, kept.mkString(" "))
      }.sortBy(_._1)
      val got = Mining.dupSpanCut(mkDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed rows=$rows")
    }
  }

  test("bm25 matches the naive reference on random corpora") {
    for (seed <- 31 to 36) {
      // vocab overlaps the fixed query terms so matches actually occur
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("spark", "merge", "dup", "x", "y", "z")
      val rows = (0 until 4 + rnd.nextInt(16)).map { i =>
        (i.toLong, (0 until rnd.nextInt(13))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      val toks = rows.map { case (id, t) => id -> tok(t) }
      val nDocs = toks.size.toLong
      val nTok = toks.map(_._2.size.toLong).sum
      val avgdl = math.max(nTok / nDocs, 1L)
      val tf = toks.flatMap { case (id, w) =>
        w.filter(Mining.Bm25Terms.contains).groupBy(identity)
          .map { case (t, o) => (id, t, o.size.toLong, w.size.toLong) }
      }
      val dfc = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      def idf(t: String): Long =
        (Log2Fix.eval(2 * nDocs + 2, 2 * dfc(t) + 1) * Log2Fix.Ln2E6) >> 20
      val want = tf.groupBy(_._1).map { case (id, ts) =>
        val score = ts.map { case (_, t, f, dl) =>
          val rE3 = dl * 1000 / avgdl
          (idf(t) * 22000 * f) / (10000 * f + 3000 + 9 * rE3)
        }.sum
        (id, ts.size.toLong, score)
      }.toSeq.sortBy { case (id, _, s) => (-s, id) }.take(Mining.Bm25TopK)
      val got = Mining.bm25(mkDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"seed=$seed rows=$rows")
    }
  }

  test("jaccardE4 stays in [0, 10000] and matches integer expectations on exact pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 200).map { _ =>
      val u = 1L + rnd.nextInt(1000)
      val c = rnd.nextLong(u + 1)
      (c, u)
    }
    val out = pairs.toDF("c", "u")
      .select(Dedup.jaccardE4(col("c"), col("u")).as("j"))
      .collect().map(_.getLong(0))
    out.zip(pairs).foreach { case (j, (c, u)) =>
      assert(j >= 0 && j <= 10000)
      assert(j == math.floor(c.toDouble * 1e4 / u.toDouble + 0.5).toLong)
    }
  }

  test("novelty matches the naive first-occurrence reference on random corpora") {
    val n = Mining.OverlapGram
    for (seed <- 61 to 66) {
      val rows = corpus(seed)
      val docGrams = rows.map { case (id, t) =>
        val w = tok(t)
        id -> w.indices.dropRight(n - 1).map(i => w.slice(i, i + n).mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
      val owner = docGrams.flatMap { case (id, gs) => gs.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val want = docGrams.map { case (id, gs) =>
        val novel = gs.count(owner(_) == id).toLong
        (id, gs.size.toLong, novel, novel * 10000 / gs.size)
      }.sortBy(_._1)
      val got = Mining.novelty(mkDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("drift matches the naive PSI reference on random corpora") {
    import spark.implicits._
    for (seed <- 71 to 76) {
      val rnd = new scala.util.Random(seed)
      val rows = corpus(seed).map { case (id, t) =>
        (id, t, Vector("en", "de", "fr")(rnd.nextInt(3)))
      }
      val toks = rows.map { case (id, t, l) => (id, l, tok(t)) }
      if (toks.exists(_._3.nonEmpty)) {
        val cut = (rows.map(_._1).min + rows.map(_._1).max) / 2
        val want = toks.groupBy(_._2).flatMap { case (lang, ds) =>
          val byWord = ds.flatMap { case (id, _, w) => w.map((id <= cut, _)) }
          if (byWord.isEmpty) None
          else {
            val words = byWord.map(_._2).distinct
            val ca = byWord.filter(_._1).groupBy(_._2).view.mapValues(_.size.toLong)
            val cb = byWord.filterNot(_._1).groupBy(_._2).view.mapValues(_.size.toLong)
            val na = byWord.count(_._1).toLong
            val nb = byWord.size - na
            val v = words.size.toLong
            val psi = words.map { w =>
              val a = ca.getOrElse(w, 0L)
              val b = cb.getOrElse(w, 0L)
              val pa = (a + 1) * 1000000L / (na + v)
              val pb = (b + 1) * 1000000L / (nb + v)
              (pa - pb) * (slog(a + 1, b + 1) + slog(nb + v, na + v))
            }.sum
            Some(lang -> ((na, nb, v, psi, psi / 1000000L)))
          }
        }
        val got = Mining.drift(
            rows.map { case (id, t, l) => (id, t, l) }
              .toDF("doc_id", "text", "lang")
              .withColumn("source", org.apache.spark.sql.functions.lit("t")))
          .collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5)))).toMap
        assert(got == want, s"seed=$seed")
      }
    }
  }

  test("sourceKl matches the naive reference on random multi-source corpora") {
    import spark.implicits._
    for (seed <- 61 to 66) {
      val rnd = new scala.util.Random(seed)
      val rows = corpus(seed).map { case (id, t) =>
        (id, t, s"s${rnd.nextInt(3)}")
      }
      val byWord = rows.flatMap { case (_, t, s) => tok(t).map(s -> _) }
      if (byWord.nonEmpty) {
        val cSw = byWord.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val cW = byWord.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val nS = byWord.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val nn = byWord.size.toLong
        val want = nS.map { case (s, n) =>
          val s1 = cSw.collect { case ((`s`, w), c) => c * slog(c, cW(w)) }.sum
          val sum = s1 + n * Log2Fix.eval(nn, n)
          (s, (n, sum, sum / n))
        }
        val got = Mining.sourceKl(
            rows.toDF("doc_id", "text", "source")
              .withColumn("lang", org.apache.spark.sql.functions.lit("en")))
          .collect()
          .map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        assert(got == want, s"seed=$seed")
      }
    }
  }

  test("vocabGrowth matches the scalar walk on random corpora with sparse ids") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(500 + seed)
      val stride = 1L + rnd.nextInt(7)
      val rows = corpus(seed).map { case (i, t) => (i * stride, t) }
      val b = Mining.VocabGrowthBuckets
      val nd = rows.map(_._1).max + 1
      val seen = scala.collection.mutable.Set.empty[String]
      val nDocs = Array.fill(b)(0L); val nTok = Array.fill(b)(0L)
      val newW = Array.fill(b)(0L)
      for ((id, text) <- rows.sortBy(_._1)) {
        val dec = math.min(id * b / nd, b - 1L).toInt
        val w = tok(text)
        nDocs(dec) += 1; nTok(dec) += w.length
        for (t <- w; if seen.add(t)) newW(dec) += 1
      }
      val want = (0 until b).map { d =>
        (d.toLong, nDocs(d), nTok(d), nTok.take(d + 1).sum, newW(d),
          newW.take(d + 1).sum)
      }
      val got = Mining.vocabGrowth(mkDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed stride=$stride")
    }
  }

  test("zipf matches the scalar regression on random corpora (tiny-vocab edges)") {
    for (seed <- 1 to 6) {
      val rows = corpus(seed)
      val counts = rows.flatMap { case (_, t) => tok(t) }
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val row = Mining.zipf(mkDocs(rows)).collect() match {
        case Array(r) => r
        case other => fail(s"expected one row, got ${other.length}")
      }
      if (counts.isEmpty) {
        assert(row.getLong(0) == 0L && row.isNullAt(1) && row.isNullAt(5),
          s"empty corpus must yield a null-stat row: $row")
      } else {
        val n = counts.map(_._2).sum
        val top = counts.sortBy { case (w, c) => (-c, w) }.take(Mining.ZipfTopN)
        val xy = top.zipWithIndex.map { case ((_, c), i) =>
          (i + 1L, c, Log2Fix.eval(i + 1L, 1L) >> 11, Log2Fix.eval(c, 1L) >> 11)
        }
        val k = xy.length.toLong
        val (sx, sy) = (xy.map(_._3).sum, xy.map(_._4).sum)
        val (sxy, sxx) = (xy.map(t => t._3 * t._4).sum, xy.map(t => t._3 * t._3).sum)
        val (num, den) = (k * sxy - sx * sy, k * sxx - sx * sx)
        assert(row.getLong(0) == counts.length.toLong && row.getLong(1) == n)
        assert(row.getLong(2) == xy.filter(_._1 <= 10L).map(_._2).sum * 10000 / n)
        assert(row.getLong(3) == xy.filter(_._1 <= 100L).map(_._2).sum * 10000 / n)
        assert(row.getLong(4) == top.map(_._2).sum * 10000 / n)
        if (den == 0L) assert(row.isNullAt(5), s"degenerate fit must be null: $row")
        else assert(row.getLong(5) ==
          (num / den) * 10000 + (num % den) * 10000 / den, s"seed=$seed")
      }
    }
  }

  test("nearDuplicatesAgainst matches the brute cross-half reference on random corpora") {
    var totalPairs = 0
    for (seed <- 1 to 5) {
      val rows = corpus(seed)
      val cut = (rows.map(_._1).max + 1) / 2
      val hist = rows.filter(_._1 < cut)
      val inc = rows.filter(_._1 >= cut)
      def sh3(t: String): Set[String] = {
        val w = tok(t)
        if (w.size < 3) Set.empty
        else w.sliding(3).map(_.mkString(" ")).toSet
      }
      val hSh = hist.map { case (id, t) => id -> sh3(t) }.filter(_._2.nonEmpty)
      val iSh = inc.map { case (id, t) => id -> sh3(t) }.filter(_._2.nonEmpty)
      val want = (for {
        (i, sb) <- iSh; (h, sa) <- hSh
        inter = (sa & sb).size.toLong
        union = (sa.size + sb.size).toLong - inter
        if inter.toDouble / union >= 0.8
      } yield (i, h, math.floor(inter * 1.0e4 / union + 0.5).toLong))
        .groupBy(_._1).map { case (_, g) => g.minBy(x => (-x._3, x._2)) }.toSet
      val got = Dedup.nearDuplicatesAgainst(mkDocs(hist), mkDocs(inc))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want,
        s"seed=$seed missing=${want -- got} extra=${got -- want}")
      totalPairs += want.size
    }
    assert(totalPairs > 0, "the planted-copy corpora must produce cross-half dups")
  }
}
