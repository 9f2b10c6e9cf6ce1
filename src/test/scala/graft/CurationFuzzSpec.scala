package graft

import graft.llm.{Curation, Mining, Repetition}
import graft.queries.LlmQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential tests for the curation family (the
  * MiningFuzzSpec pattern): each stage operator vs a naive driver-side
  * Scala reference, plus composition-vs-stages equivalence for the
  * composed pipeline. The corpora are adversarial by construction —
  * exact duplicates, repeated-bigram loops, digit/punct noise, empty and
  * near-empty docs, and languages outside the mixture/sample weight
  * tables — so every rule branch and every empty-stage edge gets hit
  * across seeds. The references restate the SPEC (same md5 buckets, same
  * integer arithmetic, same tie-breaks) with none of the distributed
  * machinery, so a divergence is a plan bug, not a formula choice.
  */
class CurationFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tok(text: String): Vector[String] =
    text.toLowerCase.split("\\W+").filterNot(_.isEmpty).toVector

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The shared doc→bucket hash: first 15 md5 hex digits as int64, mod m. */
  private def hash15(s: String, mod: Long): Long =
    java.lang.Long.parseLong(md5hex(s).take(15), 16) % mod

  // (doc_id, lang, source, text, n_chars)
  private type Doc = (Long, String, String, String, Long)

  private def mkDocs(rows: Seq[Doc]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "source", "text", "n_chars")
  }

  /** Random corpus mixing the failure modes the rule chains exist for:
    * verbatim copies (dup clusters / span coverage), single-bigram loops
    * (repetitive), digit runs (low_alpha), empty/short docs (too_short),
    * and languages with no mixture/sample weight (the join-miss edge). */
  private def corpus(seed: Int): Seq[Doc] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val langs = Vector("en", "de", "fr", "es", "zh", "xx")
    val sources = Vector("web", "wiki", "books")
    val n = 20 + rnd.nextInt(40)
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    (0 until n).foreach { i =>
      texts += (rnd.nextInt(8) match {
        case 0 if i > 0 => texts(rnd.nextInt(i))
        case 1 =>
          val a = vocab(rnd.nextInt(vocab.length))
          val b = vocab(rnd.nextInt(vocab.length))
          Seq.fill(4 + rnd.nextInt(8))(s"$a $b").mkString(" ")
        case 2 =>
          (0 until 6 + rnd.nextInt(8)).map(_ => rnd.nextInt(1000)).mkString("; ")
        case 3 =>
          (0 until rnd.nextInt(4)).map(_ => vocab(rnd.nextInt(vocab.length)))
            .mkString(" ")
        case _ =>
          (0 until 5 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.length)))
            .mkString(" ")
      })
    }
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, langs(rnd.nextInt(langs.length)),
        sources(rnd.nextInt(sources.length)), t, t.length.toLong)
    }.toSeq
  }

  test("gopherFilter matches the naive rule chain on random corpora") {
    for (seed <- 1 to 6) {
      val rows = corpus(seed)
      val want = rows.map { case (id, _, _, text, _) =>
        val w = tok(text)
        val n = w.size.toLong
        val quality =
          if (text.isEmpty) 0L
          else math.floor(100.0 * text.count(c =>
            (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || c == ' ')
            / text.length + 0.5).toLong
        val bg = w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }
        val maxBg =
          if (bg.isEmpty) 0L
          else bg.groupBy(identity).values.map(_.size).max.toLong
        val dfrac =
          if (n > 0) math.floor(w.distinct.size * 1.0e4 / n + 0.5).toLong else 0L
        val tbf =
          if (bg.nonEmpty) math.floor(maxBg * 1.0e4 / bg.size + 0.5).toLong else 0L
        val reason =
          if (n < Repetition.MinTokens) "too_short"
          else if (n > Repetition.MaxTokens) "too_long"
          else if (quality < Repetition.MinQuality) "low_alpha"
          else if (dfrac < Repetition.MinDistinctFracE4) "low_diversity"
          else if (tbf > Repetition.MaxTopBigramFracE4) "repetitive"
          else "ok"
        (id, n, quality, reason == "ok", reason)
      }.sortBy(_._1)
      val got = Repetition.gopherFilter(mkDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
          r.getString(4))).sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed")
      // every corpus shape must exercise both verdicts
      assert(want.exists(_._4) && want.exists(!_._4), s"seed=$seed one-sided")
    }
  }

  test("mixture matches the naive T-fit and acceptance hash on random corpora") {
    for (seed <- 11 to 16) {
      val rows = corpus(seed)
      val weights = Curation.MixtureWeightsE4.toMap
      val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        .filter { case (l, _) => weights.contains(l) }
      val want =
        if (counts.isEmpty) Seq.empty
        else {
          val t = counts.map { case (l, c) => c * 10000L / weights(l) }.min
          counts.toSeq.map { case (l, c) =>
            val rate = math.min(1000000L, (weights(l) * t / 10000L) * 1000000L / c)
            val kept = rows.count { case (id, lang, _, _, _) =>
              lang == l && hash15(id.toString, 1000000L) < rate
            }.toLong
            (l, c, rate, kept)
          }.sortBy(_._1)
        }
      val got = Curation.mixture(mkDocs(rows)).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("pack matches the naive sequential prefix sum on random corpora") {
    for (seed <- 21 to 26) {
      val rows = corpus(seed)
      var run = 0L
      val want = rows.sortBy(_._1).map { case (id, _, _, text, _) =>
        val nTok = tok(text).size.toLong
        val before = run
        run += nTok
        (id, nTok, before, before / Curation.PackBudget)
      }
      val got = Curation.pack(mkDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("stratifiedSample matches the naive bucket predicate on random corpora") {
    val rates = Curation.SampleRates.toMap
    for (seed <- 31 to 36) {
      val rows = corpus(seed)
      val want = rows.flatMap { case (id, lang, _, _, _) =>
        val b = hash15(id.toString, 100L)
        if (b < rates.getOrElse(lang, 0)) Some((id, lang, b)) else None
      }.sortBy(_._1)
      val got = Curation.stratifiedSample(mkDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("domainCap matches the naive hash-ordered rank on random corpora") {
    for (seed <- 41 to 46) {
      val rows = corpus(seed)
      val want = rows.groupBy { case (_, lang, src, _, _) => (src, lang) }
        .toSeq.flatMap { case ((src, lang), group) =>
          group.map(_._1).sortBy(id => (md5hex(id.toString), id))
            .zipWithIndex
            .filter { case (_, i) => i < Curation.DomainCapN }
            .map { case (id, i) => (id, lang, src, i + 1L) }
        }.sortBy(_._1)
      val got = Curation.domainCap(mkDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  /** The pipeline conjoins nine keep-gates (gopher ∧ model ∧ blocklist ∧
    * ¬dup ∧ ¬span ∧ ¬contam ∧ cap ∧ mixture ∧ sample) and then a
    * constrained token-budget cut — on the small adversarial corpus alone
    * the survivor set is often empty, which would make the composition
    * check vacuous; and if the stragglers that do survive each sit alone
    * in their source, the 0.60× budget cut empties the set entirely (the
    * r11 seed=51 regression). Append a keep-biased block engineered so a
    * MULTI-DOC source always reaches the budget stage:
    *  - long unique texts over a wide vocab (passes gopher, no blocked
    *    terms), rejection-sampled until the hashed-linear quality score
    *    is ≥ 0 (passes the model gate);
    *  - all in source "web" with weighted langs repeated ∝ their mixture
    *    weight, so the fitted T keeps every acceptance rate high;
    *  - doc_ids rejection-sampled on the shared md5 hash so each doc's
    *    md5 leads with '0' (wins the domain-cap rank), docBucket < 25
    *    (passes every sample rate) and mixBucket < 250000 (passes any
    *    healthy mixture rate).
    * The naive reference recomputes every stage from the same rows, so
    * the bias costs no generality — and the test asserts the budget cut
    * is PARTIAL (some but not all survivors kept), so neither the
    * cut-nothing nor the cut-everything degeneracy can pass silently. */
  private def pipelineCorpus(seed: Int): Seq[Doc] = {
    val base = corpus(seed)
    val rnd = new scala.util.Random(seed * 7919)
    val wide = (0 until 40).map(i => s"word$i")
    val half = (Curation.QualityMod - 1) / 2
    def qualityPass(t: String): Boolean =
      tok(t).map(w => hash15(w, Curation.QualityMod) - half).sum >= 0
    val langPool = Vector("en", "en", "en", "en", "zh", "zh", "de", "de",
      "fr", "es")
    val goodIds = Iterator.from(1000).map(_.toLong).filter { id =>
      val hex = md5hex(id.toString)
      val v = java.lang.Long.parseLong(hex.take(15), 16)
      hex.head == '0' && v % 100 < 25 && v % 1000000 < 250000
    }
    val extra = goodIds.take(60).toSeq.zipWithIndex.map { case (id, j) =>
      var t = (0 until 12 + rnd.nextInt(12))
        .map(_ => wide(rnd.nextInt(wide.length))).mkString(" ")
      while (!qualityPass(t))
        t = (0 until 12 + rnd.nextInt(12))
          .map(_ => wide(rnd.nextInt(wide.length))).mkString(" ")
      (id, langPool(j % langPool.length), "web", t, t.length.toLong)
    }
    base ++ extra
  }

  test("qualityScore matches the naive hashed-linear sum on random corpora") {
    for (seed <- 61 to 66) {
      val rows = corpus(seed)
      val half = (Curation.QualityMod - 1) / 2
      val want = rows.map { case (id, _, _, text, _) =>
        val w = tok(text)
        val s = w.map(t => hash15(t, Curation.QualityMod) - half).sum
        val n = w.size.toLong
        (id, n, s, if (n > 0) s * 10000 / n else 0L, s >= 0)
      }.sortBy(_._1)
      val got = Curation.qualityScore(mkDocs(rows)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getBoolean(4))).sortBy(_._1).toSeq
      assert(got == want, s"seed=$seed")
    }
  }

  test("composed pipeline equals the conjunction of its standalone stages") {
    for (seed <- 51 to 52) {
      val rows = pipelineCorpus(seed)
      val dir = java.nio.file.Files.createTempDirectory(s"curfuzz$seed").toString
      try {
      mkDocs(rows).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = LlmQueries.pipeline(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val d = spark.read.parquet(s"$dir/documents.parquet")
      def ids(df: DataFrame): Set[Long] =
        df.select("doc_id").collect().map(_.getLong(0)).toSet
      val keepQ = ids(Repetition.gopherFilter(d).filter(col("keep")))
      val keepM = ids(Curation.qualityScore(d).filter(col("keep")))
      val keepB = ids(Curation.blocklistFilter(d).filter(col("keep")))
      val dropDup = ids(LlmQueries.dupClusters(spark, dir).filter(!col("keep")))
      val dropSpan = ids(Mining.dupSpans(d)
        .filter(col("dup_frac_e4") >= Mining.DupSpanDropE4))
      val contam = ids(Curation.decontaminate(d))
      val cap = ids(Curation.pipelineCapKeep(d))
      val mix = ids(Curation.mixtureKeep(d))
      val samp = ids(Curation.stratifiedSample(d))
      val survivors = rows
        .map { case (id, l, s, text, _) => (id, l, s, tok(text).size.toLong) }
        .filter { case (id, _, _, _) =>
          keepQ(id) && keepM(id) && keepB(id) && cap(id) && mix(id) &&
            samp(id) && !dropDup(id) && !dropSpan(id) && !contam(id)
        }
      // scalar re-derivation of the constrained budget cut — the same
      // √-share integer algebra as tokenBudgetFromCounts plus a
      // per-source doc_id-ordered strict prefix cut, independent of
      // groupedCumBefore (mirrors CurationSpec's composition twin)
      val avail = survivors.groupBy(_._3)
        .map { case (s, xs) => s -> xs.map(_._4).sum }.filter(_._2 > 0)
      val budgetKept: Seq[(Long, String)] =
        if (avail.isEmpty) Seq.empty
        else {
          val sqrtW = avail.map { case (s, a) =>
            s -> math.sqrt(a.toDouble).toLong }
          val sw = sqrtW.values.sum
          val b = avail.values.sum * Curation.PipelineBudgetMultipleE2 / 100
          val capTok = avail.map { case (s, a) =>
            val share = sqrtW(s) * 1000000L / sw
            val want = (b / 1000000L) * share + (b % 1000000L) * share / 1000000L
            s -> math.min(a, math.min(want, a * Curation.BudgetEpochsCapE4 / 10000L))
          }
          survivors.groupBy(_._3).toSeq.flatMap { case (s, xs) =>
            // a source absent from capTok (all-zero tokens) drops all its
            // docs — mirrors the engine's inner join to the cap set
            capTok.get(s).toSeq.flatMap { capT =>
              var run = 0L
              xs.sortBy(_._1).flatMap { case (id, l, _, n) =>
                val fits = run + n <= capT
                run += n
                if (fits) Some((id, l)) else None
              }
            }
          }
        }
      val want = budgetKept.groupBy(_._2)
        .map { case (l, xs) => (l, xs.size.toLong, xs.map(_._1).sum) }
        .toSeq.sortBy(_._1)
      assert(got == want, s"seed=$seed")
      assert(got.nonEmpty, s"seed=$seed degenerate: pipeline kept nothing")
      assert(budgetKept.nonEmpty && budgetKept.size < survivors.size,
        s"seed=$seed budget cut must be partial: " +
          s"kept ${budgetKept.size} of ${survivors.size} survivors")
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete()
        }
        rm(new java.io.File(dir))
      }
    }
  }

  test("tokenBudget matches the naive sqrt-temperature allocator on random corpora") {
    for (seed <- 1 to 6) {
      val rows = corpus(seed)
      val avail = rows.groupBy(_._3).view
        .mapValues(_.map(d => tok(d._4).size.toLong).sum)
        .filter(_._2 > 0L).toMap
      val s = avail.view.mapValues(a => math.floor(math.sqrt(a.toDouble)).toLong).toMap
      val sw = s.values.sum
      val b = avail.values.sum * Curation.BudgetMultiple
      val want = avail.map { case (src, a) =>
        val share = s(src) * 1000000L / sw
        val w = (b / 1000000L) * share + (b % 1000000L) * share / 1000000L
        val got = math.min(w, a * Curation.BudgetEpochsCapE4 / 10000L)
        src -> ((a, share, w, w * 10000L / a, got, w - got))
      }
      val got = Curation.tokenBudget(mkDocs(rows)).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
      assert(got == want, s"seed=$seed")
    }
  }
}
