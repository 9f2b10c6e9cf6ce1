package graft

import graft.llm.{Curation, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioural tests of the curation operators on sf0.001 (the DuckDB
  * hash parity is pinned by the driver gate; these pin the semantics).
  */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet").cache()

  test("stratified sample is deterministic and respects per-lang rates") {
    val s1 = Curation.stratifiedSample(docs).collect().map(_.getLong(0)).toSet
    val s2 = Curation.stratifiedSample(docs).collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "hash sampling must be re-run-stable")
    // every kept row's bucket is under its language's rate
    val rates = Curation.SampleRates.toMap
    Curation.stratifiedSample(docs).collect().foreach { r =>
      assert(r.getLong(2) < rates(r.getString(1)))
    }
    // en is downsampled harder than zh (rate 25 vs 90)
    val kept = Curation.stratifiedSample(docs)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (total.contains("en") && total.contains("zh") && total("zh") > 20)
      assert(kept.getOrElse("en", 0L).toDouble / total("en") <
             kept.getOrElse("zh", 0L).toDouble / total("zh"))
  }

  test("mixture: kept proportions track the target weights within hash noise") {
    val out = Curation.mixture(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val weights = Curation.MixtureWeightsE4.toMap
    assert(out.map(_._1).toSet == weights.keySet.intersect(
      docs.select("lang").distinct().collect().map(_.getString(0)).toSet))
    out.foreach { case (lang, nDocs, rateE6, kept) =>
      assert(kept <= nDocs, s"$lang kept more than available")
      assert(rateE6 >= 0 && rateE6 <= 1000000)
      // the hash acceptance tracks the rate: expected = n*rate/1e6, allow
      // generous binomial slack on a few hundred docs
      val expected = nDocs * rateE6 / 1000000.0
      assert(math.abs(kept - expected) <= math.max(8.0, 4 * math.sqrt(expected + 1)),
        s"$lang kept=$kept expected~$expected at rate_e6=$rateE6")
    }
    // the binding language is fully kept (rate 1e6) and at least one
    // language is genuinely downsampled
    assert(out.exists(_._3 == 1000000L), s"no binding language: $out")
    assert(out.exists(_._3 < 1000000L), s"nothing downsampled: $out")
    // determinism
    val again = Curation.mixture(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("ccnet buckets: per-lang terciles balance and order by score") {
    import spark.implicits._
    // 9 docs in one language with graded token rarity: shared filler keeps
    // a common vocabulary, doc i adds i copies of its own unique token, so
    // mean NLL strictly orders with uniqueness share
    val synth = (0 until 9).map { i =>
      val rare = (s"zq$i " * (i + 1)).trim
      (i.toLong, s"the common filler words here $rare", "en")
    }.toDF("doc_id", "text", "lang")
    val out = Curation.ccnetBuckets(synth).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.length == 9)
    val byBucket = out.groupBy(_._4).view.mapValues(_.map(_._3).toSeq).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    assert(byBucket.values.forall(_.size == 3), s"terciles must balance: $byBucket")
    assert(byBucket("head").max <= byBucket("middle").min,
      "head scores must not exceed middle scores")
    assert(byBucket("middle").max <= byBucket("tail").min,
      "middle scores must not exceed tail scores")
  }

  test("semdedup: near-identical vectors collapse to one survivor per group") {
    import spark.implicits._
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    // two well-separated blobs; in each, two near-identical vectors (cos
    // ~1) and one merely-similar one below the 0.99 threshold
    val emb = Seq(
      (0L, v(1.0, 0.0)), (1L, v(0.9999, 0.0001)), (2L, v(0.9, 0.4)),
      (3L, v(0.0, 1.0)), (4L, v(0.0001, 0.9999)), (5L, v(0.4, 0.9))
    ).toDF("vec_id", "embedding")
    val out = graft.llm.SemDedup.semDedup(emb, k = 2, iters = 2, thrE6 = 990000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    // the near-identical pairs form groups keeping the min id
    assert(out(0L) == ((0L, true)) && out(1L) == ((0L, false)))
    assert(out(3L) == ((3L, true)) && out(4L) == ((3L, false)))
    // the merely-similar vectors are singleton survivors
    assert(out(2L) == ((2L, true)) && out(5L) == ((5L, true)))
    // deterministic across invocations
    val again = graft.llm.SemDedup.semDedup(emb, k = 2, iters = 2, thrE6 = 990000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(again == out)
  }

  test("semdedup: byte-identical zero vectors dedup; zero-vs-nonzero stays unpaired") {
    import spark.implicits._
    val z = Array(0.0f, 0.0f)
    val emb = Seq(
      (0L, z), (1L, z),                  // identical zero pair: must collapse
      (2L, Array(1.0f, 0.0f))            // nonzero: unpaired with zeros
    ).toDF("vec_id", "embedding")
    val out = graft.llm.SemDedup.semDedup(emb, k = 1, iters = 1, thrE6 = 990000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out(0L) == ((0L, true)) && out(1L) == ((0L, false)),
      s"zero-vector pair must collapse to one survivor, got $out")
    assert(out(2L) == ((2L, true)))
  }

  test("semdedup gate invariants hold on the real embeddings") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val gate = graft.llm.SemDedup.gate(emb).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(gate.size == 4 && gate.values.forall(identity), s"gate failed: $gate")
  }

  test("chunking covers every token exactly via stride windows") {
    val w = docs.select(col("doc_id").cast("long").as("doc_id"),
      size(Dedup.tokens(col("text"))).as("n"))
    val expect = w.collect().map { r =>
      val n = r.getInt(1)
      r.getLong(0) -> (if (n < 1) 0 else (n + Curation.ChunkStride - 1) / Curation.ChunkStride)
    }.toMap
    val got = Curation.chunk(docs).groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect.filter(_._2 > 0).map { case (k, v) => k -> v.toLong })
    // every chunk's token count is in (0, ChunkSize]
    Curation.chunk(docs).select("n_tok").collect().foreach { r =>
      assert(r.getLong(0) > 0 && r.getLong(0) <= Curation.ChunkSize)
    }
  }

  test("decontamination only flags non-benchmark docs with real overlap") {
    val out = Curation.decontaminate(docs).collect()
    out.foreach { r =>
      assert(r.getLong(0) % 17 != 0, "benchmark docs must not self-flag")
      assert(r.getLong(1) >= 1)
    }
    // planted near-duplicates of benchmark docs must be caught: any doc
    // sharing a full 4-gram with a bench doc appears in the output
    val sh = docs.select(col("doc_id").cast("long").as("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        explode(Dedup.shinglesFromTokens(col("w"), Curation.DecontamGram)).as("g"))
    val bench = sh.filter(col("doc_id") % 17 === 0).select("g").distinct()
    val expect = sh.filter(col("doc_id") % 17 =!= 0).join(bench, "g")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet == expect)
  }

  test("tfidf ranks rare terms above ubiquitous ones") {
    val out = Curation.tfidf(docs).cache()
    // rank is 1..K per doc, no gaps
    val byDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("c"), max("rank").as("m"), min("rank").as("lo"))
      .collect()
    byDoc.foreach { r =>
      assert(r.getLong(1) <= Curation.TfIdfTopK)
      assert(r.getLong(3) == 1L && r.getLong(2) == r.getLong(1))
    }
    // a term present in EVERY doc has idf 0 → can never outrank a term
    // with positive score in the same doc
    out.collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getLong(3)).map(_.getLong(2))
      assert(scores.sameElements(scores.sortBy(-_)), "scores descend with rank")
    }
  }

  test("redaction masks the injected email and phone exactly once each") {
    val out = Curation.redact(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) == 1L, s"one email per doc, got ${r.getLong(1)}")
      assert(r.getLong(2) == 1L, s"one phone per doc, got ${r.getLong(2)}")
    }
    // the production column leaves no residual matches
    val injected = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1-202-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now"))
    val residual = docs.select(Curation.redactText(injected).as("t"))
      .filter(col("t").rlike(Curation.EmailRe) || col("t").rlike(Curation.PhoneRe))
      .count()
    assert(residual == 0, "redacted text must contain no PII matches")
    assert(docs.select(Curation.redactText(injected).as("t"))
      .filter(col("t").contains("<EMAIL>") && col("t").contains("<PHONE>"))
      .count() == docs.count())
  }

  test("lm score: rare-token docs score higher nll than common-token docs") {
    import spark.implicits._
    // "the" dominates the corpus; doc 3 is all rare tokens
    val corpus = Seq(
      (1L, "the the the the the the"),
      (2L, "the the the common words"),
      (3L, "zyxwv qqqqz rarest")
    ).toDF("doc_id", "text")
    val scores = Curation.lmScore(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(scores(3L) > scores(1L), s"rare doc must out-score common: $scores")
    assert(scores(2L) > scores(1L) && scores(2L) < scores(3L),
      s"mixed doc sits between: $scores")
    // deterministic across invocations
    val again = Curation.lmScore(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(again == scores)
  }

  test("decontam cut: planted bench overlap loses exactly the covered span, flag ≡ cut agree") {
    import spark.implicits._
    // doc 0 is benchmark (0 % 17 = 0); doc 1 quotes its 4-gram inside
    // unique filler; doc 2 is clean training text
    val planted = Seq(
      (0L, "e1 e2 e3 e4 e5"),
      (1L, "u1 u2 e2 e3 e4 e5 u3 u4"),
      (2L, "c1 c2 c3 c4 c5 c6")).toDF("doc_id", "text")
    val out = Curation.decontamCut(planted).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L), "benchmark docs are eval data, not output")
    // doc 1 shares grams (e2 e3 e4 e5) at p=3 -> covered 3..6
    assert(out(1L) == ((8L, 4L, "u1 u2 u3 u4")), s"quote must be cut: $out")
    assert(out(2L) == ((6L, 0L, "c1 c2 c3 c4 c5 c6")))

    // corpus-level consistency: the docs the CUT touches are EXACTLY the
    // docs the flag operator reports, and each loses >= 1 token
    val flagged = Curation.decontaminate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val cut = Curation.decontamCut(docs).collect()
    val touched = cut.filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    assert(touched == flagged,
      s"cut/flag drift: ${(touched -- flagged).size} cut-only, ${(flagged -- touched).size} flag-only")
    val nTrain = docs.filter(col("doc_id") % 17 =!= 0).count()
    assert(cut.length == nTrain, "every training doc must appear, cut or not")
  }

  test("bloom decontamination: no false negatives, FP envelope holds") {
    val gate = Curation.decontamBloomGate(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(gate("bloom_no_false_negatives")._2,
      "a Bloom filter can never miss a contaminated doc")
    assert(gate("bloom_flagged_docs")._2,
      s"bloom-flagged count outside the fpp envelope (exact=${gate("bloom_flagged_docs")._1})")
    // both rows report the same exact count, and it matches the exact op
    val exact = Curation.decontaminate(docs).select("doc_id").distinct().count()
    assert(gate("bloom_no_false_negatives")._1 == exact)
  }

  test("composed pipeline equals the intersection of its standalone stages") {
    val spark2 = spark
    val got = graft.queries.LlmQueries.pipeline(spark2, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // recompute from the STANDALONE stage outputs, driver-side
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val keepQ = ids(graft.llm.Repetition.gopherFilter(docs).where(col("keep")))
    val keepM = ids(Curation.qualityScore(docs).where(col("keep")))
    val sampled = ids(Curation.stratifiedSample(docs))
    val dropped = ids(graft.queries.LlmQueries.dupClusters(spark2, dir)
      .filter(!col("keep")))
    val contam = ids(Curation.decontaminate(docs))
    val spanDrop = ids(graft.llm.Mining.dupSpans(docs)
      .where(col("dup_frac_e4") >= graft.llm.Mining.DupSpanDropE4))
    val capped = ids(Curation.pipelineCapKeep(docs))
    val mixed = ids(Curation.mixtureKeep(docs))
    val blocked = ids(Curation.blocklistFilter(docs).where(col("keep")))
    val survivors = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("source"),
        size(graft.llm.Dedup.tokens(col("text"))).cast("long").as("n_tok"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .filter { case (id, _, _, _) =>
        keepQ(id) && keepM(id) && blocked(id) && sampled(id) && capped(id) &&
          mixed(id) && !dropped(id) && !spanDrop(id) && !contam(id) }
    // scalar re-derivation of the constrained budget cut: the same
    // √-share integer algebra as tokenBudgetFromCounts, then a per-source
    // doc_id-ordered running cut — independent of groupedCumBefore
    val avail = survivors.groupBy(_._3).map { case (s, xs) =>
      s -> xs.map(_._4).sum }.filter(_._2 > 0)
    val sqrtW = avail.map { case (s, a) => s -> math.sqrt(a.toDouble).toLong }
    val sw = sqrtW.values.sum
    val t = avail.values.sum
    val b = t * Curation.PipelineBudgetMultipleE2 / 100
    val capTok = avail.map { case (s, a) =>
      val share = sqrtW(s) * 1000000L / sw
      val want = (b / 1000000L) * share + (b % 1000000L) * share / 1000000L
      val got = math.min(want, a * Curation.BudgetEpochsCapE4 / 10000L)
      s -> math.min(a, got)
    }
    val budgetKept = survivors.groupBy(_._3).toSeq.flatMap { case (s, xs) =>
      // a source absent from capTok (all-zero tokens_avail) drops ALL its
      // docs — the engine reaches the budget filter through an inner join
      // to the cap set, so even an n_tok=0 doc from such a source is cut
      capTok.get(s).toSeq.flatMap { capT =>
        var run = 0L
        xs.sortBy(_._1).flatMap { case (id, l, _, n) =>
          val fits = run + n <= capT
          run += n
          if (fits) Some((id, l)) else None
        }
      }
    }
    // NOTE the running total advances past a non-fitting doc (strict
    // prefix-sum semantics, matching cum_before + n_tok <= cap)
    val want = budgetKept.groupBy(_._2)
      .map { case (l, xs) => (l, xs.size.toLong, xs.map(_._1).sum) }.toSet
    assert(got == want, s"pipeline != composed stages: got=$got want=$want")
    assert(got.nonEmpty, "the composed pipeline must keep documents")
  }

  test("shuffle order: ranks follow the md5 key, stable across runs, no rank gaps") {
    val out = Curation.shuffleOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.length == Curation.ShuffleTopK)
    assert(out.map(_._3).toSeq == (1L to out.length).toSeq, "ranks contiguous in order")
    val keys = out.map(_._2)
    assert(keys.zip(keys.tail).forall { case (a, b) => a <= b }, "ascending key order")
    // the key really is the documented md5 derivation
    out.take(5).foreach { case (id, key, _) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"shuf:$id".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      assert(key == java.lang.Long.parseLong(hex, 16), s"doc $id key mismatch")
    }
    val again = Curation.shuffleOrder(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(again.toSeq == out.toSeq, "shuffle order must be re-run-stable")
  }

  test("domain cap: every (source, lang) group is capped at N, deterministically") {
    val out = Curation.domainCap(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val byGroup = out.groupBy(t => (t._3, t._2))
    assert(byGroup.values.forall(_.length <= Curation.DomainCapN))
    // groups at/above the cap in the corpus come back with exactly N rows
    val corpusSizes = docs.groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(corpusSizes.exists(_._2 > Curation.DomainCapN),
      "fixture must contain an over-cap group for the test to bite")
    corpusSizes.foreach { case (g, n) =>
      val kept = byGroup.get(g).map(_.length).getOrElse(0)
      assert(kept == math.min(n, Curation.DomainCapN.toLong),
        s"group $g: corpus=$n kept=$kept")
    }
    // ranks are contiguous 1..k within each group, and re-runs agree
    byGroup.values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
    }
    val again = Curation.domainCap(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(again.toSet == out.toSet)
  }

  test("qualityScore: matches the naive hashed-linear sum and never shuffles") {
    import spark.implicits._
    def hash15(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def naive(text: String): (Long, Long) = {
      val w = text.toLowerCase.split("\\W+").filterNot(_.isEmpty)
      (w.length.toLong,
        w.map(t => hash15(t) % Curation.QualityMod - (Curation.QualityMod - 1) / 2).sum)
    }
    val texts = Seq(1L -> "the quick brown fox", 2L -> "", 3L -> "a a a b",
      4L -> "Spark spark SPARK") // case folding: all three hash identically
    val d = texts.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val out = Curation.qualityScore(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    texts.foreach { case (id, t) =>
      val (n, s) = naive(t)
      val perTok = if (n > 0) s * 10000 / n else 0L
      assert(out(id) == ((n, s, perTok, s >= 0L)), s"doc $id")
    }
    // the empty doc scores 0 and keeps (the filter's job is scoring, not
    // emptiness — too_short is the gopher chain's rule)
    assert(out(2L) == ((0L, 0L, 0L, true)))
    // model-based scoring must stay embarrassingly parallel: a pure
    // projection with no exchange, no join, no aggregate of any kind
    val plan = Curation.qualityScore(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"qualityScore must be a zero-shuffle projection:\n$plan")
  }

  test("weightedSample: matches the scalar A-ES reference and stays shuffle-free") {
    def md532(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val want = docs.select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(_._2 > 0)
      .map { case (id, w) =>
        val h = md532(s"wsamp:$id") + 1
        val key = -(graft.functions.Log2Fix.eval(1L << 32, h) * 1048576L) / w
        (id, w, key)
      }
      .sortBy { case (id, _, key) => (-key, id) }
      .take(Curation.WeightedSampleK).toSeq
    val got = Curation.weightedSample(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, "distributed sampler must equal the scalar E-S reference")
    // re-run stability (the auditability property rand() lacks)
    assert(Curation.weightedSample(docs).collect()
      .map(_.getLong(0)).toSeq == got.map(_._1))
    // weight bias: the sampled docs skew longer than the corpus median
    val med = docs.stat.approxQuantile("n_chars", Array(0.5), 0.0).head
    val longer = got.count(_._2 > med)
    assert(longer > got.length / 2,
      s"length-weighted sample must over-represent long docs ($longer/${got.length} above median $med)")
    // plan: TakeOrderedAndProject, no Window, no aggregate exchange
    val plan = Curation.weightedSample(docs).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must be a TOP:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }

  test("tokenBudget: hand-computed skewed recipe, cap branch exercised") {
    import spark.implicits._
    // "big" holds 1600 tokens, "small" 100: s = 40/10, S = 50, T = 1700,
    // budget = 3T = 5100; share = 800000/200000 e6; want = 4080/1020;
    // epochs = 25500/102000 e4 -> small exceeds the 4-epoch cap and gets
    // exactly 400 tokens with a 620 shortfall
    val d = Seq(
        (1L, ("a " * 800).trim, "big"), (2L, ("b " * 800).trim, "big"),
        (3L, ("c " * 100).trim, "small"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val out = Curation.tokenBudget(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out("big") == ((1600L, 800000L, 4080L, 25500L, 4080L, 0L)))
    assert(out("small") == ((100L, 200000L, 1020L, 102000L, 400L, 620L)))
  }

  test("blocklist: token membership (not substring), C4 verdict on zero hits") {
    import spark.implicits._
    val d = Seq(
        (1L, "the dup table and the slow scan"),   // 2 hits
        (2L, "dups and slowness are not tokens"),  // 0: substrings don't hit
        (3L, "clean merge join"),                  // 0
        (4L, "DUP Dup dup"))                       // 3: case-folded
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val out = Curation.blocklistFilter(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((2L, false)))
    assert(out(2L) == ((0L, true)), "substring matches must NOT hit")
    assert(out(3L) == ((0L, true)))
    assert(out(4L) == ((3L, false)), "matching is case-folded, per occurrence")
  }

  test("qualityPairs: classes balance per language, degenerate languages cap to zero") {
    val out = Curation.qualityPairs(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    // exact per-language class balance
    val byLang = out.groupBy(_._2)
    byLang.foreach { case (l, rows) =>
      val pos = rows.count(_._3 == 1L); val neg = rows.count(_._3 == 0L)
      assert(pos == neg && pos > 0, s"$l unbalanced: $pos vs $neg")
    }
    // labels are exactly the (trimmed) head/tail of the tercile table
    val buckets = Curation.ccnetBuckets(docs).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    out.foreach { case (id, _, lab) =>
      assert(buckets(id) == (if (lab == 1L) "head" else "tail"))
    }

    import spark.implicits._
    // 4 docs in one lang -> head 2 / middle 1 / tail 1 -> ONE pair, and
    // the kept head is the best-scoring (trim is doc_id-ordered, but
    // both head docs tie only if scores tie); 2 docs -> no tail -> zero
    val d = Seq(
        (1L, "alpha alpha alpha alpha", "en"), // repetitive -> low nll
        (2L, "alpha alpha alpha beta", "en"),
        (3L, "alpha beta gamma delta", "en"),
        (4L, "epsilon zeta eta theta", "en"),  // all-rare -> high nll
        (10L, "iota iota", "zz"), (11L, "kappa kappa", "zz"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val small = Curation.qualityPairs(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(small.forall(_._2 == "en"), s"zz must cap to zero: $small")
    assert(small.size == 2 && small.count(_._3 == 1L) == 1 &&
      small.count(_._3 == 0L) == 1, s"one balanced pair expected: $small")
  }

  test("tokenBudget plan: one sources-sized aggregate, corpus never joins wide") {
    val plan = Curation.tokenBudget(docs).queryExecution.executedPlan.toString
    // r17: the sw/t totals ride as a GLOBAL WINDOW over the sources-sized
    // aggregate (they replaced a crossJoin(broadcast(agg)) that re-planned
    // the corpus tokenization a second time). The Window must consume the
    // aggregate's output — i.e. sit ABOVE the HashAggregate in the
    // top-down print — and the corpus side must never reach a sort-merge
    // join or a corpus-wide window.
    val winAt = plan.indexOf("Window")
    val aggAt = plan.indexOf("HashAggregate")
    assert(winAt >= 0 && aggAt >= 0 && winAt < aggAt,
      s"the totals window must consume the sources-sized aggregate:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no SMJ expected:\n$plan")
  }

  test("tokenBudget: corpus invariants — budget respected, √-damping holds") {
    val out = Curation.tokenBudget(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.nonEmpty)
    val total = out.map(_._2).sum
    val budget = total * Curation.BudgetMultiple
    assert(out.map(_._3).sum <= 1000000L, "shares must floor-sum under 1e6")
    assert(out.map(_._4).sum <= budget, "allocations cannot exceed the budget")
    out.foreach { case (src, avail, _, want, epochs, got, short) =>
      assert(epochs == want * 10000 / avail, s"$src epochs definition")
      assert(got == math.min(want,
        avail * Curation.BudgetEpochsCapE4 / 10000), s"$src cap definition")
      assert(short == want - got, s"$src shortfall definition")
    }
    // want is monotone in availability (share is a floor of a monotone
    // map of avail, and want a floor of a monotone map of share); the
    // antitone-epochs damping itself is pinned EXACTLY by the hand test
    // above — on this near-uniform corpus the e4 floors can wiggle
    // adjacent epochs by more than their true gap, so asserting it here
    // would be asserting floor noise
    val byAvail = out.sortBy(_._2).toSeq
    for (Seq(sm, bg) <- byAvail.sliding(2); if bg._2 > sm._2)
      assert(bg._4 >= sm._4, "want must be monotone in availability")
  }

  test("qualityCalibration: equals the naive driver-side decile reference") {
    val rule = graft.llm.Repetition.gopherFilter(docs).select("doc_id", "keep")
    val out = Curation.qualityCalibration(docs, rule).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val qs = Curation.qualityScore(docs)
      .select(col("doc_id").cast("long"), col("score_per_tok_e4")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keep = rule.collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val n = qs.length
    val want = qs.sortBy { case (id, s) => (s, id) }.zipWithIndex
      .map { case ((id, s), i) => (i.toLong * 10 / n, id, s) }
      .groupBy(_._1).map { case (d, rows) =>
        (d, rows.length.toLong, rows.count(r => keep(r._2)).toLong,
          rows.map(_._3).min, rows.map(_._3).max)
      }.toSet
    assert(out == want)
    // all ten deciles populated and exactly covering the corpus
    assert(out.map(_._1) == (0L to 9L).toSet)
    assert(out.toSeq.map(_._2).sum == n)
    // decile score ranges are disjoint and ordered (exact-rank sanity)
    val ordered = out.toSeq.sortBy(_._1)
    for (Seq(a, b) <- ordered.sliding(2)) assert(a._5 <= b._4)
  }

  test("splitLeakage: orientations, non-train-pair exclusion, pinned ties") {
    import spark.implicits._
    // the spec's own md5-bucket twin — MUST stay in lockstep with
    // Curation.splitOf (an independent JVM re-derivation, not a call)
    def splitOf(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      val b = java.lang.Long.parseLong(hex, 16) % 100
      if (b < 80) "train" else if (b < 90) "validation" else "test"
    }
    val ids = (0L until 400L).groupBy(splitOf)
    val (tr, va, te) = (ids("train"), ids("validation"), ids("test"))
    // engine and twin agree on every id (lockstep guard)
    val got = spark.range(400).select(col("id"),
      Curation.splitOf(col("id")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 400L).foreach(i => assert(got(i) == splitOf(i), s"id $i"))

    // pairs: both orientations leak, train-train and val-test do not,
    // and eval doc te(0) has TWO train dups tied on jaccard_r
    val pairs = Seq(
      (tr(0), te(0), 9000L), // train→test leak (a=train)
      (te(0), tr(1), 9000L), // test→train leak (b=train), tied similarity
      (te(0), tr(2), 8000L), // weaker third dup of the same eval doc
      (va(0), tr(3), 7000L), // validation leak
      (tr(4), tr(5), 9999L), // train-train: not a leak
      (va(1), te(1), 9999L)  // val-test: no train side, not a leak
    ).toDF("doc_a", "doc_b", "jaccard_r")
    val out = Curation.splitLeakage(pairs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val bestTrain = math.min(tr(0), tr(1)) // tie at 9000 → smallest id
    assert(out == Set(
      (te(0), "test", 3L, 9000L, bestTrain),
      (va(0), "validation", 1L, 7000L, tr(3))))
  }

  test("packStats: block-local greedy fold matches a reference packer; truncation and block split pinned") {
    import spark.implicits._
    val ctx = Curation.PackCtxTokens.toInt
    // planted docs: ids straddle a block boundary (1023/1024); one doc
    // exceeds the context (truncates); several exact-fit sequences
    def doc(id: Long, nTok: Int) = (id, Seq.fill(nTok)("w").mkString(" "))
    val rows = Seq(
      doc(0L, 300), doc(1L, 212),          // exact fill: 300+212 = 512
      doc(2L, 500), doc(3L, 13),           // 500, then 13 overflows -> new bin
      doc(1023L, ctx + 250),               // truncates to 512, fills bin alone
      doc(1024L, 100), doc(1025L, 100),    // SECOND block: independent state
      doc(2048L, 0))                       // empty doc in its own block
    val out = Curation.packStats(rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    // reference packer (plain sequential fold per block)
    def ref(ts: Seq[Int]): (Long, Long) = {
      var bins = 1L; var fill = 0L
      ts.foreach { t0 =>
        val t = math.min(t0, ctx)
        if (fill + t > ctx) { bins += 1; fill = t } else fill += t
      }
      (bins, ts.map(math.min(_, ctx).toLong).sum)
    }
    def row(block: Long, ts: Seq[Int]): (Long, Long, Long, Long, Long) = {
      val (bins, sum) = ref(ts)
      (block, ts.size.toLong, bins, sum,
        math.floor((bins * ctx - sum) * 1e4 / (bins * ctx) + 0.5).toLong)
    }
    assert(out == Set(
      row(0L, Seq(300, 212, 500, 13, ctx + 250)),
      row(1L, Seq(100, 100)),
      row(2L, Seq(0))))
    // and the planted shape really exercises what it claims: the exact
    // 512-fill shares a bin, every later doc overflows —
    // [300+212 | 500 | 13 | 512-truncated] = 4 bins
    assert(out.find(_._1 == 0L).get._3 == 4L)
  }
}
