package graft

import graft.functions.Log2Fix
import graft.llm.Mining
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioural tests of the text-mining operators: PMI collocations
  * (bit-locked to the Log2Fix kernel), BM25 ranking (idf monotonicity +
  * hand-computed integer score), fuzzy decontamination (exact Jaccard vs
  * the benchmark subset, no false positives/negatives at the threshold).
  */
class MiningSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  private def mkDocs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
  }

  // ---------------------------------------------------------- collocations

  test("collocations: a planted collocation tops the ranking with the exact Log2Fix pmi20") {
    // 10 docs of "alpha beta" + filler words that never co-occur with each
    // other twice; "alpha beta" always adjacent -> maximal PMI.
    val rows = (0L until 10L).map(i => (i, s"alpha beta w$i x$i y$i z$i"))
    val out = Mining.collocations(mkDocs(rows)).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getString(0) == "alpha beta")
    // hand-computed: N = 60 tokens, B = 50 bigram slots, c_xy = 10,
    // c_alpha = c_beta = 10 -> pmi20 = slog2(10*60, 10*10) + log2fix(60, 50)
    val expected = Log2Fix.eval(600, 100) + Log2Fix.eval(60, 50)
    assert(top.getLong(2) == expected,
      s"pmi20 must equal the Log2Fix kernel: got ${top.getLong(2)}, want $expected")
    assert(top.getLong(1) == 10L)
  }

  test("collocations: min-count threshold and (pmi desc, bigram asc) ordering hold on the corpus") {
    val out = Mining.collocations(docs).collect()
    assert(out.length == Mining.CollocTopK)
    assert(out.forall(_.getLong(1) >= Mining.CollocMinCount))
    val keys = out.map(r => (r.getLong(2), r.getString(0)))
    val sorted = keys.sortBy { case (p, b) => (-p, b) }
    assert(keys.toSeq == sorted.toSeq, "rows must arrive ranked")
  }

  test("collocations: anti-collocations get a NEGATIVE pmi20 (signed log path)") {
    // c and d are each frequent (20 occurrences) but adjacent only 5
    // times in 70 tokens: c_xy*N = 350 < c_x*c_y = 400, so the PMI ratio
    // is below 1 and the slog2 reflection must produce a negative term.
    val rows = Seq(
      (1L, "c d c d c d c d c d"),
      (2L, Seq.fill(15)("c e").mkString(" ")),
      (3L, Seq.fill(15)("d e").mkString(" ")))
    val out = Mining.collocations(mkDocs(rows))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out.contains("c d") && out.contains("c e"))
    assert(out("c d") < 0L, s"anti-collocation must have negative PMI: $out")
    assert(out("c e") > 0L && out("c e") > out("c d"))
  }

  // ------------------------------------------------------------- lm2Score

  test("bigram LM: repeated word order scores better than a shuffle the unigram LM can't separate") {
    // docs 1-8: the same 6-token sentence (frequent bigrams); doc 9: the
    // SAME words permuted (identical unigram profile, novel bigrams).
    val sent = "alpha beta gamma delta epsilon zeta"
    val rows = (1L to 8L).map(i => (i, sent)) :+ (9L, "beta alpha delta gamma zeta epsilon")
    val df = mkDocs(rows)
    val out = Mining.lm2Score(df, Mining.gramCounts(df)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) < out(9L),
      s"natural-order docs must score lower NLL than the shuffle: $out")
    assert((1L to 8L).forall(i => out(i) == out(1L)))
    // hand-replay doc 1: V=6; every bigram slot has c12=8, and c1=9
    // (each word occurs once in docs 1-8 AND once in the permuted doc 9)
    // -> nll = ln((9+6)/(8+1)) via the kernel
    val slot = (graft.functions.Log2Fix.eval(15, 9) * graft.functions.Log2Fix.Ln2E6) >> 20
    assert(out(1L) == slot, s"uniform slots -> mean == slot nll: ${out(1L)} vs $slot")
  }

  test("bigram LM on the corpus: every doc with >=2 tokens scores, mean is nonnegative") {
    val out = Mining.lm2Score(docs, Mining.gramCounts(docs)).collect()
    val eligible = docs.where(size(graft.llm.Dedup.tokens(col("text"))) >= 2).count()
    assert(out.length == eligible)
    assert(out.forall(_.getLong(2) >= 0L))
    assert(out.forall(r => r.getLong(1) >= 1L))
  }

  // ------------------------------------------------------------- knScore

  test("KN LM: continuation counts beat raw frequency (the san-francisco property)") {
    // "francisco" is MORE frequent than "many" but follows only "san";
    // "many" ends three distinct kept bigrams. KN's continuation backoff
    // must make the unseen slot (zz francisco) cost MORE than (zz many) —
    // the exact ordering an add-one/frequency backoff gets wrong.
    val rows = (1L to 10L).map(i => (i, "san francisco")) ++
      Seq((11L, "alpha many"), (12L, "alpha many"), (13L, "beta many"),
        (14L, "beta many"), (15L, "gamma many"), (16L, "gamma many")) ++
      Seq((20L, "zz francisco"), (21L, "zz many"))
    val df = mkDocs(rows)
    val counts = Mining.gramCounts(df)
    val uni = counts.where(col("k") === "u").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(uni("francisco") > uni("many"),
      "fixture must make the narrow-context word the more frequent one")
    val out = Mining.knScore(df, counts).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(20L) > out(21L),
      s"unseen continuation of a one-context word must cost more: $out")
  }

  test("KN LM: the add-one mass P>1 edge clamps to zero nll in the plan") {
    // every doc is the same single bigram: Σ_w P(w|a) = 1 + D/c1 > 1 and
    // the one slot absorbs it all -> num > den -> the documented clamp
    val rows = (1L to 5L).map(i => (i, "a b"))
    val df = mkDocs(rows)
    val out = Mining.knScore(df, Mining.gramCounts(df)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // hand-replay: c12=5, c1=5, V=2, N1pp=1, C=3, sh=0, cq=3:
    // num = 17*3 + 3*2*2 = 63 > den = 4*5*3 = 60
    assert(out.values.toSet == Set(0L),
      s"P>1 slots must clamp to exactly zero nll: $out")
  }

  test("KN LM: the corpus-level shift quantization engages on huge synthetic counts") {
    import spark.implicits._
    // model counts a real corpus could not fit in a test: maxc = 2^57
    // makes bl(4*maxc)=59 and C=33 makes bl(C)=5 -> sh=4, cq=33>>4=2;
    // UNshifted den would be 33*2^59 (> 2^63, a silent wrap) — the
    // quantized plan computes the exact pinned value instead
    val fill = (1 to 30).map(i => ("u", s"w$i", 1L))
    val counts = (Seq(("u", "a", 1L << 57), ("u", "b", 1L << 56)) ++ fill ++
      Seq(("b", "a b", 1L << 55), ("bt", "", 123L))).toDF("k", "g", "c")
    val df = mkDocs(Seq((1L, "a b")))
    val out = Mining.knScore(df, counts).collect()
    assert(out.length == 1)
    // a = 4*2^55-3 = 2^57-3; num = (2^57-3)*2 + ((3*2*2)>>4 = 0) = 2^58-6
    // den = 4*2^57*2 = 2^60
    val num = (1L << 58) - 6L
    val want = (graft.functions.Log2Fix.eval(1L << 60, num) *
      graft.functions.Log2Fix.Ln2E6) >> 20
    assert(out.head.getLong(2) == want,
      s"quantized slot must hit the pinned value: ${out.head.getLong(2)} vs $want")
  }

  test("KN LM on the corpus: every doc with >=2 tokens scores, mean is nonnegative") {
    val out = Mining.knScore(docs, Mining.gramCounts(docs)).collect()
    val eligible = docs.where(size(graft.llm.Dedup.tokens(col("text"))) >= 2).count()
    assert(out.length == eligible)
    assert(out.forall(_.getLong(2) >= 0L))
    assert(out.map(_.getLong(2)).distinct.length > 1,
      "corpus must produce a score spread, not one constant")
  }

  // ------------------------------------------------- hapax pre-filter

  test("gramCounts: hapax-heavy corpus — table holds exactly the bigrams with exact count >= HapaxMin") {
    // 60 docs, each a UNIQUE 6-token sentence (every bigram a hapax),
    // plus 3 docs repeating one sentence (its 5 bigrams count 4 >= 2).
    val uniq = (0L until 60L).map(i =>
      (i, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f"))
    val rep = (100L until 103L).map(i => (i, "r1 r2 r3 r4 r5 r6"))
    val df = mkDocs(uniq ++ rep ++ Seq((0L + 200L, "r1 r2 r3 r4 r5 r6")))
    val tbl = Mining.gramCounts(df).collect()
    val big = tbl.filter(_.getString(0) == "b")
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    // the 300 hapax bigrams are gone; only the 5 repeated ones remain,
    // with their EXACT counts (4 each)
    assert(big.keySet == Set("r1 r2", "r2 r3", "r3 r4", "r4 r5", "r5 r6"),
      s"only non-hapax bigrams may survive: ${big.keySet}")
    assert(big.values.forall(_ == 4L), s"survivor counts must stay exact: $big")
    assert(big.values.forall(_ >= Mining.HapaxMin))
    // unigrams are NOT filtered: all 366 distinct words present, exact
    val uniRows = tbl.filter(_.getString(0) == "u")
    assert(uniRows.length == 60 * 6 + 6)
    assert(uniRows.filter(r => r.getString(1).startsWith("r"))
      .forall(_.getLong(2) == 4L))
  }

  test("bigram LM: hapax slots take the add-one floor ln((c1+V)/1)") {
    // doc 1 repeated 3x (bigrams survive, c12=3); doc 9 all-hapax bigrams
    // over words seen once each -> every slot floors at ln((1+V)/1)
    val rows = (1L to 3L).map(i => (i, "p q r s")) :+ (9L, "h1 h2 h3 h4")
    val df = mkDocs(rows)
    val out = Mining.lm2Score(df, Mining.gramCounts(df)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val v = 8L // p q r s h1 h2 h3 h4
    val floor = (Log2Fix.eval(1 + v, 1) * Log2Fix.Ln2E6) >> 20
    assert(out(9L) == floor, s"hapax doc must score the exact floor: $out vs $floor")
    val surviving = (Log2Fix.eval(3 + v, 3 + 1) * Log2Fix.Ln2E6) >> 20
    assert(out(1L) == surviving, s"surviving slots keep exact add-one nll: $out")
  }

  // ------------------------------------------------------------------ bm25

  test("bm25: a rare-term doc outranks common-term docs; score matches the integer formula") {
    // term universe: "dup" rare (1 doc), "spark" common (all docs).
    val rows = Seq(
      (1L, "dup spark pad1 pad2"),
      (2L, "spark pad1 pad2 pad3"),
      (3L, "spark pad1 pad2 pad3"),
      (4L, "spark pad1 pad2 pad3"))
    val out = Mining.bm25(mkDocs(rows)).collect()
    assert(out.head.getLong(0) == 1L, "the rare-term doc must rank first")
    // hand-replay: N=4 docs, n_tok=16, avgdl_tok=4, dl=4 -> r_e3=1000.
    def idfE6(df: Long) = (Log2Fix.eval(2 * 4 + 2, 2 * df + 1) * Log2Fix.Ln2E6) >> 20
    def ts(idf: Long, tf: Long, rE3: Long) =
      (idf * 22000 * tf) / (10000 * tf + 3000 + 9 * rE3)
    // dl == avgdl and tf=1 -> denominator 22000 -> ts == idf exactly
    val expTop = ts(idfE6(1), 1, 1000) + ts(idfE6(4), 1, 1000)
    assert(out.head.getLong(2) == expTop,
      s"integer BM25 mismatch: got ${out.head.getLong(2)}, want $expTop")
    assert(out.head.getLong(1) == 2L)
  }

  test("bm25: corpus rows are ranked, capped at topK, and every doc matched a query term") {
    val out = Mining.bm25(docs).collect()
    assert(out.length == Mining.Bm25TopK)
    val scores = out.map(_.getLong(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(out.forall(_.getLong(1) >= 1L))
    // tf>0 for some query term really holds for every returned doc
    val ids = out.map(_.getLong(0)).toSet
    val withTerm = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(graft.llm.Dedup.tokens(col("text"))).as("t"))
      .where(col("t").isin(Mining.Bm25Terms: _*))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(withTerm))
  }

  // ------------------------------------------------------------- dupSpans

  test("dup spans: a copied 5-gram is found in both docs, exact copies cover 100%") {
    // docs 1/2 share exactly one 5-token span inside otherwise-unique
    // text; docs 3/4 are identical (full coverage).
    val shared = "v w x y z"
    val rows = Seq(
      (1L, s"a1 b1 c1 $shared d1 e1 f1"),
      (2L, s"a2 b2 $shared c2 d2 e2 f2"),
      (3L, "m n o p q r s t"),
      (4L, "m n o p q r s t"))
    val out = Mining.dupSpans(mkDocs(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(1L) == ((1L, 5L, 11L, Math.floor(5.0 * 1e4 / 11 + 0.5).toLong)))
    assert(out(2L) == ((1L, 5L, 11L, Math.floor(5.0 * 1e4 / 11 + 0.5).toLong)))
    assert(out(3L) == ((1L, 8L, 8L, 10000L)), s"full-copy doc must cover 100%: $out")
    assert(out(4L) == ((1L, 8L, 8L, 10000L)))
  }

  test("dup spans: overlapping gram starts merge into one maximal span") {
    // a 7-token copied run -> 3 duplicated 5-gram starts (positions
    // 1,2,3 within the run) that must merge to ONE span of 7 tokens.
    val run = "k1 k2 k3 k4 k5 k6 k7"
    val rows = Seq(
      (1L, s"$run a b c"),
      (2L, s"x y $run"))
    val out = Mining.dupSpans(mkDocs(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((1L, 7L)), s"3 overlapping starts must merge: $out")
    assert(out(2L) == ((1L, 7L)))
  }

  test("dup spans: disjoint duplicated regions stay separate spans") {
    val r1 = "s1 s2 s3 s4 s5"
    val r2 = "t1 t2 t3 t4 t5"
    val rows = Seq(
      (1L, s"$r1 gapa gapb $r2"),
      (2L, s"$r1 other words here entirely"),
      (3L, s"pre tokens also $r2"))
    val out = Mining.dupSpans(mkDocs(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((2L, 10L)), s"two disjoint spans expected: $out")
  }

  test("dup span cut: keep-one — the first corpus-order occurrence survives, the copy is cut") {
    val shared = "v w x y z"
    val rows = Seq(
      (1L, s"a1 b1 c1 $shared d1 e1 f1"),
      (2L, s"a2 b2 $shared c2 d2 e2 f2"),
      (5L, "u1 u2 u3 u4 u5 u6"))
    val out = Mining.dupSpanCut(mkDocs(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out.keySet == Set(1L, 2L, 5L), "every doc must appear, cut or not")
    assert(out(1L) == ((11L, 0L, "a1 b1 c1 v w x y z d1 e1 f1")),
      s"the owner occurrence must keep its span: $out")
    assert(out(2L) == ((11L, 5L, "a2 b2 c2 d2 e2 f2")),
      s"the copy must lose exactly the shared span: $out")
    assert(out(5L) == ((6L, 0L, "u1 u2 u3 u4 u5 u6")),
      "docs without duplicated spans pass through")
  }

  test("dup span cut: identical docs — the min-doc_id copy keeps everything, the other empties") {
    val rows = Seq(
      (3L, "m n o p q r s t"),
      (4L, "m n o p q r s t"))
    val out = Mining.dupSpanCut(mkDocs(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(out(3L) == ((0L, "m n o p q r s t")))
    assert(out(4L) == ((8L, "")), s"the full copy must cut to empty: $out")
  }

  test("dup spans / cut: a PERSISTED hotGramOwners table yields identical verdicts (the shared-stage shape the entries run)") {
    val shared = "v w x y z"
    val rows = Seq(
      (1L, s"a1 b1 c1 $shared d1 e1 f1"),
      (2L, s"a2 b2 $shared c2 d2 e2 f2"),
      (3L, "m n o p q r s t"),
      (4L, "m n o p q r s t"),
      (5L, "u1 u2 u3 u4 u5 u6"))
    val docs = mkDocs(rows)
    val hot = Mining.hotGramOwners(docs).persist()
    try {
      assert(Mining.dupSpans(docs, hot).collect().toSet ==
        Mining.dupSpans(docs).collect().toSet)
      assert(Mining.dupSpanCut(docs, hot).collect().toSet ==
        Mining.dupSpanCut(docs).collect().toSet)
    } finally { hot.unpersist(); () }
  }

  // -------------------------------------------------------- fuzzyDecontam

  test("fuzzy decontam: identical cross-boundary docs hit at 10000; sub-threshold pairs don't") {
    val benchText = "q w e r t y u i o p"     // bench doc (id 17): 7 4-grams
    val nearText = "q w e r t y u i o p zz"   // J = 7/8 of 4-gram sets
    val farText = "q w e r zz aa bb cc dd ee" // one shared 4-gram, J = 1/13
    val rows = Seq(
      (17L, benchText), (1L, benchText), (2L, nearText), (3L, farText),
      (34L, "totally different bench words here all the way down"))
    val out = Mining.fuzzyDecontam(mkDocs(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out.contains((1L, 17L, 10000L)), s"exact copy must hit 10000: $out")
    val near = out.find(t => t._1 == 2L && t._2 == 17L)
    assert(near.isDefined, "lightly-edited copy must be caught")
    assert(near.get._3 == Math.floor(7.0 * 1e4 / 8.0 + 0.5).toLong)
    assert(!out.exists(_._1 == 3L), "J<0.5 pair must not be flagged")
    assert(out.forall(t => t._1 % 17 != 0 && t._2 % 17 == 0))
  }

  test("fuzzy decontam matches brute-force all-pairs on the corpus") {
    val out = Mining.fuzzyDecontam(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sh = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.llm.Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= Mining.FuzzyGram)
      .select(col("doc_id"),
        graft.llm.Dedup.shinglesFromTokens(col("w"), Mining.FuzzyGram).as("sh"))
    val a = sh.where(col("doc_id") % 17 =!= 0)
      .select(col("doc_id").as("da"), col("sh").as("sha"))
    val b = sh.where(col("doc_id") % 17 === 0)
      .select(col("doc_id").as("db"), col("sh").as("shb"))
    val inter = size(array_intersect(col("sha"), col("shb")))
    val jac = inter.cast("double") /
      (size(col("sha")) + size(col("shb")) - inter).cast("double")
    val brute = a.crossJoin(b).where(jac >= Mining.FuzzyThreshold)
      .select(col("da"), col("db"),
        graft.llm.Dedup.jaccardE4(inter, size(col("sha")) + size(col("shb")) - inter))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "expected planted cross-boundary near-dups")
    assert(out == brute, s"missing=${brute -- out} extra=${out -- brute}")
  }

  test("source overlap: exact shared counts, coefficient, and no rows for disjoint sources") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f", "s1"), // s1 grams: {a b c d e, b c d e f}
      (2L, "a b c d e x", "s2"), // s2 gains {a b c d e, b c d e x}
      (3L, "p q r s t u", "s3"), // disjoint from everything
      (4L, "a b c d e f", "s2")  // s2 also gains {b c d e f}
    ).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
    val out = Mining.sourceOverlap(d).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    // s1={2 grams} fully inside s2={3 grams}: shared 2, coeff = 2/min(2,3) = 1e4
    assert(out == Set(("s1", "s2", 2L, 2L, 3L, 10000L)), s"got $out")
    // sanity on the real corpus: symmetric-free (a<b), coeff bounded
    val corpus = Mining.sourceOverlap(docs).collect()
    assert(corpus.nonEmpty)
    assert(corpus.forall(r => r.getString(0) < r.getString(1)))
    assert(corpus.forall(r => r.getLong(5) >= 0L && r.getLong(5) <= 10000L))
  }

  // ---------------------------------------------------------------- novelty

  test("novelty: min-doc_id ownership, short docs absent, e4 fraction exact") {
    val d = mkDocs(Seq(
      1L -> "a b c d e f", // grams {a b c d e, b c d e f}: both first seen here
      2L -> "a b c d e f", // same grams, owned by doc 1 → fully stale
      3L -> "x y z w v",   // 1 gram, disjoint → fully novel
      4L -> "a b"          // < 5 tokens → no grams, absent from output
    ))
    val out = Mining.novelty(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 2L, 10000L), (2L, 2L, 0L, 0L), (3L, 1L, 1L, 10000L)))
    // real corpus: doc 0 (no earlier docs) is fully novel if it has grams;
    // every fraction is a valid e4
    val corpus = Mining.novelty(docs).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(corpus.nonEmpty)
    assert(corpus.values.forall(v => v >= 0L && v <= 10000L))
    corpus.get(0L).foreach(v => assert(v == 10000L, "doc 0 must be fully novel"))
    // the corpus-sized gram stream must never join back to itself: the
    // only joins in the plan are the doc-count-sized size×novel merge
    val plan = Mining.novelty(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window:\n$plan")
  }

  // ------------------------------------------------- source KL divergence

  private def mkDocsSrc(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")))
  }

  test("sourceKl: identical sources diverge by exactly zero (power-of-two exact path)") {
    // two sources with the SAME distribution: every per-word ratio is
    // exactly N/n_s = 2, a power of two the Log2Fix kernel computes
    // exactly, so the floor arithmetic cancels to literal 0
    val out = Mining.sourceKl(mkDocsSrc(Seq(
        (1L, "a a b", "s1"), (2L, "a a b", "s2"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set("s1", "s2"))
    assert(out.values.forall { case (n, k) => n == 3L && k == 0L })
  }

  test("sourceKl: bit-locked to the Log2Fix kernel, skewed source larger") {
    // corpus: a×4, b×2, c×3 (N=9); s1/s2 share {a,a,b}; s3 is all-c
    val out = Mining.sourceKl(mkDocsSrc(Seq(
        (1L, "a a b", "s1"), (2L, "a a b", "s2"), (3L, "c c c", "s3"))))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val l93 = Log2Fix.eval(9, 3)
    // s1: 2·slog2(2,4) + 1·slog2(1,2) + 3·log2fix(9,3) = 3·(l93 − 2^20)
    val s1 = 3L * (l93 - (1L << 20))
    // s3: 3·slog2(3,3) + 3·log2fix(9,3) = 3·l93
    val s3 = 3L * l93
    assert(out("s1") == ((3L, s1, s1 / 3L)))
    assert(out("s2") == ((3L, s1, s1 / 3L)))
    assert(out("s3") == ((3L, s3, s3 / 3L)))
    assert(s3 > s1, "the fully-skewed source must diverge more")
    assert(s1 > 0L)
  }

  test("drift: identical halves diverge by exactly zero; a hand case is bit-locked") {
    // doc_ids 0..3, cut = 1: halves {a a, a b} vs {a a, a b} — identical
    // distributions, so every pa_e6 == pb_e6 and the PSI sum is literal 0
    val same = Mining.drift(mkDocsSrc(Seq(
        (0L, "a a", "s"), (1L, "a b", "s"), (2L, "a a", "s"), (3L, "a b", "s"))))
      .collect()
    assert(same.length == 1 && same.head.getLong(4) == 0L)

    // cut = (0+1)/2 = 0: half A {a:2}, half B {a:1, b:1}; v=2, na=nb=2.
    // a: pa=3e6/4=750000, pb=2e6/4=500000, lr=slog2(3,2); term=250000*L32
    // b: pa=1e6/4=250000, pb=2e6/4=500000, lr=-slog2(2,1); term=250000*2^20
    val out = Mining.drift(mkDocsSrc(Seq((0L, "a a", "s"), (1L, "a b", "s"))))
      .collect()
    assert(out.length == 1)
    val want = 250000L * Log2Fix.eval(3, 2) + 250000L * (1L << 20)
    assert(out.head.getLong(4) == want,
      s"psi_sum must equal the Log2Fix hand computation: ${out.head.getLong(4)} vs $want")
    assert(out.head.getLong(1) == 2L && out.head.getLong(2) == 2L &&
      out.head.getLong(3) == 2L)
  }

  test("drift: empty input yields an empty frame with the pinned schema, not an NPE") {
    val out = Mining.drift(mkDocsSrc(Nil))
    assert(out.columns.toSeq ==
      Seq("lang", "n_a", "n_b", "vocab", "psi_sum", "psi_ub20"))
    assert(out.count() == 0L)
  }

  test("sourceKl: corpus run is finite and the avg is the truncating div") {
    val out = Mining.sourceKl(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0L)
      assert(r.getLong(3) == r.getLong(2) / r.getLong(1),
        "kl20_avg must be kl20_sum div n_tok (toward zero)")
    }
  }

  // ---------------------------------------------------------- vocab growth

  test("vocabGrowth: matches an independent scalar reference on the corpus") {
    val out = Mining.vocabGrowth(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // scalar reference: walk docs in doc_id order, tracking seen words
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val b = Mining.VocabGrowthBuckets
    val nd = rows.map(_._1).max + 1
    val seen = scala.collection.mutable.Set.empty[String]
    val nDocs = Array.fill(b)(0L); val nTok = Array.fill(b)(0L)
    val newW = Array.fill(b)(0L)
    for ((id, text) <- rows) {
      val dec = math.min(id * b / nd, b - 1).toInt
      val w = text.toLowerCase.split("\\W+").filterNot(_.isEmpty)
      nDocs(dec) += 1; nTok(dec) += w.length
      for (t <- w; if seen.add(t)) newW(dec) += 1
    }
    val want = (0 until b).map { d =>
      (d.toLong, nDocs(d), nTok(d), nTok.take(d + 1).sum, newW(d),
        newW.take(d + 1).sum)
    }
    assert(out.sortBy(_._1).toSeq == want,
      s"growth profile must match the scalar walk")
    assert(out.map(_._5).sum == out.sortBy(_._1).last._6,
      "vocab_cum must end at the total distinct-word count")
  }

  test("zipf: matches the scalar integer regression and a planted power law slopes ≈ -1e4") {
    // corpus reference: recompute the whole statistic from collected
    // word counts with the same Log2Fix kernel and integer algebra
    val out = Mining.zipf(docs).collect()
    assert(out.length == 1)
    val row = out.head
    val counts = docs.select(col("text")).collect()
      .flatMap(_.getString(0).toLowerCase.split("\\W+").filterNot(_.isEmpty))
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }.toSeq
    val n = counts.map(_._2).sum
    val top = counts.sortBy { case (w, c) => (-c, w) }.take(Mining.ZipfTopN)
    val xy = top.zipWithIndex.map { case ((_, c), i) =>
      (i + 1L, c, Log2Fix.eval(i + 1L, 1L) >> 11, Log2Fix.eval(c, 1L) >> 11)
    }
    val k = xy.length.toLong
    val (sx, sy) = (xy.map(_._3).sum, xy.map(_._4).sum)
    val (sxy, sxx) = (xy.map(t => t._3 * t._4).sum, xy.map(t => t._3 * t._3).sum)
    val (num, den) = (k * sxy - sx * sy, k * sxx - sx * sx)
    val slope = (num / den) * 10000 + (num % den) * 10000 / den
    assert(row.getLong(0) == counts.length.toLong && row.getLong(1) == n)
    assert(row.getLong(2) == xy.filter(_._1 <= 10).map(_._2).sum * 10000 / n)
    assert(row.getLong(4) == top.map(_._2).sum * 10000 / n)
    assert(row.getLong(5) == slope, s"slope_e4 must match the scalar kernel")

    // a planted exact power law c(r) = floor(C / r) must fit near -1
    val words = (1 to 200).flatMap(r => Seq.fill(2000 / r)(s"w$r"))
    val planted = mkDocs(Seq((0L, words.mkString(" "))))
    val s = Mining.zipf(planted).head().getLong(5)
    assert(s < -8500 && s > -11500, s"planted 1/r law must slope near -1e4, got $s")
  }

  test("vocab growth / zipf plans: pruned scans, TOP-k top-N, no corpus-wide window") {
    val vg = Mining.vocabGrowth(docs.select("doc_id", "text", "lang", "source",
      "n_chars")).queryExecution.executedPlan.toString
    // the only shuffles are the word-count aggregate, the bucket
    // aggregate, and the 10-row spine join/window — never a sort-merge
    // join of corpus-sized sides
    assert(!vg.contains("SortMergeJoin"), s"vocabGrowth must not SMJ:\n$vg")
    val zp = Mining.zipf(docs).queryExecution.executedPlan.toString
    assert(zp.contains("TakeOrderedAndProject"),
      s"zipf top-N must be a TOP, not a global sort:\n$zp")
    assert(!zp.contains("SortMergeJoin"), s"zipf must not SMJ:\n$zp")
  }

  test("vocabGrowth: empty deciles densify to zero rows, totals still close") {
    // all docs land in decile 0 and 9 (ids 0 and nd-1): the spine must
    // still emit all 10 deciles with zeroed middles and flat cum curves
    val out = Mining.vocabGrowth(mkDocs(Seq(
        (0L, "a b c"), (99L, "a b d e")))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(out.length == 10)
    assert(out.head == (0L, 1L, 3L, 3L, 3L, 3L))
    assert(out.last == (9L, 1L, 4L, 7L, 2L, 5L))
    assert(out.slice(1, 9).forall(r => r._2 == 0L && r._5 == 0L),
      "middle deciles must be zero-filled")
    assert(out.slice(1, 9).forall(r => r._4 == 3L && r._6 == 3L),
      "cumulative curves must stay flat across empty deciles")
  }

  // --------------------------------------------------------- char entropy

  test("charEntropy: planted garbage classes land on the right side of the keep bounds") {
    import graft.llm.TextStats
    val rows = Seq(
      1L -> "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",               // 1 symbol: H = 0
      2L -> "abababababababababababababababab",               // 2 symbols: H = 1 bit
      3L -> "the quick brown fox jumps over the lazy dog and keeps going", // prose
      4L -> (('!' to 'z').mkString * 2))                       // 90-symbol uniform: H ≈ 6.49
    val out = graft.llm.TextStats.charEntropy(mkDocs(rows)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((32L, 0L, false)), s"single-symbol doc: ${out(1L)}")
    // exactly 1 bit: ent_e4 = 10000, below the 2.0-bit floor
    assert(out(2L)._2 == 10000L && !out(2L)._3, s"two-symbol doc: ${out(2L)}")
    // natural prose sits inside the keep band
    assert(out(3L)._3, s"prose flagged as garbage: ${out(3L)}")
    assert(out(3L)._2 > TextStats.CharEntLoE4 && out(3L)._2 < TextStats.CharEntHiE4)
    // wide-alphabet noise exceeds the 5.5-bit ceiling
    assert(out(4L)._2 > TextStats.CharEntHiE4 && !out(4L)._3,
      s"uniform noise kept: ${out(4L)}")
    // the kernel is exact for power-of-two uniform distributions:
    // 32 distinct chars × 2 occurrences → exactly 5 bits
    val u32 = (('a' to 'z') ++ ('0' to '5')).mkString * 2
    val e32 = graft.llm.TextStats.charEntropy(mkDocs(Seq(9L -> u32))).collect()(0)
    assert(e32.getLong(3) == 50000L, s"uniform-32 entropy: ${e32.getLong(3)}")
  }
}
