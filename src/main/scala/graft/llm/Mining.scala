package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Log2Fix, VectorExpressions}

/** Corpus text-mining operators: PMI collocation mining, BM25 keyword
  * retrieval, and fuzzy (Jaccard) benchmark decontamination.
  *
  * Same discipline as [[Curation]]/[[TextStats]]: every score is derived
  * with pure int64 arithmetic (logs via the [[graft.functions.Log2Fix]]
  * normalize-then-square kernel that the DuckDB oracles replay exactly),
  * so both engines produce IDENTICAL integers — no libm, no float
  * accumulation-order hazard. Scale notes per operator.
  */
object Mining {

  /** Positional (non-distinct) adjacent word pairs — [[Dedup.gramSeq]]
    * at n = 2, because collocation counts are occurrence counts. */
  def bigramSeq(w: Column): Column = Dedup.gramSeq(w, 2)

  /** Signed fixed-point log2 ratio — the shared
    * [[VectorExpressions.slog2_fix]] kernel. */
  private def slog2(num: Column, den: Column): Column =
    VectorExpressions.slog2_fix(num, den)

  val CollocMinCount = 5
  val CollocTopK = 50

  /** Bigrams below this EXACT corpus count are dropped from the persisted
    * gram table — the hapax pre-filter. The table's semantics are defined
    * on exact counts (NOT on any hash/bucket artifact), so the DuckDB
    * oracles replay it as a plain `HAVING count(*) >= HapaxMin`. */
  val HapaxMin = 2

  /** Width of the approximate-count bucket table (2^bits buckets) used by
    * the pre-filter's first pass. 2^22 longs ≈ 32 MB aggregated state —
    * sized for the test corpora; a 100 TB run raises this toward 2^30
    * (the bucket aggregate is distributed; only the Bloom filter built
    * OVER the surviving bucket ids ships to tasks). */
  val PrefilterBits = 22

  /** FPP for the Bloom over surviving bucket ids. False positives only
    * let extra grams into the exact second pass (where the final exact
    * `c >= HapaxMin` filter removes them); false negatives are impossible
    * (Bloom property), so the filter never changes the result. */
  val PrefilterFpp = 0.01

  /** The unigram-count side of the table PLUS the exact bigram-slot
    * total as one `(k="bt", g="", c)` row — both from ONE corpus scan
    * (the total rides along as a per-doc weight `max(len-1, 0)`, so the
    * filtered bigram side never has to answer "how many slots were
    * there" — a question the filtered counts cannot). */
  private def uniCounts(docs: DataFrame): DataFrame =
    docs
      .select(Dedup.tokens(col("text")).as("w"))
      .select(explode(concat(
        transform(col("w"),
          t => struct(lit("u").as("k"), t.as("g"), lit(1L).as("n"))),
        array(struct(lit("bt").as("k"), lit("").as("g"),
          greatest(size(col("w")) - 1, lit(0)).cast("long").as("n")))))
        .as("kg"))
      .groupBy(col("kg.k").as("k"), col("kg.g").as("g"))
      .agg(sum(col("kg.n")).as("c"))

  /** The per-occurrence bigram stream — one corpus scan, never
    * materialized. */
  private def bigramStream(docs: DataFrame): DataFrame =
    docs
      .select(Dedup.tokens(col("text")).as("w"))
      .select(explode(bigramSeq(col("w"))).as("g"))

  /** The melted gram-count table `(k, g, c)` consumed by
    * [[collocationsFrom]] and [[lm2Score]]: exact counts for ALL unigrams
    * (zipf-tiny), one exact `(k="bt", g="", c)` bigram-slot-total row,
    * plus exact counts for bigrams with exact count >= [[HapaxMin]] — the
    * hapax tail (often 10-30% of token count on web text, the one piece
    * of operator state that would otherwise grow corpus-sublinearly-but-
    * unboundedly) never enters the persisted table.
    *
    * Build is the two-pass approximate-then-exact shape:
    *   1. bucket pass — the bigram stream aggregates into a FIXED
    *      2^[[PrefilterBits]] bucket-count table (map-side combined, the
    *      only state is the bounded bucket array); buckets whose total is
    *      below [[HapaxMin]] cannot contain a surviving gram (bucket
    *      count >= gram count — no false negatives);
    *   2. a Bloom filter over the surviving bucket ids (bounded by
    *      2^[[PrefilterBits]] items) probes the re-streamed bigram stream
    *      with the native codegen'd BloomFilterMightContain — same
    *      build/probe pairing as [[Curation.decontamBloomGate]];
    *   3. exact pass — only probe survivors reach the per-gram aggregate,
    *      and the final exact `c >= HapaxMin` filter removes every
    *      collision/Bloom false positive.
    * Result: exactly "bigrams with exact count >= HapaxMin", independent
    * of hash behavior. Cost: the corpus gram stream is scanned twice
    * (bucket pass + exact pass) instead of once — the deliberate trade
    * for a bounded exact-aggregate: its hash table holds only repeated
    * grams (plus a fpp sliver), not the hapax tail.
    *
    * Callers on a hot path should persist/memoize the result (the entry
    * layer memoizes per (session, dir)). NOTE: this builder runs the
    * bucket pass eagerly (two small actions: survivor count + Bloom
    * build) at call time. */
  def gramCounts(docs: DataFrame): DataFrame = {
    val uni = uniCounts(docs)
    val bigOcc = bigramStream(docs)
    val bkt = pmod(xxhash64(col("g")), lit(1L << PrefilterBits))
    // persisted across its two actions (count + Bloom build) so the
    // bucket-pass corpus scan runs once; the table is bounded by 2^bits
    val okBuckets = bigOcc.select(bkt.as("bkt"))
      .groupBy("bkt").agg(count(lit(1)).as("bc"))
      .where(col("bc") >= HapaxMin)
      .persist()
    val nOk = math.max(okBuckets.count(), 1L)
    val bf = okBuckets.stat.bloomFilter(col("bkt"), nOk, PrefilterFpp)
    okBuckets.unpersist()
    val bfBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain: Column =
      org.apache.spark.sql.GraftColumn.of(
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal(bfBytes,
            org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.GraftColumn.exprOf(bkt)))
    val big = bigOcc.where(mightContain)
      .groupBy("g").agg(count(lit(1)).as("c"))
      .where(col("c") >= HapaxMin)
      .select(lit("b").as("k"), col("g"), col("c"))
    uni.unionByName(big)
  }

  /** Convenience form for tests/small inputs; hot paths should build
    * [[gramCounts]] once, persist it, and call [[collocationsFrom]]. */
  def collocations(docs: DataFrame): DataFrame =
    collocationsFrom(gramCounts(docs))

  /** Top-[[CollocTopK]] bigram collocations by pointwise mutual
    * information from a [[gramCounts]] table. With N total tokens, B
    * total bigram slots, c_xy the bigram's occurrence count and c_x/c_y
    * the word occurrence counts,
    *
    *   PMI = log2( (c_xy/B) / ((c_x/N)(c_y/N)) )
    *       = log2(c_xy*N / (c_x*c_y)) + log2(N/B)
    *
    * computed as `pmi20` = floor(PMI * 2^20) from the two Log2Fix terms
    * (the split keeps every product inside int64 up to ~3e9 tokens; past
    * that a production run would pre-scale the counts — the ranking only
    * needs the ratio). Bigrams below [[CollocMinCount]] occurrences are
    * noise and excluded, ties broken by bigram ascending.
    *
    * Plan shape: everything downstream of the count table is vocab-sized
    * — bigram candidates, the two c_x/c_y lookups (word keys recovered by
    * splitting the aggregated bigram strings, never per-occurrence), and
    * the 1-row totals broadcast; the corpus itself never joins, and the
    * top-k is a TakeOrderedAndProject. */
  def collocationsFrom(counts: DataFrame): DataFrame = {
    // n_big from the dedicated slot-total row — the filtered "b" side no
    // longer sums to the slot count (hapax occurrences are absent)
    val totals = counts
      .agg(sum(when(col("k") === "u", col("c")).otherwise(0)).as("n_tok"),
        sum(when(col("k") === "bt", col("c")).otherwise(0)).as("n_big"))
    val ucnt = counts.where(col("k") === "u")
      .select(col("g").as("t"), col("c"))
    val bcnt = counts.where(col("k") === "b" && col("c") >= CollocMinCount)
      .select(col("g").as("bigram"), col("c").as("pairs"))
      // word keys recovered on the aggregated (vocab-sized) side only
      .withColumn("x", split(col("bigram"), " ").getItem(0))
      .withColumn("y", split(col("bigram"), " ").getItem(1))

    val joined = bcnt
      .join(ucnt.select(col("t").as("x"), col("c").as("cx")), "x")
      .join(ucnt.select(col("t").as("y"), col("c").as("cy")), "y")
      .crossJoin(broadcast(totals))
    joined
      .withColumn("pmi20",
        slog2(col("pairs") * col("n_tok"), col("cx") * col("cy")) +
          VectorExpressions.log2_fix(col("n_tok"), col("n_big")))
      .orderBy(col("pmi20").desc, col("bigram").asc)
      .limit(CollocTopK)
      .select(col("bigram"), col("pairs"), col("pmi20"))
  }

  /** DuckDB twin of [[collocations]] — replays both Log2Fix chains. */
  val collocationsOracle: String = {
    val lg1 = Log2Fix.duckdbCtes("r1", "bigram, pairs, sgn", "lg1")
    // dummy key "kk" (NOT "k" — the Log2Fix CTE chain has its own k column)
    val lg2 = Log2Fix.duckdbCtes("r2", "kk", "lg2")
    s"""WITH RECURSIVE tok AS (
       |  SELECT list_filter(string_split_regex(lower(text), '\\W+'),
       |                     t -> t != '') AS w FROM documents),
       |tot AS (
       |  SELECT sum(len(w))::BIGINT AS n_tok,
       |    sum(greatest(len(w) - 1, 0))::BIGINT AS n_big FROM tok),
       |big AS (
       |  SELECT unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
       |    i -> w[i] || ' ' || w[i+1])) AS bigram FROM tok),
       |bcnt AS (
       |  SELECT bigram, count(*)::BIGINT AS pairs FROM big GROUP BY 1
       |  HAVING count(*) >= $CollocMinCount),
       |uni AS (SELECT unnest(w) AS t FROM tok),
       |ucnt AS (SELECT t, count(*)::BIGINT AS c FROM uni GROUP BY 1),
       |j AS (
       |  SELECT bigram, pairs, pairs * n_tok AS p1, cx.c * cy.c AS p2
       |  FROM bcnt
       |  JOIN ucnt cx ON cx.t = string_split(bigram, ' ')[1]
       |  JOIN ucnt cy ON cy.t = string_split(bigram, ' ')[2], tot),
       |r1 AS (
       |  SELECT bigram, pairs, CASE WHEN p1 >= p2 THEN 1 ELSE -1 END AS sgn,
       |    greatest(p1, p2) AS num, least(p1, p2) AS den FROM j),
       |$lg1,
       |r2 AS (SELECT 1 AS kk, n_tok AS num, n_big AS den FROM tot),
       |$lg2
       |SELECT bigram, pairs,
       |  (sgn * lg1.l20 + (SELECT l20 FROM lg2))::BIGINT AS pmi20
       |FROM lg1 ORDER BY pmi20 DESC, bigram LIMIT $CollocTopK""".stripMargin
  }

  /** Bigram language-model quality score with add-one smoothing — the
    * perplexity filter one order up from [[Curation.lmScore]]'s unigram
    * model (a bigram LM separates natural word order from shuffled soup,
    * which a unigram model cannot). Per bigram slot (w1, w2):
    *
    *   p(w2|w1) = (c12 + 1) / (c1 + V)      [add-one smoothing, V = vocab]
    *   nll_e6   = floor(ln((c1 + V)/(c12 + 1)) * 1e6)
    *
    * with c12 the gram's count IN THE FILTERED TABLE: bigrams the hapax
    * pre-filter dropped (exact count < [[HapaxMin]]) take the add-one
    * FLOOR ln((c1 + V)/1) — i.e. c12 treated as 0, the same probability
    * an unseen continuation of w1 gets. That is the bounded approximation
    * the pre-filter buys: a hapax's true nll ln((c1+V)/2) differs from
    * its floor by exactly ln 2, and only hapax slots are affected.
    *
    * Add-one smoothing is what keeps the arithmetic sign-free for the
    * Log2Fix kernel: c1 + V >= c12 + 1 always (c12 <= c1, V >= 1), so the
    * ratio never drops below 1 and no signed-log branch is needed. The
    * per-doc score is the integer mean over the doc's bigram slots; docs
    * with fewer than two tokens have no slots and are excluded.
    *
    * Plan shape: the nll table is computed per DISTINCT surviving bigram
    * on the vocab-bounded [[gramCounts]] side (c1 looked up by splitting
    * the aggregated bigram string — never per occurrence) and broadcasts
    * into the per-doc bigram stream via a LEFT join; the per-word floor
    * table (unigram-vocab-sized) broadcasts alongside to fill the dropped
    * grams. The corpus streams once into ONE doc-keyed aggregate and
    * shuffles only (doc_id, partial-sum) rows.
    * Output: (doc_id, n_bigrams, mean_nll2_e6). */
  def lm2Score(docs: DataFrame, counts: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    val ucnt = counts.where(col("k") === "u").select(col("g").as("t"), col("c"))
    val vsize = ucnt.agg(count(lit(1)).as("v"))
    val nll = counts.where(col("k") === "b")
      .select(col("g"), col("c").as("c12"))
      .withColumn("x", split(col("g"), " ").getItem(0))
      .join(ucnt.select(col("t").as("x"), col("c").as("c1")), "x")
      .crossJoin(broadcast(vsize))
      .withColumn("nll_e6", shiftright(
        VectorExpressions.log2_fix(col("c1") + col("v"), col("c12") + 1) *
          Log2Fix.Ln2E6, 20))
      .select(col("g"), col("nll_e6"))
    // add-one floor per FIRST word: ln((c1 + V)/1), the nll of any bigram
    // the pre-filter dropped; every first word is in the vocab, so the
    // floor join is inner and total
    val floorTbl = ucnt.crossJoin(broadcast(vsize))
      .withColumn("floor_e6", shiftright(
        VectorExpressions.log2_fix(col("c") + col("v"), lit(1L)) *
          Log2Fix.Ln2E6, 20))
      .select(col("t").as("x"), col("floor_e6"))
    // carry: doc-level metadata columns riding the per-doc aggregate
    // keys (see lmScore — removes the consumer's doc-keyed join back to
    // the corpus; default Nil keeps the original plan byte-identical)
    docs
      .select(col("doc_id").cast("long").as("doc_id") +:
        carry.map(col) :+ Dedup.tokens(col("text")).as("w"): _*)
      .select(col("doc_id") +: carry.map(col) :+
        explode(bigramSeq(col("w"))).as("g"): _*)
      .withColumn("x", split(col("g"), " ").getItem(0))
      .join(broadcast(nll), Seq("g"), "left")
      .join(broadcast(floorTbl), "x")
      .groupBy(col("doc_id") +: carry.map(col): _*)
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(coalesce(nll_e6, floor_e6)) div count(1)").as("mean_nll2_e6"))
  }

  /** The [[lm2Score]] CTE chain up to the per-doc score, with every CTE
    * name prefixed by `p` so it can be spliced alongside OTHER chains
    * (the DoReMi oracle runs it next to [[Curation.lmScoreCtes]] — one
    * definition of the score, never a re-derivation). Replays the hapax
    * pre-filter as the plain exact-count predicate it is
    * (`HAVING count(*) >= HapaxMin`; the bucket/Bloom pass is a pure
    * implementation detail with no semantic footprint), plus the
    * per-word add-one floor fallback. Ends in
    * `${p}doc(doc_id, n_bigrams, mean_nll2_e6)`; does NOT own the
    * `WITH RECURSIVE` opener. */
  private[graft] def lm2ScoreCtes(p: String): String = {
    val lg = Log2Fix.duckdbCtes(s"${p}src", "g", s"${p}lg")
    val fl = Log2Fix.duckdbCtes(s"${p}fsrc", "t", s"${p}fl")
    s"""${p}tok AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |    list_filter(string_split_regex(lower(text), '\\W+'),
       |                t -> t != '') AS w FROM documents),
       |${p}big AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, greatest(len(w) - 1, 0) + 1),
       |    i -> w[i] || ' ' || w[i+1])) AS g FROM ${p}tok),
       |${p}bcnt AS (SELECT g, count(*)::BIGINT AS c12 FROM ${p}big GROUP BY 1
       |         HAVING count(*) >= $HapaxMin),
       |${p}ucnt AS (
       |  SELECT t, count(*)::BIGINT AS c1
       |  FROM (SELECT unnest(w) AS t FROM ${p}tok) GROUP BY 1),
       |${p}vs AS (SELECT count(*)::BIGINT AS v FROM ${p}ucnt),
       |${p}src AS (
       |  SELECT g, c1 + v AS num, c12 + 1 AS den
       |  FROM ${p}bcnt JOIN ${p}ucnt ON t = string_split(g, ' ')[1], ${p}vs),
       |$lg,
       |${p}nll AS (SELECT g, (l20 * ${Log2Fix.Ln2E6}) >> 20 AS nll_e6 FROM ${p}lg),
       |${p}fsrc AS (SELECT t, c1 + v AS num, 1::BIGINT AS den FROM ${p}ucnt, ${p}vs),
       |$fl,
       |${p}flr AS (SELECT t, (l20 * ${Log2Fix.Ln2E6}) >> 20 AS floor_e6 FROM ${p}fl),
       |${p}doc AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       |    (sum(coalesce(nll_e6, floor_e6)) // count(*))::BIGINT AS mean_nll2_e6
       |  FROM ${p}big
       |  LEFT JOIN ${p}nll USING (g)
       |  JOIN ${p}flr ON ${p}flr.t = string_split(g, ' ')[1]
       |  GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB twin of [[lm2Score]] — the shared [[lm2ScoreCtes]] chain. */
  val lm2ScoreOracle: String =
    s"""WITH RECURSIVE ${lm2ScoreCtes("")}
       |SELECT doc_id, n_bigrams, mean_nll2_e6 FROM doc""".stripMargin

  /** Kneser–Ney discount D = [[KnDiscountNum]]/[[KnDiscountDen]] = 3/4
    * (Chen & Goodman 1999's fixed-discount baseline) — kept rational so
    * every probability is an exact int64 fraction: the formula below is
    * multiplied through by [[KnDiscountDen]], so "c − D" becomes the
    * integer `4·c − 3` and no engine ever divides. */
  val KnDiscountNum = 3L
  val KnDiscountDen = 4L

  /** Back-term envelope for [[knScore]]: the backoff numerator
    * `3·(N1_u+1)·(N1_w+1)` is bounded by `3·(N1pp+1)²` (continuation
    * counts never exceed the kept-bigram type count), so N1pp below this
    * bound keeps it under 2^62 (3·(1.23e9)² ≈ 4.54e18 < 2^62) — and the
    * shift bound keeps the discount term under 2^62 too, so their SUM
    * (the fraction's numerator) stays inside int64. A corpus
    * whose PERSISTED bigram table passes 1.23e9 types trips the loud
    * in-plan guard rather than wrapping — at that scale the documented
    * swap is pre-scaling the continuation counts by a common shift, the
    * same quantization [[knScore]] already applies to the big products. */
  val KnMaxBigramTypes = 1230000000L

  /** Kneser–Ney bigram language-model score — the smoothing family the
    * CCNet/KenLM perplexity filter actually uses (Wenzek et al. 2020 score
    * with a modified-KN model; [[lm2Score]]'s add-one smoothing is the
    * order-0 stand-in). Continuation counts make the backoff reward words
    * that appear in MANY contexts rather than words that appear OFTEN —
    * the "san francisco" test: `francisco` is frequent but follows only
    * `san`, so its unigram backoff weight should be tiny.
    *
    * Per bigram slot (u, w), with c12 the pair's count in the persisted
    * [[gramCounts]] table (dropped hapax pairs score as unseen, c12 = 0 —
    * the same bounded pre-filter approximation [[lm2Score]] documents),
    * c1 = c(u), N1_u = |{w' : (u,w') kept}|, N1_w = |{u' : (u',w) kept}|,
    * N1pp = kept bigram types, V = vocabulary size:
    *
    *   P(w|u) = [max(c12 − D, 0) + D·(N1_u+1)·Pcont(w)] / c1
    *   Pcont(w) = (N1_w + 1) / (N1pp + V)        [add-one continuation]
    *
    * The +1s are add-one smoothing of the continuation distribution
    * (Σ_w Pcont = 1 exactly, every slot strictly positive — no floor
    * table needed, unseen (u,w) flows through the SAME formula with the
    * discount term zero). Multiplying through by KnDiscountDen = 4 and
    * C = N1pp + V gives the pure-integer fraction
    *
    *   num = max(4·c12 − 3, 0)·C + 3·(N1_u+1)·(N1_w+1),   den = 4·c1·C
    *
    * and nll_e6 = floor(ln(den/num)·1e6) via the [[Log2Fix]] kernel.
    *
    * int64 envelope, by construction rather than by guard: the two big
    * products multiply a COUNT (≤ max c1) by the scalar C, so C is
    * shift-QUANTIZED once per corpus — `sh = max(0, bl(4·maxc) + bl(C) −
    * 60)`, `Cq = max(C >> sh, 1)` with bl(x) = ⌊log2 x⌋ — which bounds
    * every product below 2^62 at ANY corpus size (so the numerator SUM
    * of the discount product and the [[KnMaxBigramTypes]]-guarded
    * back-term stays inside int64) (the DoReMi
    * shift-normalization precedent: both engines replay the identical
    * quantization, so the gate stays bit-exact; sh = 0 until max(c1)·C
    * approaches 2^61, i.e. well past trillion-token corpora). The backoff
    * term (a product of two continuation counts, not of a count and C)
    * is shifted by the same sh and guarded by [[KnMaxBigramTypes]]. The
    * add-one mass can push a near-deterministic pair's P marginally above
    * 1 (Σ_w P = (Σc12 + D)/c1 ≤ 1 + D/c1); its nll clamps to 0 — both
    * engines replay the clamp, and it keeps every per-doc sum
    * nonnegative so the truncating mean is floor-exact cross-engine.
    *
    * Plan shape (the [[lm2Score]] scale discipline): the model tables —
    * kept bigrams, unigrams, the two continuation-count aggregates, the
    * 1-row scalar — all derive from the vocab-bounded [[gramCounts]]
    * side and BROADCAST. The broadcast bound is far TIGHTER than the
    * int64 envelope: a bigram-type table stops fitting driver/executor
    * memory around 10^7–10^8 rows (a few GB), two orders of magnitude
    * below [[KnMaxBigramTypes]] — at that point the documented swap is
    * dropping the `broadcast()` hints so the kept-bigram and
    * continuation joins become sort-merge joins shuffled on the
    * bigram/word key (the int64 quantization is join-strategy-agnostic,
    * so only the exchange shape changes, not the values). The corpus
    * streams once through the bigram
    * explode, joins the broadcasts, evaluates the codegen'd kernel
    * per slot inline (the per-distinct-pair precompute the oracle uses is
    * the documented swap when slots-per-type is high), and shuffles only
    * (doc_id, partial-sum) rows into ONE doc-keyed aggregate. Docs with
    * fewer than two tokens have no slots and are excluded.
    *
    * Output: (doc_id, n_bigrams, mean_knll_e6). */
  def knScore(docs: DataFrame, counts: DataFrame): DataFrame = {
    val ucnt = counts.where(col("k") === "u")
      .select(col("g").as("t"), col("c").as("c1"))
    val bxy = counts.where(col("k") === "b")
      .select(col("g"), col("c").as("c12"),
        split(col("g"), " ").getItem(0).as("x"),
        split(col("g"), " ").getItem(1).as("y"))
    val n1uT = bxy.groupBy(col("x")).agg(count(lit(1)).as("n1u"))
    val n1wT = bxy.groupBy(col("y")).agg(count(lit(1)).as("n1w"))
    // the corpus-level scalar row: V, max unigram count, kept-type count,
    // the quantization shift and the quantized C — one broadcast row; the
    // envelope guard rides a filtered column (the q27 pattern) so pruning
    // cannot elide it
    val scal = ucnt.agg(count(lit(1)).as("v"), max(col("c1")).as("maxc"))
      .crossJoin(bxy.agg(count(lit(1)).as("n1pp")))
      .withColumn("_g", assert_true(col("n1pp") < lit(KnMaxBigramTypes),
        lit("llm_kn_perplexity int64 back-term envelope exceeded: " +
          "kept bigram types pass 1.23e9 — pre-scale continuation counts")))
      .filter(col("_g").isNull)
      .withColumn("cc", col("n1pp") + col("v"))
      .withColumn("sh", greatest(
        (length(bin(col("maxc") * 4)) - 1) +
          (length(bin(col("cc"))) - 1) - 60, lit(0)).cast("int"))
      .withColumn("cq", greatest(expr("shiftright(cc, sh)"), lit(1L)))
      .select(col("sh"), col("cq"))
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(bigramSeq(col("w"))).as("g"))
      .withColumn("x", split(col("g"), " ").getItem(0))
      .withColumn("y", split(col("g"), " ").getItem(1))
      .join(broadcast(bxy.select(col("g"), col("c12"))), Seq("g"), "left")
      .join(broadcast(ucnt.select(col("t").as("x"), col("c1"))), "x")
      .join(broadcast(n1uT), Seq("x"), "left")
      .join(broadcast(n1wT), Seq("y"), "left")
      .crossJoin(broadcast(scal))
      .withColumn("a", greatest(coalesce(col("c12"), lit(0L)) * 4 - 3, lit(0L)))
      .withColumn("back", expr(
        "shiftright(3 * (coalesce(n1u, 0L) + 1) * (coalesce(n1w, 0L) + 1), sh)"))
      .withColumn("num", greatest(col("a") * col("cq") + col("back"), lit(1L)))
      .withColumn("den", col("c1") * 4 * col("cq"))
      .withColumn("knll_e6", when(col("den") >= col("num"), shiftright(
        VectorExpressions.log2_fix(col("den"), col("num")) * Log2Fix.Ln2E6, 20))
        .otherwise(lit(0L)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(knll_e6) div count(1)").as("mean_knll_e6"))
  }

  /** The [[knScore]] CTE chain up to the per-doc score, prefixed like
    * [[lm2ScoreCtes]] for splice-ability. The oracle evaluates the kernel
    * per DISTINCT occurring bigram (num/den are functions of the pair
    * alone) and joins back to the slot stream — same values as the
    * engine's inline per-slot evaluation, fewer recursive-CTE rows. Ends
    * in `${p}kdoc(doc_id, n_bigrams, mean_knll_e6)`; does NOT own the
    * `WITH RECURSIVE` opener. */
  private[graft] def knScoreCtes(p: String): String = {
    val lg = Log2Fix.duckdbCtes(s"${p}ksrc", "g", s"${p}klg")
    s"""${p}ktok AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |    list_filter(string_split_regex(lower(text), '\\W+'),
       |                t -> t != '') AS w FROM documents),
       |${p}kbig AS (
       |  SELECT doc_id, unnest(list_transform(
       |    range(1, greatest(len(w) - 1, 0) + 1),
       |    i -> w[i] || ' ' || w[i+1])) AS g FROM ${p}ktok),
       |${p}kbcnt AS (SELECT g, count(*)::BIGINT AS c12 FROM ${p}kbig GROUP BY 1
       |          HAVING count(*) >= $HapaxMin),
       |${p}kucnt AS (
       |  SELECT t, count(*)::BIGINT AS c1
       |  FROM (SELECT unnest(w) AS t FROM ${p}ktok) GROUP BY 1),
       |${p}kn1u AS (SELECT string_split(g, ' ')[1] AS x, count(*)::BIGINT AS n1u
       |         FROM ${p}kbcnt GROUP BY 1),
       |${p}kn1w AS (SELECT string_split(g, ' ')[2] AS y, count(*)::BIGINT AS n1w
       |         FROM ${p}kbcnt GROUP BY 1),
       |${p}kscal AS (
       |  SELECT greatest((length(bin(maxc * 4)) - 1) +
       |                  (length(bin(n1pp + v)) - 1) - 60, 0) AS sh,
       |         n1pp + v AS cc
       |  FROM (SELECT count(*)::BIGINT AS v, max(c1)::BIGINT AS maxc
       |        FROM ${p}kucnt),
       |       (SELECT count(*)::BIGINT AS n1pp FROM ${p}kbcnt)),
       |${p}kscal2 AS (SELECT sh, greatest(cc >> sh, 1::BIGINT) AS cq FROM ${p}kscal),
       |${p}kpair AS (
       |  SELECT g, greatest(coalesce(c12, 0) * 4 - 3, 0)::BIGINT AS a,
       |    c1, sh, cq,
       |    ((3 * (coalesce(n1u, 0) + 1) * (coalesce(n1w, 0) + 1)) >> sh)::BIGINT AS back
       |  FROM (SELECT DISTINCT g, string_split(g, ' ')[1] AS x,
       |               string_split(g, ' ')[2] AS y FROM ${p}kbig)
       |  LEFT JOIN ${p}kbcnt USING (g)
       |  JOIN ${p}kucnt ON t = x
       |  LEFT JOIN ${p}kn1u USING (x)
       |  LEFT JOIN ${p}kn1w USING (y), ${p}kscal2),
       |${p}kfrac AS (
       |  SELECT g, greatest(a * cq + back, 1)::BIGINT AS knum,
       |    (c1 * 4 * cq)::BIGINT AS kden
       |  FROM ${p}kpair),
       |${p}ksrc AS (SELECT g, kden AS num, knum AS den FROM ${p}kfrac
       |         WHERE kden >= knum),
       |$lg,
       |${p}knll AS (
       |  SELECT g, (l20 * ${Log2Fix.Ln2E6}) >> 20 AS knll_e6 FROM ${p}klg
       |  UNION ALL
       |  SELECT g, 0::BIGINT FROM ${p}kfrac WHERE kden < knum),
       |${p}kdoc AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       |    (sum(knll_e6) // count(*))::BIGINT AS mean_knll_e6
       |  FROM ${p}kbig JOIN ${p}knll USING (g)
       |  GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB twin of [[knScore]] — the shared [[knScoreCtes]] chain. */
  val knScoreOracle: String =
    s"""WITH RECURSIVE ${knScoreCtes("")}
       |SELECT doc_id, n_bigrams, mean_knll_e6 FROM kdoc""".stripMargin

  /** Heavy-hitter threshold denominator: report tokens with
    * `freq · k > total`. 40 makes the gate corpus's answer a strict
    * non-trivial subset (the ~30 template words pass at ~1/31 of mass
    * each; the planted 'dup' token at ~1/1000 drops) at every sf decade;
    * a production corpus runs k in the thousands — the state bound
    * scales with k, nothing else changes. */
  val HeavyTokensK = 40

  /** EXACT frequent tokens above `total/k` — via a Misra–Gries prune
    * (Misra & Gries 1982; merge per Agarwal et al., "Mergeable
    * Summaries", PODS'12), NOT via a vocabulary-wide groupBy. The
    * 100 TB point: an exact token count table needs vocabulary-sized
    * aggregation state (web-scale vocab is billions of hapax-ish
    * strings); MG needs k counters per partition, and its guarantee —
    * any item with freq > n/k has a POSITIVE merged count (no false
    * negatives) — means a bounded second pass over just the ≤ k
    * candidates recovers the EXACT answer:
    *   1. per-partition MG(k) summaries (one token-stream pass, k
    *      counters of state each);
    *   2. driver merge: sum summaries, subtract the (k+1)-th largest
    *      count, keep positives (the PODS'12 compress — undercount stays
    *      ≤ n/k, so no qualifying item dies); partials are
    *      partitions × k rows — bounded; treeAggregate is the documented
    *      swap when partitions × k outgrows the driver;
    *   3. one conditional aggregate over the re-streamed tokens with the
    *      candidate set broadcast (InSet): per-candidate exact counts
    *      PLUS the exact total ride the same pass (non-candidates fold
    *      into one null group — state ≤ k+1 whatever the vocabulary),
    *      and the exact integer filter `c·k > n` removes every false
    *      positive. Partitioning/order affect which extra candidates MG
    *      retains, never the final set (exactness restored in pass 3).
    * Output: `(t, c)` — the exact counts of every token above total/k. */
  def heavyTokens(docs: DataFrame, k: Int = HeavyTokensK): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val toks = docs.select(explode(Dedup.tokens(col("text"))).as("t"))
    val partials = toks.as[String].mapPartitions { it =>
      val mg = new java.util.HashMap[String, Long]()
      it.foreach { t =>
        val cur = mg.get(t)
        if (cur != 0L || mg.containsKey(t)) mg.put(t, cur + 1)
        else if (mg.size < k) mg.put(t, 1L)
        else {
          val e = mg.entrySet().iterator()
          while (e.hasNext) {
            val en = e.next()
            if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1)
          }
        }
      }
      Iterator.single(mg.asScala.toMap)
    }.collect()
    val merged = scala.collection.mutable.HashMap.empty[String, Long]
    partials.foreach(_.foreach { case (t, c) =>
      merged(t) = merged.getOrElse(t, 0L) + c
    })
    val cands: Seq[String] =
      if (merged.size <= k) merged.keys.toSeq
      else {
        val sub = merged.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
        merged.iterator.filter(_._2 > sub).map(_._1).toSeq
      }
    if (cands.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL("t STRING, c BIGINT"))
    // the exact total rides the SAME aggregate as the candidate counts
    // (non-candidates fold into the null group, so n = Σc over all ≤ k+1
    // groups) — summed via a global window over the tiny grouped table,
    // so the token stream is scanned exactly once in this pass (the MG
    // pass + this one = the documented two corpus scans)
    val grouped = toks
      .groupBy(when(col("t").isInCollection(cands), col("t")).as("t"))
      .agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
    grouped.where(col("t").isNotNull && col("c") * k > col("n"))
      .select(col("t"), col("c"))
  }

  /** DuckDB twin of [[heavyTokens]] — the MG prune is a pure
    * implementation detail with no semantic footprint (pass 3 restores
    * exactness), so the oracle is the plain definition. */
  val heavyTokensOracle: String =
    s"""WITH tok AS (
       |  SELECT unnest(list_filter(string_split_regex(lower(text), '\\W+'),
       |                            t -> t != '')) AS t
       |  FROM documents),
       |tot AS (SELECT count(*)::BIGINT AS n FROM tok)
       |SELECT t, count(*)::BIGINT AS c FROM tok, tot
       |GROUP BY t, n HAVING count(*) * $HeavyTokensK > n""".stripMargin

  /** The fixed keyword query for the BM25 entry: two common terms and one
    * rare term ("dup" appears only in the planted duplicate docs), so the
    * ranking exercises the idf spread. */
  val Bm25Terms: Seq[String] = Seq("spark", "merge", "dup")
  val Bm25TopK = 10

  /** BM25 top-[[Bm25TopK]] retrieval for [[Bm25Terms]], integerized.
    * Per matching (doc, term) with term frequency tf, doc length dl
    * (tokens), N docs, avgdl the mean doc length:
    *
    *   idf        = ln((N + 1) / (df + 0.5))          [Lucene's +1 form:
    *                                                   never negative]
    *   term score = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    *
    * with k1 = 1.2, b = 0.75. Integerization: `idf_e6` from Log2Fix on
    * the doubled ratio (2N+2)/(2df+1); the doc-length ratio is reduced
    * FIRST to a per-doc e3 integer `r_e3 = dl*1000 div max(avgdl_tok, 1)`
    * (avgdl_tok = n_tok div N), and the rational term-score multiplies
    * through by 1e4 so the ONE division is the final integer div:
    *
    *   ts = (idf_e6 * 22000 * tf) div (10000*tf + 3000 + 9*r_e3)
    *
    * Overflow bound — deliberately INDEPENDENT of corpus shape: the
    * numerator is idf_e6 (≤ ~3e7 at N = 1e12 docs) × 22000 × tf, inside
    * int64 for tf up to ~1e7 occurrences of one term in one document;
    * folding avgdl into the numerator instead (the obvious
    * multiply-through) overflows at realistic avgdl×tf under ANSI mode.
    *
    * Plan shape: the corpus explodes to its token stream but is filtered
    * to the query terms BEFORE any shuffle — only matching postings (a
    * |terms|-bounded sliver) reach the (doc, term) aggregate. df and the
    * corpus stats are tiny aggregates; idf joins back as a broadcast.
    * The final top-k is a TakeOrderedAndProject (per-partition heaps, no
    * global sort), deterministic via the (score desc, doc_id) total
    * order. */
  def bm25(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      Dedup.tokens(col("text")).as("w"))
    val stats = toks
      .agg(count(lit(1)).as("n_docs"), sum(size(col("w"))).as("n_tok"))
      .select(col("n_docs"),
        greatest(expr("n_tok div n_docs"), lit(1L)).as("avgdl_tok"))

    val tf = toks
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"),
        explode(col("w")).as("term"))
      .where(col("term").isin(Bm25Terms: _*))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_e6", shiftright(
        VectorExpressions.log2_fix(col("n_docs") * 2 + 2, col("df") * 2 + 1) *
          Log2Fix.Ln2E6, 20))
      .select(col("term"), col("idf_e6"), col("avgdl_tok"))

    tf.join(broadcast(idf), "term")
      .withColumn("r_e3", expr("(dl * 1000) div avgdl_tok"))
      .withColumn("ts", expr(
        "(idf_e6 * 22000 * tf) div (10000 * tf + 3000 + 9 * r_e3)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("ts")).as("score_e6"))
      .orderBy(col("score_e6").desc, col("doc_id").asc)
      .limit(Bm25TopK)
      .select(col("doc_id"), col("n_terms"), col("score_e6"))
  }

  /** DuckDB twin of [[bm25]]. */
  val bm25Oracle: String = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    val lg = Log2Fix.duckdbCtes("r1", "term, df", "lg")
    s"""WITH RECURSIVE tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
       |                             t -> t != '') AS w FROM documents),
       |st AS (
       |  SELECT count(*)::BIGINT AS n_docs,
       |    greatest(sum(len(w))::BIGINT // count(*), 1) AS avgdl_tok FROM tok),
       |tf AS (
       |  SELECT doc_id, t AS term, count(*)::BIGINT AS tf,
       |    max(dln)::BIGINT AS dl
       |  FROM (SELECT doc_id, len(w) AS dln, unnest(w) AS t FROM tok)
       |  WHERE t IN ($terms) GROUP BY 1, 2),
       |dfc AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
       |r1 AS (
       |  SELECT term, df, 2 * n_docs + 2 AS num, 2 * df + 1 AS den
       |  FROM dfc, st),
       |$lg,
       |idf AS (SELECT term, (l20 * ${Log2Fix.Ln2E6}) >> 20 AS idf_e6 FROM lg),
       |sc AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_terms,
       |    sum((idf_e6 * 22000 * tf)
       |        // (10000 * tf + 3000 + 9 * ((dl * 1000) // avgdl_tok)))::BIGINT
       |      AS score_e6
       |  FROM tf JOIN idf USING (term), st GROUP BY 1)
       |SELECT doc_id::BIGINT AS doc_id, n_terms, score_e6
       |FROM sc ORDER BY score_e6 DESC, doc_id LIMIT $Bm25TopK""".stripMargin
  }

  val SpanGram = 5

  /** Positional word n-gram starts: `(p, gram)` structs, p 1-based —
    * [[Dedup.gramSeq]] zipped with its indices (the gram list is already
    * in document order, so the 0-based transform index + 1 IS the start
    * position). */
  def posShingleSeq(w: Column, n: Int): Column =
    transform(Dedup.gramSeq(w, n),
      (g, i) => struct((i + 1).cast("long").as("p"), g.as("g")))

  /** Duplicated-span detection (the Lee et al. 2022 "Deduplicating
    * Training Data" shape): mark every position where a word
    * [[SpanGram]]-gram occurs MORE THAN ONCE corpus-wide, merge the
    * covered token ranges per document, and report the duplicated-token
    * fraction — the per-document evidence a span-cutting dedup pass acts
    * on (doc-level Jaccard misses a copied paragraph inside an otherwise
    * unique doc; this finds exactly the copied tokens). Emits one row per
    * document with at least one duplicated span: `(doc_id, n_spans,
    * dup_tok, n_tokens, dup_frac_e4)` where spans are maximal contiguous
    * covered ranges.
    *
    * Plan shape: the positional gram stream is generated TWICE (a count
    * pass and a mark pass) and deliberately never persisted — unlike the
    * collocation count table it is corpus-sized, so re-streaming the
    * narrow scan beats materializing it at any real scale. The
    * duplicated-gram set comes from ONE map-side-combined count
    * aggregate (no collect_list per gram — hot boilerplate grams stay
    * skew-safe, same argument as the tfidf df aggregate); the membership
    * join back is gram-keyed (broadcast while the dup set is small, AQE
    * skew-split otherwise). The interval merge is two window functions
    * sharing ONE sort over ONE (doc_id)-keyed shuffle of only the
    * duplicated starts — a sliver of the corpus — and per-doc token
    * counts ride the gram rows so no third scan is needed. */
  def dupSpans(docs: DataFrame): DataFrame = dupSpans(docs, hotGramOwners(docs))

  /** The CORPUS-WIDE duplicated-gram ownership table shared by the
    * detection report ([[dupSpans]]) and the cut apply ([[dupSpanCut]]):
    * `(g, odoc, op)` — every word [[SpanGram]]-gram occurring MORE THAN
    * ONCE, with its first corpus-order occurrence (min (doc_id, p)
    * struct — the exact integer tie-break the cut's keep-one semantics
    * acts on). ONE map-side-combined aggregate (never a per-gram window,
    * so hot boilerplate grams stay skew-safe — the tfidf df argument);
    * output is DUPLICATED-GRAM-sized, the sliver of the gram vocabulary
    * worth persisting (the gram STREAM stays corpus-sized and is never
    * persisted — the established dupSpans discipline). Callers that run
    * detection and cut as one pipeline persist THIS table once (§5
    * reuse: two consumers, each otherwise paying its own full
    * count-pass gram generation) and each pass then re-generates only
    * its own mark-side stream. */
  def hotGramOwners(docs: DataFrame): DataFrame = {
    val L = SpanGram
    val grams = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= L)
      .select(col("doc_id"), explode(posShingleSeq(col("w"), L)).as("pg"))
      .select(col("doc_id"), col("pg.p").as("p"), col("pg.g").as("g"))
    grams.groupBy("g")
      .agg(count(lit(1)).as("c"), min(struct(col("doc_id"), col("p"))).as("o"))
      .where(col("c") >= 2)
      .select(col("g"), col("o.doc_id").as("odoc"), col("o.p").as("op"))
  }

  /** [[dupSpans]] against a PRECOMPUTED (typically persisted)
    * [[hotGramOwners]] table — the detection's dup-gram set is exactly
    * the hot table's key set (count >= 2 is its defining predicate), so
    * the verdict is identical to the self-contained overload. */
  def dupSpans(docs: DataFrame, hot: DataFrame): DataFrame = {
    val L = SpanGram
    val grams = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= L)
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
        explode(posShingleSeq(col("w"), L)).as("pg"))
      .select(col("doc_id"), col("n_tokens"),
        col("pg.p").as("p"), col("pg.g").as("g"))
    val dup = hot.select("g")
    val starts = grams.join(dup, "g")
      .select(col("doc_id"), col("n_tokens"), col("p"))
    val spans = mergeSpanStarts(starts, Seq("n_tokens"))
    spans.groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"), sum(col("e") - col("s") + 1).as("dup_tok"),
        max(col("n_tokens")).as("n_tokens"))
      .select(col("doc_id"), col("n_spans"), col("dup_tok"), col("n_tokens"),
        floor(col("dup_tok") * lit(1e4) / col("n_tokens") + 0.5)
          .cast("long").as("dup_frac_e4"))
  }

  /** Merge the covered [p, p+SpanGram-1] token ranges of a `(doc_id,
    * carry…, p)` start table into maximal contiguous intervals
    * `(doc_id, carry…, s, e)` — the two-window single-sort merge (ONE
    * (doc_id)-keyed shuffle of only the duplicated starts) shared by the
    * detection report ([[dupSpans]]) and the cut apply ([[dupSpanCut]]);
    * `carry` columns ride through with max(). */
  private[llm] def mergeSpanStarts(starts: DataFrame, carry: Seq[String],
      L: Int = SpanGram): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy("doc_id").orderBy("p")
    val prevEnd = max(col("p") + lit(L - 1))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val aggs = carry.map(c => max(col(c)).as(c)) ++
      Seq(min(col("p")).as("s"), (max(col("p")) + lit(L - 1)).as("e"))
    starts
      .withColumn("isnew",
        when(col("p") > coalesce(prevEnd, lit(-1L)) + 1, 1L).otherwise(0L))
      .withColumn("gid", sum(col("isnew"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("gid"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Duplicated-span CUT — the APPLY step of [[dupSpans]]'s detection
    * (Lee et al. 2022 keep-one semantics): every duplicated
    * [[SpanGram]]-gram occurrence EXCEPT its first corpus-order
    * occurrence (min (doc_id, p) struct — an exact integer tie-break)
    * has its covered tokens removed; covered ranges merge exactly as the
    * detection reports them, and the cut acts at token granularity (the
    * granularity the detection measures), so case/punctuation
    * normalization is inherited from the tokenizer, not a second text
    * pass. Emits EVERY document: `(doc_id, n_tokens, cut_tok,
    * text_clean)` with text_clean the kept tokens rejoined — docs
    * without duplicated spans (or under [[SpanGram]] tokens) pass
    * through with cut_tok = 0.
    *
    * Plan shape: gram ownership is ONE map-side-combined aggregate
    * (count + min-struct per gram — never a per-gram window, so hot
    * boilerplate grams stay skew-safe, the tfidf df argument); the
    * membership join back is gram-keyed; the interval merge runs over
    * only the non-owner duplicated starts (a sliver of the corpus); the
    * cut itself is a per-row HOF filter against the doc's own
    * span-count-bounded interval list joined in by doc_id — the corpus
    * token arrays never shuffle, and the positional gram stream is
    * re-generated rather than persisted (the [[dupSpans]] discipline:
    * it is corpus-sized, the narrow re-scan beats materializing it). */
  def dupSpanCut(docs: DataFrame): DataFrame =
    dupSpanCut(docs, hotGramOwners(docs))

  /** [[dupSpanCut]] against a PRECOMPUTED (typically persisted)
    * [[hotGramOwners]] table — same ownership aggregate, same keep-one
    * semantics, shared with the detection pass instead of re-derived. */
  def dupSpanCut(docs: DataFrame, hot: DataFrame): DataFrame = {
    val L = SpanGram
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      Dedup.tokens(col("text")).as("w"))
    val grams = toks.where(size(col("w")) >= L)
      .select(col("doc_id"), explode(posShingleSeq(col("w"), L)).as("pg"))
      .select(col("doc_id"), col("pg.p").as("p"), col("pg.g").as("g"))
    val nonOwner = grams.join(hot, "g")
      .where(!(col("doc_id") === col("odoc") && col("p") === col("op")))
      .select("doc_id", "p")
    cutCovered(toks, mergeSpanStarts(nonOwner, Seq.empty))
  }

  /** Apply merged `(doc_id, s, e)` token intervals as a CUT over a
    * `(doc_id, w)` token table: every row of `toks` comes back as
    * `(doc_id, n_tokens, cut_tok, text_clean)` with covered tokens
    * removed — the shared tail of [[dupSpanCut]] and
    * [[Curation.decontamCut]]. The interval list is span-count-bounded
    * per doc and joins in by doc_id; the cut is a per-row HOF filter, so
    * the corpus token arrays never shuffle. */
  private[llm] def cutCovered(toks: DataFrame, intervals: DataFrame): DataFrame = {
    val ivTable = intervals
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("ivs"))
    val ivl = coalesce(col("ivs"),
      array().cast("array<struct<s:bigint,e:bigint>>"))
    val kept = filter(col("w"), (_, i) =>
      !exists(ivl, iv =>
        (i + 1) >= iv.getField("s") && (i + 1) <= iv.getField("e")))
    toks.join(ivTable, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        (size(col("w")) - size(kept)).cast("long").as("cut_tok"),
        array_join(kept, " ").as("text_clean"))
  }

  /** The merge+cut SQL tail shared by [[dupSpanCutOracle]] and
    * [[Curation.decontamCutOracle]]: CTEs m/gi/iv/pos/cov/keptp/kl/cut
    * over a caller-defined start table `$no(doc_id, p)` (covered width
    * `L`) and token table `$tok(doc_id, w)`, plus the final projection —
    * ONE definition of the merge windows and the empty-list/NULL
    * coalesce both cut oracles replay. Kept positions come from a
    * relational anti-join of exploded positions against exploded
    * interval cover (Σ tokens + Σ covered work) — the earlier per-token
    * `list_filter` over the doc's interval list was O(tokens×intervals)
    * in interpreted lambdas and blew the sf1 oracle past its 480 s
    * budget (round-13 campaign). */
  private[llm] def spanCutTailSql(no: String, tok: String, L: Int): String =
    s"""m AS (
       |  SELECT doc_id, p,
       |    CASE WHEN p > coalesce(max(p + ${L - 1}) OVER (
       |        PARTITION BY doc_id ORDER BY p
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
       |      THEN 1 ELSE 0 END AS isnew
       |  FROM $no),
       |gi AS (
       |  SELECT doc_id, p, sum(isnew) OVER (
       |    PARTITION BY doc_id ORDER BY p) AS gid FROM m),
       |iv AS (
       |  SELECT doc_id, gid, min(p) AS s, max(p) + ${L - 1} AS e
       |  FROM gi GROUP BY 1, 2),
       |pos AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS i FROM $tok),
       |cov AS (SELECT doc_id, unnest(range(s, e + 1)) AS i FROM iv),
       |keptp AS (
       |  SELECT p.doc_id, p.i FROM pos p
       |  LEFT JOIN cov c ON c.doc_id = p.doc_id AND c.i = p.i
       |  WHERE c.i IS NULL),
       |kl AS (SELECT doc_id, list(i ORDER BY i) AS ks FROM keptp GROUP BY doc_id),
       |cut AS (
       |  SELECT t.doc_id, t.w,
       |    list_transform(coalesce(l.ks, []), i -> t.w[i]) AS kept
       |  FROM $tok t LEFT JOIN kl l ON t.doc_id = l.doc_id)
       |SELECT doc_id::BIGINT AS doc_id, len(w)::BIGINT AS n_tokens,
       |  (len(w) - len(kept))::BIGINT AS cut_tok,
       |  coalesce(array_to_string(kept, ' '), '') AS text_clean
       |FROM cut""".stripMargin

  /** DuckDB twin of [[dupSpanCut]]. */
  val dupSpanCutOracle: String = {
    val L = SpanGram
    val gramExpr = (1 to L).map(o => s"w[i+${o - 1}]").mkString(" || ' ' || ")
    s"""WITH tok0 AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
       |                             t -> t != '') AS w FROM documents),
       |ge AS (
       |  SELECT doc_id, unnest(
       |    list_transform(range(1, len(w) - ${L - 1} + 1),
       |      i -> struct_pack(p := i::BIGINT, g := $gramExpr))) AS pg
       |  FROM tok0 WHERE len(w) >= $L),
       |gp AS (SELECT doc_id, pg.p AS p, pg.g AS g FROM ge),
       |own AS (
       |  -- ownership = lexicographic min (doc_id, p), packed into ONE
       |  -- int64 (doc_id·2^20 + p; exact while p < 2^20, i.e. any doc
       |  -- under a million tokens): DuckDB's min(STRUCT) aggregate
       |  -- allocates unaccounted heap per group and OOMs the host at
       |  -- ~10^6 gram groups (the real round-13 sf1 killer of this
       |  -- oracle); the packed-int min is a plain fixed-width aggregate.
       |  -- The CASE is the LOUD domain guard (like bitstring_agg's range
       |  -- error next door): a doc over 2^20 tokens or doc_id >= 2^43
       |  -- would silently change ownership order — fail the oracle to
       |  -- oracle_infeasible instead of returning a plausible wrong set
       |  SELECT g, min(CASE
       |    WHEN p >= 1048576 OR doc_id >= 8796093022208 THEN
       |      error('packed ownership domain exceeded (p>=2^20 or doc_id>=2^43)')::BIGINT
       |    ELSE doc_id * 1048576 + p END) AS op
       |  FROM gp GROUP BY g HAVING count(*) >= 2),
       |no AS (
       |  SELECT doc_id, p FROM gp JOIN own USING (g)
       |  WHERE doc_id * 1048576 + p != op),
       |${spanCutTailSql("no", "tok0", L)}""".stripMargin
  }

  /** Docs whose duplicated-span coverage reaches this fraction (e4) are
    * dropped by the composed pipeline's span-cut stage (Lee et al. cut
    * the spans in place; at the document-selection granularity this
    * pipeline composes, a doc that is half duplicated text is removed). */
  val DupSpanDropE4 = 5000L

  /** The dup-span CTE chain with a caller-chosen prefix, ending in
    * `<p>sp(doc_id, n_spans, dup_tok, n_tokens, dup_frac_e4)` — ONE
    * definition shared by [[dupSpansOracle]] and the composed-pipeline
    * oracle (prefixed so it can sit next to other stages' CTEs without
    * name collisions). */
  def dupSpansCtes(p: String): String = {
    val L = SpanGram
    val gramExpr = (1 to L).map(o => s"w[i+${o - 1}]").mkString(" || ' ' || ")
    s"""${p}tok AS (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
       |                               t -> t != '') AS w FROM documents)
       |  WHERE len(w) >= $L),
       |${p}ge AS (
       |  SELECT doc_id, len(w)::BIGINT AS n_tokens, unnest(
       |    list_transform(range(1, len(w) - ${L - 1} + 1),
       |      i -> struct_pack(p := i::BIGINT, g := $gramExpr))) AS pg
       |  FROM ${p}tok),
       |${p}gp AS (SELECT doc_id, n_tokens, pg.p AS p, pg.g AS g FROM ${p}ge),
       |${p}dup AS (SELECT g FROM ${p}gp GROUP BY g HAVING count(*) >= 2),
       |${p}ds AS (SELECT doc_id, n_tokens, p FROM ${p}gp JOIN ${p}dup USING (g)),
       |${p}m AS (
       |  SELECT doc_id, n_tokens, p,
       |    CASE WHEN p > coalesce(max(p + ${L - 1}) OVER (
       |        PARTITION BY doc_id ORDER BY p
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
       |      THEN 1 ELSE 0 END AS isnew
       |  FROM ${p}ds),
       |${p}gi AS (
       |  SELECT doc_id, n_tokens, p, sum(isnew) OVER (
       |    PARTITION BY doc_id ORDER BY p) AS gid FROM ${p}m),
       |${p}iv AS (
       |  SELECT doc_id, gid, max(n_tokens) AS n_tokens, min(p) AS s,
       |    max(p) + ${L - 1} AS e
       |  FROM ${p}gi GROUP BY 1, 2),
       |${p}sp AS (
       |  SELECT doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_spans,
       |    sum(e - s + 1)::BIGINT AS dup_tok,
       |    max(n_tokens)::BIGINT AS n_tokens,
       |    floor(sum(e - s + 1) * 1.0e4 / max(n_tokens) + 0.5)::BIGINT
       |      AS dup_frac_e4
       |  FROM ${p}iv GROUP BY doc_id)""".stripMargin
  }

  /** DuckDB twin of [[dupSpans]]. */
  val dupSpansOracle: String =
    s"""WITH ${dupSpansCtes("")}
       |SELECT doc_id, n_spans, dup_tok, n_tokens, dup_frac_e4 FROM sp""".stripMargin

  val FuzzyGram = 4 // keep in lockstep with Curation.DecontamGram — the
                    // 13-gram analog for the tiny synthetic vocab; a
                    // shorter gram explodes chance collisions (31^3
                    // possible grams ≈ corpus shingle count) and with
                    // them the candidate-pair density
  val FuzzyThreshold = 0.5

  /** Fuzzy benchmark decontamination: flag training documents whose
    * distinct word [[FuzzyGram]]-gram Jaccard against ANY benchmark
    * document (the same `doc_id % 17 = 0` stand-in as
    * [[Curation.decontaminate]]) reaches [[FuzzyThreshold]] — the
    * near-match contamination filter (exact n-gram overlap misses
    * lightly-edited eval copies; Jaccard catches them). Emits one row per
    * contaminated (doc, bench) pair with the rounded similarity.
    *
    * Plan shape: the benchmark side is an eval suite — tiny at any corpus
    * scale — so its full inverted shingle index (g -> bench_id, |bench
    * shingles|) broadcasts, the corpus shingle stream filters against it
    * MAP-SIDE, and only matching slivers reach the one (doc, bench)
    * count-aggregate. Intersection counts come straight from that
    * aggregate (no second corpus pass, no candidate re-join), and the
    * Jaccard test is exact — unlike banded MinHash there are no false
    * negatives at the threshold, which is what lets the DuckDB all-pairs
    * oracle match row-for-row. */
  def fuzzyDecontam(docs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    // The repartition is a MATERIALIZATION BARRIER, not a distribution
    // choice (the ngramJaccard precedent, Dedup.scala): without it
    // InferFiltersFromGenerate pushes a `size(shingles) > 0` prune below
    // this projection and inlines the tokenization into every element_at
    // of the shingle lambda — measured ~70 split() calls per row. The
    // compact (doc_id, n, sh) form is persisted because BOTH the bench
    // and corpus branches read it (otherwise each branch replays the
    // scan+shingle work); OpCaches bounds the lifetime, and the entry is
    // memoized per (session, dir) so repeat invocations don't churn it.
    val sh = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= FuzzyGram)
      .repartition(par, col("doc_id"))
      .select(col("doc_id"),
        Dedup.shinglesFromTokens(col("w"), FuzzyGram).as("sh"))
      .select(col("doc_id"), size(col("sh")).cast("long").as("n"), col("sh"))
      .persist()
    OpCaches.track("mining.fuzzy", Seq(sh))
    val ex = sh.select(col("doc_id"), col("n"), explode(col("sh")).as("g"))
    val bench = ex.where(col("doc_id") % 17 === 0)
      .select(col("doc_id").as("bench_id"), col("n").as("nb"), col("g"))
    val c = ex.where(col("doc_id") % 17 =!= 0)
      .join(broadcast(bench), "g")
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("c"), max(col("n")).as("na"), max(col("nb")).as("nb"))
    val jac = col("c").cast("double") /
      (col("na") + col("nb") - col("c")).cast("double")
    c.where(jac >= FuzzyThreshold)
      .select(col("doc_id"), col("bench_id"),
        Dedup.jaccardE4(col("c"), col("na") + col("nb") - col("c"))
          .as("jaccard_r"))
  }

  /** DuckDB twin of [[fuzzyDecontam]] — plain all-pairs vs the benchmark
    * subset (feasible at oracle scale). */
  val fuzzyDecontamOracle: String = {
    val gramExpr = (0 until FuzzyGram).map(o => s"w[i+$o]").mkString(" || ' ' || ")
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    range(1, greatest(len(w) - ${FuzzyGram - 1}, 0) + 1),
       |    i -> $gramExpr)) AS g
       |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
       |                                   t -> t != '') w
       |        FROM documents WHERE len(list_filter(
       |          string_split_regex(lower(text), '\\W+'), t -> t != ''))
       |          >= $FuzzyGram)),
       |inter AS (
       |  SELECT a.doc_id AS doc_id, b.doc_id AS bench_id, count(*) AS c
       |  FROM sh a JOIN sh b USING (g)
       |  WHERE a.doc_id % 17 != 0 AND b.doc_id % 17 = 0
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
       |SELECT i.doc_id::BIGINT AS doc_id, bench_id::BIGINT AS bench_id,
       |  floor(c * 1.0e4 / (sa.n + sb.n - c) + 0.5)::BIGINT AS jaccard_r
       |FROM inter i
       |JOIN sizes sa ON sa.doc_id = i.doc_id
       |JOIN sizes sb ON sb.doc_id = i.bench_id
       |WHERE c * 1.0 / (sa.n + sb.n - c) >= $FuzzyThreshold""".stripMargin
  }

  // ------------------------------------------------------- source overlap

  /** Gram length for the cross-source overlap matrix (word 5-grams — the
    * boilerplate/df phrase unit). */
  val OverlapGram = 5

  /** Cross-source n-gram overlap matrix — the corpus-leakage diagnostic a
    * curation run consults before capping or dedup: which pairs of
    * sources share suspiciously much text (mirrors, syndication, scraped
    * re-hosts). One row per unordered source pair that shares at least
    * one distinct word-[[OverlapGram]]-gram: the shared distinct-gram
    * count, each side's distinct-gram total, and the overlap coefficient
    * |A∩B| / min(|A|,|B|) in e4 (integer floor — engine-neutral).
    *
    * Plan shape: ONE corpus scan melts to the DISTINCT (source, gram)
    * table (corpus-sublinear — the df table's shape), persisted and read
    * three times (pair join both sides + per-source sizes). The pair
    * count is a gram-keyed self-join whose per-gram output is bounded by
    * sources² — the source domain is small (tens here, at most thousands
    * at web scale), so a boilerplate gram present everywhere emits a
    * bounded pair burst, never a corpus-scaled one. Per-source sizes are
    * a broadcast; nothing all-pairs over documents anywhere. */
  def sourceOverlap(docs: DataFrame): DataFrame = {
    val n = OverlapGram
    val grams = docs
      .select(col("source"), Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= n)
      .select(col("source"), explode(Dedup.shinglesFromTokens(col("w"), n)).as("g"))
      .distinct()
      .persist()
    OpCaches.track("mining.sourceOverlap", Seq(grams))
    val shared = grams.select(col("source").as("src_a"), col("g"))
      .join(grams.select(col("source").as("src_b"), col("g")), Seq("g"))
      .where(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("shared"))
    val sizes = grams.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    shared
      .join(broadcast(sizes.select(col("source").as("src_a"), col("sz").as("na"))),
        Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"), col("sz").as("nb"))),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("shared"), col("na"), col("nb"),
        expr("(shared * 10000) div least(na, nb)").as("overlap_e4"))
  }

  /** DuckDB twin of [[sourceOverlap]]. */
  val sourceOverlapOracle: String = {
    val gramExpr = (0 until OverlapGram).map(o => s"w[i+$o]").mkString(" || ' ' || ")
    s"""WITH sh AS (
       |  SELECT DISTINCT source, unnest(list_transform(
       |    range(1, greatest(len(w) - ${OverlapGram - 1}, 0) + 1),
       |    i -> $gramExpr)) AS g
       |  FROM (SELECT source, list_filter(string_split_regex(lower(text), '\\W+'),
       |                                   t -> t != '') w FROM documents)
       |  WHERE len(w) >= $OverlapGram),
       |sz AS (SELECT source, count(*) AS sz FROM sh GROUP BY 1),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
       |  FROM sh a JOIN sh b USING (g)
       |  WHERE a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT src_a, src_b, shared::BIGINT AS shared,
       |  sa.sz::BIGINT AS na, sb.sz::BIGINT AS nb,
       |  ((shared * 10000) // least(sa.sz, sb.sz))::BIGINT AS overlap_e4
       |FROM pairs
       |JOIN sz sa ON sa.source = pairs.src_a
       |JOIN sz sb ON sb.source = pairs.src_b""".stripMargin
  }

  /** Per-document n-gram NOVELTY: the fraction of a doc's distinct
    * [[OverlapGram]]-gram shingles whose corpus-wide FIRST occurrence
    * (min doc_id) is this doc — the "how much does this doc add that
    * earlier data didn't already have" curation diagnostic (the doc-id
    * order stands in for crawl/arrival order, the same convention the
    * incremental-dedup operator uses).
    *
    * Scale shape: the corpus-sized (doc_id, gram) stream is aggregated
    * per gram (map-side-combined min) and the novel count per doc falls
    * straight out of a SECOND doc-keyed aggregate over that result — the
    * gram stream is never joined back to itself, so the only corpus-sized
    * shuffle is the gram-keyed min (the per-doc size aggregate combines
    * to doc-count cardinality map-side). The stream is re-generated for
    * each consumer rather than persisted — the [[dupSpans]] discipline:
    * two cheap corpus scans beat materializing a corpus-sized gram table.
    * The final join is doc-count-sized on both sides. Pure integer e4
    * arithmetic. */
  def novelty(docs: DataFrame): DataFrame = {
    val n = OverlapGram
    val grams = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"), explode(Dedup.shinglesFromTokens(col("w"), n)).as("g"))
    val owners = grams.groupBy(col("g")).agg(min(col("doc_id")).as("doc_id"))
    val novel = owners.groupBy(col("doc_id")).agg(count(lit(1)).as("novel_grams"))
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
    sizes
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"))
      .withColumn("novelty_e4", expr("novel_grams * 10000 div n_grams"))
  }

  /** DuckDB twin of [[novelty]]. */
  val noveltyOracle: String = {
    val gramExpr = (0 until OverlapGram).map(o => s"w[i+$o]").mkString(" || ' ' || ")
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, unnest(list_transform(
       |    range(1, greatest(len(w) - ${OverlapGram - 1}, 0) + 1),
       |    i -> $gramExpr)) AS g
       |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
       |                                   t -> t != '') w FROM documents)
       |  WHERE len(w) >= $OverlapGram),
       |own AS (SELECT g, min(doc_id) AS doc_id FROM sh GROUP BY 1),
       |nov AS (SELECT doc_id, count(*) AS novel_grams FROM own GROUP BY 1),
       |sz AS (SELECT doc_id, count(*) AS n_grams FROM sh GROUP BY 1)
       |SELECT sz.doc_id, sz.n_grams::BIGINT AS n_grams,
       |  coalesce(nov.novel_grams, 0)::BIGINT AS novel_grams,
       |  (coalesce(nov.novel_grams, 0) * 10000 // sz.n_grams)::BIGINT AS novelty_e4
       |FROM sz LEFT JOIN nov USING (doc_id)""".stripMargin
  }

  // ------------------------------------------------- source KL divergence

  /** Per-source unigram-distribution divergence from the whole corpus:
    *
    *   KL(P_s ‖ P) = Σ_w p_s(w) · log2(p_s(w) / p(w))   [bits]
    *
    * with p_s(w) = c_sw / n_s and p(w) = c_w / N — the data-mixture
    * diagnostic the [[Curation.mixtureKeep]] / [[Curation.domainCap]]
    * knobs consult: a source far from the corpus distribution is either
    * a distinct register worth reweighting or template spam worth
    * capping, and a near-zero KL on a supposedly-independent source is a
    * mirror. Computed in the split signed-Log2Fix form
    * `slog2(c_sw, c_w) + log2fix(N, n_s)` (the DSIR trick) so every
    * kernel argument is a plain count — int64-safe at any corpus size
    * where the single-ratio product `c_sw·N` overflows past ~3e9 tokens.
    * Reported integers: `kl20_sum` = Σ_w c_sw·slog2(c_sw,c_w) +
    * n_s·log2fix(N,n_s) = floor-exact n_s·KL·2^20 under the kernel's
    * pinned approximation, and `kl20_avg` = kl20_sum div n_tok (per-token
    * KL in 2^-20 bits; `div` ≡ DuckDB BIGINT `//`, both truncate toward
    * zero). |kl20_sum| ≤ n_s·63·2^20 keeps int64 safe for sources to
    * ~1.4e11 tokens; past that, drop fraction bits.
    *
    * Plan shape: ONE corpus scan melts to the map-side-combined
    * (source, word) count table (vocab×sources-sized — corpus-sublinear),
    * persisted because all four downstream consumers (c_w re-aggregate,
    * n_s re-aggregate, the term join, the grand total) read it; the term
    * join is the agg-then-join df shape (skew-safe, AQE-splittable), the
    * per-source totals broadcast. The corpus itself never shuffles. */
  def sourceKl(docs: DataFrame): DataFrame = {
    val sw = docs
      .select(col("source"), explode(Dedup.tokens(col("text"))).as("t"))
      .groupBy("source", "t").agg(count(lit(1)).as("c_sw"))
      .persist()
    OpCaches.track("mining.sourceKl", Seq(sw))
    val cw = sw.groupBy("t").agg(sum(col("c_sw")).as("c_w"))
    val ns = sw.groupBy("source").agg(sum(col("c_sw")).as("n_tok"))
    val nn = ns.agg(sum(col("n_tok")).as("nn"))
    val s1 = sw.join(cw, "t")
      .withColumn("lr", slog2(col("c_sw"), col("c_w")))
      .groupBy("source").agg(sum(col("c_sw") * col("lr")).as("s1"))
    s1.join(ns, "source").crossJoin(broadcast(nn))
      .select(col("source"), col("n_tok"),
        (col("s1") + col("n_tok") *
          VectorExpressions.log2_fix(col("nn"), col("n_tok"))).as("kl20_sum"))
      .withColumn("kl20_avg", expr("kl20_sum div n_tok"))
  }

  /** Per-language temporal DRIFT between the corpus's two doc_id halves
    * (doc-id order stands in for crawl/arrival order, the [[novelty]] /
    * incremental-dedup convention): the Population Stability Index
    *
    *   PSI = Σ_w (p_a(w) − p_b(w)) · log2(p_a(w) / p_b(w))
    *
    * over add-one-smoothed unigram distributions p(w) = (c+1)/(n+V) —
    * the smoothing keeps every word defined on both sides, the standard
    * PSI zero-bin guard. The snapshot-shift monitor a recurring curation
    * run consults per language: PSI ≈ 0 means today's crawl looks like
    * yesterday's; a spike means the source mix or register moved (or a
    * pipeline stage upstream broke).
    *
    * Integer discipline: probabilities integerize at e6 by truncating
    * div (identical in both engines; e6 keeps (c+1)·1e6 inside int64 for
    * single-word counts to ~9.2e12 — past that, pre-scale counts), the
    * log ratio is the split signed-Log2Fix form slog2(ca+1, cb+1) +
    * slog2(nb+V, na+V) — every kernel argument a plain count. `psi_sum`
    * = Σ (pa_e6 − pb_e6)·lr20 in e6·2^-20-bit units; since Σ|pa−pb| ≤ 2
    * over a distribution pair and |lr20| ≤ 2·63·2^20 (it is the SUM of
    * two slog2 terms), |psi_sum| ≤ 2e6·126·2^20 ≈ 2.6e14 — int64-safe
    * regardless of vocabulary size. `psi_ub20` = psi_sum div 1e6 is the
    * PSI in 2^-20-bit units.
    *
    * Plan shape: ONE corpus scan → map-side-combined (lang, word,
    * half-conditional counts) — vocab-sized; per-lang totals re-aggregate
    * it and broadcast back; the cutoff is a bounded 1-row min/max
    * aggregate (the incremental-dedup precedent), mirrored exactly by
    * the oracle. The corpus never shuffles. */
  def drift(docs: DataFrame): DataFrame = {
    val ids = docs.agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"))
      .head()
    if (ids.isNullAt(0))
      return docs.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "lang STRING, n_a BIGINT, n_b BIGINT, vocab BIGINT, " +
            "psi_sum BIGINT, psi_ub20 BIGINT"))
    val cut = (ids.getLong(0) + ids.getLong(1)) / 2
    val counts = docs
      .select(col("lang"), (col("doc_id") <= cut).as("a"),
        explode(Dedup.tokens(col("text"))).as("t"))
      .groupBy("lang", "t")
      .agg(sum(when(col("a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("a"), 0L).otherwise(1L)).as("cb"))
      .persist()
    OpCaches.track("mining.drift", Seq(counts))
    val totals = counts.groupBy("lang")
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
        count(lit(1)).as("v"))
    val terms = counts.join(broadcast(totals), "lang")
      .withColumn("pa_e6", expr("(ca + 1) * 1000000 div (na + v)"))
      .withColumn("pb_e6", expr("(cb + 1) * 1000000 div (nb + v)"))
      .withColumn("lr20",
        slog2(col("ca") + 1, col("cb") + 1) +
          slog2(col("nb") + col("v"), col("na") + col("v")))
      .groupBy("lang")
      .agg(sum((col("pa_e6") - col("pb_e6")) * col("lr20")).as("psi_sum"))
    terms.join(broadcast(totals), "lang")
      .select(col("lang"), col("na").as("n_a"), col("nb").as("n_b"),
        col("v").as("vocab"), col("psi_sum"),
        expr("psi_sum div 1000000").as("psi_ub20"))
  }

  /** DuckDB twin of [[drift]] — two Log2Fix chains per (lang, word) /
    * per lang. */
  val driftOracle: String = {
    val lg1 = Log2Fix.duckdbCtes("r1", "lang, t, pa_e6, pb_e6, sgn", "lg1")
    val lg2 = Log2Fix.duckdbCtes("r2", "lang, sgn2", "lg2")
    s"""WITH RECURSIVE ids AS (
       |  SELECT (min(doc_id) + max(doc_id)) // 2 AS cut FROM documents),
       |tok AS (
       |  SELECT lang, doc_id <= cut AS a,
       |    unnest(list_filter(string_split_regex(lower(text), '\\W+'),
       |                       x -> x != '')) AS t
       |  FROM documents, ids),
       |cnt AS (
       |  SELECT lang, t,
       |    sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS ca,
       |    sum(CASE WHEN a THEN 0 ELSE 1 END)::BIGINT AS cb
       |  FROM tok GROUP BY 1, 2),
       |tot AS (
       |  SELECT lang, sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb,
       |    count(*)::BIGINT AS v
       |  FROM cnt GROUP BY 1),
       |j AS (
       |  SELECT c.lang, c.t, ca, cb, na, nb, v,
       |    ((ca + 1) * 1000000 // (na + v)) AS pa_e6,
       |    ((cb + 1) * 1000000 // (nb + v)) AS pb_e6
       |  FROM cnt c JOIN tot USING (lang)),
       |r1 AS (
       |  SELECT lang, t, pa_e6, pb_e6,
       |    CASE WHEN ca >= cb THEN 1 ELSE -1 END AS sgn,
       |    greatest(ca + 1, cb + 1) AS num, least(ca + 1, cb + 1) AS den
       |  FROM j),
       |$lg1,
       |r2 AS (
       |  SELECT lang, CASE WHEN nb >= na THEN 1 ELSE -1 END AS sgn2,
       |    greatest(nb + v, na + v) AS num, least(nb + v, na + v) AS den
       |  FROM tot),
       |$lg2,
       |s1 AS (
       |  SELECT lg1.lang,
       |    sum((pa_e6 - pb_e6) * (sgn * lg1.l20 + sgn2 * lg2.l20))::BIGINT
       |      AS psi_sum
       |  FROM lg1 JOIN lg2 USING (lang) GROUP BY 1)
       |SELECT tot.lang, na AS n_a, nb AS n_b, v AS vocab, psi_sum,
       |  (psi_sum // 1000000)::BIGINT AS psi_ub20
       |FROM s1 JOIN tot USING (lang)""".stripMargin
  }

  /** DuckDB twin of [[sourceKl]] — replays both Log2Fix chains. */
  val sourceKlOracle: String = {
    val lg1 = Log2Fix.duckdbCtes("r1", "source, t, c_sw, sgn", "lg1")
    val lg2 = Log2Fix.duckdbCtes("r2", "source, n_tok", "lg2")
    s"""WITH RECURSIVE tok AS (
       |  SELECT source, list_filter(string_split_regex(lower(text), '\\W+'),
       |                             t -> t != '') AS w FROM documents),
       |uni AS (SELECT source, unnest(w) AS t FROM tok),
       |swc AS (SELECT source, t, count(*)::BIGINT AS c_sw FROM uni GROUP BY 1, 2),
       |cwc AS (SELECT t, sum(c_sw)::BIGINT AS c_w FROM swc GROUP BY 1),
       |ns AS (SELECT source, sum(c_sw)::BIGINT AS n_tok FROM swc GROUP BY 1),
       |nt AS (SELECT sum(c_w)::BIGINT AS nn FROM cwc),
       |r1 AS (
       |  SELECT source, t, c_sw, CASE WHEN c_sw >= c_w THEN 1 ELSE -1 END AS sgn,
       |    greatest(c_sw, c_w) AS num, least(c_sw, c_w) AS den
       |  FROM swc JOIN cwc USING (t)),
       |$lg1,
       |s1 AS (SELECT source, sum(c_sw * sgn * l20)::BIGINT AS s1
       |       FROM lg1 GROUP BY 1),
       |r2 AS (SELECT source, n_tok, nn AS num, n_tok AS den FROM ns, nt),
       |$lg2
       |SELECT s1.source, ns.n_tok,
       |  (s1.s1 + ns.n_tok * lg2.l20)::BIGINT AS kl20_sum,
       |  ((s1.s1 + ns.n_tok * lg2.l20) // ns.n_tok)::BIGINT AS kl20_avg
       |FROM s1 JOIN ns USING (source) JOIN lg2 USING (source)""".stripMargin
  }

  // --------------------------------------------------------- vocab growth

  /** Corpus prefix buckets for [[vocabGrowth]] (deciles of the doc-id
    * range). */
  val VocabGrowthBuckets = 10

  /** Heaps-law vocabulary-growth profile: split the corpus into
    * [[VocabGrowthBuckets]] doc-id deciles and report, per decile, the
    * document/token mass and the number of words whose FIRST occurrence
    * falls there, plus running totals — `(decile, n_docs, n_tokens,
    * tokens_cum, new_words, vocab_cum)`. The `vocab_cum` vs `tokens_cum`
    * curve is the Heaps/Herdan diagnostic a corpus card reports (is the
    * crawl still discovering vocabulary, or re-crawling the same text?),
    * and a flattening `new_words` tail is the cheap staleness signal.
    *
    * Scale shape: two corpus scans, zero corpus shuffles of full rows —
    * scan 1 aggregates per-doc (decile, token count) into a
    * BUCKETS-sized table; scan 2 melts words and min-aggregates
    * first-occurrence doc per word (vocab-sized, map-side-combined — the
    * classic word-count shuffle). Everything downstream (decile spine,
    * cumulative window) runs on ≤ BUCKETS rows, so the unpartitioned
    * window is a constant-size frame, not a corpus funnel. The doc-id
    * count rides in as a broadcast 1-row aggregate; `doc_id · buckets`
    * stays in int64 for any doc_id < 9.2e17. */
  def vocabGrowth(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = VocabGrowthBuckets
    val spark = docs.sparkSession
    val d = docs.select(col("doc_id").cast("long").as("doc_id"),
      Dedup.tokens(col("text")).as("w"))
    val nd = d.agg((max(col("doc_id")) + 1).as("nd"))
    val decile = expr(s"least(doc_id * $b div nd, ${b - 1})")

    val perDecile = d.select(col("doc_id"), size(col("w")).cast("long").as("n_tok"))
      .crossJoin(broadcast(nd))
      .groupBy(decile.as("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

    val firstDoc = d.select(col("doc_id"), explode(col("w")).as("t"))
      .groupBy(col("t")).agg(min(col("doc_id")).as("doc_id"))
    val newWords = firstDoc.crossJoin(broadcast(nd))
      .groupBy(decile.as("decile"))
      .agg(count(lit(1)).as("new_words"))

    val spine = spark.range(b).select(col("id").as("decile"))
    // BUCKETS rows post-aggregate: the unpartitioned running-sum window
    // is a constant-size frame (the q16 aggregated-series shape)
    val cum = Window.orderBy(col("decile"))
    spine.join(perDecile, Seq("decile"), "left_outer")
      .join(newWords, Seq("decile"), "left_outer")
      .select(col("decile"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("new_words"), lit(0L)).as("new_words"))
      .withColumn("tokens_cum", sum(col("n_tokens")).over(cum))
      .withColumn("vocab_cum", sum(col("new_words")).over(cum))
      .select("decile", "n_docs", "n_tokens", "tokens_cum", "new_words",
        "vocab_cum")
  }

  // ------------------------------------------------------------------ zipf

  /** Rank window for the [[zipf]] slope fit and the deepest head-mass
    * coefficient. */
  val ZipfTopN = 1000

  /** Zipf rank-frequency diagnostic, one row per corpus: `(vocab,
    * total_tokens, top10_e4, top100_e4, top1000_e4, slope_e4)` — the
    * token-mass share of the 10/100/[[ZipfTopN]] most frequent words and
    * the least-squares slope of log2(count) against log2(rank) over the
    * top [[ZipfTopN]] (Zipf's law predicts ≈ −1; a much flatter slope on
    * a web snapshot usually means boilerplate/template mass, much
    * steeper means a degenerate vocabulary). Pure integer end-to-end:
    * both logs are the [[graft.functions.Log2Fix]] kernel (den = 1),
    * right-shifted 11 bits so every regression sum stays far inside
    * int64 at any corpus size, and the final e4 slope uses the split
    * quantized division (q·1e4 + r·1e4 div den — exact under truncating
    * division of either sign).
    *
    * Scale shape: one corpus scan into the map-combined word-count
    * aggregate (vocab-sized); the top-N is TakeOrderedAndProject (no
    * global sort), the regression runs over ≤ N rows, and the corpus
    * totals ride in as a broadcast 1-row aggregate. The head-mass
    * numerators bound `total_tokens < 9.2e14` (×1e4 in int64) — two
    * orders past a 100 TB corpus. */
  def zipf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // r18: the vocab aggregate is PERSISTED and n/vocab ride as a
    // broadcast 1-row aggregate OVER THE CACHE. History of this spot:
    // the original crossJoin(broadcast(wc.agg)) re-planned the whole
    // corpus tokenize+count pass under the broadcast (two corpus passes
    // for one diagnostic); r17 replaced it with a GLOBAL WINDOW over the
    // vocab table (one pass) — but an unpartitioned window shuffles the
    // ENTIRE vocab into ONE task, and unlike lmScore's (whose windowed
    // table is the one the plan broadcasts two lines later anyway) zipf
    // never broadcasts its vocab, so at web-corpus vocabularies
    // (hundreds of millions of distinct tokens) that single task was a
    // serial choke + OOM hazard the old plan did not have (VERDICT r17
    // item 3 / ADVICE). Persisting the vocab-sized table keeps it
    // DISTRIBUTED (MEMORY_AND_DISK, spills instead of dying), the totals
    // aggregate is map-side combined over the cache, and the corpus is
    // still tokenized exactly once.
    val wc = docs.select(explode(Dedup.tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .persist()
    OpCaches.track("mining.zipf", Seq(wc))
    val tot = wc.agg(sum(col("c")).as("n"), count(lit(1)).as("vocab"))
    // ties at the cut break toward the lexicographically smaller word —
    // pinned so the oracle selects the identical row set
    val top = wc.orderBy(col("c").desc, col("t")).limit(ZipfTopN)
      .withColumn("r",
        row_number().over(Window.orderBy(col("c").desc, col("t"))).cast("long"))
      .crossJoin(broadcast(tot))
    val x = shiftright(VectorExpressions.log2_fix(col("r"), lit(1L)), 11)
    val y = shiftright(VectorExpressions.log2_fix(col("c"), lit(1L)), 11)
    val reg = top.select(col("c"), col("r"), col("n"), col("vocab"),
        x.as("x"), y.as("y"))
      .agg(count(lit(1)).as("k"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(when(col("r") <= 10, col("c")).otherwise(lit(0L))).as("m10"),
        sum(when(col("r") <= 100, col("c")).otherwise(lit(0L))).as("m100"),
        sum(col("c")).as("mtop"),
        // totals are constant across the top rows (window-carried);
        // coalesce(vocab, 0) preserves the former empty-corpus row shape
        // (count() = 0, sum() = null) exactly
        first(col("n")).as("n"),
        coalesce(first(col("vocab")), lit(0L)).as("vocab"))
    reg
      .withColumn("num", expr("k * sxy - sx * sy"))
      .withColumn("den", expr("nullif(k * sxx - sx * sx, 0)"))
      .select(col("vocab"), col("n").as("total_tokens"),
        expr("m10 * 10000 div n").as("top10_e4"),
        expr("m100 * 10000 div n").as("top100_e4"),
        expr("mtop * 10000 div n").as("top1000_e4"),
        expr("(num div den) * 10000 + (num % den) * 10000 div den")
          .as("slope_e4"))
  }

  /** The [[zipf]] oracle's CTE chain (`z`-prefixed names so it composes
    * into multi-diagnostic oracles without collisions — the corpus-card
    * oracle splices it next to the closure/gopher/decontam chains):
    * ends with `ztot(n, vocab)` and `zsl(…, num, den, m10, m100, mtop)`.
    * Requires the query to open with `WITH RECURSIVE`. */
  val zipfCtes: String = {
    val lg = Log2Fix.duckdbCtes("zmelt", "r, kind", "zlg")
    s"""zwc AS (
       |  SELECT t, count(*)::BIGINT AS c
       |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\\W+'),
       |                                  x -> x != '')) AS t
       |        FROM documents)
       |  GROUP BY 1),
       |ztot AS (SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS vocab FROM zwc),
       |ztop AS (
       |  SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r
       |  FROM zwc ORDER BY c DESC, t LIMIT $ZipfTopN),
       |zmelt AS (
       |  SELECT r, 'x' AS kind, r::BIGINT AS num, 1::BIGINT AS den FROM ztop
       |  UNION ALL
       |  SELECT r, 'y' AS kind, c::BIGINT AS num, 1::BIGINT AS den FROM ztop),
       |$lg,
       |zxy AS (
       |  SELECT t.r, t.c,
       |    (lx.l20 >> 11)::BIGINT AS x, (ly.l20 >> 11)::BIGINT AS y
       |  FROM ztop t
       |  JOIN zlg lx ON lx.r = t.r AND lx.kind = 'x'
       |  JOIN zlg ly ON ly.r = t.r AND ly.kind = 'y'),
       |zreg AS (
       |  SELECT count(*)::BIGINT AS k,
       |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
       |    sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
       |    sum(CASE WHEN r <= 10 THEN c ELSE 0 END)::BIGINT AS m10,
       |    sum(CASE WHEN r <= 100 THEN c ELSE 0 END)::BIGINT AS m100,
       |    sum(c)::BIGINT AS mtop
       |  FROM zxy),
       |zsl AS (
       |  SELECT k, sx, sy, sxy, sxx, m10, m100, mtop,
       |    (k * sxy - sx * sy)::BIGINT AS num,
       |    nullif(k * sxx - sx * sx, 0)::BIGINT AS den
       |  FROM zreg)""".stripMargin
  }

  /** DuckDB twin of [[zipf]] — the Log2Fix kernel replayed on the melted
    * (rank ∪ count) log arguments, identical shifts, sums and split
    * division (`//`/`%` are trunc on BIGINT, matching Spark `div`/`%`
    * for either sign of the slope numerator). */
  val zipfOracle: String =
    s"""WITH RECURSIVE $zipfCtes
       |SELECT vocab, n AS total_tokens,
       |  (m10 * 10000 // n)::BIGINT AS top10_e4,
       |  (m100 * 10000 // n)::BIGINT AS top100_e4,
       |  (mtop * 10000 // n)::BIGINT AS top1000_e4,
       |  ((num // den) * 10000 + (num % den) * 10000 // den)::BIGINT
       |    AS slope_e4
       |FROM zsl, ztot""".stripMargin

  /** DuckDB twin of [[vocabGrowth]] — same decile arithmetic (`//` is
    * trunc on BIGINT, matching Spark's `div` on nonnegative ids), same
    * default RANGE window frame for the running sums (decile is unique,
    * so RANGE ≡ ROWS). */
  val vocabGrowthOracle: String = {
    val b = VocabGrowthBuckets
    s"""WITH nd AS (SELECT max(doc_id) + 1 AS nd FROM documents),
       |d AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
       |                                 t -> t != '') AS w FROM documents),
       |tok AS (
       |  SELECT least(doc_id * $b // (SELECT nd FROM nd), ${b - 1}) AS decile,
       |    count(*)::BIGINT AS n_docs, sum(len(w))::BIGINT AS n_tokens
       |  FROM d GROUP BY 1),
       |fw AS (SELECT t, min(doc_id) AS fd
       |       FROM (SELECT doc_id, unnest(w) AS t FROM d) GROUP BY 1),
       |nw AS (
       |  SELECT least(fd * $b // (SELECT nd FROM nd), ${b - 1}) AS decile,
       |    count(*)::BIGINT AS new_words
       |  FROM fw GROUP BY 1),
       |sp AS (SELECT unnest(range(0, $b)) AS decile)
       |SELECT sp.decile::BIGINT AS decile,
       |  coalesce(n_docs, 0)::BIGINT AS n_docs,
       |  coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       |  sum(coalesce(n_tokens, 0)) OVER (ORDER BY sp.decile)::BIGINT
       |    AS tokens_cum,
       |  coalesce(new_words, 0)::BIGINT AS new_words,
       |  sum(coalesce(new_words, 0)) OVER (ORDER BY sp.decile)::BIGINT
       |    AS vocab_cum
       |FROM sp LEFT JOIN tok USING (decile) LEFT JOIN nw USING (decile)""".stripMargin
  }
}
