package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{Exp2Fix, Log2Fix, VectorExpressions}

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
  * Data Mixtures Speeds Up Language Model Pretraining"): upweight the
  * sources where a STRONGER proxy model reduces loss the most over a
  * WEAKER reference model — the per-domain "reducible loss" signal the
  * paper's Group-DRO loop feeds back into the mixture. This is the
  * one-shot analytic step of that loop, on model proxies the engine
  * already owns: the add-one unigram LM ([[Curation.lmScore]]) as the
  * reference, the add-one bigram LM ([[Mining.lm2Score]]) as the proxy.
  * A domain where the bigram model beats the unigram model by a lot has
  * a lot of learnable sequential structure; a domain where it barely
  * helps is (for this model family) closer to unigram soup — the same
  * excess-loss ordering DoReMi's proxy/reference pair induces.
  *
  * Per source s (macro-averaged over docs — the int64-safe aggregation
  * at any corpus size, where token-weighted sums of e6 scores would
  * overflow past ~3e5 corpus-tokens-per-doc x 1e9 docs):
  *
  *   uni_nll_e6 = sum(doc mean unigram nll) div n_docs
  *   bi_nll_e6  = sum(doc mean bigram  nll) div n_docs2
  *   excess_e6  = max(uni_nll_e6 - bi_nll_e6, 0)        [reducible loss]
  *   w          = exp(eta * excess)   via   2^(x),
  *     x20 = (excess_e6 * EtaE2 * 2^20) div (100 * Ln2E6)
  *   weight_e6  = softmax share of w across sources, in e6
  *
  * The exponential is the pure-integer [[Exp2Fix]] kernel, and the
  * softmax normalization is SHIFT-QUANTIZED to stay int64-exact at any
  * weight magnitude: all weights share the e20 scale, so a common right
  * shift `sh = max(0, bitlen(max w) - 41)` bounds every summand below
  * 2^41 before the 1e6-scaled division — no envelope guard needed, the
  * quantization (documented, both engines) replaces it. A source whose
  * excess exceeds [[Exp2Fix.MaxX20]] (eta*excess > ~28 nats — beyond
  * any real LM gap, the unigram entropy itself is the ceiling) drops
  * from the table in BOTH engines (kernel NULL / oracle range filter).
  *
  * Scale shape: the two per-doc score tables are the existing lmScore /
  * lm2Score plans (each streams the corpus once; the vocab/gram model
  * state broadcasts). Source aggregation shuffles doc-count rows down to
  * the LOW-CARDINALITY source table (the [[graft.operators.PrefixSum]]
  * group contract); everything after — excess, exponential, shift,
  * normalize — runs on that sources-sized table with broadcast 1-row
  * aggregates, the corpus never shuffles.
  *
  * Output: (source, n_docs, uni_nll_e6, bi_nll_e6, excess_e6, weight_e6).
  */
object DoReMi {

  /** Group-DRO step size eta in e2 fixed point (1.00 — the paper's
    * default update scale for the one-shot analytic step). */
  val EtaE2 = 100L

  /** Shift-normalization bound: weights right-shift until the maximum
    * fits in 41 bits, so `w * 1e6` stays under 2^61. */
  val NormBits = 41

  def domainWeights(docs: DataFrame, counts: DataFrame): DataFrame = {
    // source rides the two per-doc score aggregates as a carry key (r17:
    // source is functionally dependent on doc_id, so grouping the carried
    // column is identical to the former dmap join — and the plan loses
    // both doc-keyed joins plus their corpus re-scans; one exchange keyed
    // the same way replaces join + second exchange, guide §2.4)
    val uni = Curation.lmScore(docs, carry = Seq("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        expr("sum(mean_nll_e6) div count(1)").as("uni_nll_e6"))
    val bi = Mining.lm2Score(docs, counts, carry = Seq("source"))
      .groupBy("source")
      .agg(expr("sum(mean_nll2_e6) div count(1)").as("bi_nll_e6"))
    // inner join: a source with no >=2-token docs carries no proxy
    // signal and has no row (mirrored by the oracle's inner join)
    val ew = uni.join(bi, "source")
      .withColumn("excess_e6",
        greatest(col("uni_nll_e6") - col("bi_nll_e6"), lit(0L)))
      .withColumn("x20",
        expr(s"excess_e6 * $EtaE2 * 1048576 div ${100L * Log2Fix.Ln2E6}"))
      .withColumn("w_e20", VectorExpressions.exp2_fix(col("x20")))
      .where(col("w_e20").isNotNull)
    // The max-shift and softmax total are GLOBAL WINDOW aggregates over
    // the sources-sized ew table (r17; previously two crossJoin(broadcast
    // (agg)) references — each embedded its own copy of ew's two-corpus-
    // pass lineage with no exchange reuse in the plan, so the LM scoring
    // pipelines were planned up to 3x). The unpartitioned window is the
    // bounded-global-window pattern (zipf/vocab_growth): ew is
    // low-cardinality by contract (one row per source), so the single
    // partition holds |sources| rows at any corpus size. Integer algebra
    // identical — only the plan shape changed.
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    ew
      .withColumn("sh",
        greatest(lit(0), length(bin(max(col("w_e20")).over(wAll))) - 1 - NormBits))
      .withColumn("wr", expr("shiftright(w_e20, sh)"))
      .withColumn("t", sum(col("wr")).over(wAll))
      .select(col("source"), col("n_docs"), col("uni_nll_e6"),
        col("bi_nll_e6"), col("excess_e6"),
        expr("wr * 1000000 div t").as("weight_e6"))
  }

  /** DuckDB twin of [[domainWeights]] — splices the SAME
    * [[Curation.lmScoreCtes]] and [[Mining.lm2ScoreCtes]] chains (score
    * definitions cannot diverge) plus the [[Exp2Fix]] replay. */
  val domainWeightsOracle: String = {
    val keys = "source, n_docs, uni_nll_e6, bi_nll_e6, excess_e6"
    s"""${Curation.lmScoreCtes},
       |${Mining.lm2ScoreCtes("b2")},
       |dmap AS (SELECT doc_id::BIGINT AS doc_id, source FROM documents),
       |uni AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |    (sum(mean_nll_e6) // count(*))::BIGINT AS uni_nll_e6
       |  FROM lmdoc JOIN dmap USING (doc_id) GROUP BY 1),
       |bi AS (
       |  SELECT source,
       |    (sum(mean_nll2_e6) // count(*))::BIGINT AS bi_nll_e6
       |  FROM b2doc JOIN dmap USING (doc_id) GROUP BY 1),
       |xsrc AS (
       |  SELECT source, n_docs, uni_nll_e6, bi_nll_e6,
       |    greatest(uni_nll_e6 - bi_nll_e6, 0)::BIGINT AS excess_e6,
       |    (greatest(uni_nll_e6 - bi_nll_e6, 0) * $EtaE2 * 1048576)
       |      // ${100L * Log2Fix.Ln2E6} AS x20
       |  FROM uni JOIN bi USING (source)),
       |${Exp2Fix.duckdbCtes("xsrc", keys, "ew")},
       |shx AS (
       |  SELECT greatest(length(bin(max(e20))) - 1 - $NormBits, 0) AS sh
       |  FROM ew),
       |wrt AS (SELECT $keys, e20 >> sh AS wr FROM ew, shx),
       |tot AS (SELECT sum(wr)::BIGINT AS t FROM wrt)
       |SELECT $keys, (wr * 1000000 // t)::BIGINT AS weight_e6
       |FROM wrt, tot""".stripMargin
  }
}
