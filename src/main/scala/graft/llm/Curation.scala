package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Log2Fix, VectorExpressions}

/** Dataset-curation operators for training-data pipelines: deterministic
  * stratified sampling, overlapping-window document chunking, benchmark
  * decontamination, TF-IDF term ranking, and PII redaction.
  *
  * Every operator is a pure relational plan (narrow scans + at most one
  * keyed shuffle) whose arithmetic is integerized/hashed so the DuckDB
  * oracle reproduces it bit-for-bit — the same discipline as
  * [[TextStats]]. Scale notes per operator below.
  */
object Curation {

  // ---------------------------------------------------------------- sample

  /** Per-language keep-rate (percent) for [[stratifiedSample]]: downsample
    * the over-represented head language, keep most of the tail — the
    * standard corpus-rebalancing move. */
  val SampleRates: Seq[(String, Int)] =
    Seq("en" -> 25, "de" -> 60, "fr" -> 60, "es" -> 60, "zh" -> 90)

  /** The 60-bit salted md5 draw (first 15 hex digits as int64 — safely
    * inside the type) — the ONE deterministic per-row randomness kernel
    * the sampling/splitting/ordering operators derive from, engine-
    * portable by construction. Keep in lockstep with [[hash60SqlOf]]. */
  def hash60(salt: String, id: Column): Column = {
    val s = if (salt.isEmpty) id.cast("string")
            else concat(lit(salt), id.cast("string"))
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")
  }

  /** DuckDB twin of [[hash60]], parameterized over the id expression. */
  def hash60SqlOf(salt: String, e: String): String =
    if (salt.isEmpty) s"('0x' || substr(md5($e::VARCHAR), 1, 15))::BIGINT"
    else s"('0x' || substr(md5('$salt' || $e::VARCHAR), 1, 15))::BIGINT"

  /** The ONE deterministic doc→bucket assignment ([[hash60]] mod 100)
    * shared by sampling and splitting. */
  private def bucketOf(docId: Column): Column = hash60("", docId) % 100
  private def docBucket: Column = bucketOf(col("doc_id"))

  /** DuckDB twin of [[bucketOf]], parameterized over the id expression. */
  def bucketSqlOf(e: String): String = s"${hash60SqlOf("", e)} % 100"
  private val bucketSql = bucketSqlOf("doc_id")

  /** The deterministic split assignment as a pure per-row projection of
    * the id — usable on EITHER side of a pair table without touching the
    * corpus (the leakage audit's whole trick). Keep the thresholds in
    * lockstep with [[split]] and [[splitCaseSqlOf]]. */
  def splitOf(docId: Column): Column = {
    val b = bucketOf(docId)
    when(b < 80, "train").when(b < 90, "validation").otherwise("test")
  }

  /** DuckDB twin of [[splitOf]]. */
  def splitCaseSqlOf(e: String): String =
    s"""CASE WHEN ${bucketSqlOf(e)} < 80 THEN 'train'
       |     WHEN ${bucketSqlOf(e)} < 90 THEN 'validation'
       |     ELSE 'test' END""".stripMargin

  /** [[docBucket]] at e6 granularity (mixture rates need finer steps than
    * percent). 15 hex digits = 60 bits, safely inside int64. */
  private def mixBucket: Column = hash60("", col("doc_id")) % 1000000

  /** DuckDB twin of [[mixBucket]]. */
  private val mixBucketSql =
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 1000000"

  /** Deterministic stratified sampling: a document is kept iff
    * `docBucket(doc_id) < rate(lang)` — a stable content hash, NOT
    * `rand()`. Determinism is what makes sampling auditable and
    * re-runnable at 100 TB: the same corpus always yields the same
    * sample, a re-run after a crash resumes identically, and the oracle
    * can verify row-for-row. The plan is a single narrow filter — no
    * shuffle, prunes to (doc_id, lang) at the scan. */
  def stratifiedSample(docs: DataFrame): DataFrame = {
    val rate = SampleRates.foldLeft(lit(0)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        docBucket.as("bucket"))
      .filter(col("bucket") < rate)
  }

  // --------------------------------------------------------------- shuffle

  val ShuffleTopK = 100

  /** Deterministic training-order shuffle: every document gets a stable
    * pseudorandom rank key (the md5-derived 60-bit integer the sampler
    * family uses — content-stable, salt-free, engine-portable), defining
    * the corpus's global training order. The entry emits the first
    * [[ShuffleTopK]] documents of that order with their rank — enough for
    * the oracle to pin the ORDER itself.
    *
    * Scale shape: the top-k prefix is a TakeOrderedAndProject
    * (per-partition heaps, no global sort); materializing the WHOLE
    * shuffled corpus — the actual pipeline step — is
    * `repartitionByRange(shuffle_key) + sortWithinPartitions`, Spark's
    * sampled range-exchange total order, which never funnels through one
    * task. Ties cannot occur (the key is salted with doc_id... the key IS
    * doc_id-derived and doc_id is unique), but doc_id remains the formal
    * tiebreak so the order is total by construction. */
  def shuffleOrder(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"))
      .withColumn("shuffle_key", hash60("shuf:", col("doc_id")))
    keyed
      .orderBy(col("shuffle_key").asc, col("doc_id").asc)
      .limit(ShuffleTopK)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("shuffle_key").asc, col("doc_id").asc)).cast("long"))
  }

  /** DuckDB twin of [[shuffleOrder]]. */
  val shuffleOrderOracle: String =
    s"""SELECT doc_id::BIGINT AS doc_id, lang,
       |  ${hash60SqlOf("shuf:", "doc_id")} AS shuffle_key,
       |  row_number() OVER (ORDER BY
       |    ${hash60SqlOf("shuf:", "doc_id")}, doc_id)::BIGINT AS rank
       |FROM documents
       |ORDER BY shuffle_key, doc_id LIMIT $ShuffleTopK""".stripMargin

  /** Sample size of [[weightedSample]]. */
  val WeightedSampleK = 100

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-ES): each doc ranks by ln(u)/w with u a deterministic
    * md5-derived uniform and w = n_chars (size-weighted selection; any
    * positive integer weight — a quality score, a DSIR weight — slots
    * into the same plan). The top-[[WeightedSampleK]] keys are the
    * sample; A-ES makes inclusion probabilities follow the weights at
    * any corpus size, and the seeded hash makes the draw reproducible
    * and auditable (re-runs yield the same sample — the [[shuffleOrder]]
    * / [[stratifiedSample]] discipline; rand() gives neither).
    *
    * Integer form: u = h/2^32 with h = 1 + md5₃₂(doc_id) ∈ [1, 2^32],
    * so ln u ∝ −log2(2^32/h) = −Log2Fix(2^32, h), and the rank key is
    * key20 = −(l20·2^20) div w — the b20 log pre-scaled by 2^20 before
    * the truncating weight division (both engines truncate toward zero;
    * |l20·2^20| ≤ 32·2^40 ≈ 3.5e13, int64-safe). Ties break by doc_id.
    *
    * Plan shape: a zero-shuffle projection (md5 + the codegen'd Log2Fix
    * expression) into TakeOrderedAndProject — per-partition top-k heaps
    * then one k-row merge, corpus-size-independent; no Window, no
    * exchange. */
  def weightedSample(docs: DataFrame, k: Int = WeightedSampleK): DataFrame =
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("w"))
      .where(col("w") > 0)
      .withColumn("h",
        conv(substring(md5(concat(lit("wsamp:"), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long") + 1)
      .withColumn("l20",
        VectorExpressions.log2_fix(lit(1L << 32), col("h")))
      .withColumn("key20", expr("-(l20 * 1048576) div w"))
      .orderBy(col("key20").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("w"), col("key20"))

  /** DuckDB twin of [[weightedSample]]. */
  val weightedSampleOracle: String = {
    val lg = Log2Fix.duckdbCtes("r1", "doc_id, w", "lg")
    s"""WITH RECURSIVE base AS (
       |  SELECT doc_id::BIGINT AS doc_id, n_chars::BIGINT AS w,
       |    ('0x' || substr(md5('wsamp:' || doc_id::VARCHAR), 1, 8))::BIGINT
       |      + 1 AS h
       |  FROM documents WHERE n_chars > 0),
       |r1 AS (SELECT doc_id, w, 4294967296 AS num, h AS den FROM base),
       |$lg
       |SELECT doc_id, w, (-(l20 * 1048576) // w)::BIGINT AS key20
       |FROM lg ORDER BY key20 DESC, doc_id LIMIT $WeightedSampleK""".stripMargin
  }

  // ------------------------------------------------------------ domain cap

  val DomainCapN = 8

  /** Per-domain cap (RefinedWeb's "no more than N documents per source"):
    * within each (source, lang) group keep the [[DomainCapN]] documents
    * with the smallest stable content hash — deterministic (re-runs and
    * the oracle agree row-for-row), unbiased (hash order is unrelated to
    * any document property), and rank-stable under corpus growth for the
    * kept set's ORDER (unlike rand()-based caps).
    *
    * Plan shape: a rank()<=N filter over a (source, lang) window, which
    * Spark rewrites to WindowGroupLimit — each input partition prunes to
    * its own top-N BEFORE the shuffle, so a giant domain contributes at
    * most N rows per upstream partition to the exchange instead of its
    * full membership (the skew escape a naive window lacks). */
  def domainCap(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"), col("lang"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    docs
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"), col("source"))
      .withColumn("rank_in_group", row_number().over(w).cast("long"))
      .where(col("rank_in_group") <= DomainCapN)
  }

  /** The capped ranking subquery — ONE definition shared by the
    * standalone oracle and the pipeline keep-set CTE, so the cap
    * semantics cannot diverge between them. */
  private val domainCapRankedSql: String =
    s"""SELECT doc_id, lang, source, row_number() OVER (
       |    PARTITION BY source, lang
       |    ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
       |  FROM documents""".stripMargin

  /** DuckDB twin of [[domainCap]]. */
  val domainCapOracle: String =
    s"""SELECT doc_id::BIGINT AS doc_id, lang, source,
       |  rn::BIGINT AS rank_in_group
       |FROM ($domainCapRankedSql)
       |WHERE rn <= $DomainCapN""".stripMargin

  /** One-in-[[PipelineCapMod]] of each domain survives the pipeline's
    * cap stage beyond the absolute floor. */
  val PipelineCapMod = 4L

  /** The COMPOSED pipeline's cap keep-set: the absolute [[domainCap]]
    * top-[[DomainCapN]] floor UNION a deterministic
    * 1-in-[[PipelineCapMod]] salted-hash sample of every domain.
    *
    * Why not [[domainCap]] alone: an absolute per-domain cap has a
    * scale-INVARIANT numerator — at the sf1 decade it kept 800 of
    * 50,000 docs (1.6 % and falling linearly with corpus growth), and
    * the pipeline's stage intersection emptied (the fourth-decade probe
    * that caught it is in PLANS.md). The union keeps the cap's
    * spam-defense floor for small domains while surviving a constant
    * FRACTION of large ones, so the composed pipeline's survivor set
    * scales with the corpus. The sample is the shared salted draw
    * kernel ([[hash60]] with salt `cap:`) — map-side, zero shuffle
    * beyond the floor's existing
    * WindowGroupLimit window; the union dedupes on the keep-set-sized
    * side only, never the corpus. */
  def pipelineCapKeep(docs: DataFrame): DataFrame =
    domainCap(docs).select("doc_id")
      .union(docs
        .select(col("doc_id").cast("long").as("doc_id"))
        .where(hash60("cap:", col("doc_id")) % PipelineCapMod === 0L))
      .distinct()

  /** DuckDB twin of [[pipelineCapKeep]] as a named CTE. DISTINCT over
    * UNION ALL, not a bare UNION: under the pipeline oracle's
    * `WITH RECURSIVE` opener DuckDB parses a CTE whose body is a
    * top-level UNION as a (degenerate) recursive definition and skips
    * the dedup — measured as exactly |floor| + |sample| rows. */
  def pipelineCapKeepCte(name: String): String =
    s"""$name AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_id::BIGINT AS doc_id
       |    FROM ($domainCapRankedSql)
       |    WHERE rn <= $DomainCapN
       |    UNION ALL
       |    SELECT doc_id::BIGINT AS doc_id FROM documents
       |    WHERE ${hash60SqlOf("cap:", "doc_id")}
       |          % $PipelineCapMod = 0) u)""".stripMargin

  // -------------------------------------------------------- length outliers

  /** Percentile bounds for [[lengthOutliers]] (e4): flag docs strictly
    * below the p1 or strictly above the p99 corpus length. */
  val LengthLoE4 = 100L
  val LengthHiE4 = 9900L

  /** Percentile-based length-outlier filter — the curation stage that
    * drops truncation stubs and concatenation monsters relative to the
    * CORPUS's own distribution rather than fixed thresholds (the
    * complement of Gopher's absolute length rules). Bounds come from the
    * exact distributed order statistic ([[graft.operators.Quantiles]]):
    * the corpus streams once into a distinct-value-sized histogram, the
    * two resulting scalars (a bounded 2-row collect, the k-means-centroid
    * precedent) re-enter the plan as literals, so the outlier filter
    * itself is a plain pushdown-friendly range predicate. */
  def lengthOutliers(docs: DataFrame): DataFrame = {
    val st = graft.operators.Quantiles
      .orderStats(docs.select(col("n_chars")), "n_chars", Seq(LengthLoE4, LengthHiE4))
      .select(col("q_e4"), col("value")).collect()
    def at(q: Long): Long = st.find(_.getLong(0) == q).map(_.getLong(1))
      .getOrElse(0L) // empty corpus: no rows survive the filter below anyway
    val (lo, hi) = (at(LengthLoE4), at(LengthHiE4))
    docs
      .filter(col("n_chars") < lo || col("n_chars") > hi)
      .select(col("doc_id").cast("long").as("doc_id"), col("n_chars"),
        lit(lo).as("lo"), lit(hi).as("hi"))
  }

  /** DuckDB twin of [[lengthOutliers]] — the same explicit order-statistic
    * contract (k = max(1, ceil(q·n)) over the ascending order). */
  val lengthOutliersOracle: String =
    s"""WITH hist AS (SELECT n_chars AS v, count(*) AS c FROM documents
       |              WHERE n_chars IS NOT NULL GROUP BY 1),
       |tot AS (SELECT count(*) AS n FROM documents WHERE n_chars IS NOT NULL),
       |cum AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cle FROM hist),
       |lo AS (SELECT min(v) AS lo FROM cum, tot
       |       WHERE cle >= ${graft.operators.Quantiles.kSql(LengthLoE4.toString, "n")}),
       |hi AS (SELECT min(v) AS hi FROM cum, tot
       |       WHERE cle >= ${graft.operators.Quantiles.kSql(LengthHiE4.toString, "n")})
       |SELECT doc_id::BIGINT AS doc_id, n_chars, lo, hi
       |FROM documents, lo, hi
       |WHERE n_chars < lo OR n_chars > hi""".stripMargin

  /** Quantiles for [[lengthProfile]] (e4): the quartile + tail report. */
  val ProfileQsE4: Seq[Long] = Seq(2500L, 5000L, 7500L, 9500L)

  /** Per-language corpus length profile — exact p25/p50/p75/p95 of
    * document length, the distribution report a curation run consults
    * before setting filter thresholds. One histogram pass; all four
    * quantiles resolve against the same windowed histogram
    * ([[graft.operators.Quantiles.groupedOrderStats]]). */
  def lengthProfile(docs: DataFrame): DataFrame =
    graft.operators.Quantiles.groupedOrderStats(
        docs.select(col("lang"), col("n_chars")), "lang", "n_chars", ProfileQsE4)
      .withColumnRenamed("value", "chars")

  /** DuckDB twin of [[lengthProfile]]. */
  val lengthProfileOracle: String =
    s"""WITH hist AS (SELECT lang, n_chars AS v, count(*) AS c
       |              FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
       |cum AS (SELECT lang, v, c,
       |          sum(c) OVER (PARTITION BY lang ORDER BY v) AS cle,
       |          sum(c) OVER (PARTITION BY lang) AS n FROM hist),
       |qs AS (SELECT unnest([${ProfileQsE4.mkString(", ")}]) AS q_e4)
       |SELECT lang, q_e4::BIGINT AS q_e4, n::BIGINT AS n,
       |  ${graft.operators.Quantiles.kSql("q_e4", "n")}::BIGINT AS k, v AS chars
       |FROM cum, qs
       |WHERE cle - c < ${graft.operators.Quantiles.kSql("q_e4", "n")}
       |  AND ${graft.operators.Quantiles.kSql("q_e4", "n")} <= cle""".stripMargin

  // --------------------------------------------------------------- mixture

  /** Target corpus mixture by language (e4 weights, sum 10000) — the "data
    * mixing" step of a pretraining pipeline (fixed domain weights à la The
    * Pile / DoReMi's static baseline). Languages not listed mix at 0. */
  val MixtureWeightsE4: Seq[(String, Long)] = Seq(
    "en" -> 4000L, "zh" -> 2000L, "de" -> 1600L, "fr" -> 1400L, "es" -> 1000L)

  /** Deterministic mixture resampling: find the largest total corpus size
    * T whose target split fits availability (T = min over languages of
    * n_l·1e4 div w_l), then accept each language's documents at
    * rate_e6 = (w_l·T div 1e4)·1e6 div n_l by the same stable content
    * hash the stratified sampler uses — re-run-stable, engine-portable
    * (pure integer arithmetic), and disjoint decisions per document.
    *
    * Scale shape: the corpus never shuffles — per-lang counts are one
    * map-combined aggregate (|langs| rows), the T reduction and rate
    * table ride along as broadcast joins, and acceptance is a per-row
    * hash compare. Output: per-language (lang, n_docs, rate_e6, kept).
    */
  def mixture(docs: DataFrame): DataFrame = {
    val rates = mixtureRates(docs)
    val kept = docs.select(col("lang"), mixBucket.as("mb"))
      .join(broadcast(rates), "lang")
      .filter(col("mb") < col("rate_e6"))
      .groupBy(col("lang")).agg(count(lit(1)).as("kept"))
    rates.join(kept, Seq("lang"), "left_outer")
      .select(col("lang"), col("n_docs"), col("rate_e6"),
        coalesce(col("kept"), lit(0L)).as("kept"))
  }

  /** The per-language acceptance rate table (lang, n_docs, rate_e6) —
    * the shared core of [[mixture]] (which reports it) and
    * [[mixtureKeep]] (which applies it). */
  private def mixtureRates(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = MixtureWeightsE4.toDF("lang", "w_e4")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .join(broadcast(w), Seq("lang"))
    // t as a GLOBAL WINDOW min over the langs-sized counts table (r17;
    // previously crossJoin(broadcast(counts.agg(min))) — the 1-row agg
    // embedded a second copy of the corpus groupBy lineage, doubling the
    // corpus passes; the single-partition window holds |langs| rows)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("t", min(expr("n_docs * 10000 div w_e4")).over(wAll))
      .withColumn("rate_e6",
        expr("least(1000000, (w_e4 * t div 10000) * 1000000 div n_docs)"))
      .select(col("lang"), col("n_docs"), col("rate_e6"))
  }

  /** The mixture resampling applied as a pipeline STAGE: the accepted
    * doc_ids under the same rates and acceptance hash [[mixture]]
    * reports. Corpus never shuffles — rates broadcast in, acceptance is
    * a per-row hash compare. */
  def mixtureKeep(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        mixBucket.as("mb"))
      .join(broadcast(mixtureRates(docs)), "lang")
      .filter(col("mb") < col("rate_e6"))
      .select("doc_id")

  /** The mixture rate/keep CTE chain with a caller-chosen prefix, ending
    * in `<p>keep(doc_id)` — ONE definition shared by [[mixtureOracle]]
    * and the composed-pipeline oracle (same weights, same T fit, same
    * acceptance hash). */
  def mixtureKeepCtes(p: String): String = {
    val values = MixtureWeightsE4
      .map { case (l, v) => s"('$l', ${v}::BIGINT)" }.mkString(", ")
    s"""${p}w(lang, w_e4) AS (VALUES $values),
       |${p}c AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
       |${p}cw AS (SELECT ${p}c.lang, n_docs, w_e4 FROM ${p}c JOIN ${p}w USING (lang)),
       |${p}t AS (SELECT min(n_docs * 10000 // w_e4) AS t FROM ${p}cw),
       |${p}r AS (SELECT lang, n_docs,
       |        least(1000000,
       |          (w_e4 * (SELECT t FROM ${p}t) // 10000) * 1000000 // n_docs)
       |          AS rate_e6
       |      FROM ${p}cw),
       |${p}keep AS (
       |  SELECT d.doc_id::BIGINT AS doc_id
       |  FROM documents d JOIN ${p}r USING (lang)
       |  WHERE $mixBucketSql < rate_e6)""".stripMargin
  }

  val mixtureOracle: String =
    s"""WITH ${mixtureKeepCtes("")},
       |k AS (SELECT d.lang, count(*)::BIGINT AS kept
       |      FROM documents d JOIN keep ON keep.doc_id = d.doc_id
       |      GROUP BY 1)
       |SELECT r.lang, n_docs, rate_e6, coalesce(k.kept, 0)::BIGINT AS kept
       |FROM r LEFT JOIN k USING (lang)""".stripMargin

  // ------------------------------------------------------------- blocklist

  /** Blocked terms for [[blocklistFilter]] (the C4 "bad words" stage
    * shape — Raffel et al. 2020 dropped any page containing a listed
    * word; the list here is a fixture stand-in, the mechanism is the
    * operator). */
  val BlockedTerms: Seq[String] = Seq("dup", "slow", "stale")

  /** Blocklist document filter: per doc, how many TOKEN OCCURRENCES hit
    * the blocked-term list and the C4-style verdict (`keep` = zero
    * hits). Token-membership semantics (not substring — "leaky" does
    * not hit "leak"), over the same [[Dedup.tokens]] tokenization every
    * text operator uses.
    *
    * Scale shape: the list is broadcast-tiny by nature (thousands of
    * terms at most) — here it folds into a per-row array_intersect-free
    * membership test (one `exists` over the token array against a
    * literal set), zero shuffles, corpus streamed once. With a list too
    * large for a literal, the drop-in swap is the Bloom-gate shape
    * (`decontamBloomGate`). */
  /** Blocked-term hit count as a Column over a token-array column — the
    * kernel [[blocklistFilter]] and the streaming [[curationVerdicts]]
    * share (one definition of "hit"). */
  def blocklistHitsOf(w: Column): Column =
    size(filter(w, t => t.isin(BlockedTerms: _*))).cast("long")

  def blocklistFilter(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
        blocklistHitsOf(Dedup.tokens(col("text"))).as("n_hits"))
      .withColumn("keep", col("n_hits") === 0L)

  /** DuckDB twin of [[blocklistFilter]] — same tokenization, same
    * token-membership count. */
  val blocklistOracle: String = {
    val list = BlockedTerms.map(t => s"'$t'").mkString(", ")
    s"""SELECT doc_id::BIGINT AS doc_id,
       |  len(list_filter(list_filter(string_split_regex(lower(text), '\\W+'),
       |                              t -> t != ''),
       |                  t -> t IN ($list)))::BIGINT AS n_hits,
       |  len(list_filter(list_filter(string_split_regex(lower(text), '\\W+'),
       |                              t -> t != ''),
       |                  t -> t IN ($list))) = 0 AS keep
       |FROM documents""".stripMargin
  }

  // ---------------------------------------------------------- token budget

  /** Training-token budget as a multiple of the corpus's total token
    * count (the "how many epochs of what" planning input). */
  val BudgetMultiple = 3L

  /** The composed pipeline's CONSTRAINED budget multiple, e2 (0.60× the
    * corpus token count). The standalone [[tokenBudget]] report runs the
    * planning default 3.00×, where every source's want exceeds its
    * supply and a cap stage never cuts; the pipeline's cap stage uses
    * this genuinely data-constrained setting so the budget cut is a real
    * gate (verdict-distribution-checked, the llm_blocklist lesson). */
  val PipelineBudgetMultipleE2 = 60L

  /** Per-source epoch cap, e4 fixed point (4.0 epochs — past which
    * repetition hurts more than the tokens help, the Muennighoff et al.
    * 2023 data-constrained heuristic). */
  val BudgetEpochsCapE4 = 40000L

  /** The data-recipe calculator: allocate a training-token budget of
    * [[BudgetMultiple]]× the corpus across sources with temperature-
    * sampled weights (share ∝ √tokens, the τ=2 smoothing of Arivazhagan
    * et al. 2019 — big sources damped, small sources boosted), then
    * report per source what the allocation implies: `(source,
    * tokens_avail, share_e6, tokens_want, epochs_e4, tokens_got,
    * shortfall)` with `tokens_got` capped at [[BudgetEpochsCapE4]]
    * epochs of the available data. A planning/report operator — its
    * output is the table a run config is written from.
    *
    * Determinism: `floor(sqrt(tokens))` is exact cross-engine (int64 →
    * double is the same round-to-nearest on both sides and IEEE sqrt is
    * correctly rounded — unlike log, sqrt carries no libm hazard); all
    * further arithmetic is int64 with truncating division. `tokens_want`
    * = B·share_e6 div 1e6 computed in the SPLIT form
    * (B div 1e6)·share + (B mod 1e6)·share div 1e6 — algebraically equal
    * (the first term's dividend is 1e6-divisible) and in-int64 for EVERY
    * int64 budget, where the direct product overflows past B ≈ 9.2e12;
    * `epochs_e4 = want·1e4 div avail` bounds want < 9.2e14 — orders of
    * magnitude past a 100 TB corpus (~2.5e13 tokens, want ≤ 3T).
    *
    * Scale shape: one corpus scan map-side-combines into a sources-sized
    * aggregate; the budget/weight totals ride back as a broadcast 1-row
    * cross; the corpus itself never shuffles. */
  def tokenBudget(docs: DataFrame): DataFrame =
    tokenBudgetAt(docs, BudgetMultiple * 100L)

  /** [[tokenBudget]]'s core, parameterized over the budget multiple in
    * e2 fixed point (`tokenBudget` = 300 = 3.00× the corpus; the
    * composed pipeline's cap stage runs a genuinely CONSTRAINED 0.60× so
    * the cut actually bites — with B ≈ 3× every source wants more than
    * it has and a cap stage is vacuous). The budget
    * `B = t·multipleE2 div 100` then splits exactly like before
    * (`(B div 1e6)·share + (B mod 1e6)·share div 1e6` — in-int64 for any
    * int64 B); at multipleE2 = 300 this is bit-identical to the previous
    * `t·3` form since t·300 div 100 = 3t exactly. */
  def tokenBudgetAt(docs: DataFrame, multipleE2: Long): DataFrame =
    tokenBudgetFromCounts(
      docs.select(col("source"),
          size(Dedup.tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("source")).agg(sum(col("n_tok")).as("tokens_avail")),
      multipleE2)

  /** The budget algebra over a pre-aggregated `(source, tokens_avail)`
    * frame — factored so the composed pipeline can budget the CURATED
    * corpus (its survivor token counts, already in hand) without a
    * second tokenization pass. */
  def tokenBudgetFromCounts(counts: DataFrame, multipleE2: Long): DataFrame = {
    val avail = counts
      // a zero-token source cannot absorb budget and would divide the
      // epochs by zero (null in Spark, a hard error in the oracle) —
      // omitted from the report by contract
      .where(col("tokens_avail") > 0)
      .withColumn("s", floor(sqrt(col("tokens_avail").cast("double"))).cast("long"))
    // sw/t as GLOBAL WINDOW sums over the sources-sized avail table
    // (r17; previously crossJoin(broadcast(avail.agg(...))) — the totals
    // aggregate embedded a second copy of the caller's corpus
    // tokenization lineage, doubling the passes of tokenBudgetAt; the
    // single-partition window holds |sources| rows)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    avail
      .withColumn("sw", sum(col("s")).over(wAll))
      .withColumn("t", sum(col("tokens_avail")).over(wAll))
      .withColumn("share_e6", expr("s * 1000000 div sw"))
      .withColumn("b", expr(s"t * $multipleE2 div 100"))
      .withColumn("tokens_want",
        expr("(b div 1000000) * share_e6 + (b % 1000000) * share_e6 div 1000000"))
      .withColumn("epochs_e4", expr("tokens_want * 10000 div tokens_avail"))
      .withColumn("tokens_got",
        expr(s"least(tokens_want, tokens_avail * $BudgetEpochsCapE4 div 10000)"))
      .withColumn("shortfall", expr("tokens_want - tokens_got"))
      .select("source", "tokens_avail", "share_e6", "tokens_want",
        "epochs_e4", "tokens_got", "shortfall")
  }

  /** DuckDB twin of [[tokenBudgetAt]] — identical √-weight,
    * quantized-want and cap arithmetic (`//` ≡ `div` on the nonnegative
    * operands), parameterized like the Scala core so the composed
    * pipeline's constrained-budget stage replays the SAME algebra. */
  def tokenBudgetOracleAt(multipleE2: Long): String =
    s"""WITH a AS (
       |  SELECT source,
       |    sum(len(list_filter(string_split_regex(lower(text), '\\W+'),
       |                        t -> t != '')))::BIGINT AS tokens_avail
       |  FROM documents GROUP BY 1
       |  HAVING tokens_avail > 0),
       |${tokenBudgetAlgebraCtes("a", "", multipleE2)}
       |SELECT source, tokens_avail, share_e6, tokens_want, epochs_e4,
       |  tokens_got, shortfall
       |FROM rep""".stripMargin

  /** The [[tokenBudgetFromCounts]] algebra as a reusable CTE chain over
    * any `(source, tokens_avail)` relation `availRel` (tokens_avail > 0
    * by the caller's contract) — CTEs `{p}w, {p}t, {p}sh, {p}wt, {p}rep`
    * with the full report in `{p}rep`. Shared verbatim by the standalone
    * 3.00× oracle and the pipeline's constrained-budget stage so the two
    * cannot diverge. */
  def tokenBudgetAlgebraCtes(availRel: String, p: String,
      multipleE2: Long): String =
    s"""${p}w AS (SELECT source, tokens_avail,
       |        floor(sqrt(tokens_avail))::BIGINT AS s FROM $availRel),
       |${p}t AS (SELECT sum(s)::BIGINT AS sw, sum(tokens_avail)::BIGINT AS t
       |      FROM ${p}w),
       |${p}sh AS (SELECT source, tokens_avail,
       |         (s * 1000000 // sw)::BIGINT AS share_e6,
       |         (t * $multipleE2 // 100)::BIGINT AS b FROM ${p}w, ${p}t),
       |${p}wt AS (SELECT source, tokens_avail, share_e6,
       |         ((b // 1000000) * share_e6 +
       |          (b % 1000000) * share_e6 // 1000000)::BIGINT
       |           AS tokens_want
       |       FROM ${p}sh),
       |${p}rep AS (SELECT source, tokens_avail, share_e6, tokens_want,
       |  (tokens_want * 10000 // tokens_avail)::BIGINT AS epochs_e4,
       |  least(tokens_want,
       |        tokens_avail * $BudgetEpochsCapE4 // 10000)::BIGINT AS tokens_got,
       |  (tokens_want - least(tokens_want,
       |     tokens_avail * $BudgetEpochsCapE4 // 10000))::BIGINT AS shortfall
       |FROM ${p}wt)""".stripMargin

  /** DuckDB twin of [[tokenBudget]] (the 3.00× standalone report). */
  val tokenBudgetOracle: String = tokenBudgetOracleAt(BudgetMultiple * 100L)

  // ------------------------------------------------------------------ pack

  val PackBudget = 512L // tokens per shard

  /** Sequence packing: assign documents, in doc_id order, to fixed
    * token-budget shards — shard i holds the documents whose exact global
    * running token count lands in [i·budget, (i+1)·budget). The batch
    * construction step of a pretraining pipeline (greedy first-fit in
    * arrival order, the common default), and an exact-prefix-sum problem:
    * a document's shard depends on EVERY preceding document's length.
    *
    * Scale shape: [[graft.operators.PrefixSum.cumBefore]] — a plain
    * windowed `sum() OVER (ORDER BY doc_id)` would single-task the corpus;
    * the two-pass distributed prefix sum keeps both passes at full
    * parallelism with only per-partition totals on the driver.
    *
    * Output: (doc_id, n_tok, cum_before, shard) — bit-exact across
    * engines (pure integer arithmetic over an exact sum). */
  def pack(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      size(Dedup.tokens(col("text"))).cast("long").as("n_tok"))
    graft.operators.PrefixSum.cumBefore(toks, "doc_id", "n_tok")
      .withColumn("shard", expr(s"cum_before div $PackBudget"))
  }

  val packOracle: String =
    s"""WITH tok AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |    len(list_filter(string_split_regex(lower(text), '\\W+'),
       |                    x -> x != ''))::BIGINT AS n_tok
       |  FROM documents)
       |SELECT doc_id, n_tok,
       |  coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
       |    AS cum_before,
       |  (coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |    // $PackBudget)::BIGINT AS shard
       |FROM tok""".stripMargin

  // ----------------------------------------------------------------- chunk

  val ChunkSize = 40   // tokens per chunk
  val ChunkStride = 20 // tokens between chunk starts (50% overlap)

  /** Split each document into overlapping token windows (size
    * [[ChunkSize]], stride [[ChunkStride]]) — the shape LLM pre-training
    * and embedding pipelines feed from. Emits (doc_id, chunk_idx, n_tok,
    * chunk_hash); the hash stands in for the chunk text so the output
    * stays narrow (the text itself is `array_join(slice(w, start, size))`
    * if a caller wants it).
    *
    * Plan shape: tokenize once (materialized through the projection so
    * the lambda isn't re-inlined per chunk — the [[Dedup.tokens]]
    * caveat), `posexplode` the start sequence; no shuffle at all, so it
    * scales as a pure map over any corpus size. */
  def chunk(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("n"))
      .filter(col("n") >= 1)
      .select(col("doc_id"), col("w"), col("n"),
        posexplode(sequence(lit(1), col("n"), lit(ChunkStride))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        least(lit(ChunkSize), col("n") - col("col") + 1).cast("long").as("n_tok"),
        md5(concat_ws(" ",
          slice(col("w"), col("col"), lit(ChunkSize))).cast("binary"))
          .as("chunk_hash"))

  // ------------------------------------------------------------- decontam

  val DecontamGram = 4 // word n-gram width for contamination matching
                       // (the 13-gram analog for the tiny synthetic vocab)

  /** Benchmark decontamination: flag training documents sharing any word
    * [[DecontamGram]]-gram with the benchmark set (here: `doc_id % 17 =
    * 0`, standing in for an eval suite). Emits (doc_id, n_shared) for
    * contaminated non-benchmark documents — the standard n-gram-overlap
    * filter (GPT-3 appendix C / PaLM style).
    *
    * Plan shape: both sides explode to DISTINCT shingles; the benchmark
    * side is a tiny fraction of the corpus, so the join broadcasts it at
    * any scale — the full corpus is never shuffled, only its shingle
    * stream filtered map-side, then one count-aggregate on the surviving
    * (rare) matches. */
  def decontaminate(docs: DataFrame): DataFrame = {
    val sh = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        explode(Dedup.shinglesFromTokens(col("w"), DecontamGram)).as("g"))
    val bench = sh.filter(col("doc_id") % 17 === 0)
      .select(col("g")).distinct()
    sh.filter(col("doc_id") % 17 =!= 0)
      .join(broadcast(bench), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Decontamination by CUT: remove the benchmark-overlapping token
    * spans from every TRAINING document instead of dropping the whole
    * doc — the surgical variant of [[decontaminate]] (drop a doc that is
    * half eval text, keep a long doc that merely quotes one eval
    * sentence... minus the quote). Every training-doc position starting
    * a [[DecontamGram]]-gram found in the benchmark set (the SAME set
    * definition as the flag operator: docs with `doc_id % 17 = 0`) has
    * its covered range cut; ranges merge exactly like the dup-span cut
    * and the cleaned text is the kept tokens rejoined. Unlike the
    * keep-one dup cut there is NO ownership — eval text must not
    * survive in training data anywhere. Emits every training doc
    * (benchmark docs are eval data, not output): `(doc_id, n_tokens,
    * cut_tok, text_clean)`.
    *
    * Plan shape: the benchmark positional-gram side is tiny and
    * broadcasts (the [[decontaminate]] argument); matched starts — the
    * rare case — are the only rows the doc_id merge exchange carries;
    * the cut tail is [[Mining.cutCovered]] (interval list joined by
    * doc_id, per-row HOF filter, corpus token arrays never shuffle). */
  def decontamCut(docs: DataFrame): DataFrame = {
    val G = DecontamGram
    val toks = docs.select(col("doc_id").cast("long").as("doc_id"),
      Dedup.tokens(col("text")).as("w"))
    val grams = toks.where(size(col("w")) >= G)
      .select(col("doc_id"), explode(Mining.posShingleSeq(col("w"), G)).as("pg"))
      .select(col("doc_id"), col("pg.p").as("p"), col("pg.g").as("g"))
    val bench = grams.filter(col("doc_id") % 17 === 0).select("g").distinct()
    val starts = grams.filter(col("doc_id") % 17 =!= 0)
      .join(broadcast(bench), "g")
      .select("doc_id", "p")
    Mining.cutCovered(toks.where(col("doc_id") % 17 =!= 0),
      Mining.mergeSpanStarts(starts, Seq.empty, G))
  }

  /** DuckDB twin of [[decontamCut]] — the merge+cut tail is
    * [[Mining.spanCutTailSql]], the ONE definition the dup-span cut
    * oracle also replays; the bench set is value-identical to
    * [[decontamCtes]]'s (same gram width, same `doc_id % 17` membership),
    * expressed over the positional gram table the cut needs. */
  val decontamCutOracle: String = {
    val G = DecontamGram
    val gramExpr = (1 to G).map(o => s"w[i+${o - 1}]").mkString(" || ' ' || ")
    s"""WITH tok0 AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
       |                             x -> x != '') AS w FROM documents),
       |ge AS (
       |  SELECT doc_id, unnest(
       |    list_transform(range(1, len(w) - ${G - 1} + 1),
       |      i -> struct_pack(p := i::BIGINT, g := $gramExpr))) AS pg
       |  FROM tok0 WHERE len(w) >= $G),
       |gp AS (SELECT doc_id, pg.p AS p, pg.g AS g FROM ge),
       |bench AS (SELECT DISTINCT g FROM gp WHERE doc_id % 17 = 0),
       |no AS (
       |  SELECT doc_id, p FROM gp JOIN bench USING (g)
       |  WHERE doc_id % 17 != 0),
       |train AS (SELECT doc_id, w FROM tok0 WHERE doc_id % 17 != 0),
       |${Mining.spanCutTailSql("no", "train", G)}""".stripMargin
  }

  // ---------------------------------------------------------------- tfidf

  val TfIdfTopK = 5

  /** Top-[[TfIdfTopK]] terms per document by tf·idf (idf = ln(N/df)),
    * scored as `(tf * idf_e6) div 100` with `idf_e6` derived from the
    * pure-integer [[graft.functions.Log2Fix]] kernel — both engines
    * compute IDENTICAL integers with no libm call anywhere (a 1-ulp
    * `ln` divergence on a floor boundary was the one residual
    * cross-platform hazard); ties broken by term ascending.
    *
    * Plan shape: one explode + one (doc_id, term) count, then df as an
    * AGGREGATE-then-JOIN (not a window over term): the per-term aggregate
    * partial-combines map-side so stop-word terms never pile one
    * partition, and the join back is AQE-skew-splittable (or an auto-
    * broadcast when the vocabulary is small) — a window over `term`
    * would shuffle the full tf table onto hot term keys with no skew
    * escape. N comes from a 1-row aggregate that broadcasts. The final
    * top-k is a per-doc window that WindowGroupLimit prunes to k rows
    * per partition before the sort. */
  def tfidf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(Dedup.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfCounts = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf
      .join(dfCounts, "term")
      .crossJoin(broadcast(n))
      .withColumn("idf_e6", shiftright(
        VectorExpressions.log2_fix(col("n_docs"), col("df")) * Log2Fix.Ln2E6, 20))
      .withColumn("score_r", expr("(tf * idf_e6) div 100"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score_r").desc, col("term"))))
      .filter(col("rank") <= TfIdfTopK)
      .select(col("doc_id"), col("term"), col("score_r"),
        col("rank").cast("long").as("rank"))
  }

  // --------------------------------------------------------------- redact

  /** Portable (Java regex ∩ RE2) patterns — no backrefs, no lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9\\-]{6,}[0-9]"

  /** PII redaction: mask emails and phone-like digit runs, counting each.
    * The synthetic corpus carries no PII, so the operator first injects a
    * deterministic contact line per document (making the redaction
    * verifiable end-to-end), then strips it — the injection is part of
    * the oracle contract, not the operator; `redactText` below is the
    * production column. Pure per-row map, no shuffle. */
  def redact(docs: DataFrame): DataFrame = {
    val injected = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or +1-202-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" now"))
    docs.select(col("doc_id").cast("long").as("doc_id"),
        injected.as("t"))
      .select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(redactText(col("t")).cast("binary")).as("red_hash"))
  }

  /** The production redaction column: emails then phones masked. */
  def redactText(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(t, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  // -------------------------------------------------------------- oracles

  /** Unigram language-model quality score per document — the CCNet-style
    * "perplexity filter" shape (Wenzek et al. 2019 score against a
    * reference LM; here the corpus itself is the reference): rare-token
    * documents score high negative-log-likelihood, template/common-token
    * documents score low.
    *
    * Scale shape: ONE aggregation builds the unigram table (map-side
    * combined, |vocab| rows — at 100 TB this is the thing you broadcast,
    * not the corpus); scoring joins each token occurrence against the
    * broadcast table and averages per doc. Everything integerized — and
    * the log itself is libm-FREE: per-token `nll_e6` comes from the
    * pure-int64 [[graft.functions.Log2Fix]] kernel times the pinned
    * rational ln(2) constant, so the value is bit-identical on every
    * platform/engine by construction (a 1-ulp `Math.log` vs libm `ln`
    * divergence could otherwise flip an e6 floor boundary and fail the
    * hash gate nondeterministically). The nll is computed once per VOCAB
    * row (not per occurrence) before the broadcast join.
    *
    * Output: (doc_id, carry…, n_tokens, mean_nll_e6).
    *
    * `carry` columns (doc-level metadata like `source`/`lang`,
    * functionally dependent on doc_id) ride the per-doc aggregate keys,
    * so a consumer grouping scores by that metadata needs NO join back
    * to the corpus — the r17 optimization that removed the doc-keyed
    * dmap joins from the DoReMi and CCNet plans (one exchange keyed the
    * same way replaces join + second exchange; identical output because
    * the key set per doc_id is unchanged). Default Nil keeps the
    * original plan byte-identical.
    */
  def lmScore(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val toks = docs
      .select(col("doc_id").cast("long").as("doc_id") +:
        carry.map(col) :+ explode(Dedup.tokens(col("text"))).as("t"): _*)
    // total token count = sum(tc) as a GLOBAL WINDOW over the vocab
    // aggregate (r17; previously a crossJoin(broadcast(toks.agg(count)))
    // — that 1-row aggregate embedded its own copy of the tokenize+
    // explode lineage with nothing reusable between the copies, so the
    // corpus was tokenized THREE times per score: total, vocab, and the
    // scoring stream. The window computes the identical count from the
    // vocab rows themselves — one corpus pass builds the model, one
    // scores. SCALE BOUND (r18, VERDICT r17 item 3/5): the single-
    // partition window holds |vocab| rows — exactly the table this plan
    // BROADCASTS two lines later, so the window cannot be the binding
    // constraint at any scale: a vocab too big for one window task is
    // already too big for the broadcast hash relation (8 GB / 512M-row
    // cap), and the operator's documented 100 TB swap is the same for
    // both (persist the vocab aggregate and score via a shuffled join —
    // the zipf r18 persist form). This is why zipf's window WAS replaced
    // (its vocab never broadcasts) and this one deliberately stays.)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("tc"))
      .withColumn("total", sum(col("tc")).over(wAll))
      .withColumn("nll_e6", shiftright(
        VectorExpressions.log2_fix(col("total"), col("tc")) * Log2Fix.Ln2E6, 20))
    val perToken = toks.join(broadcast(vocab.select("t", "nll_e6")), "t")
    perToken.groupBy(col("doc_id") +: carry.map(col): _*)
      .agg(count(lit(1)).as("n_tokens"),
        // integral div, matching the oracle's `//` exactly (double `/`
        // rounds, which can differ from floor by one at large sums)
        expr("sum(nll_e6) div count(1)").as("mean_nll_e6"))
  }

  /** The [[lmScore]] CTE chain up to the per-doc score, shared by the
    * lm-score, CCNet-bucket and DoReMi oracles so the score definition
    * can never diverge between them. Ends in
    * `lmdoc(doc_id, n_tokens, mean_nll_e6)`; requires the query to open
    * with this string (it owns WITH RECURSIVE). */
  private[graft] val lmScoreCtes: String =
    s"""WITH RECURSIVE tok AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |    unnest(list_filter(string_split_regex(lower(text), '\\W+'),
       |                       x -> x != '')) AS t
       |  FROM documents),
       |vocab AS (SELECT t, count(*)::BIGINT AS tc FROM tok GROUP BY 1),
       |src AS (
       |  SELECT t, (SELECT count(*)::BIGINT FROM tok) AS num, tc AS den
       |  FROM vocab),
       |${Log2Fix.duckdbCtes("src", "t", "lg")},
       |per AS (
       |  SELECT doc_id, (l20 * ${Log2Fix.Ln2E6}) >> 20 AS nll_e6
       |  FROM tok JOIN lg USING (t)),
       |lmdoc AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_tokens,
       |    (sum(nll_e6) // count(*))::BIGINT AS mean_nll_e6
       |  FROM per GROUP BY 1)""".stripMargin

  val lmScoreOracle: String =
    s"""$lmScoreCtes
       |SELECT doc_id, n_tokens, mean_nll_e6 FROM lmdoc""".stripMargin

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, the CCNet
    * pipeline): per LANGUAGE, rank documents by unigram-LM mean NLL
    * ascending and split the ranking into head/middle/tail terciles —
    * the standard quality stratification a curation pipeline uses to
    * keep "head" data, sample "middle", and drop "tail".
    *
    * Exactness: rank ties break on doc_id, the tercile is integer
    * arithmetic on (rank, count), and the score is the libm-free
    * [[lmScore]] — so buckets are bit-identical across engines.
    *
    * Scale shape: scoring is the lmScore plan (corpus never shuffles);
    * bucketing shuffles once on lang. The per-lang window is a total
    * order per language — correct for the gate, and the documented
    * 100 TB swap is CCNet's own: derive the two threshold VALUES from a
    * sample (or a mergeable quantile sketch, q12's machinery), then
    * bucket by plain per-row comparison with no global sort.
    *
    * Output: (doc_id, lang, mean_nll_e6, bucket).
    */
  def ccnetBuckets(docs: DataFrame): DataFrame =
    ccnetRanked(docs)
      .select(col("doc_id"), col("lang"), col("mean_nll_e6"), col("bucket"))

  /** The shared CCNet ranking: per-language NLL-ascending tercile
    * assignment with n_tokens carried through — [[ccnetBuckets]]
    * projects it down; [[qualityPairs]] consumes the label side. ONE
    * definition of the tercile arithmetic. */
  private def ccnetRanked(docs: DataFrame): DataFrame = {
    // lang rides the lmScore per-doc aggregate keys (r17: removes the
    // doc-keyed join back to the corpus — lang is functionally dependent
    // on doc_id, so the groups and scores are unchanged)
    val scored = lmScore(docs, carry = Seq("lang"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("mean_nll_e6"), col("doc_id"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .withColumn("bucket",
        element_at(array(lit("head"), lit("middle"), lit("tail")),
          (expr("((rn - 1) * 3) div n") + 1).cast("int")))
  }

  /** Quality-classifier training-set construction — the step that closes
    * the CCNet loop (Wenzek et al. 2020): label the perplexity HEAD as
    * positive and the TAIL as negative (middle excluded), then balance
    * the classes per language to `min(|head|, |tail|)` rows each with a
    * deterministic doc_id-ordered trim (production swaps in the md5
    * shuffle rank for an unbiased trim — same plan shape). Output
    * `(doc_id, lang, label, n_tokens, n_chars)` — the labeled feature
    * table a fastText-style quality model trains on. A language whose
    * tercile split yields only one class (fewer than 3 docs) caps to
    * ZERO pairs rather than emitting unpaired examples.
    *
    * Scale shape: scoring is the lmScore plan (corpus never shuffles);
    * ranking shuffles once on lang (the ccnetBuckets window, same
    * documented 100 TB swap to sketch thresholds); the class cap is a
    * pure expression of the already-windowed language count (min of the
    * tercile sizes = n div 3), so balancing adds no aggregate, no join
    * and no second pass. */
  def qualityPairs(docs: DataFrame): DataFrame = {
    // the class cap needs NO second aggregate pass: the tercile
    // arithmetic fixes the class sizes as pure functions of the
    // language count n already windowed in — head = ceil(n/3) >=
    // tail = floor(n/3), so min(|head|, |tail|) = n div 3, carried as
    // a derived column instead of a caps aggregate + broadcast join
    // (the review-caught double corpus sort/window pass)
    val lab = ccnetRanked(docs)
      .filter(col("bucket") =!= "middle")
      .withColumn("label",
        when(col("bucket") === "head", 1L).otherwise(0L))
      .select(col("doc_id"), col("lang"), col("label"), col("n_tokens"),
        expr("n div 3").as("cap"))
    val w = Window.partitionBy(col("lang"), col("label")).orderBy(col("doc_id"))
    lab.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= col("cap"))
      // feature metadata joined AFTER the trim (the smaller side)
      .join(docs.select(col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("n_chars")), "doc_id")
      .select(col("doc_id"), col("lang"), col("label"), col("n_tokens"),
        col("n_chars"))
  }

  /** DuckDB twin of [[qualityPairs]] — same tercile, label, cap and
    * trim arithmetic over the shared lmScore CTEs. */
  val qualityPairsOracle: String =
    s"""$lmScoreCtes,
       |qj AS (
       |  SELECT l.doc_id, d.lang, l.mean_nll_e6, l.n_tokens,
       |    d.n_chars::BIGINT AS n_chars
       |  FROM lmdoc l JOIN documents d ON d.doc_id::BIGINT = l.doc_id),
       |qr AS (
       |  SELECT doc_id, lang, n_tokens, n_chars,
       |    row_number() OVER (PARTITION BY lang
       |                       ORDER BY mean_nll_e6, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM qj),
       |qlab AS (
       |  SELECT doc_id, lang, n_tokens, n_chars, n // 3 AS cap,
       |    (CASE ((rn - 1) * 3) // n WHEN 0 THEN 1 ELSE 0 END)::BIGINT AS label
       |  FROM qr WHERE ((rn - 1) * 3) // n != 1),
       |qrk AS (
       |  SELECT *, row_number() OVER (PARTITION BY lang, label
       |                               ORDER BY doc_id) AS rn2
       |  FROM qlab)
       |SELECT doc_id, lang, label, n_tokens, n_chars
       |FROM qrk WHERE rn2 <= cap""".stripMargin

  val ccnetBucketsOracle: String =
    s"""$lmScoreCtes,
       |j AS (
       |  SELECT l.doc_id, d.lang, l.mean_nll_e6
       |  FROM lmdoc l JOIN documents d ON d.doc_id::BIGINT = l.doc_id),
       |r AS (
       |  SELECT doc_id, lang, mean_nll_e6,
       |    row_number() OVER (PARTITION BY lang
       |                       ORDER BY mean_nll_e6, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM j)
       |SELECT doc_id, lang, mean_nll_e6,
       |  CASE ((rn - 1) * 3) // n WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM r""".stripMargin

  /** Deterministic train/validation/test split by the same md5 bucket
    * used for sampling: disjoint and complete BY CONSTRUCTION (every doc
    * lands in exactly one bucket, each bucket in exactly one split), and
    * re-run-stable across engines/partitionings — the assignment is pure
    * per-row arithmetic, no shuffle. Reported as per-(split, lang)
    * counts; the assignment itself is the obvious projection. */
  def split(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        splitOf(col("doc_id")).as("split"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Train→eval near-dup LEAKAGE audit: every validation/test document
    * with at least one verified near-duplicate in the train split — the
    * contamination a benchmark-decontam pass cannot see because both
    * sides live in the SAME corpus. One row per leaked eval doc:
    * `(doc_id, split, n_train_dups, best_jaccard_r, best_train_dup)`,
    * best = max similarity, ties toward the smallest train id (pinned
    * via lexicographic struct max so the oracle can mirror it). The
    * actionable output is the removal list a practitioner feeds back
    * into the eval split.
    *
    * Scale shape: `pairs` is the verified near-dup pair table (tiny —
    * candidates, not corpus; memoized upstream exactly as the cluster
    * view consumes it), and the split of EACH side is a pure per-row
    * md5 projection of the id — no join back to the corpus, no new
    * corpus scan, one pairs-sized shuffle for the per-doc aggregate. */
  def splitLeakage(pairs: DataFrame): DataFrame = {
    val sp = pairs.select(
      col("doc_a").cast("long").as("doc_a"),
      col("doc_b").cast("long").as("doc_b"),
      col("jaccard_r").cast("long").as("jaccard_r"),
      splitOf(col("doc_a")).as("sa"), splitOf(col("doc_b")).as("sb"))
    val oriented = sp
      .where(col("sa") === "train" && col("sb") =!= "train")
      .select(col("doc_b").as("doc_id"), col("sb").as("split"),
        col("doc_a").as("train_dup"), col("jaccard_r"))
      .union(sp.where(col("sb") === "train" && col("sa") =!= "train")
        .select(col("doc_a").as("doc_id"), col("sa").as("split"),
          col("doc_b").as("train_dup"), col("jaccard_r")))
    oriented.groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_train_dups"),
        max(struct(col("jaccard_r").as("j"),
          (-col("train_dup")).as("nd"))).as("b"))
      .select(col("doc_id"), col("split"), col("n_train_dups"),
        col("b.j").as("best_jaccard_r"),
        (-col("b.nd")).as("best_train_dup"))
  }

  val splitOracle: String =
    s"""WITH s AS (
       |  SELECT doc_id, lang, $bucketSql AS bucket
       |  FROM documents)
       |SELECT CASE WHEN bucket < 80 THEN 'train'
       |            WHEN bucket < 90 THEN 'validation'
       |            ELSE 'test' END AS split,
       |  lang, count(*)::BIGINT AS n_docs
       |FROM s GROUP BY 1, 2""".stripMargin

  /** The sampling keep-predicate over a `documents` row, shared by the
    * sample oracle and the composed-pipeline oracle. */
  val sampleKeepSql: String = {
    val cases = SampleRates.map { case (l, r) => s"WHEN '$l' THEN $r" }
      .mkString(" ")
    s"$bucketSql < CASE lang $cases ELSE 0 END"
  }

  val sampleOracle: String =
    s"""WITH s AS (
       |  SELECT doc_id::BIGINT AS doc_id, lang, $bucketSql AS bucket
       |  FROM documents)
       |SELECT doc_id, lang, bucket FROM s
       |WHERE $sampleKeepSql""".stripMargin

  val chunkOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |    list_filter(string_split_regex(lower(text), '\\W+'), x -> x != '') AS w
       |  FROM documents),
       |n AS (SELECT doc_id, w, len(w)::BIGINT AS n FROM t WHERE len(w) >= 1),
       |c AS (
       |  SELECT doc_id, n, w,
       |    unnest(range(1, n + 1, $ChunkStride)) AS start
       |  FROM n)
       |SELECT doc_id, ((start - 1) // $ChunkStride)::BIGINT AS chunk_idx,
       |  least($ChunkSize, n - start + 1)::BIGINT AS n_tok,
       |  md5(array_to_string(w[start : start + ${ChunkSize - 1}], ' ')) AS chunk_hash
       |FROM c""".stripMargin

  /** Bloom-filter decontamination, accuracy-gated against the exact
    * broadcast-set form.
    *
    * At 100 TB the exact [[decontaminate]] broadcast (every distinct
    * benchmark shingle as strings) is the bottleneck: a large benchmark
    * suite's shingle set runs to GBs per executor. The production shape
    * is a Bloom filter — ~12 bits/item at 1e-4 fpp, built distributed
    * (partial sketches OR-merged, one tiny driver merge), broadcast
    * once, probed per corpus shingle with zero shuffle. Bloom filters
    * have NO false negatives, so contaminated documents can never slip
    * through; false positives only send a few extra docs to the exact
    * verify a production pipeline runs on the flagged set.
    *
    * The gate emits (variant, exact, meets_bound):
    *  - `bloom_no_false_negatives`: every exactly-flagged doc is
    *    bloom-flagged (must ALWAYS hold, by construction);
    *  - `bloom_flagged_docs`: the bloom-flagged doc count stays inside
    *    [exact, exact + 5% of corpus + 8] — the fpp envelope at doc
    *    granularity (~60 shingles/doc × 1e-4 ≈ 0.6% FP per doc).
    * Deterministic: Bloom insertion is bit-OR (order-independent) and
    * the seeded hashes are fixed, so the counts are stable across runs
    * and partitionings.
    */
  def decontamBloomGate(docs: DataFrame, fpp: Double = 1e-4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // r17: the gate drives THREE actions total — bench count, the bloom
    // build, and ONE combined flag/containment/size aggregate over the
    // corpus shingle stream (previously five: bloom-flag count, exact-flag
    // count, containment anti-join count and corpus-size count each ran
    // their own corpus pass over two persisted frames). bench stays
    // persisted (three consumers); the corpus side streams once and needs
    // no persist at all.
    val sh = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        explode(Dedup.shinglesFromTokens(col("w"), DecontamGram)).as("g"))
    val bench = sh.filter(col("doc_id") % 17 === 0).select("g").distinct().persist()
    val corpus = sh.filter(col("doc_id") % 17 =!= 0)

    // Build the filter over xxhash64(g) LONGS with the distributed
    // map-side-partial/OR-merge build (stat.bloomFilter sizes to the
    // requested fpp with NO cap — BloomFilterAggregate silently clamps to
    // spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits,
    // which would quietly blow the fpp envelope past ~4M shingles), then
    // probe with the native BloomFilterMightContain expression over the
    // serialized filter as a BINARY LITERAL: putLong at build matches
    // mightContainLong at probe, and the probe stays inside whole-stage
    // codegen (the filter deserializes once per task), where the previous
    // Scala-UDF probe paid an interpreted invocation per corpus shingle.
    val nItems = math.max(bench.count(), 1L)
    val bf = bench.stat.bloomFilter(xxhash64(col("g")), nItems, fpp)
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
          org.apache.spark.sql.GraftColumn.exprOf(xxhash64(col("g")))))
    // one corpus pass: per-doc bloom/exact hit flags (map-side-combined
    // max), then a 1-row rollup — nBloom/nExact/missed/nCorpusDocs are
    // the identical doc-level counts the four separate distinct+count
    // jobs produced (a doc is bloom-flagged iff ANY shingle probes true;
    // exact-flagged iff ANY shingle joins bench; missed = exact ∧ ¬bloom)
    val flags = corpus
      .join(broadcast(bench.withColumn("hit", lit(1L))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(max(when(mightContain, 1L).otherwise(0L)).as("bloomHit"),
        max(coalesce(col("hit"), lit(0L))).as("exactHit"))
    // coalesce: sum over an EMPTY corpus is null, and the empty gate must
    // report zeros exactly as the former count() jobs did
    val r = flags.agg(
      coalesce(sum(col("bloomHit")), lit(0L)).as("nBloom"),
      coalesce(sum(col("exactHit")), lit(0L)).as("nExact"),
      coalesce(sum(when(col("exactHit") === 1L && col("bloomHit") === 0L, 1L)
        .otherwise(0L)), lit(0L)).as("missed"),
      count(lit(1)).as("nDocs")).head()
    val (nBloom, nExact, missed, nCorpusDocs) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val slack = math.ceil(nCorpusDocs * 0.05).toLong + 8L
    bench.unpersist()
    Seq(
      ("bloom_no_false_negatives", nExact, missed == 0L),
      ("bloom_flagged_docs", nExact, nBloom >= nExact && nBloom <= nExact + slack)
    ).toDF("variant", "exact", "meets_bound")
  }

  val decontamBloomOracle: String =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(w) - ${DecontamGram - 1}, 0) + 1),
       |    i -> array_to_string(w[i : i + ${DecontamGram - 1}], ' ')))) AS g
       |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
       |                                   x -> x != '') AS w
       |        FROM documents)),
       |bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 17 = 0),
       |flagged AS (SELECT DISTINCT doc_id FROM sh JOIN bench USING (g)
       |            WHERE doc_id % 17 != 0)
       |SELECT v.variant, (SELECT count(*) FROM flagged)::BIGINT AS exact,
       |       true AS meets_bound
       |FROM (VALUES ('bloom_no_false_negatives'), ('bloom_flagged_docs')) v(variant)""".stripMargin

  /** The decontamination shingle/bench CTE pair with caller-chosen names,
    * so the composed-pipeline oracle can embed the SAME definition next
    * to other stages' CTEs without name collisions. */
  def decontamCtes(sh: String, bench: String): String =
    s"""$sh AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(w) - ${DecontamGram - 1}, 0) + 1),
       |    i -> array_to_string(w[i : i + ${DecontamGram - 1}], ' ')))) AS g
       |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
       |                                   x -> x != '') AS w
       |        FROM documents)),
       |$bench AS (SELECT DISTINCT g FROM $sh WHERE doc_id % 17 = 0)""".stripMargin

  val decontamOracle: String =
    s"""WITH ${decontamCtes("sh", "bench")}
       |SELECT doc_id::BIGINT AS doc_id, count(*)::BIGINT AS n_shared
       |FROM sh JOIN bench USING (g)
       |WHERE doc_id % 17 != 0
       |GROUP BY 1""".stripMargin

  val tfidfOracle: String =
    s"""WITH RECURSIVE tok AS (
       |  SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(text), '\\W+'), x -> x != '')) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
       |dfc AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
       |src AS (
       |  SELECT term,
       |    (SELECT count(DISTINCT doc_id)::BIGINT FROM documents) AS num,
       |    df AS den
       |  FROM dfc),
       |${Log2Fix.duckdbCtes("src", "term", "lg")},
       |sc AS (
       |  SELECT doc_id, term, tf,
       |    (tf * ((l20 * ${Log2Fix.Ln2E6}) >> 20)) // 100 AS score_r
       |  FROM tf JOIN lg USING (term)),
       |r AS (
       |  SELECT doc_id, term, tf, score_r,
       |    row_number() OVER (PARTITION BY doc_id
       |                       ORDER BY score_r DESC, term) AS rank
       |  FROM sc)
       |SELECT doc_id::BIGINT AS doc_id, term, score_r, rank::BIGINT AS rank
       |FROM r WHERE rank <= $TfIdfTopK""".stripMargin

  /** Modulus of the hashed-feature weight table: weights land in
    * [-(QualityMod-1)/2, (QualityMod-1)/2] = [-1000, 1000]. */
  val QualityMod = 2001L

  /** Model-based quality scoring, the hashed-linear-classifier shape
    * (fastText / CCNet's quality filters reduce to exactly this at
    * inference: score = Σ weight[hash(token)] over token OCCURRENCES,
    * keep if the score clears a threshold). The weight table here is the
    * deterministic hash itself — w(t) = hash15(t) mod [[QualityMod]]
    * shifted to signed — standing in for trained weights so both engines
    * can replay it exactly; swapping in a real model is a broadcast
    * lookup in the same plan position.
    *
    * Scale shape: a pure zero-shuffle projection — the per-doc sum runs
    * as a codegen'd `aggregate` over the token array, so quality
    * filtering at 100 TB is embarrassingly parallel (the classic reason
    * model-based filters are the CHEAP stage of a curation pipeline).
    * Pure integer arithmetic: |w| <= 1000, so a doc needs 2^53/1000
    * tokens before the sum could even approach the int64 envelope. */
  /** The hashed-linear score as a Column over a token-array column —
    * the kernel [[qualityScore]] and the streaming [[curationVerdicts]]
    * share (one definition of the score). */
  def qualityScoreOf(w: Column): Column =
    aggregate(w, lit(0L), (acc, t) =>
      acc + conv(substring(md5(t), 1, 15), 16, 10).cast("long") % QualityMod
        - lit((QualityMod - 1) / 2))

  def qualityScore(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
        qualityScoreOf(col("w")).as("score"))
      .withColumn("score_per_tok_e4",
        when(col("n_tokens") > 0, expr("score * 10000 div n_tokens"))
          .otherwise(lit(0L)))
      .withColumn("keep", col("score") >= 0)

  /** The (tokens, score) CTE pair shared by [[qualityScoreOracle]] and
    * [[qualityKeepCte]] — ONE SQL definition of the hashed-linear score. */
  private def qualityCtes(tName: String, sName: String): String =
    s"""$tName AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\W+'),
       |                             x -> x != '') AS w
       |  FROM documents),
       |$sName AS (
       |  SELECT doc_id, len(w)::BIGINT AS n_tokens,
       |    coalesce(list_sum(list_transform(w,
       |      x -> ('0x' || substr(md5(x), 1, 15))::BIGINT % $QualityMod
       |           - ${(QualityMod - 1) / 2})), 0)::BIGINT AS score
       |  FROM $tName)""".stripMargin

  /** DuckDB twin of [[qualityScore]]. */
  val qualityScoreOracle: String =
    s"""WITH ${qualityCtes("t", "s")}
       |SELECT doc_id, n_tokens, score,
       |  CASE WHEN n_tokens > 0 THEN (score * 10000 // n_tokens)::BIGINT
       |       ELSE 0 END AS score_per_tok_e4,
       |  score >= 0 AS keep
       |FROM s""".stripMargin

  /** The per-document STATELESS curation gate: Gopher rules ∧ model
    * score ∧ blocklist, as ONE projection chain over (doc_id, lang,
    * text) — no joins, no aggregation, no state. That makes it the
    * incremental-ingest filter: the SAME plan runs unchanged on a
    * streaming DataFrame (each arriving document is judged in its own
    * micro-batch; pinned batch ≡ stream by StreamCurationSpec), which is
    * how a production pipeline curates a crawl as it lands rather than
    * re-scanning the corpus. The corpus-level stages (dedup, decontam,
    * caps, budget) stay batch — they need global state by definition;
    * this gate is the part that doesn't.
    *
    * Output: (doc_id, lang, keep). Rule definitions are the SHARED
    * kernels ([[Repetition.gopherFilterWith]], [[qualityScoreOf]],
    * [[blocklistHitsOf]]) — nothing re-derived, nothing to diverge.
    *
    * CONSUMPTION CAVEAT: do not `.where(col("keep"))` directly on this
    * (un-persisted) frame — the optimizer pushes the predicate below the
    * projection chain, re-inlining the tokenizer into every heavy
    * reference of the reason CASE (measured ~100× on sf0.1). Aggregate
    * the projected boolean conditionally, persist first, or filter after
    * an aggregation boundary. */
  def curationVerdicts(docs: DataFrame): DataFrame =
    Repetition.gopherFilterWith(docs, Seq("lang"), retainTokens = true)
      .select(col("doc_id"), col("lang"),
        (col("keep") && qualityScoreOf(col("w")) >= 0 &&
          blocklistHitsOf(col("w")) === 0L).as("keep"))

  /** CTE chain ending in `<name>` = the [[qualityScore]] keep set, for
    * oracle composition (the pipeline entry conjoins it). */
  def qualityKeepCte(name: String): String =
    s"""${qualityCtes(s"${name}_t", s"${name}_s")},
       |$name AS (SELECT doc_id FROM ${name}_s WHERE score >= 0)""".stripMargin

  /** CALIBRATION matrix between the model-based [[qualityScore]] and a
    * rule-based keep verdict (the Gopher filter, in the shipped entry):
    * per score-DECILE — exact global deciles of `score_per_tok_e4`, ties
    * broken by doc_id — the doc count, how many the rules keep, and the
    * decile's score extrema. The standard acceptance check before a
    * learned filter replaces (or gates behind) a heuristic one: if rule
    * keep-rate is flat across score deciles the model carries no signal
    * the rules recognize; a monotone curve says where to put the cut.
    *
    * Scale shape: the score is the zero-shuffle [[qualityScore]]
    * projection; the exact decile comes from
    * [[graft.operators.PrefixSum.groupedRank]]'s global (score, doc_id)
    * rank — a range exchange, never a 1-partition window; then one
    * doc-keyed equi-join with the (memoized) rule verdicts and a 10-row
    * map-side-combined aggregate. `docs.count()` is the only driver
    * value (parquet row-count pushdown). */
  def qualityCalibration(docs: DataFrame, ruleKeep: DataFrame): DataFrame = {
    val n = docs.count()
    val qs = qualityScore(docs)
      .select(col("doc_id").cast("long").as("doc_id"),
        col("score_per_tok_e4"))
    val ranked = graft.operators.PrefixSum.groupedRank(
      qs.withColumn("g", lit(0L)), "score_per_tok_e4", "doc_id", "g", "rnk")
    ranked
      .select(col("doc_id"), col("score_per_tok_e4"),
        expr(s"rnk * 10 div ${n}L").as("decile"))
      .join(ruleKeep.select(col("doc_id").cast("long").as("doc_id"),
        col("keep").as("rule_keep")), Seq("doc_id"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("rule_keep"), 1L).otherwise(0L)).as("n_rule_keep"),
        min("score_per_tok_e4").as("min_spt"),
        max("score_per_tok_e4").as("max_spt"))
  }

  /** DuckDB twin of [[qualityCalibration]]: caller splices the rule CTE
    * chain ending in `v(doc_id, …, reason)` (the Gopher chain in the
    * shipped oracle) — the SAME chain the standalone rule gate runs. */
  def qualityCalibrationOracle(ruleCtes: String): String =
    s"""WITH ${qualityCtes("qc_t", "qc_s")},
       |q AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |    CASE WHEN n_tokens > 0 THEN (score * 10000 // n_tokens)
       |         ELSE 0 END::BIGINT AS spt
       |  FROM qc_s),
       |r AS (
       |  SELECT doc_id, spt,
       |    row_number() OVER (ORDER BY spt, doc_id) - 1 AS rnk
       |  FROM q),
       |$ruleCtes
       |SELECT (rnk * 10 // (SELECT count(*) FROM q))::BIGINT AS decile,
       |  count(*)::BIGINT AS n_docs,
       |  sum(CASE WHEN v.reason = 'ok' THEN 1 ELSE 0 END)::BIGINT AS n_rule_keep,
       |  min(spt)::BIGINT AS min_spt, max(spt)::BIGINT AS max_spt
       |FROM r JOIN v USING (doc_id) GROUP BY 1""".stripMargin

  // ------------------------------------------------------- curriculum order

  /** Difficulty cuts on the per-token quality score: docs at
    * `score_per_tok_e4 >= high` are "easy" (bucket 0), `>= low` "mid"
    * (1), below "hard" (2). Fixed thresholds (near the test corpora's
    * score terciles) keep the bucketing a zero-shuffle projection; a
    * loss-quantile curriculum would derive the cuts once from the
    * quantile sketch and use them the same way. */
  val CurriculumHighE4 = 800000L
  val CurriculumLowE4 = 100000L
  val CurriculumBuckets = 3

  /** Curriculum data ordering (Bengio et al. 2009 shape): emit a total
    * training order that (a) starts easy, by difficulty-bucketing each doc
    * on the model-based quality score, and (b) round-robins the buckets so
    * every training window still mixes difficulties — `pos = brank *
    * [[CurriculumBuckets]] + bucket` with `brank` the doc's rank inside
    * its bucket under a deterministic md5 shuffle. Positions of unequal
    * buckets leave gaps once a bucket exhausts; the loader sorts by `pos`,
    * so only the ORDER is contractual.
    *
    * Scale shape: bucket assignment is the zero-shuffle [[qualityScore]]
    * projection; the within-bucket rank deliberately does NOT use a
    * `PARTITION BY bucket` window (3 partitions = the whole corpus in 3
    * tasks) but [[graft.operators.PrefixSum.groupedRank]] — a range
    * exchange on the shuffle key (balanced regardless of bucket sizes)
    * plus per-bucket running counters, full parallelism at any corpus
    * size. Output: (doc_id, bucket, brank, pos). */
  def curriculum(docs: DataFrame): DataFrame = {
    val scored = qualityScore(docs)
      .select(col("doc_id"),
        when(col("score_per_tok_e4") >= CurriculumHighE4, 0L)
          .when(col("score_per_tok_e4") >= CurriculumLowE4, 1L)
          .otherwise(2L).as("bucket"))
      .withColumn("shuffle_key", hash60("curr:", col("doc_id")))
    graft.operators.PrefixSum
      .groupedRank(scored, "shuffle_key", "doc_id", "bucket", "brank")
      .select(col("doc_id"), col("bucket"), col("brank"),
        (col("brank") * CurriculumBuckets + col("bucket")).as("pos"))
  }

  /** DuckDB twin of [[curriculum]] — the grouped rank replays as the
    * plain per-bucket window it is semantically. */
  val curriculumOracle: String =
    s"""WITH ${qualityCtes("cu_t", "cu_s")},
       |cu_b AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |    CASE WHEN n_tokens > 0 THEN score * 10000 // n_tokens
       |         ELSE 0 END AS spt
       |  FROM cu_s),
       |cu_k AS (
       |  SELECT doc_id,
       |    CASE WHEN spt >= $CurriculumHighE4 THEN 0
       |         WHEN spt >= $CurriculumLowE4 THEN 1 ELSE 2 END AS bucket,
       |    ${hash60SqlOf("curr:", "doc_id")} AS shuffle_key
       |  FROM cu_b),
       |cu_r AS (
       |  SELECT doc_id, bucket,
       |    row_number() OVER (PARTITION BY bucket
       |                       ORDER BY shuffle_key, doc_id) - 1 AS brank
       |  FROM cu_k)
       |SELECT doc_id, bucket::BIGINT AS bucket, brank::BIGINT AS brank,
       |  (brank * $CurriculumBuckets + bucket)::BIGINT AS pos
       |FROM cu_r""".stripMargin

  val redactOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |    text || ' contact user' || doc_id::VARCHAR || '@example.com or +1-202-555-'
       |      || lpad((doc_id % 10000)::VARCHAR, 4, '0') || ' now' AS t
       |  FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(t, '$EmailRe'))::BIGINT AS n_emails,
       |  len(regexp_extract_all(t, '$PhoneRe'))::BIGINT AS n_phones,
       |  md5(regexp_replace(regexp_replace(t, '$EmailRe', '<EMAIL>', 'g'),
       |                     '$PhoneRe', '<PHONE>', 'g')) AS red_hash
       |FROM t""".stripMargin

  // --- sequence packing (round 13) --------------------------------------

  /** Packing context length (tokens per training sequence) and the
    * block size (docs per independently-packed block). 512 tokens suits
    * the synthetic 10–100-token docs the way 2k–8k contexts suit real
    * corpora (several docs per bin, overflow boundaries actually
    * exercised); 1024-doc blocks amortize block-boundary waste to
    * < 0.1% while keeping every block's fold array bounded. */
  val PackCtxTokens = 512L
  val PackBlockDocs = 1024L

  /** Document-respecting sequence PACKING stats — the [[pack]]
    * concat-and-chop shard map's complement: [[pack]] splits documents
    * at exact token budgets (zero waste, docs cross boundaries), while
    * THIS packer never splits a document across training sequences
    * (a doc longer than the context truncates to it — the standard
    * practice pair) and therefore pays measurable padding waste, which
    * is exactly the statistic it reports. Run BLOCK-LOCALLY: docs are
    * processed in
    * doc_id order within fixed [[PackBlockDocs]]-sized doc_id blocks,
    * each block packed independently. Block-local greedy is the
    * distributed-packing shape real pipelines use — a GLOBAL greedy
    * fold is inherently sequential (bin state threads through every
    * row), while block-local is embarrassingly parallel, deterministic
    * under any partitioning, and its extra waste is bounded by one
    * partial bin per block.
    *
    * Per block: `(block, n_docs, n_bins, sum_tok, waste_e4)` with
    * waste_e4 = floor((n_bins·CTX − Σtok)·1e4 / (n_bins·CTX) + 0.5) —
    * the padding fraction a trainer would burn on this packing.
    *
    * Plan shape: one narrow projection computes each doc's truncated
    * token count (an int, not the tokens — the corpus text never
    * shuffles), ONE block-keyed exchange groups ≤ [[PackBlockDocs]]
    * ints per block, and the greedy fold runs as a codegen'd
    * `aggregate` lambda over the sorted in-block array. At 100 TB the
    * block table is docs/1024 rows — the output IS the packing
    * manifest a sharded tokenizer run consumes. */
  def packStats(docs: DataFrame): DataFrame = {
    val ctx = PackCtxTokens
    docs.select(col("doc_id").cast("long").as("doc_id"),
        least(size(Dedup.tokens(col("text"))).cast("long"), lit(ctx)).as("t"))
      .groupBy(expr(s"doc_id div $PackBlockDocs").as("block"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("sum_tok"),
        sort_array(collect_list(struct(col("doc_id"), col("t")))).as("ds"))
      .withColumn("n_bins", expr(
        // greedy fold, (bins, fill) threaded through the sorted block:
        // overflow opens a new bin seeded with the doc's tokens. A
        // 0-token doc packs free; an all-empty block still counts its
        // one (empty) bin — consistent in both engines.
        s"""aggregate(ds, struct(1L AS bins, 0L AS fill),
           |  (acc, x) -> IF(acc.fill + x.t > $ctx,
           |    struct(acc.bins + 1L AS bins, x.t AS fill),
           |    struct(acc.bins AS bins, acc.fill + x.t AS fill)),
           |  acc -> acc.bins)""".stripMargin))
      .withColumn("waste_e4", floor(
        (col("n_bins") * ctx - col("sum_tok")).cast("double") * 1e4
          / (col("n_bins") * ctx).cast("double") + 0.5).cast("long"))
      .select(col("block"), col("n_docs"), col("n_bins"), col("sum_tok"),
        col("waste_e4"))
  }

  /** DuckDB twin of [[packStats]] — the same greedy fold via
    * `list_reduce` with the (bins, fill) state packed into one BIGINT
    * (`bins·10^4 + fill`; fill ≤ CTX < 10^4, so the encoding is exact
    * and the list's raw token counts can never be mistaken for an
    * encoded accumulator — only the PREPENDED seed carries it). */
  val packStatsOracle: String = {
    val ctx = PackCtxTokens
    s"""WITH pk_t AS (
       |  SELECT doc_id::BIGINT AS doc_id, doc_id // $PackBlockDocs AS block,
       |    least(len(list_filter(string_split_regex(lower(text), '\\W+'),
       |                          t -> t != ''))::BIGINT, $ctx) AS t
       |  FROM documents),
       |pk_b AS (
       |  SELECT block, count(*)::BIGINT AS n_docs, sum(t)::BIGINT AS sum_tok,
       |    list_prepend(10000::BIGINT, list(t ORDER BY doc_id)) AS ts
       |  FROM pk_t GROUP BY 1),
       |pk_f AS (
       |  SELECT block, n_docs, sum_tok,
       |    list_reduce(ts, (acc, t) ->
       |      CASE WHEN acc % 10000 + t > $ctx
       |           THEN (acc // 10000 + 1) * 10000 + t
       |           ELSE acc + t END) // 10000 AS n_bins
       |  FROM pk_b)
       |SELECT block, n_docs, n_bins, sum_tok,
       |  floor((n_bins * $ctx - sum_tok) * 1e4 /
       |        (n_bins * $ctx) + 0.5)::BIGINT AS waste_e4
       |FROM pk_f""".stripMargin
  }
}
