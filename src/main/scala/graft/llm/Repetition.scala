package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Repetition and boilerplate analysis for corpus curation — the
  * Gopher-style quality-filter family (Rae et al. 2021, "Scaling
  * Language Models", table A1: fraction-of-duplicate-n-gram filters)
  * plus cross-document boilerplate phrase mining (CCNet-style common
  * line/phrase removal, Wenzek et al. 2019).
  *
  * [[metrics]] is per-row only — tokenize once, every statistic is a
  * higher-order fold over the token array, no shuffle, embarrassingly
  * parallel at any corpus size.
  *
  * [[boilerplate]] is ONE shuffle: distinct 5-gram phrases per doc
  * (map-side, inside the scan stage) → groupBy phrase with partial
  * aggregation → a bounded global top-k (TakeOrdered — only k rows per
  * partition ever reach the driver-side merge). Head phrases are the
  * skew risk; the count partials absorb them map-side exactly like any
  * word-count.
  */
object Repetition {

  /** Per-document repetition metrics (all fractions integerized e4):
    *  - `distinct_frac_e4`   distinct tokens / tokens (low ⇒ repetitive)
    *  - `top_bigram_frac_e4` occurrences of the most frequent bigram /
    *    total bigrams (high ⇒ loops/boilerplate)
    *  - `dup_bigram_frac_e4` excess duplicate bigram occurrences /
    *    total bigrams
    * Documents with no tokens (resp. no bigrams) report 0 by convention.
    */
  def metrics(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        when(size(col("w")) >= 2,
          expr("transform(sequence(1, size(w) - 1), i -> concat_ws(' ', w[i-1], w[i]))"))
          .otherwise(array().cast("array<string>")).as("bg"))
      // max run length over the SORTED bigram list == max bigram count;
      // a per-row codegen'd walk (SortedMaxRunLength), not a groupBy and
      // not an interpreted HOF fold — nothing leaves the row and the
      // projection stays inside whole-stage codegen.
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        size(col("bg")).cast("long").as("n_bg"),
        size(array_distinct(col("bg"))).cast("long").as("n_distinct_bg"),
        graft.functions.VectorExpressions
          .sorted_max_run_length(sort_array(col("bg"))).as("max_bg"))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") > 0,
          floor(col("n_distinct") * lit(1.0e4) / col("n_tokens") + 0.5).cast("long"))
          .otherwise(0L).as("distinct_frac_e4"),
        when(col("n_bg") > 0,
          floor(col("max_bg") * lit(1.0e4) / col("n_bg") + 0.5).cast("long"))
          .otherwise(0L).as("top_bigram_frac_e4"),
        when(col("n_bg") > 0,
          floor((col("n_bg") - col("n_distinct_bg")) * lit(1.0e4) / col("n_bg") + 0.5)
            .cast("long"))
          .otherwise(0L).as("dup_bigram_frac_e4"))

  /** Pinned thresholds for [[gopherFilter]] (Rae et al. 2021 table A1's
    * rule SHAPE, thresholds adapted to the integerized metrics and this
    * corpus's observed distributions so both verdicts occur). */
  val MinTokens = 5L
  val MaxTokens = 100000L
  val MinQuality = 60L
  val MinDistinctFracE4 = 3500L
  val MaxTopBigramFracE4 = 900L

  /** The composed Gopher-style document filter: per document, evaluate
    * the rule chain (length bounds → character quality → lexical
    * diversity → bigram repetition) and emit keep/drop with the FIRST
    * failing rule as the reason — the audit trail a curation pipeline
    * writes next to its drops.
    *
    * One zero-shuffle projection: every signal (token counts, alpha
    * ratio, distinct fraction, top-bigram fraction via the codegen'd
    * sorted-run walk) computes inside the scan stage; no joins — the
    * shared formulas come from the same helpers [[metrics]] and
    * [[TextStats.stats]] use, so the definitions cannot diverge.
    *
    * Output: (doc_id, n_tokens, quality, keep, reason). */
  def gopherFilter(docs: DataFrame): DataFrame =
    gopherFilterWith(docs, Nil)

  /** [[gopherFilter]] carrying `passThrough` input columns (`lang`,
    * `text`, …) into the output unchanged — the streaming curation gate
    * composes further stateless stages after the verdict and must not
    * JOIN back to the source (a self-join is illegal on a stream; on a
    * batch it is a pointless shuffle). With `retainTokens` the token
    * array the filter already computed rides along as `w`, so a
    * downstream stage doesn't re-tokenize the text. Same projection
    * chain, same rule definitions. */
  def gopherFilterWith(docs: DataFrame, passThrough: Seq[String],
      retainTokens: Boolean = false): DataFrame = {
    val pt = passThrough.map(col)
    val ptw = if (retainTokens) col("w") +: pt else pt
    docs
      .select(Seq(col("doc_id").cast("long").as("doc_id"),
        TextStats.qualityCol(col("text")).as("quality"),
        Dedup.tokens(col("text")).as("w")) ++ pt: _*)
      .select(Seq(col("doc_id"), col("quality"), col("w"),
        when(size(col("w")) >= 2,
          expr("transform(sequence(1, size(w) - 1), i -> concat_ws(' ', w[i-1], w[i]))"))
          .otherwise(array().cast("array<string>")).as("bg")) ++ pt: _*)
      .select(Seq(col("doc_id"), col("quality"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        size(col("bg")).cast("long").as("n_bg"),
        graft.functions.VectorExpressions
          .sorted_max_run_length(sort_array(col("bg"))).as("max_bg")) ++ ptw: _*)
      .select(Seq(col("doc_id"), col("n_tokens"), col("quality"),
        when(col("n_tokens") > 0,
          floor(col("n_distinct") * lit(1.0e4) / col("n_tokens") + 0.5).cast("long"))
          .otherwise(0L).as("distinct_frac_e4"),
        when(col("n_bg") > 0,
          floor(col("max_bg") * lit(1.0e4) / col("n_bg") + 0.5).cast("long"))
          .otherwise(0L).as("top_bigram_frac_e4")) ++ ptw: _*)
      .withColumn("reason",
        when(col("n_tokens") < MinTokens, "too_short")
          .when(col("n_tokens") > MaxTokens, "too_long")
          .when(col("quality") < MinQuality, "low_alpha")
          .when(col("distinct_frac_e4") < MinDistinctFracE4, "low_diversity")
          .when(col("top_bigram_frac_e4") > MaxTopBigramFracE4, "repetitive")
          .otherwise("ok"))
      .select(Seq(col("doc_id"), col("n_tokens"), col("quality"),
        (col("reason") === "ok").as("keep"), col("reason")) ++ ptw: _*)
  }

  /** The Gopher-filter CTE chain (tok/base/mx/m/v, ending in
    * `v(doc_id, n_tokens, quality, reason)`), exposed so the
    * composed-pipeline oracle can embed the SAME rule definitions. */
  val gopherCtes: String =
    s"""tok AS (SELECT doc_id, text,
       |    list_filter(string_split_regex(lower(text), '\\W+'), t -> t != '') w
       |  FROM documents),
       |base AS (SELECT doc_id, text, len(w)::BIGINT AS n_tokens,
       |  len(list_distinct(w))::BIGINT AS n_distinct,
       |  CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
       |       ELSE []::VARCHAR[] END AS bg FROM tok),
       |mx AS (SELECT doc_id, max(c) AS mxc FROM
       |        (SELECT doc_id, g, count(*) AS c
       |         FROM (SELECT doc_id, unnest(bg) AS g FROM base) GROUP BY 1, 2)
       |       GROUP BY 1),
       |m AS (SELECT b.doc_id::BIGINT AS doc_id, n_tokens,
       |  CASE WHEN length(text) > 0
       |    THEN floor(100.0 * length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) / length(text) + 0.5)::BIGINT
       |    ELSE 0 END AS quality,
       |  CASE WHEN n_tokens > 0
       |    THEN floor(n_distinct * 1.0e4 / n_tokens + 0.5)::BIGINT ELSE 0 END AS dfrac,
       |  CASE WHEN n_tokens >= 2
       |    THEN floor(coalesce(mxc, 0) * 1.0e4 / (n_tokens - 1) + 0.5)::BIGINT ELSE 0 END AS tbf
       |  FROM base b LEFT JOIN mx USING (doc_id)),
       |v AS (SELECT doc_id, n_tokens, quality,
       |  CASE WHEN n_tokens < $MinTokens THEN 'too_short'
       |       WHEN n_tokens > $MaxTokens THEN 'too_long'
       |       WHEN quality < $MinQuality THEN 'low_alpha'
       |       WHEN dfrac < $MinDistinctFracE4 THEN 'low_diversity'
       |       WHEN tbf > $MaxTopBigramFracE4 THEN 'repetitive'
       |       ELSE 'ok' END AS reason
       |  FROM m)""".stripMargin

  val gopherFilterOracle: String =
    s"""WITH $gopherCtes
       |SELECT doc_id, n_tokens, quality, (reason = 'ok') AS keep, reason
       |FROM v""".stripMargin

  /** The `topK` most document-frequent word-5-gram phrases across the
    * corpus (ties broken by phrase, so the cut is deterministic).
    * Phrase → doc-frequency is the boilerplate signal: anything near
    * df == corpus size is template text a curation pass strips.
    */
  def boilerplate(docs: DataFrame, topK: Int = 50): DataFrame =
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        explode(Dedup.shinglesFromTokens(col("w"), 5)).as("phrase"))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("phrase").asc)
      .limit(topK)

  val metricsOracle: String =
    """WITH tok AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'),
      |                                        t -> t != '') w FROM documents),
      |base AS (SELECT doc_id, len(w)::BIGINT AS n_tokens,
      |  len(list_distinct(w))::BIGINT AS n_distinct,
      |  CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
      |       ELSE []::VARCHAR[] END AS bg FROM tok),
      |mx AS (SELECT doc_id, max(c) AS mxc FROM
      |        (SELECT doc_id, g, count(*) AS c
      |         FROM (SELECT doc_id, unnest(bg) AS g FROM base) GROUP BY 1, 2)
      |       GROUP BY 1)
      |SELECT b.doc_id::BIGINT AS doc_id, n_tokens,
      |  CASE WHEN n_tokens > 0
      |    THEN floor(n_distinct * 1.0e4 / n_tokens + 0.5)::BIGINT ELSE 0 END AS distinct_frac_e4,
      |  CASE WHEN n_tokens >= 2
      |    THEN floor(coalesce(mxc, 0) * 1.0e4 / (n_tokens - 1) + 0.5)::BIGINT ELSE 0 END AS top_bigram_frac_e4,
      |  CASE WHEN n_tokens >= 2
      |    THEN floor((len(bg) - len(list_distinct(bg))) * 1.0e4 / (n_tokens - 1) + 0.5)::BIGINT
      |    ELSE 0 END AS dup_bigram_frac_e4
      |FROM base b LEFT JOIN mx USING (doc_id)""".stripMargin

  val boilerplateOracle: String =
    """WITH sh AS (SELECT DISTINCT doc_id,
      |    unnest(list_transform(range(1, greatest(len(w) - 4, 0) + 1),
      |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS g
      |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\W+'),
      |                                   t -> t != '') w FROM documents))
      |SELECT g AS phrase, count(*)::BIGINT AS df
      |FROM sh GROUP BY 1 ORDER BY df DESC, phrase LIMIT 50""".stripMargin
}
