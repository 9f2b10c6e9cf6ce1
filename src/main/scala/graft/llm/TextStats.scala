package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-document text analysis for training-data curation: token counts,
  * quality scoring, language identification and content fingerprinting.
  * Pure Column expressions — one narrow scan, no shuffle, trivially
  * embarrassing-parallel at any scale.
  *
  * Every number is integerized so results are engine-portable (the DuckDB
  * oracle computes the identical formulas).
  */
object TextStats {

  /** Tiny per-language stopword regexes for the n-gram/stopword-count
    * language heuristic. */
  private val stops = Seq(
    "en" -> "\\b(the|of|and|to|in|is|was|for)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|dans)\\b",
    "es" -> "\\b(el|los|las|es|una|para)\\b")

  /** Percentage of alphabetic+space characters, rounded; empty text is 0
    * by convention (unguarded, the division yields null here but NaN-ish
    * in other engines — the oracles mirror the CASE). Shared by [[stats]]
    * and the Gopher filter so the quality definition cannot diverge. */
  def qualityCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(length(text) > 0,
      floor(lit(100.0) *
        length(regexp_replace(text, "[^A-Za-z ]", "")) / length(text)
        + 0.5).cast("long"))
      .otherwise(lit(0L))

  /** Appends the per-language stopword counts and the deterministic
    * `lang_guess` argmax (fixed precedence en > de > fr > es) to any
    * frame with a `text` column — the ONE classifier definition, shared
    * by [[stats]] and [[langidEval]]. */
  private def withLangGuess(in: DataFrame): DataFrame = {
    var df = in
    for ((lang, re) <- stops)
      df = df.withColumn(s"sw_$lang",
        size(regexp_extract_all(lower(col("text")), lit(re), lit(0))).cast("long"))
    df.withColumn("lang_guess",
        when(col("sw_de") > col("sw_en") && col("sw_de") >= col("sw_fr") && col("sw_de") >= col("sw_es"), "de")
          .when(col("sw_fr") > col("sw_en") && col("sw_fr") >= col("sw_es"), "fr")
          .when(col("sw_es") > col("sw_en"), "es")
          .otherwise("en"))
      .drop("text")
  }

  def stats(docs: DataFrame): DataFrame =
    withLangGuess(docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("text"),
      // word tokens
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("n_words"),
      // BPE-ish budget heuristic: ~4 chars per token
      ceil(length(col("text")) / 4.0).cast("long").as("n_tokens_approx"),
      qualityCol(col("text")).as("quality"),
      // content fingerprint
      substring(md5(lower(col("text")).cast("binary")), 1, 16).as("fingerprint")))

  /** Language-ID evaluation: the confusion matrix of the stopword
    * heuristic against the gold `lang` labels plus a per-gold-language
    * recall (e4) — the classifier-evaluation table a pipeline reviews
    * before trusting [[stats]]' `lang_guess` for routing/mixing. Output
    * one row per observed `(lang, lang_guess)` cell: `(lang, lang_guess,
    * n, n_lang, recall_e4)` where `recall_e4` is the diagonal share for
    * the row's gold language. The guess expression is the SAME
    * [[withLangGuess]] definition [[stats]] ships, so the evaluated
    * classifier is the shipped one.
    *
    * Scale shape: ONE shuffle-free per-doc projection (gold label
    * carried through — no doc_id self-join); the confusion aggregate is
    * (langs × langs)-sized with map-side combine; the per-gold totals
    * are a window over that tiny matrix. */
  def langidEval(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // gold label carried THROUGH the classifier projection — one scan,
    // no doc_id self-join (the review-caught two-exchange shape); the
    // guess expression is the SAME withLangGuess definition stats ships
    val guessed = withLangGuess(docs.select(col("lang"), col("text")))
      .select(col("lang"), col("lang_guess"))
    val byGold = Window.partitionBy(col("lang"))
    guessed.groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_lang", sum(col("n")).over(byGold))
      .withColumn("diag",
        sum(when(col("lang") === col("lang_guess"), col("n"))
          .otherwise(lit(0L))).over(byGold))
      .withColumn("recall_e4", expr("diag * 10000 div n_lang"))
      .select(col("lang"), col("lang_guess"), col("n"), col("n_lang"),
        col("recall_e4"))
  }

  /** The DuckDB twin of [[stats]] — formulas must stay in lockstep. */
  val oracleSql: String =
    """SELECT doc_id::BIGINT AS doc_id,
      |  len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_words,
      |  ceil(length(text) / 4.0)::BIGINT AS n_tokens_approx,
      |  CASE WHEN length(text) > 0
      |       THEN floor(100.0 * length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) / length(text) + 0.5)::BIGINT
      |       ELSE 0 END AS quality,
      |  substr(md5(lower(text)), 1, 16) AS fingerprint,
      |  len(regexp_extract_all(lower(text), '\b(the|of|and|to|in|is|was|for)\b'))::BIGINT AS sw_en,
      |  len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein)\b'))::BIGINT AS sw_de,
      |  len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|dans)\b'))::BIGINT AS sw_fr,
      |  len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|para)\b'))::BIGINT AS sw_es,
      |  CASE WHEN sw_de > sw_en AND sw_de >= sw_fr AND sw_de >= sw_es THEN 'de'
      |       WHEN sw_fr > sw_en AND sw_fr >= sw_es THEN 'fr'
      |       WHEN sw_es > sw_en THEN 'es'
      |       ELSE 'en' END AS lang_guess
      |FROM documents""".stripMargin

  /** Character-entropy gibberish bounds, e4 bits/char: natural prose
    * sits ~3.5–4.5; single-character spam and run-length garbage fall
    * under [[CharEntLoE4]]; random bytes / base64 blobs push above
    * [[CharEntHiE4]] toward log2(alphabet). */
  val CharEntLoE4 = 20000L
  val CharEntHiE4 = 55000L

  /** Per-document CHARACTER-distribution Shannon entropy — the classic
    * binary-garbage / gibberish detector (the CCNet-family pipelines
    * run exactly this ahead of the model-based filters; neither the
    * Gopher ratios nor the LM scores catch base64 blobs or run-length
    * spam, whose entropy is the direct fingerprint).
    *
    * Pure int64 cross-engine arithmetic: per doc with per-character
    * counts c_i over lower-cased code points and n = Σc_i,
    *
    *   H·n·2^20 = Σ c_i · log2fix(n, c_i)   (the [[graft.functions.Log2Fix]]
    *                                         kernel — n ≥ c_i ≥ 1 always)
    *   ent_e4   = (h20_sum · 10^4) div (n · 2^20)    [truncating]
    *   keep     = [[CharEntLoE4]] ≤ ent_e4 ≤ [[CharEntHiE4]]
    *
    * int64 envelope: h20_sum ≤ n·log2(alphabet)·2^20, so the e4 scaling
    * stays inside int64 for docs up to ~10^8 characters — beyond any
    * sane document; a corpus of larger blobs belongs in the binary
    * media path, not the text one.
    *
    * Plan shape: explode to (doc_id, ch), ONE doc+char-keyed aggregate
    * (map-side combined — the per-doc alphabet bounds the state), the
    * per-doc total as a doc-keyed window over the RESULTING char table
    * (alphabet-sized partitions — a join back to a separate total
    * aggregate would re-run the corpus explode, the heavyTokens lesson),
    * and the codegen'd Log2Fix expression per (doc, char) row. The
    * corpus text streams once; everything after the first aggregate is
    * char-table-sized (~alphabet rows per doc). */
  def charEntropy(docs: DataFrame): DataFrame = {
    import graft.functions.VectorExpressions
    val cnt = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(split(lower(col("text")), "")).as("ch"))
      // Spark's split("", "") yields [""], DuckDB's string_split an empty
      // list — drop the empty token so an empty doc produces NO row in
      // both engines (documented in the oracle)
      .where(col("ch") =!= "")
      .groupBy(col("doc_id"), col("ch"))
      .agg(count(lit(1)).as("c"))
    cnt
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .withColumn("t20", col("c") * VectorExpressions.log2_fix(col("n"), col("c")))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_chars"), sum(col("t20")).as("h20_sum"))
      .withColumn("ent_e4",
        expr("(h20_sum * 10000) div (n_chars * 1048576)"))
      .withColumn("keep",
        col("ent_e4") >= CharEntLoE4 && col("ent_e4") <= CharEntHiE4)
      .select(col("doc_id"), col("n_chars"), col("h20_sum"), col("ent_e4"),
        col("keep"))
  }

  /** DuckDB twin of [[charEntropy]] — the [[graft.functions.Log2Fix]]
    * recursive-CTE kernel replayed per (doc, char) row; requires the
    * query to open `WITH RECURSIVE`. Docs with no characters produce no
    * row in either engine (explode of an empty array). */
  val charEntropyOracle: String = {
    val lg = graft.functions.Log2Fix.duckdbCtes("cemelt", "doc_id, ch", "celg")
    s"""WITH RECURSIVE cecnt AS (
       |  SELECT doc_id, ch, count(*)::BIGINT AS c
       |  FROM (SELECT doc_id::BIGINT AS doc_id,
       |          unnest(string_split(lower(text), '')) AS ch
       |        FROM documents)
       |  GROUP BY 1, 2),
       |cetot AS (SELECT doc_id, sum(c)::BIGINT AS n FROM cecnt GROUP BY 1),
       |cemelt AS (
       |  SELECT c.doc_id, c.ch, t.n AS num, c.c AS den, c.c
       |  FROM cecnt c JOIN cetot t USING (doc_id)),
       |$lg,
       |ceh AS (
       |  SELECT m.doc_id, max(m.num)::BIGINT AS n_chars,
       |    sum(m.c * l.l20)::BIGINT AS h20_sum
       |  FROM cemelt m JOIN celg l ON l.doc_id = m.doc_id AND l.ch = m.ch
       |  GROUP BY 1)
       |SELECT doc_id, n_chars, h20_sum,
       |  (h20_sum * 10000) // (n_chars * 1048576) AS ent_e4,
       |  (h20_sum * 10000) // (n_chars * 1048576) BETWEEN $CharEntLoE4 AND $CharEntHiE4 AS keep
       |FROM ceh""".stripMargin
  }

  /** DuckDB twin of [[langidEval]] — the confusion/recall arithmetic
    * over the [[oracleSql]] guess definition (ONE classifier spec). */
  val langidEvalOracle: String =
    s"""WITH st AS ($oracleSql),
       |g AS (SELECT d.lang, st.lang_guess
       |      FROM st JOIN documents d ON d.doc_id::BIGINT = st.doc_id),
       |m AS (SELECT lang, lang_guess, count(*)::BIGINT AS n
       |      FROM g GROUP BY 1, 2)
       |SELECT lang, lang_guess, n,
       |  (sum(n) OVER w)::BIGINT AS n_lang,
       |  ((sum(CASE WHEN lang = lang_guess THEN n ELSE 0 END) OVER w)
       |    * 10000 // sum(n) OVER w)::BIGINT AS recall_e4
       |FROM m
       |WINDOW w AS (PARTITION BY lang)""".stripMargin
}
