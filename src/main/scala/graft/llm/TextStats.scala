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

  def stats(docs: DataFrame): DataFrame = {
    var df = docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("text"),
      // word tokens
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)))
        .cast("long").as("n_words"),
      // BPE-ish budget heuristic: ~4 chars per token
      ceil(length(col("text")) / 4.0).cast("long").as("n_tokens_approx"),
      qualityCol(col("text")).as("quality"),
      // content fingerprint
      substring(md5(lower(col("text")).cast("binary")), 1, 16).as("fingerprint"))
    for ((lang, re) <- stops)
      df = df.withColumn(s"sw_$lang",
        size(regexp_extract_all(lower(col("text")), lit(re), lit(0))).cast("long"))
    // deterministic argmax with fixed precedence en > de > fr > es
    df.withColumn("lang_guess",
        when(col("sw_de") > col("sw_en") && col("sw_de") >= col("sw_fr") && col("sw_de") >= col("sw_es"), "de")
          .when(col("sw_fr") > col("sw_en") && col("sw_fr") >= col("sw_es"), "fr")
          .when(col("sw_es") > col("sw_en"), "es")
          .otherwise("en"))
      .drop("text")
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
}
