package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Log2Fix, VectorExpressions}

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * select raw-corpus documents whose hashed-n-gram distribution looks
  * like a small trusted TARGET domain, by scoring each raw doc with the
  * log importance ratio log p_target(doc) / p_raw(doc) under two
  * bag-of-hashed-features unigram models.
  *
  * Concretely, with features = word unigrams + adjacent bigrams hashed
  * into [[Buckets]] buckets (the paper's 10k-bucket hashed n-gram space),
  * cp_b / cq_b the per-bucket feature-occurrence counts in the target /
  * raw corpus and TP / TQ their totals, each feature occurrence in bucket
  * b contributes the add-one-smoothed signed log ratio
  *
  *   lr(b) = log2((cp_b + 1)/(TP + B)) - log2((cq_b + 1)/(TQ + B))
  *         = slog2(cp_b + 1, cq_b + 1) + slog2(TQ + B, TP + B)
  *
  * in Log2Fix 2^-20 fixed point — the SPLIT form keeps every kernel
  * argument a plain count (≤ corpus tokens), so nothing overflows int64
  * at any corpus size, where the single-ratio form would overflow past
  * ~3e9 tokens. A doc's weight is the sum over its feature occurrences;
  * the engine then takes the top-[[SelectK]] docs by (weight, doc_id) —
  * the deterministic budgeted variant of the paper's Gumbel top-k
  * resample (a seeded Gumbel perturbation would add one hashed term to
  * the same sum; determinism is what makes the selection replayable).
  *
  * Scale shape: two corpus scans, zero corpus shuffles.
  *   1. count pass — the feature stream aggregates into the FIXED
  *      [[Buckets]]-bounded (b, cp, cq) table (map-side combined; the
  *      only state is the bucket table);
  *   2. score pass — the B-sized lr table BROADCASTS into the re-streamed
  *      features; the doc-keyed sum map-combines to ~1 row per doc per
  *      task before its (doc-count-sized) exchange; the final top-k is a
  *      TakeOrderedAndProject (per-partition heaps), never a global sort.
  * The target side is typically tiny (a trusted reference corpus) but
  * nothing here requires it — both distributions are bucket aggregates.
  * Every scored feature's bucket exists in the count table (the scored
  * doc itself contributed to cq), so the broadcast join is inner+total.
  *
  * Int64 envelope: |lr| < 2·63·2^20 ≈ 1.3e8, so a doc would need ~7e10
  * feature occurrences (≫ any real document) to overflow the sum.
  *
  * Portability: the feature hash is the engine-portable
  * `('0x' || substr(md5(g), 1, 15))::BIGINT % B` (same kernel as
  * [[Curation.qualityScore]]'s weight hash), and both log terms replay in
  * DuckDB through [[Log2Fix.duckdbCtes]] — the oracle matches
  * bit-for-bit.
  */
object Dsir {

  /** Hashed feature space width. Sized for the test corpora; a 100 TB
    * run raises it (the paper uses 10^4; the count table stays a
    * broadcastable few MB up to ~2^20 buckets). */
  val Buckets = 4096L

  /** Selection budget — the "sample k docs for the mix" knob. */
  val SelectK = 100

  /** Stand-in target domain: the corpus rows from this source act as the
    * trusted reference sample (the paper's Wikipedia/books side). */
  val TargetSource = "src0"

  /** First 60 bits of md5 as a non-negative int64 — the engine-portable
    * string hash shared with the oracle side. */
  private def hash15(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Signed fixed-point log2 ratio — the shared
    * [[VectorExpressions.slog2_fix]] kernel. */
  private def slog2(num: Column, den: Column): Column =
    VectorExpressions.slog2_fix(num, den)

  /** The per-occurrence hashed feature stream `(doc_id, tgt, b)` — one
    * corpus scan, never materialized (re-streamed by each pass, the
    * [[Mining.gramCounts]] discipline). */
  private def features(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        (col("source") === TargetSource).as("tgt"),
        Dedup.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("tgt"),
        explode(concat(col("w"), Mining.bigramSeq(col("w")))).as("g"))
      .select(col("doc_id"), col("tgt"),
        (hash15(col("g")) % Buckets).as("b"))

  /** The bounded (b, cp, cq) hashed-count table — the entire model
    * state of both distributions. */
  def bucketCounts(docs: DataFrame): DataFrame =
    features(docs)
      .groupBy("b")
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("cp"),
        sum(when(!col("tgt"), 1L).otherwise(0L)).as("cq"))

  /** Top-[[SelectK]] raw docs by importance weight:
    * `(rank, doc_id, n_feats, w20)` with w20 the summed signed log ratio
    * in 2^-20 fixed point. Docs with no tokens have no features and are
    * not candidates (an empty doc carries no distributional evidence). */
  def select(docs: DataFrame): DataFrame = {
    val counts = bucketCounts(docs)
    // TP/TQ as GLOBAL WINDOW sums over the [[Buckets]]-bounded count
    // table (r17; previously a crossJoin(broadcast(counts.agg(...))) —
    // that totals aggregate embedded a second copy of the whole hashed-
    // feature corpus pass with nothing reusable between the copies, so
    // the corpus was tokenized+hashed THREE times per select instead of
    // the documented two). The window's single partition holds at most
    // [[Buckets]] rows at any corpus size.
    val wAll = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val lr = counts
      .withColumn("tp", sum(col("cp")).over(wAll))
      .withColumn("tq", sum(col("cq")).over(wAll))
      .select(col("b"),
        (slog2(col("cp") + 1, col("cq") + 1) +
          slog2(col("tq") + Buckets, col("tp") + Buckets)).as("lr20"))
    val top = features(docs)
      .where(!col("tgt"))
      .join(broadcast(lr), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum("lr20").as("w20"))
      .orderBy(col("w20").desc, col("doc_id").asc)
      .limit(SelectK)
    // rank re-derived over the K selected rows only (tiny)
    top.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("w20").desc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("doc_id"), col("n_feats"), col("w20"))
  }

  /** DuckDB twin of [[select]] — replays the hash, both signed Log2Fix
    * terms, and the top-k. */
  val selectOracle: String = {
    val lg1 = Log2Fix.duckdbCtes("r1", "b, sgn", "lg1")
    val lg2 = Log2Fix.duckdbCtes("r2", "kk, sgn2", "lg2")
    s"""WITH RECURSIVE tok AS (
       |  SELECT doc_id::BIGINT AS doc_id, source = '$TargetSource' AS tgt,
       |    list_filter(string_split_regex(lower(text), '\\W+'),
       |                t -> t != '') AS w
       |  FROM documents),
       |feat AS (
       |  SELECT doc_id, tgt,
       |    ('0x' || substr(md5(g), 1, 15))::BIGINT % $Buckets AS b
       |  FROM (
       |    SELECT doc_id, tgt,
       |      unnest(w || list_transform(range(1, greatest(len(w) - 1, 0) + 1),
       |                                 i -> w[i] || ' ' || w[i+1])) AS g
       |    FROM tok)),
       |bc AS (
       |  SELECT b, sum(tgt::INT)::BIGINT AS cp,
       |    sum((NOT tgt)::INT)::BIGINT AS cq
       |  FROM feat GROUP BY 1),
       |tot AS (SELECT sum(cp)::BIGINT AS tp, sum(cq)::BIGINT AS tq FROM bc),
       |r1 AS (
       |  SELECT b, CASE WHEN cp + 1 >= cq + 1 THEN 1 ELSE -1 END AS sgn,
       |    greatest(cp + 1, cq + 1) AS num, least(cp + 1, cq + 1) AS den
       |  FROM bc),
       |$lg1,
       |r2 AS (
       |  SELECT 1 AS kk,
       |    CASE WHEN tq + $Buckets >= tp + $Buckets THEN 1 ELSE -1 END AS sgn2,
       |    greatest(tq + $Buckets, tp + $Buckets) AS num,
       |    least(tq + $Buckets, tp + $Buckets) AS den
       |  FROM tot),
       |$lg2,
       |lr AS (
       |  SELECT b, sgn * l20 + (SELECT sgn2 * l20 FROM lg2) AS lr20
       |  FROM lg1),
       |sc AS (
       |  SELECT doc_id, count(*)::BIGINT AS n_feats, sum(lr20)::BIGINT AS w20
       |  FROM feat JOIN lr USING (b) WHERE NOT tgt GROUP BY 1)
       |SELECT row_number() OVER (ORDER BY w20 DESC, doc_id)::BIGINT AS rank,
       |  doc_id, n_feats, w20
       |FROM sc ORDER BY w20 DESC, doc_id LIMIT $SelectK""".stripMargin
  }
}
