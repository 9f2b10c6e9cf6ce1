package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting: near-identical documents get fingerprints
  * within a small Hamming distance, so near-dup candidate search becomes a
  * (rotated-)prefix equality join on a single 60-bit integer — O(n log n) at
  * scale instead of pairwise comparison.
  *
  * 60-bit variant (not 64) so the fingerprint and every intermediate stays
  * exactly representable in a signed 64-bit integer on any engine — the
  * token hash is the first 15 hex digits of md5, portable to any SQL oracle.
  */
object SimHash {

  val Bits = 60

  /** Per-token 60-bit hashes of the distinct lowercased word tokens. */
  private val tokenHashes: Column = expr(
    """transform(
      |  array_distinct(filter(split(lower(text), '\\W+'), t -> t != '')),
      |  t -> cast(conv(substring(md5(cast(t as binary)), 1, 15), 16, 10) as bigint))""".stripMargin)

  /** The classic bit-majority fold: bit i of the fingerprint is set iff the
    * majority of token hashes have bit i set. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id").cast("long").as("doc_id"), tokenHashes.as("hs"))
      // exchange barrier: materialize token hashes so the 60-bit fold
      // references a plain attribute (see Dedup.nearDuplicates for why);
      // explicit count so AQE keeps the parallelism
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
      // native one-pass fold (graft.functions.SimHashFold) — bit-identical
      // to the nested-aggregate HOF form, locked by VectorExpressionsSpec
      .withColumn("simhash",
        graft.functions.VectorExpressions.simhash_fold(col("hs"), Bits))
      .select(col("doc_id").cast("long").as("doc_id"), col("simhash"))

  /** Hamming distance between two fingerprints (for candidate verification). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dedup verdicts: for each doc, its best earlier match
    * within Hamming distance `maxDist` of the 60-bit fingerprint —
    * `(doc_id, dup_of, hamming)`, best = min (distance, partner id).
    * The SimHash counterpart to the MinHash path, and EXACT by the
    * pigeonhole principle: the fingerprint splits into `maxDist + 1`
    * bands, and two prints within `maxDist` differing bits must agree
    * on at least one whole band — so the band-key candidate join has
    * ZERO false negatives (unlike MinHash banding's probabilistic
    * bound), and the Hamming verify removes the false positives.
    *
    * Scale shape: the classic Manku et al. (WWW'07) near-duplicate
    * layout — O(n·bands) band rows, candidates only where a 20-bit band
    * agrees, verification a codegen'd xor/popcount, verdicts one
    * map-combined min-struct aggregate. */
  def hammingDedup(docs: DataFrame, maxDist: Int = 2): DataFrame = {
    val bands = maxDist + 1
    val bits = Bits / bands
    val mask = (1L << bits) - 1
    val fp = fingerprints(docs)
    val banded = fp.select(col("doc_id"), col("simhash"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), i -> " +
          s"shiftright(simhash, i * $bits) & $mask)")))
      .select(col("doc_id"), col("simhash"), col("pos").as("band"),
        col("col").as("bkey"))
      .cache() // both sides of the candidate self-join
    OpCaches.track("simhash.dedup", Seq(banded))
    val l = banded.alias("l")
    val r = banded.alias("r")
    val d = hamming(col("sa"), col("sb"))
    l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("dup_of"), col("l.simhash").as("sa"),
        col("r.doc_id").as("doc_id"), col("r.simhash").as("sb"))
      // no distinct: a pair agreeing on k bands yields k identical rows,
      // and the min-struct verdict is duplicate-insensitive — dedup here
      // would cost a full-width exchange before the filter prunes
      .where(d <= maxDist)
      .groupBy(col("doc_id"))
      .agg(min(struct(d.as("d"), col("dup_of"))).as("b"))
      .select(col("doc_id"), col("b.dup_of").as("dup_of"),
        col("b.d").cast("long").as("hamming"))
  }
}
