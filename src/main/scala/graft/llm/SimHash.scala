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
}
