package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines, over the canonical
  * `documents` table (doc_id, text, ...).
  *
  * Scale design (the point of each operator):
  *  - [[exact]]: hash → groupBy. One shuffle on the 128-bit content hash,
  *    map-side partial aggregation; never compares documents pairwise.
  *  - [[nearDuplicates]]: MinHash + LSH banding. Each doc produces `bands`
  *    (band, bandKey) rows; the candidate join shuffles on the band key so
  *    only docs agreeing on a whole band ever meet — at 100 TB this is the
  *    standard O(n·bands) plan, vs the O(n²) all-pairs join that would be
  *    the naive translation. Candidates (a tiny set) are then verified with
  *    EXACT Jaccard, so false positives never escape; false negatives are
  *    bounded by 1-(1-t^r)^b (≈1e-18 at J=0.9 with b=32, r=3).
  * Everything is Column expressions (codegen), no UDFs.
  */
object Dedup {

  /** Distinct word n-gram shingles of a document (lowercased, non-word
    * separators), the unit of Jaccard similarity. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val w = filter(split(lower(text), "\\W+"), t => t =!= "")
    val cnt = size(w) - (n - 1)
    array_distinct(
      when(cnt >= 1,
        transform(sequence(lit(1), greatest(cnt, lit(1))), i =>
          concat_ws(" ", (0 until n).map(o => element_at(w, i + o)): _*)))
        .otherwise(array().cast("array<string>")))
  }

  /** Exact dedup: group by full-content hash, keep the smallest doc_id as
    * the survivor. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(min("doc_id").cast("long").as("doc_id"), count("*").cast("long").as("dups"))
      .select("doc_id", "text_hash", "dups")

  /** MinHash signature: element i = min over shingles of hash_i(shingle),
    * hash_i = xxhash64 seeded by the slot index. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(shingles, g => xxhash64(i, g))))

  /** Near-duplicate pairs (doc_a < doc_b) with word-3-shingle Jaccard ≥
    * `threshold`, found via LSH banding and verified exactly.
    * `jaccard_r` = Jaccard similarity scaled by 1e4 and rounded. */
  def nearDuplicates(docs: DataFrame, bands: Int = 32, rowsPerBand: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sh = docs
      .select(col("doc_id").cast("long").as("doc_id"), wordShingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)

    val banded = sh
      .withColumn("sig", minhashSignature(col("sh"), bands * rowsPerBand))
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          struct(b.as("band"),
            xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))

    val l = banded.alias("l")
    val r = banded.alias("r")
    val cand = l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .distinct()

    val withSh = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
    val inter = size(array_intersect(col("sha"), col("shb")))
    val jac = inter.cast("double") /
      (size(col("sha")) + size(col("shb")) - inter).cast("double")
    withSh.where(jac >= threshold)
      .select(col("doc_a"), col("doc_b"),
        floor(jac * 1e4 + 0.5).cast("long").as("jaccard_r"))
  }
}
