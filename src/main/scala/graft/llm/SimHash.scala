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
    * map-combined min-struct aggregate — with one crucial twist: the
    * band self-join runs over DISTINCT fingerprints, not docs. Identical
    * fingerprints (exact and near-exact dups — the common case in a web
    * corpus, and guaranteed by a low-entropy corpus like the 31-word
    * synthetic vocab) otherwise blow the join up quadratically per
    * group: at the 50k-doc sf1 decade the doc-level join is 67.4M
    * candidate rows vs 5.25M over the 33,956 distinct prints (12.8×,
    * max identical-print group 2,336 docs — ScaleDecadeSpec pins the
    * density). The collapse is EXACT, not approximate: dups inside a
    * print group are found at d = 0 via the group's min doc id (for any
    * doc x, the best same-print partner is min_id when min_id < x, and
    * the best partner from a neighbouring print g is likewise g's
    * min_id), so verdicts are bit-identical to the doc-level join's. */
  def hammingDedup(docs: DataFrame, maxDist: Int = 2): DataFrame =
    hammingDedupFrom(fingerprints(docs).select(col("doc_id"), col("simhash")),
      maxDist, "simhash.dedup")

  /** [[hammingDedup]]'s core over ANY `(doc_id, simhash)` table of
    * [[Bits]]-bit prints — the text SimHash and the image aHash
    * ([[Multimodal.imagePhash]]) share this ONE banding/verify/verdict
    * implementation, so the pigeonhole-exactness argument is proved
    * once. `cacheKey` names the distinct-print cache in OpCaches. */
  def hammingDedupFrom(fp: DataFrame, maxDist: Int = 2,
      cacheKey: String = "simhash.dedup"): DataFrame = {
    val bands = maxDist + 1
    val bits = Bits / bands
    val mask = (1L << bits) - 1
    // one row per DISTINCT fingerprint, carrying the group's min doc id
    val fpg = fp.groupBy(col("simhash"))
      .agg(min(col("doc_id")).as("min_id"))
      .cache() // both sides of the band self-join + the d=0 self rows
    OpCaches.track(cacheKey, Seq(fpg))
    val banded = fpg.select(col("simhash"), col("min_id"), posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), i -> " +
          s"shiftright(simhash, i * $bits) & $mask)")))
      .select(col("simhash"), col("min_id"), col("pos").as("band"),
        col("col").as("bkey"))
    val l = banded.alias("l")
    val r = banded.alias("r")
    val d = hamming(col("l.simhash"), col("r.simhash"))
    // undirected distinct-print pairs within the radius; no distinct():
    // a pair agreeing on k bands yields k identical rows, and the
    // min-struct verdict is duplicate-insensitive — dedup here would
    // cost an exchange before the Hamming filter prunes
    val half = l.join(r,
        col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
          col("l.simhash") < col("r.simhash"))
      .where(d <= maxDist)
      .select(col("l.simhash").as("fa"), col("l.min_id").as("ma"),
        col("r.simhash").as("fb"), col("r.min_id").as("mb"),
        d.cast("int").as("d"))
    // per-print candidate partners: both directions of each near pair,
    // plus the print's own min id at d = 0 (the identical-dup case)
    val nbr = half.select(col("fa").as("simhash"), col("d"), col("mb").as("pid"))
      .union(half.select(col("fb").as("simhash"), col("d"), col("ma").as("pid")))
      .union(fpg.select(col("simhash"), lit(0).as("d"), col("min_id").as("pid")))
    fp.join(nbr, "simhash")
      .where(col("pid") < col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(min(struct(col("d"), col("pid"))).as("b"))
      .select(col("doc_id"), col("b.pid").as("dup_of"),
        col("b.d").cast("long").as("hamming"))
  }
}
