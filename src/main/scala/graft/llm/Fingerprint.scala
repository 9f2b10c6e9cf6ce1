package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document fingerprinting by winnowing (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03): k-byte-gram Rabin-Karp rolling hashes, then the minimum of
  * each w-hash window, deduplicated — any shared substring of length
  * >= w+k-1 between two documents is guaranteed to share a fingerprint.
  * Output is one (doc_id, fp) row per selected hash, the join-friendly
  * shape for copy detection at corpus scale (shuffle on fp only).
  *
  * The kernel is a primitive-long rolling loop in `mapPartitions` — O(1)
  * per byte, no interpreted higher-order Columns — and arithmetic is mod a
  * 31-bit prime so every intermediate fits a long and the DuckDB oracle
  * reproduces it bit-for-bit from hex byte pairs.
  */
object Fingerprint {

  val K = 8             // gram width (bytes)
  val W = 16            // winnowing window (hashes)
  val B = 256L          // byte base
  val M = 1000000007L   // modulus

  /** B^(K-1-j) mod M for j = 0..K-1 (shared with the oracle SQL). */
  val Pows: Seq[Long] = (0 until K).map(j => {
    var p = 1L
    (0 until (K - 1 - j)).foreach(_ => p = p * B % M)
    p
  })

  def winnow(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val topPow = Pows.head
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val n = bytes.length
          if (n < K + W - 1) Iterator.empty
          else {
            val hs = new Array[Long](n - K + 1)
            var h = 0L
            var i = 0
            while (i < K) { h = (h * B + (bytes(i) & 0xff)) % M; i += 1 }
            hs(0) = h
            i = 1
            while (i <= n - K) {
              h = Math.floorMod(
                (h - (bytes(i - 1) & 0xff) * topPow) * B + (bytes(i + K - 1) & 0xff), M)
              hs(i) = h
              i += 1
            }
            val sel = scala.collection.mutable.SortedSet.empty[Long]
            var w = 0
            while (w <= hs.length - W) {
              var min = Long.MaxValue
              var j = 0
              while (j < W) { if (hs(w + j) < min) min = hs(w + j); j += 1 }
              sel += min
              w += 1
            }
            sel.iterator.map(fp => (id, fp))
          }
        }
      }.toDF("doc_id", "fp")
  }

  /** DuckDB twin: same grams, same per-term mod arithmetic over hex byte
    * pairs, same window-min selection. */
  val oracleSql: String = {
    val powList = Pows.mkString("[", ", ", "]")
    s"""WITH b AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |         octet_length(encode(text))::BIGINT AS n
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, list_transform(range(0, greatest(n - ${K - 1}, 0)),
       |    i -> list_sum(list_transform(range(0, $K),
       |      j -> (('0x' || substr(hx, (i + j) * 2 + 1, 2))::BIGINT
       |            * ($powList)[j + 1]) % $M)) % $M) AS hs
       |  FROM b),
       |w AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(0, greatest(len(hs) - ${W - 1}, 0)),
       |    i -> list_aggregate(hs[i + 1 : i + $W], 'min'))) AS fps
       |  FROM h)
       |SELECT doc_id::BIGINT AS doc_id, unnest(fps)::BIGINT AS fp FROM w""".stripMargin
  }
}
