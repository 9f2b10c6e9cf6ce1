package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition in bounded batches.
  *
  * The Spark-side shape is the real deliverable — schema, partitioning,
  * batched iteration (the exact structure a Python `mapInPandas` decode
  * would use) — while the byte-level decode itself is a DECODE STUB: this
  * container has no image/audio codecs, so [[decodeStub]] derives
  * deterministic fake media properties from the raw bytes. Swapping in a
  * real JPEG/WAV decoder changes ONLY that function.
  */
object Multimodal {

  /** Decoded media record (all numerics long for engine portability). */
  final case class MediaInfo(
      doc_id: Long, byte_len: Long, width: Long, height: Long,
      frames: Long, checksum: Long)

  /** DECODE STUB — deterministic fake "decoder": real code would parse the
    * container header (JPEG SOF / WAV fmt / MP4 moov) here. Reads every
    * byte, as a real decoder would, producing a checksum the oracle can
    * recompute. */
  def decodeStub(bytes: Array[Byte]): MediaInfo = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val len = bytes.length.toLong
    MediaInfo(-1L, len, len % 640 + 1, len % 480 + 1, len % 24 + 1, sum % 997)
  }

  /** Batch size of the per-partition decode loop (the `mapInPandas` batch
    * shape: bounded memory per batch regardless of partition size). */
  val DecodeBatchSize = 64

  /** Attach a binary media column (here: the UTF-8 bytes of the text —
    * stand-in for real image/audio payloads) plus typed metadata. */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("doc_id"),
      col("text").cast("binary").as("media"),
      map(lit("modality"), lit("text"), lit("lang"), col("lang"),
        lit("source"), col("source")).as("meta"))

  /** Decode every media blob: per-partition, in [[DecodeBatchSize]] batches,
    * through [[decodeStub]]. Output (doc_id, byte_len, width, height,
    * frames, checksum). */
  def decodeAll(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = withMediaColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.map { case (id, bytes) => decodeStub(bytes).copy(doc_id = id) }
      }
    }.toDF()
  }

  /** DuckDB twin of [[decodeAll]]. Works byte-accurately for any UTF-8
    * payload: lengths come from octet_length over the encoded blob (NOT
    * character length) and the checksum parses hex byte pairs, matching
    * the Spark side's `text.cast(binary)` bytes exactly. */
  val oracleSql: String =
    """WITH b AS (
      |  SELECT doc_id, octet_length(encode(text))::BIGINT AS byte_len,
      |         hex(encode(text)) AS hx
      |  FROM documents)
      |SELECT doc_id::BIGINT AS doc_id, byte_len,
      |  (byte_len % 640 + 1)::BIGINT AS width,
      |  (byte_len % 480 + 1)::BIGINT AS height,
      |  (byte_len % 24 + 1)::BIGINT AS frames,
      |  coalesce(list_sum(list_transform(range(0, byte_len),
      |     i -> ('0x' || substr(hx, i * 2 + 1, 2))::BIGINT)), 0)::BIGINT % 997 AS checksum
      |FROM b""".stripMargin
}
