package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted per partition in bounded batches.
  *
  * The decode step parses REAL container headers — PNG IHDR, BMP
  * BITMAPINFOHEADER, WAV fmt/data chunks — as pure byte reads (no codec
  * libraries exist in this container; full pixel/sample decode of the
  * payload would slot into [[decode]] the same way). Blobs whose header no
  * parser recognizes fall back to [[decodeStub]], the clearly-labeled
  * deterministic fake.
  *
  * Fixture blobs ([[fixtureBlob]]) wrap each document's text bytes in a
  * genuine header of a doc_id-derived modality, so the oracle can recompute
  * every parsed field arithmetically while the Spark side actually reads it
  * from the container bytes.
  */
object Multimodal {

  /** Decoded media record (all numerics long for engine portability). For
    * audio, width = sample rate, height = channels, frames = sample frames
    * (data bytes / block align). */
  final case class MediaInfo(
      doc_id: Long, modality: String, byte_len: Long, width: Long,
      height: Long, frames: Long, checksum: Long)

  /** DECODE STUB — deterministic fallback for unrecognized containers: real
    * code would hand the blob to a codec here. Reads every byte, as a real
    * decoder would, producing a checksum the oracle can recompute. */
  def decodeStub(bytes: Array[Byte]): MediaInfo = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    val len = bytes.length.toLong
    MediaInfo(-1L, "unknown", len, len % 640 + 1, len % 480 + 1, len % 24 + 1, sum % 997)
  }

  // --- byte readers -------------------------------------------------------

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def le16(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8)

  private def ascii(b: Array[Byte], o: Int, s: String): Boolean =
    o + s.length <= b.length && s.indices.forall(i => b(o + i) == s.charAt(i).toByte)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Byte-sum checksum of `bytes[from, until)` mod 997 (what a real decoder
    * would replace with a content hash of the decoded samples). */
  private def payloadChecksum(bytes: Array[Byte], from: Int, until: Int): Long = {
    var sum = 0L
    var i = math.max(0, from)
    val end = math.min(bytes.length, until)
    while (i < end) { sum += bytes(i) & 0xff; i += 1 }
    sum % 997
  }

  /** Parse a real container header (pure byte reads):
    *  - PNG: 8-byte signature, IHDR width/height as big-endian u32 at
    *    offsets 16/20; payload after the 33-byte sig+IHDR chunk.
    *  - BMP: `BM`, pixel-data offset LE at 10, width/height LE at 18/22
    *    (height may be negative = top-down; reported as magnitude).
    *  - WAV: RIFF/WAVE, `fmt ` chunk (channels LE16 at 22, sample rate
    *    LE32 at 24, block align LE16 at 32), then a generic chunk walk to
    *    the `data` chunk; frames = data bytes / block align.
    *  - JPEG: SOI, then a marker-segment walk to the first SOF0/1/2 frame
    *    header (height/width big-endian u16); payload after that segment.
    * Returns the stub when no header matches.
    */
  def decode(bytes: Array[Byte]): MediaInfo = {
    val n = bytes.length
    if (n >= 33 && PngSig.indices.forall(i => bytes(i) == PngSig(i)) &&
        ascii(bytes, 12, "IHDR")) {
      MediaInfo(-1L, "png", n, be32(bytes, 16), be32(bytes, 20), 1L,
        payloadChecksum(bytes, 33, n))
    } else if (n >= 54 && ascii(bytes, 0, "BM")) {
      val dataOffset = le32(bytes, 10).toInt
      val h = le32(bytes, 22).toInt // may be negative (top-down rows)
      MediaInfo(-1L, "bmp", n, le32(bytes, 18), math.abs(h).toLong, 1L,
        payloadChecksum(bytes, dataOffset, n))
    } else if (n >= 4 && (bytes(0) & 0xff) == 0xFF && (bytes(1) & 0xff) == 0xD8) {
      // JPEG: walk marker segments from SOI to the first SOF0/1/2 frame
      // header — height/width are big-endian u16 at +5/+7 in the segment
      var off = 2
      var res: MediaInfo = null
      while (res == null && off + 4 <= n && (bytes(off) & 0xff) == 0xFF) {
        val typ = bytes(off + 1) & 0xff
        if (typ == 0xFF) {
          off += 1 // legal fill byte (0xFF padding before a marker)
        } else if (typ == 0x01 || (typ >= 0xD0 && typ <= 0xD9)) {
          off += 2 // length-less markers: TEM, RSTn, repeated SOI, EOI
        } else if (typ == 0xDA) {
          off = n // start of scan: no SOF seen, entropy data follows
        } else {
          val segLen = ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
          if (typ >= 0xC0 && typ <= 0xC2 && off + 9 <= n) {
            val h = ((bytes(off + 5) & 0xff) << 8) | (bytes(off + 6) & 0xff)
            val w = ((bytes(off + 7) & 0xff) << 8) | (bytes(off + 8) & 0xff)
            res = MediaInfo(-1L, "jpeg", n, w.toLong, h.toLong, 1L,
              payloadChecksum(bytes, off + 2 + segLen, n))
          } else if (segLen < 2) off = n // corrupt length: fall through
          else off += 2 + segLen
        }
      }
      if (res == null) decodeStub(bytes) else res
    } else if (n >= 44 && ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE") &&
        ascii(bytes, 12, "fmt ")) {
      val channels = le16(bytes, 22)
      val rate = le32(bytes, 24)
      val blockAlign = math.max(1L, le16(bytes, 32))
      wavData(bytes) match {
        case None => decodeStub(bytes)
        case Some((dataAt, len)) =>
          MediaInfo(-1L, "wav", n, rate, channels, len / blockAlign,
            payloadChecksum(bytes, dataAt, dataAt + len))
      }
    } else decodeStub(bytes)
  }

  /** Chunk-walk a RIFF/WAVE blob to its `data` chunk: Some((offset,
    * clamped byte length)). A corrupt size field (negative/overflowing
    * advance) returns None — never loops or indexes out of bounds. */
  private[graft] def wavData(bytes: Array[Byte]): Option[(Int, Int)] = {
    val n = bytes.length
    if (n < 44 || !ascii(bytes, 0, "RIFF") || !ascii(bytes, 8, "WAVE") ||
        !ascii(bytes, 12, "fmt ")) return None
    var off = 20 + le32(bytes, 16).toInt
    while (off >= 0 && off + 8 <= n) {
      val sz = le32(bytes, off + 4)
      if (ascii(bytes, off, "data"))
        return Some((off + 8, math.min(sz, (n - off - 8).toLong).toInt))
      else if (sz > n) off = -1 // corrupt size field
      else off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    None
  }

  // --- fixtures -----------------------------------------------------------

  /** Modality assigned to a doc for fixture construction. */
  def modalityOf(docId: Long): String = (docId % 4) match {
    case 0 => "png"; case 1 => "bmp"; case 2 => "wav"; case _ => "jpeg"
  }

  /** A blob with a genuine container header wrapping `payload`:
    *  - png (doc_id%4==0): width doc_id%640+1, height doc_id%480+1;
    *  - bmp (doc_id%4==1): same dimension derivation, LE fields;
    *  - wav (doc_id%4==2): sample rate 8000*((doc_id/4)%3+1), channels
    *    (doc_id/4)%2+1, 16-bit samples;
    *  - jpeg (doc_id%4==3): SOI + JFIF APP0 + SOF0 with the png/bmp
    *    dimension derivation (39 header bytes).
    * All derivations are plain integer arithmetic so the DuckDB oracle can
    * recompute what the Spark side parses out of the actual bytes. */
  def fixtureBlob(docId: Long, payload: Array[Byte]): Array[Byte] = (docId % 4) match {
    case 0 =>
      val w = docId % 640 + 1
      val h = docId % 480 + 1
      val out = java.nio.ByteBuffer.allocate(33 + payload.length)
      out.put(PngSig).putInt(13).put("IHDR".getBytes(StandardCharsets.US_ASCII))
        .putInt(w.toInt).putInt(h.toInt)
        .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .putInt(0) // CRC not validated by the header parse
        .put(payload)
      out.array()
    case 1 =>
      val w = docId % 640 + 1
      val h = docId % 480 + 1
      val out = java.nio.ByteBuffer.allocate(54 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + payload.length)
        .putInt(0).putInt(54)               // reserved, pixel-data offset
        .putInt(40).putInt(w.toInt).putInt(h.toInt)
        .putShort(1).putShort(24)           // planes, bpp
        .putInt(0).putInt(payload.length)   // compression, image size
        .putInt(0).putInt(0).putInt(0).putInt(0) // ppm + palette fields
        .put(payload)
      out.array()
    case 2 =>
      val rate = 8000 * ((docId / 4) % 3 + 1)
      val channels = (docId / 4) % 2 + 1
      val blockAlign = channels * 2
      val out = java.nio.ByteBuffer.allocate(44 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + payload.length)
        .put("WAVE".getBytes(StandardCharsets.US_ASCII))
        .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
        .putShort(1)                         // PCM
        .putShort(channels.toShort).putInt(rate.toInt)
        .putInt((rate * blockAlign).toInt)   // byte rate
        .putShort(blockAlign.toShort).putShort(16)
        .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(payload.length)
        .put(payload)
      out.array()
    case _ =>
      val w = docId % 640 + 1
      val h = docId % 480 + 1
      val out = java.nio.ByteBuffer.allocate(39 + payload.length)
      out.put(0xFF.toByte).put(0xD8.toByte) // SOI
        // APP0/JFIF segment (marker + len 16 + 14 payload bytes)
        .put(0xFF.toByte).put(0xE0.toByte).putShort(16)
        .put("JFIF".getBytes(StandardCharsets.US_ASCII)).put(0.toByte)
        .put(1.toByte).put(1.toByte).put(0.toByte)
        .putShort(1).putShort(1).put(0.toByte).put(0.toByte)
        // SOF0 (marker + len 17: precision, H, W, 3 components)
        .put(0xFF.toByte).put(0xC0.toByte).putShort(17).put(8.toByte)
        .putShort(h.toShort).putShort(w.toShort).put(3.toByte)
        .put(1.toByte).put(0x11.toByte).put(0.toByte)
        .put(2.toByte).put(0x11.toByte).put(1.toByte)
        .put(3.toByte).put(0x11.toByte).put(1.toByte)
        .put(payload)
      out.array()
  }

  /** Batch size of the per-partition decode loop (the `mapInPandas` batch
    * shape: bounded memory per batch regardless of partition size). */
  val DecodeBatchSize = 64

  /** Attach a binary media column — each document's text bytes wrapped in a
    * real container header of its doc_id-derived modality — plus typed
    * metadata. */
  def withMediaColumn(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"), col("lang"), col("source"))
      .as[(Long, String, String, String)]
      .map { case (id, text, lang, source) =>
        (id, fixtureBlob(id, text.getBytes(StandardCharsets.UTF_8)),
          Map("modality" -> modalityOf(id), "lang" -> lang, "source" -> source))
      }.toDF("doc_id", "media", "meta")
  }

  /** Decode every media blob: per-partition, in [[DecodeBatchSize]] batches,
    * through the real header parsers (stub fallback). Output (doc_id,
    * modality, byte_len, width, height, frames, checksum). */
  def decodeAll(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = withMediaColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        batch.iterator.map { case (id, bytes) => decode(bytes).copy(doc_id = id) }
      }
    }.toDF()
  }

  /** Samples per analysis frame of [[pcmFrames]]. */
  val PcmWindow = 64

  /** Audio feature extraction over REAL decoded samples: every wav blob's
    * 16-bit little-endian PCM payload is decoded sample-by-sample and
    * reduced to per-frame integer features — frame absolute-energy sum and
    * peak — in [[PcmWindow]]-sample windows (the frame-sample step of an
    * audio pipeline; a spectral front-end would replace the reducer the
    * same way). Integer features keep the result engine-portable. Channels
    * are interleaved into the frame stream (energy is channel-agnostic).
    *
    * Same scale shape as [[decodeAll]]: a pure `mapPartitions` over the
    * binary column, no shuffle, output rows ~ total-samples / window. */
  def pcmFrames(docs: DataFrame, window: Int = PcmWindow): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withMediaColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          wavData(bytes) match {
            case None => Iterator.empty
            case Some((at, len)) =>
              val ns = len / 2
              Iterator.range(0, ns, window).map { w0 =>
                val end = math.min(w0 + window, ns)
                var i = w0
                var sumAbs = 0L
                var peak = 0L
                while (i < end) {
                  val s = (bytes(at + 2 * i + 1) << 8) | (bytes(at + 2 * i) & 0xff)
                  val a = math.abs(s)
                  sumAbs += a
                  if (a > peak) peak = a
                  i += 1
                }
                (id, (w0 / window).toLong, (end - w0).toLong, sumAbs, peak)
              }
          }
        }
      }.toDF("doc_id", "frame_idx", "n_samples", "abs_sum", "peak")
  }

  /** Thumbnail grid width/height (T×T RGB samples per image). */
  val ThumbSize = 4

  /** [[ThumbSize]]²·3 — samples per thumbnail. */
  private val ThumbSamples = ThumbSize * ThumbSize * 3

  /** T×T nearest-neighbour RGB thumbnail over the REAL BMP pixel
    * geometry — the image-resize step of a multimodal pipeline, run
    * against the opaque binary column. The sample grid is
    * sx = tx·w div T, sy = ty·h div T, and the source byte offset
    * honours the actual container format: 24 bpp, rows stored
    * BOTTOM-UP, 4-byte-aligned row stride — o = (h−1−sy)·stride +
    * 3·sx + c, relative to the header's pixel-data offset. A byte past
    * the blob's payload reads as 0 (the fixture payloads are
    * text-length, not stride·h; the zero-fill rule makes short payloads
    * deterministic and oracle-replayable). Output per image: the parsed
    * dims plus two integer reductions over the T²·3 sampled bytes — a
    * position-weighted checksum (order-sensitive, so a transposed,
    * stride-broken, or top-down sampler cannot match it) and the plain
    * sample sum.
    *
    * Scale shape: same as [[decodeAll]] — a pure mapPartitions
    * projection, no shuffle; the NN sampler touches T²·3 bytes per
    * image REGARDLESS of image size, which is the point of
    * thumbnailing at 100 TB (a full-decode resize reads w·h·3). */
  /** Decimation factor for [[pcmDownsample]]. */
  val PcmDecimate = 4

  /** Audio downsampling: mean-pool the int16 PCM stream in groups of
    * [[PcmDecimate]] samples (truncating integer mean — Java `/` and
    * the oracle's BIGINT `//` both round toward zero) and emit one
    * summary row per audio doc: `(doc_id, n_in, n_out, abs_sum, peak,
    * checksum)` with the checksum position-weighted (Σ (j+1)·o_j) so a
    * reordered or off-by-one pooling cannot hash-match. The ragged tail
    * (n_in mod factor samples) is dropped — n_out = n_in div factor by
    * contract. Same scale shape as [[pcmFrames]]: a pure mapPartitions
    * projection over the opaque binary column, no shuffle, output one
    * row per doc. */
  def pcmDownsample(docs: DataFrame, factor: Int = PcmDecimate): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withMediaColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          wavData(bytes) match {
            case None => Iterator.empty
            case Some((at, len)) =>
              val ns = len / 2
              val nOut = ns / factor
              var j = 0
              var absSum = 0L
              var peak = 0L
              var ck = 0L
              while (j < nOut) {
                var k = 0
                var s = 0L
                while (k < factor) {
                  val i = j * factor + k
                  s += (bytes(at + 2 * i + 1) << 8) | (bytes(at + 2 * i) & 0xff)
                  k += 1
                }
                val o = s / factor
                val a = math.abs(o)
                absSum += a
                if (a > peak) peak = a
                ck += (j + 1) * o
                j += 1
              }
              Iterator.single((id, ns.toLong, nOut.toLong, absSum, peak, ck))
          }
        }
      }.toDF("doc_id", "n_in", "n_out", "abs_sum", "peak", "checksum")
  }

  /** DuckDB twin of [[pcmDownsample]] — the [[pcmOracleSql]] int16
    * decode, pooled with the same truncating-mean and position-weighted
    * checksum. */
  val pcmDownsampleOracle: String =
    s"""WITH b AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |         octet_length(encode(text))::BIGINT AS plen,
       |         hex(encode(text)) AS hx
       |  FROM documents WHERE doc_id % 4 = 2),
       |s AS (
       |  SELECT doc_id, plen // 2 AS ns,
       |    list_transform(range(0, plen // 2), i ->
       |      ('0x' || substr(hx, (2 * i + 1) * 2 + 1, 2))::BIGINT * 256
       |      + ('0x' || substr(hx, (2 * i) * 2 + 1, 2))::BIGINT
       |      - CASE WHEN ('0x' || substr(hx, (2 * i + 1) * 2 + 1, 2))::BIGINT
       |             >= 128 THEN 65536 ELSE 0 END) AS smp
       |  FROM b),
       |g AS (
       |  SELECT doc_id, ns, ns // $PcmDecimate AS n_out,
       |    list_transform(range(0, ns // $PcmDecimate), j ->
       |      (${(1 to PcmDecimate).map(k => s"smp[$PcmDecimate * j + $k]")
              .mkString(" + ")})
       |        // $PcmDecimate) AS o
       |  FROM s)
       |SELECT doc_id, ns::BIGINT AS n_in, n_out::BIGINT AS n_out,
       |  coalesce(list_sum(list_transform(o, x -> abs(x))), 0)::BIGINT
       |    AS abs_sum,
       |  coalesce(list_max(list_transform(o, x -> abs(x))), 0)::BIGINT AS peak,
       |  coalesce(list_sum(list_transform(range(0, n_out),
       |    j -> (j + 1) * o[j + 1])), 0)::BIGINT AS checksum
       |FROM g""".stripMargin

  def thumbnails(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = ThumbSize
    withMediaColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          // dispatch on the CONTAINER BYTES like decode()/pcmFrames — not
          // the fixture's doc_id convention: any real BMP thumbnails, any
          // foreign/truncated blob is skipped (no stub geometry to fake)
          if (bytes.length < 54 || !ascii(bytes, 0, "BM")) Iterator.empty
          else {
            val w = le32(bytes, 18)
            val h = le32(bytes, 22)
            val off = le32(bytes, 10).toInt
            val stride = ((w * 3 + 3) / 4) * 4
            val plen = (bytes.length - off).toLong
            var checksum = 0L
            var sampleSum = 0L
            var idx = 0
            var ty = 0
            while (ty < t) {
              val sy = ty * h / t
              var tx = 0
              while (tx < t) {
                val sx = tx * w / t
                val o = (h - 1 - sy) * stride + 3 * sx
                var c = 0
                while (c < 3) {
                  val p = o + c
                  val v = if (p < plen) bytes(off + p.toInt) & 0xff else 0
                  checksum += (idx + 1).toLong * v
                  sampleSum += v
                  idx += 1
                  c += 1
                }
                tx += 1
              }
              ty += 1
            }
            Iterator.single((id, w, h, checksum, sampleSum))
          }
        }
      }.toDF("doc_id", "width", "height", "thumb_checksum", "sample_sum")
  }

  /** DuckDB twin of [[thumbnails]]: the same NN grid, bottom-up row
    * order, stride alignment, and zero-fill rule, re-reading payload
    * bytes from hex pairs of the text's UTF-8 octets; flat sample index
    * k = ty·3T + tx·3 + c decodes as ty = k div 3T, tx = (k div 3)
    * mod T, c = k mod 3. */
  val thumbnailsOracle: String = {
    val t = ThumbSize
    val n = ThumbSamples
    // the (h-1-sy)*stride + 3*sx + c byte offset for flat index k
    val o = s"((h - 1 - ((k // ${3 * t}) * h // $t)) * stride" +
      s" + 3 * (((k // 3) % $t) * w // $t) + (k % 3))"
    s"""WITH b AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |         octet_length(encode(text))::BIGINT AS plen,
       |         hex(encode(text)) AS hx,
       |         doc_id % 640 + 1 AS w, doc_id % 480 + 1 AS h
       |  FROM documents WHERE doc_id % 4 = 1),
       |g AS (SELECT *, ((w * 3 + 3) // 4) * 4 AS stride FROM b),
       |s AS (
       |  SELECT doc_id, w, h,
       |    list_transform(range(0, $n), k ->
       |      CASE WHEN $o < plen
       |           THEN ('0x' || substr(hx, $o * 2 + 1, 2))::BIGINT
       |           ELSE 0 END) AS v
       |  FROM g)
       |SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
       |  list_sum(list_transform(range(0, $n),
       |    k -> (k + 1) * v[k + 1]))::BIGINT AS thumb_checksum,
       |  list_sum(v)::BIGINT AS sample_sum
       |FROM s""".stripMargin
  }

  /** Area-pooled thumbnail reduction over real BMP pixel geometry — the
    * average-pool counterpart to the [[thumbnails]] NN sampler. Every
    * PAYLOAD byte is bucketed into its [[ThumbSize]]×[[ThumbSize]]
    * pooling cell with the standard index map `cell = (coord·t) div dim`
    * (pixels past the payload are zero and contribute nothing, so both
    * engines touch exactly payload-length bytes — never w·h·3); stride
    * padding bytes and rows beyond the bitmap are excluded. Output per
    * image: `(doc_id, width, height, pool_checksum, pool_sum)` with the
    * checksum weighted by (cell·3 + channel + 1) so a transposed,
    * top-down, or stride-broken bucketing cannot hash-match. The pooled
    * SUM is the statistic (mean = sum / cell pixel area is a display
    * detail that would only add block-size bookkeeping). Pure
    * mapPartitions, no shuffle. */
  def thumbnailPool(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withMediaColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          poolBlob(bytes).map { case (w, h, checksum, total) =>
            (id, w, h, checksum, total)
          }.iterator
        }
      }.toDF("doc_id", "width", "height", "pool_checksum", "pool_sum")
  }

  /** [[thumbnailPool]]'s per-blob core, factored so specs can feed
    * crafted FOREIGN headers (huge h, bogus strides) straight at the
    * geometry guards. Returns None for non-BMP/degenerate blobs. */
  private[graft] def poolBlob(
      bytes: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    val t = ThumbSize
    // degenerate header geometry (w or h <= 0, offset outside the
    // blob, stride past Int range) is a foreign blob — skipped,
    // like the NN sampler, never a divide-by-zero in the executor
    lazy val w = le32(bytes, 18)
    lazy val h = le32(bytes, 22)
    lazy val off = le32(bytes, 10)
    lazy val strideL = ((w * 3L + 3L) / 4L) * 4L
    // off < 54 would alias file/info header bytes as pixel payload (54
    // is the minimum pixel offset for the headerless-palette 24bpp blobs
    // this accepts) — reject rather than pool garbage
    if (bytes.length < 54 || !ascii(bytes, 0, "BM") ||
        w <= 0 || h <= 0 || off < 54 || off > bytes.length ||
        strideL <= 0 || strideL > Int.MaxValue) None
    else {
      val stride = strideL.toInt
      val plen = bytes.length - off.toInt
      var checksum = 0L
      var total = 0L
      var p = 0
      while (p < plen) {
        val row = p / stride
        val rem = p - row * stride
        if (row < h && rem < 3 * w) {
          val sy = h - 1 - row
          val sx = rem / 3
          val c = rem % 3
          // cell map in Long end-to-end (the strideL discipline): a
          // foreign blob with a valid 'BM' header and h near
          // Int.MaxValue passes the geometry guards (which only bound
          // w via strideL), and sx·t likewise wraps Int for w past
          // ~2^31/t — either would poison the checksum with negative
          // cells; sy·t and sx·t always fit int64. cell ≤ t²−1.
          val cell = (sy * t / h) * t + sx.toLong * t / w
          val v = (bytes(off.toInt + p) & 0xff).toLong
          checksum += (cell * 3L + c + 1L) * v
          total += v
        }
        p += 1
      }
      Some((w, h, checksum, total))
    }
  }

  /** aHash grid: 10×6 = 60 cells, so the print is EXACTLY
    * [[SimHash.Bits]] wide and the text pipeline's pigeonhole banding
    * machinery applies unchanged (a 64-cell grid would need bit 63 —
    * an overflow DuckDB's `<<` rejects and int64 sign-wraps). */
  val PhashGridX = 10
  val PhashGridY = 6

  /** Perceptual average-hash (aHash) of a BMP blob over the real
    * bottom-up/stride geometry: every payload byte is bucketed into its
    * [[PhashGridY]]×[[PhashGridX]] cell (the [[poolBlob]] cell map on a
    * non-square grid), and cell bit `c` is set when the cell's mean
    * byte value exceeds the image mean — compared EXACTLY by
    * cross-multiplication (`cellSum·totalCnt > totalSum·cellCnt`, all
    * int64), so both engines agree at the boundary with no division
    * anywhere. Returns (w, h, phash); None for non-BMP/degenerate blobs
    * (the [[poolBlob]] guards). The cross-multiply stays inside int64
    * for payloads under ~1.8e8 bytes (255·plen² < 2^63); larger blobs
    * fail loudly rather than wrap. */
  private[graft] def phashBlob(bytes: Array[Byte]): Option[(Long, Long, Long)] = {
    // SIGNED int32 reads: biWidth/biHeight/bfOffBits are signed in the
    // format, and real-world top-down BMPs store a NEGATIVE biHeight —
    // an unsigned read would make the h<=0 reject dead code and collapse
    // every top-down image into one grid row (a false-positive dedup
    // factory). Negative-height (top-down) blobs are rejected as
    // degenerate rather than mis-fingerprinted.
    lazy val w = le32(bytes, 18).toInt
    lazy val h = le32(bytes, 22).toInt
    lazy val off = le32(bytes, 10).toInt
    lazy val strideL = ((w * 3L + 3L) / 4L) * 4L
    // off < 54 would alias file/info header bytes as pixel payload (the
    // 54-byte BITMAPFILEHEADER+BITMAPINFOHEADER is the minimum pixel
    // offset for 24bpp blobs) — reject rather than hash garbage
    if (bytes.length < 54 || !ascii(bytes, 0, "BM") ||
        w <= 0 || h <= 0 || off < 54 || off > bytes.length ||
        strideL <= 0 || strideL > Int.MaxValue) None
    else {
      val stride = strideL.toInt
      val plen = bytes.length - off
      Some((w.toLong, h.toLong,
        aHashRegion(bytes, off, plen, w.toLong, h.toLong, stride)))
    }
  }

  /** The ONE aHash kernel: the 60-bit print of a stride-padded bottom-up
    * 24bpp pixel region `[off, off+plen)` with geometry (w, h, stride) —
    * shared by the BMP [[phashBlob]] and the per-frame video prints
    * ([[videoPhash]]), so the cell map and the cross-multiplied bit test
    * exist once. */
  private def aHashRegion(bytes: Array[Byte], off: Int, plen: Int,
      w: Long, h: Long, stride: Int): Long = {
    // the int64 cross-multiply envelope (255·plen² < 2^63) lives in the
    // kernel so EVERY caller (BMP blobs, video frames) fails loudly on
    // an oversized region instead of sign-wrapping a plausible print
    require(plen < 100000000,
      s"region $plen bytes exceeds the int64 cross-multiply envelope")
    val tx = PhashGridX
    val ty = PhashGridY
    val cellSum = new Array[Long](tx * ty)
    val cellCnt = new Array[Long](tx * ty)
    var totalSum = 0L
    var totalCnt = 0L
    var p = 0
    while (p < plen) {
      val row = p / stride
      val rem = p - row * stride
      if (row < h && rem < 3 * w) {
        val sy = h - 1 - row
        val sx = rem / 3
        // Long cell map end-to-end (the poolBlob discipline)
        val cell = ((sy * ty / h) * tx + sx.toLong * tx / w).toInt
        val v = (bytes(off + p) & 0xff).toLong
        cellSum(cell) += v
        cellCnt(cell) += 1
        totalSum += v
        totalCnt += 1
      }
      p += 1
    }
    var ph = 0L
    var c = 0
    while (c < tx * ty) {
      if (cellSum(c) * totalCnt > totalSum * cellCnt(c)) ph |= 1L << c
      c += 1
    }
    ph
  }

  /** Per-BMP perceptual hash table `(doc_id, width, height, phash)` —
    * one narrow mapPartitions pass over the opaque binary column, no
    * shuffle; the print is the corpus-wide state an image-dedup store
    * persists (8 bytes per image). */
  def imagePhash(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withMediaColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          phashBlob(bytes).map { case (w, h, ph) => (id, w, h, ph) }.iterator
        }
      }.toDF("doc_id", "width", "height", "phash")
  }

  /** Image near-dedup verdicts over the aHash prints — delegates to the
    * text pipeline's pigeonhole-exact Hamming machinery
    * ([[SimHash.hammingDedupFrom]]): zero false negatives within the
    * radius, verdicts `(doc_id, dup_of, hamming)` with min-(d, partner)
    * tie-break. */
  def imagePhashDedup(docs: DataFrame, maxDist: Int = 2): DataFrame =
    SimHash.hammingDedupFrom(
      imagePhash(docs).select(col("doc_id"), col("phash").as("simhash")),
      maxDist, "phash.dedup")

  /** DuckDB twin of [[imagePhash]] — per-position (cell, byte) pairs
    * unnest to rows (relational, not a 60-wide lambda scan), per-cell
    * sums re-aggregate, and the bit test replays the exact
    * cross-multiplication. */
  /** The aHash CTE chain ending in `pr(doc_id, width, height, phash)` —
    * shared by [[imagePhashOracle]] and [[imageDedupOracle]] so the
    * print definition cannot drift between the table and the verdicts
    * (the dupSpansCtes discipline). */
  private def imagePhashCtes: String = {
    val tx = PhashGridX
    val ty = PhashGridY
    val row = "(p // stride)"
    val rem = s"(p - $row * stride)"
    val cell = s"((((h - 1 - $row) * $ty) // h) * $tx + ((($rem // 3) * $tx) // w))"
    s"""b AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |         octet_length(encode(text))::BIGINT AS plen,
       |         hex(encode(text)) AS hx,
       |         doc_id % 640 + 1 AS w, doc_id % 480 + 1 AS h
       |  FROM documents WHERE doc_id % 4 = 1),
       |g AS (SELECT *, ((w * 3 + 3) // 4) * 4 AS stride FROM b),
       |s AS (
       |  SELECT doc_id, unnest(list_transform(range(0, plen), p ->
       |    struct_pack(
       |      cell := CASE WHEN $row < h AND $rem < 3 * w
       |                   THEN $cell ELSE -1 END,
       |      v := ('0x' || substr(hx, p * 2 + 1, 2))::BIGINT))) AS pv
       |  FROM g),
       |c AS (
       |  SELECT doc_id, pv.cell AS cell, sum(pv.v)::BIGINT AS cs,
       |         count(*)::BIGINT AS cn
       |  FROM s WHERE pv.cell >= 0 GROUP BY 1, 2),
       |t AS (SELECT doc_id, sum(cs)::BIGINT AS ts, sum(cn)::BIGINT AS tn
       |      FROM c GROUP BY 1),
       |ph AS (
       |  SELECT c.doc_id,
       |    sum(CASE WHEN c.cs * t.tn > t.ts * c.cn
       |             THEN 1::BIGINT << c.cell ELSE 0 END)::BIGINT AS phash
       |  FROM c JOIN t ON c.doc_id = t.doc_id GROUP BY 1),
       |pr AS (
       |  SELECT b.doc_id, b.w::BIGINT AS width, b.h::BIGINT AS height,
       |    coalesce(ph.phash, 0)::BIGINT AS phash
       |  FROM b LEFT JOIN ph ON b.doc_id = ph.doc_id)""".stripMargin
  }

  val imagePhashOracle: String =
    s"""WITH $imagePhashCtes
       |SELECT doc_id, width, height, phash FROM pr""".stripMargin

  /** The ONE brute-force pairwise-Hamming verdict tail every modality
    * dedup oracle appends to its print chain (the oracle side need not
    * scale; the Spark side uses the pigeonhole banding, whose exactness
    * vs brute force the specs pin per modality): best (d, partner) with
    * partner < doc_id within distance 2, the llm_dedup_simhash
    * tie-break. `pr` names the print CTE, `c` its print column — one
    * definition, so a radius or tie-break change cannot diverge across
    * the image/audio/video oracles. */
  private def hammingVerdictSql(pr: String, c: String): String =
    s"""hvp AS (
       |  SELECT a.doc_id AS doc_id, b.doc_id AS pid,
       |    bit_count(xor(a.$c, b.$c)) AS d
       |  FROM $pr a JOIN $pr b ON b.doc_id < a.doc_id
       |  WHERE bit_count(xor(a.$c, b.$c)) <= 2),
       |hvr AS (SELECT doc_id, pid, d,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY d, pid) AS rn
       |      FROM hvp)
       |SELECT doc_id, pid::BIGINT AS dup_of, d::BIGINT AS hamming
       |FROM hvr WHERE rn = 1""".stripMargin

  /** DuckDB twin of [[imagePhashDedup]] — the shared
    * [[hammingVerdictSql]] tail over the SAME print chain. */
  val imageDedupOracle: String =
    s"""WITH $imagePhashCtes,
       |${hammingVerdictSql("pr", "phash")}""".stripMargin

  /** [[hammingVerdictSql]] with the VERDICT side (`a`) restricted to
    * `verdictPred` (a boolean SQL over `a.doc_id`); the PARTNER side
    * stays the FULL print table, so the restricted verdicts are exactly
    * the full oracle's verdicts for the selected docs — the bounded
    * sf10 twin tail (the full tail is quadratic in the print count and
    * OOMs DuckDB at the 10⁵·⁵-print decade; one-sided restriction makes
    * it linear in the full side). Same radius, same (d, pid) tie-break,
    * same final projection — only the added predicate differs. */
  private def hammingVerdictBoundedSql(pr: String, c: String,
      verdictPred: String): String =
    s"""hvp AS (
       |  SELECT a.doc_id AS doc_id, b.doc_id AS pid,
       |    bit_count(xor(a.$c, b.$c)) AS d
       |  FROM $pr a JOIN $pr b ON b.doc_id < a.doc_id
       |  WHERE bit_count(xor(a.$c, b.$c)) <= 2 AND ($verdictPred)),
       |hvr AS (SELECT doc_id, pid, d,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY d, pid) AS rn
       |      FROM hvp)
       |SELECT doc_id, pid::BIGINT AS dup_of, d::BIGINT AS hamming
       |FROM hvr WHERE rn = 1""".stripMargin

  /** Bounded sf10 twin of [[imageDedupOracle]]: verdict side restricted
    * to `verdictPred` over `a.doc_id`, partner side full. */
  def imageDedupOracleBounded(verdictPred: String): String =
    s"""WITH $imagePhashCtes,
       |${hammingVerdictBoundedSql("pr", "phash", verdictPred)}""".stripMargin

  /** Time segments of the audio envelope print — [[SimHash.Bits]] wide
    * so the pigeonhole banding machinery applies unchanged (the
    * [[PhashGridX]]×[[PhashGridY]] alignment argument, in one
    * dimension). */
  val AudioPhashSegments = 60

  /** Energy-envelope audio fingerprint of a WAV blob: the int16 LE PCM
    * stream is bucketed into [[AudioPhashSegments]] equal time segments
    * (`seg = i·S div ns` — the [[poolBlob]] cell map in one dimension)
    * and segment bit `s` is set when the segment's mean ABSOLUTE
    * amplitude exceeds the whole stream's — compared EXACTLY by int64
    * cross-multiplication (`segSum·totalCnt > totalSum·segCnt`, no
    * division anywhere), so both engines agree at the boundary. The
    * stream is the raw interleaved sample sequence (channel-agnostic,
    * the [[pcmFrames]] convention). |s| ≤ 2^15 keeps the cross-multiply
    * inside int64 for streams under 2^24 samples; longer streams fail
    * loudly rather than wrap. Returns (rate, channels, n_samples,
    * aphash) with rate/channels READ from the real fmt chunk; None for
    * non-WAV blobs. */
  private[graft] def audioPhashBlob(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] =
    wavData(bytes).map { case (at, len) =>
      val segs = AudioPhashSegments
      val ns = len / 2
      require(ns < (1 << 24),
        s"$ns samples exceeds the int64 cross-multiply envelope")
      val segSum = new Array[Long](segs)
      val segCnt = new Array[Long](segs)
      var totalSum = 0L
      var i = 0
      while (i < ns) {
        val s = (bytes(at + 2 * i + 1) << 8) | (bytes(at + 2 * i) & 0xff)
        val a = math.abs(s).toLong
        val seg = (i.toLong * segs / ns).toInt
        segSum(seg) += a
        segCnt(seg) += 1
        totalSum += a
        i += 1
      }
      var ph = 0L
      var c = 0
      while (c < segs) {
        if (segSum(c) * ns > totalSum * segCnt(c)) ph |= 1L << c
        c += 1
      }
      (le32(bytes, 24), le16(bytes, 22), ns.toLong, ph)
    }

  /** Per-WAV audio fingerprint table `(doc_id, sample_rate, channels,
    * n_samples, aphash)` — one narrow mapPartitions pass over the
    * opaque binary column, no shuffle; like [[imagePhash]], the print
    * is the corpus-wide state an audio-dedup store persists (8 bytes
    * per clip). */
  def audioPhash(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withMediaColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          audioPhashBlob(bytes).map { case (r, ch, ns, ph) =>
            (id, r, ch, ns, ph)
          }.iterator
        }
      }.toDF("doc_id", "sample_rate", "channels", "n_samples", "aphash")
  }

  /** Audio near-dedup verdicts over the envelope prints — the THIRD
    * consumer of [[SimHash.hammingDedupFrom]] (text SimHash, image
    * aHash, audio envelope): zero false negatives within the radius,
    * verdicts `(doc_id, dup_of, hamming)` with min-(d, partner)
    * tie-break. */
  def audioPhashDedup(docs: DataFrame, maxDist: Int = 2): DataFrame =
    SimHash.hammingDedupFrom(
      audioPhash(docs).select(col("doc_id"), col("aphash").as("simhash")),
      maxDist, "aphash.dedup")

  /** The envelope-print CTE chain ending in `pr(doc_id, sample_rate,
    * channels, n_samples, aphash)` — shared by [[audioPhashOracle]] and
    * [[audioDedupOracle]] so the print definition cannot drift between
    * the table and the verdicts (the [[imagePhashCtes]] discipline).
    * Samples decode exactly as in [[pcmOracleSql]]; the segment map and
    * the cross-multiplied bit test replay [[audioPhashBlob]]. */
  private def audioPhashCtes: String = {
    val segs = AudioPhashSegments
    val hi = "('0x' || substr(hx, (2 * i + 1) * 2 + 1, 2))::BIGINT"
    val lo = "('0x' || substr(hx, (2 * i) * 2 + 1, 2))::BIGINT"
    s"""b AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |         octet_length(encode(text))::BIGINT AS plen,
       |         hex(encode(text)) AS hx,
       |         8000 * ((doc_id // 4) % 3 + 1) AS rate,
       |         (doc_id // 4) % 2 + 1 AS ch
       |  FROM documents WHERE doc_id % 4 = 2),
       |s AS (
       |  SELECT doc_id, plen // 2 AS ns,
       |    unnest(list_transform(range(0, plen // 2), i ->
       |      struct_pack(
       |        seg := (i * $segs) // (plen // 2),
       |        a := abs($hi * 256 + $lo
       |          - CASE WHEN $hi >= 128 THEN 65536 ELSE 0 END)))) AS sa
       |  FROM b),
       |c AS (
       |  SELECT doc_id, ns, sa.seg AS seg, sum(sa.a)::BIGINT AS cs,
       |         count(*)::BIGINT AS cn
       |  FROM s GROUP BY 1, 2, 3),
       |t AS (SELECT doc_id, sum(cs)::BIGINT AS ts FROM c GROUP BY 1),
       |ph AS (
       |  SELECT c.doc_id,
       |    sum(CASE WHEN c.cs * c.ns > t.ts * c.cn
       |             THEN 1::BIGINT << c.seg ELSE 0 END)::BIGINT AS aphash
       |  FROM c JOIN t ON c.doc_id = t.doc_id GROUP BY 1),
       |pr AS (
       |  SELECT b.doc_id, b.rate::BIGINT AS sample_rate, b.ch::BIGINT AS channels,
       |    (b.plen // 2)::BIGINT AS n_samples,
       |    coalesce(ph.aphash, 0)::BIGINT AS aphash
       |  FROM b LEFT JOIN ph ON b.doc_id = ph.doc_id)""".stripMargin
  }

  /** DuckDB twin of [[audioPhash]]. */
  val audioPhashOracle: String =
    s"""WITH $audioPhashCtes
       |SELECT doc_id, sample_rate, channels, n_samples, aphash FROM pr""".stripMargin

  /** DuckDB twin of [[audioPhashDedup]] — the shared
    * [[hammingVerdictSql]] tail over the SAME print chain. */
  val audioDedupOracle: String =
    s"""WITH $audioPhashCtes,
       |${hammingVerdictSql("pr", "aphash")}""".stripMargin

  /** DuckDB twin of [[thumbnailPool]] — the same payload-byte bucketing
    * replayed from hex pairs. */
  val thumbnailPoolOracle: String = {
    val t = ThumbSize
    // row/rem/geometry for payload offset p
    val row = "(p // stride)"
    val rem = s"(p - $row * stride)"
    val cell = s"((((h - 1 - $row) * $t) // h) * $t + ((($rem // 3) * $t) // w))"
    s"""WITH b AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |         octet_length(encode(text))::BIGINT AS plen,
       |         hex(encode(text)) AS hx,
       |         doc_id % 640 + 1 AS w, doc_id % 480 + 1 AS h
       |  FROM documents WHERE doc_id % 4 = 1),
       |g AS (SELECT *, ((w * 3 + 3) // 4) * 4 AS stride FROM b),
       |s AS (
       |  SELECT doc_id, w, h,
       |    list_transform(range(0, plen), p ->
       |      CASE WHEN $row < h AND $rem < 3 * w
       |           THEN ($cell * 3 + ($rem % 3) + 1)
       |                * ('0x' || substr(hx, p * 2 + 1, 2))::BIGINT
       |           ELSE 0 END) AS wv,
       |    list_transform(range(0, plen), p ->
       |      CASE WHEN $row < h AND $rem < 3 * w
       |           THEN ('0x' || substr(hx, p * 2 + 1, 2))::BIGINT
       |           ELSE 0 END) AS v
       |  FROM g)
       |SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
       |  coalesce(list_sum(wv), 0)::BIGINT AS pool_checksum,
       |  coalesce(list_sum(v), 0)::BIGINT AS pool_sum
       |FROM s""".stripMargin
  }

  /** DuckDB twin of [[pcmFrames]]: signed LE16 samples re-read from hex
    * byte pairs of the payload, same windows, same integer reductions. */
  val pcmOracleSql: String =
    s"""WITH b AS (
       |  SELECT doc_id::BIGINT AS doc_id,
       |         octet_length(encode(text))::BIGINT AS plen,
       |         hex(encode(text)) AS hx
       |  FROM documents WHERE doc_id % 4 = 2),
       |s AS (
       |  SELECT doc_id, plen // 2 AS ns,
       |    list_transform(range(0, plen // 2), i ->
       |      ('0x' || substr(hx, (2 * i + 1) * 2 + 1, 2))::BIGINT * 256
       |      + ('0x' || substr(hx, (2 * i) * 2 + 1, 2))::BIGINT
       |      - CASE WHEN ('0x' || substr(hx, (2 * i + 1) * 2 + 1, 2))::BIGINT
       |             >= 128 THEN 65536 ELSE 0 END) AS smp
       |  FROM b),
       |w AS (SELECT doc_id, ns, smp, unnest(range(0, ns, $PcmWindow)) AS w0
       |      FROM s),
       |f AS (
       |  SELECT doc_id, w0 // $PcmWindow AS frame_idx,
       |    least(w0 + $PcmWindow, ns) - w0 AS n_samples,
       |    list_transform(range(w0, least(w0 + $PcmWindow, ns)),
       |                   i -> abs(smp[i + 1])) AS a
       |  FROM w)
       |SELECT doc_id, frame_idx::BIGINT AS frame_idx,
       |  n_samples::BIGINT AS n_samples,
       |  coalesce(list_sum(a), 0)::BIGINT AS abs_sum,
       |  coalesce(list_max(a), 0)::BIGINT AS peak
       |FROM f""".stripMargin

  /** DuckDB twin of [[decodeAll]]: recomputes every header-parsed field
    * from the same doc_id arithmetic [[fixtureBlob]] embeds into the bytes;
    * the checksum parses hex byte pairs of the payload (the text's UTF-8
    * octets), matching the Spark side byte-for-byte. */
  val oracleSql: String =
    """WITH b AS (
      |  SELECT doc_id::BIGINT AS doc_id,
      |         octet_length(encode(text))::BIGINT AS plen,
      |         hex(encode(text)) AS hx
      |  FROM documents),
      |m AS (SELECT *, doc_id % 4 AS md, doc_id // 4 AS grp FROM b)
      |SELECT doc_id,
      |  CASE md WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' WHEN 2 THEN 'wav'
      |          ELSE 'jpeg' END AS modality,
      |  (plen + CASE md WHEN 0 THEN 33 WHEN 1 THEN 54 WHEN 2 THEN 44
      |               ELSE 39 END)::BIGINT AS byte_len,
      |  (CASE WHEN md = 2 THEN 8000 * (grp % 3 + 1) ELSE doc_id % 640 + 1 END)::BIGINT AS width,
      |  (CASE WHEN md = 2 THEN grp % 2 + 1 ELSE doc_id % 480 + 1 END)::BIGINT AS height,
      |  (CASE WHEN md = 2 THEN plen // ((grp % 2 + 1) * 2) ELSE 1 END)::BIGINT AS frames,
      |  coalesce(list_sum(list_transform(range(0, plen),
      |     i -> ('0x' || substr(hx, i * 2 + 1, 2))::BIGINT)), 0)::BIGINT % 997 AS checksum
      |FROM m""".stripMargin

  // ------------------------------------------------------------- video

  /** Frame-sample budget: [[videoFrameSample]] emits up to this many
    * frames per clip at stride max(1, n_frames div budget). */
  val VideoSampleK = 4

  /** Synthetic AVI fixture column — [[withMediaColumn]]'s role for the
    * VIDEO modality (its four doc_id%4 slots are taken, so video gets
    * its own column; entries that consume it say so): every doc gets a
    * REAL minimal RIFF/AVI container — avih main header + an
    * uncompressed-DIB `movi` stream of '00db' chunks — with geometry and
    * timing derived from doc_id by plain integer arithmetic and frame
    * pixels CYCLED from the doc's text bytes, so the DuckDB oracle can
    * recompute what the Spark side parses out of the actual bytes:
    * w = id%16+1, h = id%12+1, frames = id%7+1, usPerFrame =
    * 20000 + id%5·10000; frame f byte j = text[(f·fsz+j) mod len]
    * (0x2e for empty docs), fsz = BMP-stride(w)·h. */
  def withVideoColumn(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, videoBlob(id, text.getBytes(StandardCharsets.UTF_8)))
      }.toDF("doc_id", "media")
  }

  /** See [[withVideoColumn]] for the layout contract. Frame 0's data
    * starts at byte 108; frame f's at 108 + f·(8 + fsz) — fsz is a
    * multiple of 4, so chunks are word-aligned with no pad bytes and
    * the offsets are pure arithmetic both engines replay. */
  def videoBlob(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val w = (docId % 16 + 1).toInt
    val h = (docId % 12 + 1).toInt
    val nf = (docId % 7 + 1).toInt
    val uspf = (20000 + (docId % 5) * 10000).toInt
    val stride = ((w * 3 + 3) / 4) * 4
    val fsz = stride * h
    val moviSz = 4 + nf * (8 + fsz)
    val total = 12 + (8 + 4 + 8 + 56) + 8 + moviSz
    val out = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(total - 8)
      .put("AVI ".getBytes(StandardCharsets.US_ASCII))
    out.put("LIST".getBytes(StandardCharsets.US_ASCII)).putInt(4 + 8 + 56)
      .put("hdrl".getBytes(StandardCharsets.US_ASCII))
    out.put("avih".getBytes(StandardCharsets.US_ASCII)).putInt(56)
      .putInt(uspf).putInt(0).putInt(0).putInt(0) // usPerFrame, maxBps, pad, flags
      .putInt(nf).putInt(0).putInt(1).putInt(0)   // totalFrames, initial, streams, sugBuf
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0)    // dwReserved[4]
    out.put("LIST".getBytes(StandardCharsets.US_ASCII)).putInt(moviSz)
      .put("movi".getBytes(StandardCharsets.US_ASCII))
    var f = 0
    while (f < nf) {
      out.put("00db".getBytes(StandardCharsets.US_ASCII)).putInt(fsz)
      var j = 0
      while (j < fsz) {
        val b = if (payload.isEmpty) '.'.toByte
                else payload(((f.toLong * fsz + j) % payload.length).toInt)
        out.put(b)
        j += 1
      }
      f += 1
    }
    out.array()
  }

  /** Generic RIFF chunk walk over `[from, end)` — (fourcc, dataOff,
    * size) per chunk, word-aligned advance, corrupt sizes stop the walk
    * (the [[wavData]] discipline). Shared by the avih and movi parses. */
  private def riffChunks(bytes: Array[Byte], from: Int, end: Int)
      : List[(String, Int, Int)] = {
    val out = scala.collection.mutable.ListBuffer.empty[(String, Int, Int)]
    var off = from
    while (off + 8 <= end) {
      val sz = le32(bytes, off + 4)
      if (sz < 0 || sz > end - off - 8) return out.toList // corrupt size
      val cc = new String(bytes, off, 4, StandardCharsets.US_ASCII)
      out += ((cc, off + 8, sz.toInt))
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    out.toList
  }

  /** Parse a RIFF/AVI main header off the REAL bytes: (width, height,
    * n_frames, us_per_frame, n_streams); None for non-AVI/degenerate
    * blobs. Walks the top-level chunks generically — the avih need not
    * sit at a fixed offset. */
  private[graft] def aviMeta(bytes: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
    if (bytes.length < 100 || !ascii(bytes, 0, "RIFF") || !ascii(bytes, 8, "AVI "))
      return None
    riffChunks(bytes, 12, bytes.length).collectFirst {
      case ("LIST", o, sz) if sz >= 4 && ascii(bytes, o, "hdrl") => (o, sz)
    }.flatMap { case (o, sz) =>
      riffChunks(bytes, o + 4, o + sz).collectFirst {
        case ("avih", d, asz) if asz >= 40 =>
          (le32(bytes, d + 32), le32(bytes, d + 36), le32(bytes, d + 16),
            le32(bytes, d), le32(bytes, d + 24))
      }
    }
  }

  /** The movi frame chunks off the REAL bytes: (frame_idx, dataOff,
    * size, isRaw) for every '##db'/'##dc' chunk in stream order —
    * `isRaw` marks '##db' (uncompressed DIB) chunks; '##dc' chunks are
    * compressed payloads a decoder would handle, carried for ordinals/
    * sampling but NOT aHash-able as raw pixels. */
  private[graft] def aviFrameChunks(
      bytes: Array[Byte]): List[(Int, Int, Int, Boolean)] = {
    if (bytes.length < 100 || !ascii(bytes, 0, "RIFF") || !ascii(bytes, 8, "AVI "))
      return Nil
    riffChunks(bytes, 12, bytes.length).collectFirst {
      case ("LIST", o, sz) if sz >= 4 && ascii(bytes, o, "movi") => (o, sz)
    } match {
      case None => Nil
      case Some((o, sz)) =>
        // frame ordinals count FRAME chunks only — a JUNK/'rec ' chunk
        // interleaved in the movi list (legal, common padding) must not
        // shift frame_idx away from the ordinal timing implies
        riffChunks(bytes, o + 4, o + sz).filter { case (cc, _, _) =>
          cc.length == 4 && cc(0).isDigit && cc(1).isDigit &&
            (cc.substring(2) == "db" || cc.substring(2) == "dc")
        }.zipWithIndex.map { case ((cc, d, csz), i) =>
          (i, d, csz, cc.substring(2) == "db")
        }
    }
  }

  /** Per-clip video metadata off the real container bytes —
    * `(doc_id, width, height, n_frames, us_per_frame, n_streams)`; one
    * narrow mapPartitions pass over the opaque binary column
    * ([[withVideoColumn]]), no shuffle. */
  def videoMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withVideoColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          aviMeta(bytes).map { case (w, h, nf, uspf, ns) =>
            (id, w, h, nf, uspf, ns)
          }.iterator
        }
      }.toDF("doc_id", "width", "height", "n_frames", "us_per_frame", "n_streams")
  }

  /** Deterministic frame sampling off the real movi chunk offsets — the
    * frame-sample step of a video pipeline (a codec decode would replace
    * the checksum reducer the same way [[pcmFrames]] documents for
    * audio): up to [[VideoSampleK]] frames per clip at stride
    * `max(1, n div k)` (indices 0, s, 2s, … while < n), each emitted as
    * `(doc_id, frame_idx, byte_off, n_bytes, checksum)` with `byte_off`
    * the frame data's REAL offset in the blob and `checksum` the
    * position-weighted byte sum Σ (j+1)·b_j over the REAL frame bytes
    * (orientation/offset-pinning, the thumbnailPool convention). Pure
    * mapPartitions, no shuffle; output rows ≤ k per clip. */
  def videoFrameSample(docs: DataFrame, k: Int = VideoSampleK): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withVideoColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val frames = aviFrameChunks(bytes)
          val n = frames.size
          if (n == 0) Iterator.empty
          else {
            val s = math.max(1, n / k)
            (0 until k).map(_ * s).filter(_ < n).distinct.iterator.map { f =>
              val (idx, off, sz, _) = frames(f)
              var cs = 0L
              var j = 0
              while (j < sz) { cs += (j + 1L) * (bytes(off + j) & 0xff); j += 1 }
              (id, idx.toLong, off.toLong, sz.toLong, cs)
            }
          }
        }
      }.toDF("doc_id", "frame_idx", "byte_off", "n_bytes", "checksum")
  }

  /** Perceptual video print: per SAMPLED frame (the [[videoFrameSample]]
    * stride rule) an aHash over the frame's real DIB geometry — the
    * [[aHashRegion]] kernel, stride recovered as fsz div h — folded into
    * ONE 60-bit clip print by STRICT per-bit majority (bit set iff more
    * than half the sampled frames set it; ties drop, pinned in both
    * engines). The temporal-majority fold makes the print robust to a
    * minority of differing frames (intros/outros) the way a video-dedup
    * pipeline needs, while staying [[SimHash.Bits]]-aligned so the
    * pigeonhole banding applies unchanged. One narrow mapPartitions
    * pass, no shuffle; 8 bytes of persisted state per clip.
    * Output (doc_id, n_sampled, vphash). */
  def videoPhash(docs: DataFrame, k: Int = VideoSampleK): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    withVideoColumn(docs).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          aviMeta(bytes) match {
            case Some((w, h, _, _, _)) if h > 0 =>
              val frames = aviFrameChunks(bytes)
              val n = frames.size
              val prints = (0 until k).map(_ * math.max(1, n / k))
                .filter(_ < n).distinct
                .flatMap { f =>
                  // '##dc' (compressed) sampled frames are skipped: their
                  // payload is codec output, not a raw DIB, so aHashing it
                  // with stride = sz/h would print meaningless bits — the
                  // majority fold runs over the decodable samples only
                  val (_, off, sz, raw) = frames(f)
                  val stride = (sz.toLong / h).toInt
                  if (!raw || stride <= 0) None
                  else Some(aHashRegion(bytes, off, sz, w, h, stride))
                }
              if (prints.isEmpty) Iterator.empty
              else {
                val ns = prints.size
                var ph = 0L
                var c = 0
                while (c < SimHash.Bits) {
                  val nb = prints.count(p => ((p >> c) & 1L) == 1L)
                  if (nb * 2 > ns) ph |= 1L << c
                  c += 1
                }
                Iterator.single((id, ns.toLong, ph))
              }
            case _ => Iterator.empty
          }
        }
      }.toDF("doc_id", "n_sampled", "vphash")
  }

  /** Video near-dedup verdicts over the temporal-majority prints — the
    * FOURTH consumer of [[SimHash.hammingDedupFrom]] (text, image,
    * audio, video share ONE banding/verify/verdict implementation). */
  def videoPhashDedup(docs: DataFrame, maxDist: Int = 2): DataFrame =
    SimHash.hammingDedupFrom(
      videoPhash(docs).select(col("doc_id"), col("vphash").as("simhash")),
      maxDist, "vphash.dedup")

  /** The clip-print CTE chain ending in
    * `vpr(doc_id, n_sampled, vphash)` — shared by [[videoPhashOracle]]
    * and [[videoDedupOracle]] (the imagePhashCtes no-drift discipline):
    * sampled frames from the shared [[videoCtes]] stride rule, per-frame
    * cell sums over the cycled payload replaying [[aHashRegion]]'s cell
    * map and cross-multiplied bit test, strict-majority fold per cell. */
  private def videoPhashCtes: String = {
    val tx = PhashGridX
    val ty = PhashGridY
    val row = "(p // stride)"
    val rem = s"(p - $row * stride)"
    val cell = s"((((h - 1 - $row) * $ty) // h) * $tx + ((($rem // 3) * $tx) // w))"
    s"""$videoCtes,
       |vvi AS (
       |  SELECT doc_id, plen, hx, w, h, fsz, fsz // h AS stride,
       |    unnest(list_distinct(list_filter(
       |      list_transform(range(0, $VideoSampleK),
       |        q -> q * greatest(nf // $VideoSampleK, 1)),
       |      f -> f < nf))) AS f
       |  FROM vg),
       |vvp AS (
       |  SELECT doc_id, f, unnest(list_transform(range(0, fsz), p ->
       |    struct_pack(
       |      cell := CASE WHEN $rem < 3 * w THEN $cell ELSE -1 END,
       |      v := CASE WHEN plen = 0 THEN 46
       |               ELSE ('0x' || substr(hx, ((f * fsz + p) % plen) * 2 + 1, 2))::BIGINT
       |           END))) AS pv
       |  FROM vvi),
       |vvc AS (
       |  SELECT doc_id, f, pv.cell AS cell, sum(pv.v)::BIGINT AS cs,
       |         count(*)::BIGINT AS cn
       |  FROM vvp WHERE pv.cell >= 0 GROUP BY 1, 2, 3),
       |vvt AS (SELECT doc_id, f, sum(cs)::BIGINT AS ts, sum(cn)::BIGINT AS tn
       |        FROM vvc GROUP BY 1, 2),
       |vvbit AS (
       |  SELECT vvc.doc_id, vvc.f, vvc.cell
       |  FROM vvc JOIN vvt USING (doc_id, f) WHERE cs * tn > ts * cn),
       |vvns AS (SELECT doc_id, count(DISTINCT f)::BIGINT AS ns FROM vvi GROUP BY 1),
       |vvclip AS (
       |  SELECT b.doc_id,
       |    sum(CASE WHEN b.nb * 2 > vvns.ns THEN 1::BIGINT << b.cell
       |             ELSE 0 END)::BIGINT AS vphash
       |  FROM (SELECT doc_id, cell, count(*)::BIGINT AS nb
       |        FROM vvbit GROUP BY 1, 2) b
       |  JOIN vvns USING (doc_id) GROUP BY 1),
       |vpr AS (
       |  SELECT vvns.doc_id, vvns.ns AS n_sampled,
       |    coalesce(vvclip.vphash, 0)::BIGINT AS vphash
       |  FROM vvns LEFT JOIN vvclip USING (doc_id))""".stripMargin
  }

  /** DuckDB twin of [[videoPhash]]. */
  val videoPhashOracle: String =
    s"""WITH $videoPhashCtes
       |SELECT doc_id, n_sampled, vphash FROM vpr""".stripMargin

  /** DuckDB twin of [[videoPhashDedup]] — the shared
    * [[hammingVerdictSql]] tail over the SAME clip-print chain. */
  val videoDedupOracle: String =
    s"""WITH $videoPhashCtes,
       |${hammingVerdictSql("vpr", "vphash")}""".stripMargin

  /** Bounded sf10 twin of [[videoDedupOracle]]: verdict side restricted
    * to `verdictPred` over `a.doc_id`, partner side full. */
  def videoDedupOracleBounded(verdictPred: String): String =
    s"""WITH $videoPhashCtes,
       |${hammingVerdictBoundedSql("vpr", "vphash", verdictPred)}""".stripMargin

  /** The video-fixture derivation CTE (doc_id → geometry/timing/frame
    * size), shared by both video oracles. */
  private def videoCtes: String =
    """vb AS (
      |  SELECT doc_id::BIGINT AS doc_id,
      |    octet_length(encode(text))::BIGINT AS plen,
      |    hex(encode(text)) AS hx,
      |    doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h,
      |    doc_id % 7 + 1 AS nf, 20000 + (doc_id % 5) * 10000 AS uspf
      |  FROM documents),
      |vg AS (SELECT *, ((w * 3 + 3) // 4) * 4 * h AS fsz FROM vb)""".stripMargin

  /** DuckDB twin of [[videoMeta]] — recomputes the fixture derivation
    * the parser reads back out of the bytes (the [[withMediaColumn]]
    * oracle convention). */
  val videoMetaOracle: String =
    s"""WITH $videoCtes
       |SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
       |  nf::BIGINT AS n_frames, uspf::BIGINT AS us_per_frame,
       |  1::BIGINT AS n_streams
       |FROM vg""".stripMargin

  /** DuckDB twin of [[videoFrameSample]] — replays the sampling stride,
    * the pure-arithmetic chunk offsets (frame f data at 108 + f·(8+fsz))
    * and the cycled-payload checksum. */
  val videoFramesOracle: String =
    s"""WITH $videoCtes,
       |vi AS (
       |  SELECT doc_id, plen, hx, fsz,
       |    unnest(list_distinct(list_filter(
       |      list_transform(range(0, $VideoSampleK),
       |        q -> q * greatest(nf // $VideoSampleK, 1)),
       |      f -> f < nf))) AS f
       |  FROM vg)
       |SELECT doc_id, f::BIGINT AS frame_idx,
       |  (108 + f * (8 + fsz))::BIGINT AS byte_off,
       |  fsz::BIGINT AS n_bytes,
       |  list_sum(list_transform(range(0, fsz), j -> (j + 1) *
       |    CASE WHEN plen = 0 THEN 46
       |         ELSE ('0x' || substr(hx, ((f * fsz + j) % plen) * 2 + 1, 2))::BIGINT
       |    END))::BIGINT AS checksum
       |FROM vi""".stripMargin
}
