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
    if (bytes.length < 54 || !ascii(bytes, 0, "BM") ||
        w <= 0 || h <= 0 || off < 0 || off > bytes.length ||
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
}
