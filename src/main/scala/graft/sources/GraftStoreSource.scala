package graft.sources

import graft.lql.Ast.{LqlException, Select}
import graft.lql.{Parser, TagsCompiler}
import graft.model.Model
import graft.store.{Catalog, Store}
import graft.streaming.PipeService
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector exposing a graft [[Store]] as a Spark table:
  *
  * {{{
  *   spark.read.format("graft-store").option("root", root).load()
  *   spark.readStream.format("graft-store").option("root", root)
  *     .option("from", "{name=error}").load()
  * }}}
  *
  * The batch side reads the catalog's exact file list (no directory
  * listing); the streaming side is the Spark-native form of the reference's
  * stream-mode client loop (reference api/client.go:40-75) and WriteEvent
  * subscription (reference pkg/partition/partition.go:175-206): offsets are
  * per-partition `seq` cursors, and each micro-batch is planned from
  * catalog entries whose footer `maxSeq` exceeds the cursor — discovery
  * cost is O(new data) per trigger against the memoized catalog load,
  * never an O(total files) listing (the scale property that made
  * [[graft.streaming.PipeWorker]] drop Spark's file-stream source; this
  * source packages the same contract behind the public `readStream` API,
  * with checkpointed offsets and AvailableNow/processingTime triggers for
  * free).
  *
  * Exactly-once batch planning: an offset only includes seqs at or below
  * [[Store.safeSeqWatermark]], and any append started AFTER an offset was
  * computed takes a fresh epoch whose seqs exceed every seq visible then,
  * so the row set of `(start, end]` is stable no matter when it is planned.
  * Compaction rewrites keep row seqs (rewritten rows sit at or below the
  * cursor and are filtered in the reader), so maintenance never re-emits.
  * TRUNCATE deletes rows by intent; the one documented edge is the pipes'
  * cursor contract: truncating an entire store and restarting the JVM
  * reseeds epochs low, stranding checkpoints above the new seqs.
  *
  * Options: `root` (required) — the store root; `from` (optional) — an LQL
  * tags source (`{k=v}` subset or a tags expression) selecting source
  * partitions driver-side, so non-matching partitions' files are never
  * read; pipe destinations (`logrange.pipe=...`) are excluded unless
  * matched explicitly by a `{logrange.pipe=<name>}` literal, mirroring the
  * pipe cascade guard.
  */
final class GraftStoreSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-store"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Model.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val root = properties.get("root")
    if (root == null || root.isEmpty)
      throw LqlException("graft-store: required option 'root' is missing")
    new GraftStoreTable(root, Option(properties.get("from")).filter(_.nonEmpty))
  }
}

final class GraftStoreTable(root: String, from: Option[String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-store($root${from.fold("")(f => s", from=$f")})"
  override def schema(): StructType = Model.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new GraftStoreScan(root, from)
}

final class GraftStoreScan(root: String, from: Option[String]) extends Scan {

  // FROM-option predicate + cascade guard, evaluated driver-side against
  // catalog tag lines only (the same pruning as PipeWorker.triggerOnce)
  private val pred: Map[String, String] => Boolean = {
    val src = from.map { f =>
      new Parser(() => java.time.Instant.now()).parse(s"SELECT FROM $f LIMIT 1") match {
        case Right(s: Select) => s.source.getOrElse(
          throw LqlException(s"graft-store: empty 'from' source: $f"))
        case other => throw LqlException(s"graft-store: bad 'from' option '$f': $other")
      }
    }
    val explicitPipe = src.exists(_.render.contains(PipeService.PipeTag))
    val p = TagsCompiler.compile(src)
    tags => (explicitPipe || !tags.contains(PipeService.PipeTag)) && p(tags)
  }

  private def hadoopConf: Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration
  private def catalog: Catalog = Catalog(hadoopConf, root)

  private val tagsCache = scala.collection.mutable.HashMap.empty[String, Map[String, String]]
  private def matches(line: String): Boolean =
    pred(tagsCache.getOrElseUpdate(line, Model.parseTags(line).getOrElse(Map.empty)))

  override def readSchema(): StructType = Model.schema
  override def description(): String = s"graft-store root=$root from=${from.getOrElse("*")}"

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      catalog.load().filter(e => matches(e.part))
        .map(e => GraftInputPartition(e.file, e.part, -1L, Long.MaxValue)).toArray
    override def createReaderFactory(): PartitionReaderFactory =
      GraftReaderFactory(new SerializableHadoopConf(hadoopConf))
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsTriggerAvailableNow {

      /** End offset pinned at Trigger.AvailableNow start. Without this
        * contract Spark falls back to single-batch Trigger.Once semantics,
        * which never runs the trailing no-data batch — so watermark-gated
        * append output (windows, sessions) would not flush until the NEXT
        * run's data batch. */
      private var availableNowEnd: Option[Offset] = None
      override def prepareForTriggerAvailableNow(): Unit =
        availableNowEnd = Some(computeLatestOffset())

      /** Highest cursor ever handed out (or replayed from a checkpoint)
        * per partition in this run. latestOffset max-merges into this, so
        * a cursor can never regress or drop out of the offset even when a
        * compaction merges a consumed file with a deferred higher-epoch
        * one while a lower-epoch append is in flight (which would
        * otherwise hide the partition behind the safe-seq watermark for a
        * trigger and re-emit consumed rows once it resolved). */
      private val floor = scala.collection.mutable.HashMap.empty[String, Long]
      private def raiseFloor(cursors: Map[String, Long]): Unit =
        floor.synchronized {
          cursors.foreach { case (p, s) =>
            if (s > floor.getOrElse(p, Long.MinValue)) floor(p) = s
          }
        }

      override def initialOffset(): Offset = GraftOffset(Map.empty)

      /** New data = catalog entries above the committed cursors, capped at
        * the safe seq watermark so a still-running lower-epoch append can
        * never be stranded below an advanced offset (the PipeWorker cursor
        * contract), and floored at every cursor previously handed out so
        * offsets are monotonic per partition. */
      override def latestOffset(): Offset =
        availableNowEnd.getOrElse(computeLatestOffset())

      /** Admission-control form: max-merged with `start`, so a cursor can
        * never regress below the last committed offset even across a
        * restart (the floor map alone only covers this run). ReadLimit is
        * ignored — a trigger always admits up to the safe watermark. */
      override def latestOffset(start: Offset,
          limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
        val latest = latestOffset().asInstanceOf[GraftOffset].cursors
        val base = start.asInstanceOf[GraftOffset].cursors
        val merged = (latest.keySet ++ base.keySet).iterator.map { p =>
          p -> math.max(latest.getOrElse(p, Long.MinValue),
            base.getOrElse(p, Long.MinValue))
        }.toMap
        GraftOffset(merged)
      }

      private def computeLatestOffset(): Offset = {
        val safeCache = scala.collection.mutable.HashMap.empty[String, Long]
        def safe(part: String): Long =
          safeCache.getOrElseUpdate(part, Store.safeSeqWatermarkFor(root, part))
        val cur = scala.collection.mutable.HashMap.empty[String, Long]
        catalog.load().foreach { e =>
          if (matches(e.part)) {
            if (e.maxSeq < 0)
              throw LqlException(s"graft-store: catalog entry ${e.file} has no " +
                "footer seq; seq-less files cannot be streamed (rebuild the " +
                "store, or read it in batch mode)")
            if (e.maxSeq <= safe(e.part)) {
              val prev = cur.getOrElse(e.part, -1L)
              if (e.maxSeq > prev) cur(e.part) = e.maxSeq
            }
          }
        }
        floor.synchronized {
          floor.foreach { case (p, s) =>
            if (s > cur.getOrElse(p, Long.MinValue)) cur(p) = s
          }
        }
        val off = GraftOffset(cur.toMap)
        raiseFloor(off.cursors)
        off
      }

      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val lo = start.asInstanceOf[GraftOffset].cursors
        val hi = end.asInstanceOf[GraftOffset].cursors
        // a replayed checkpoint range is also a floor (restart path)
        raiseFloor(lo); raiseFloor(hi)
        catalog.load().iterator.flatMap { e =>
          val l = lo.getOrElse(e.part, -1L)
          val h = hi.getOrElse(e.part, -1L)
          // e.maxSeq > l skips fully-consumed files (incl. compaction
          // rewrites of already-consumed rows); the reader re-applies the
          // (l, h] row filter for files straddling the bounds
          if (h > l && e.maxSeq > l) Some(GraftInputPartition(e.file, e.part, l, h))
          else None
        }.toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        GraftReaderFactory(new SerializableHadoopConf(hadoopConf))

      override def deserializeOffset(json: String): Offset = {
        val off = GraftOffset.fromJson(json)
        raiseFloor(off.cursors)
        off
      }
      override def commit(end: Offset): Unit =
        raiseFloor(end.asInstanceOf[GraftOffset].cursors)
      override def stop(): Unit = ()
    }
}

/** Streaming offset: partition tag line → highest consumed `seq`. */
final case class GraftOffset(cursors: Map[String, Long]) extends Offset {
  override def json(): String =
    cursors.toSeq.sortBy(_._1).map { case (p, s) =>
      s"""{"part":"${PipeService.esc(p)}","seq":$s}"""
    }.mkString("[", ",", "]")
}

object GraftOffset {
  /** Quote-aware parse of `[{"part":"...","seq":N},...]` as written by
    * [[GraftOffset.json]]: object boundaries are found by scanning with
    * in-string state (PipeService.esc escapes `"` and `\`, so a `}` / `,`
    * inside a part value — e.g. a Go-quoted tag containing "},{" — never
    * splits an entry), and `seq` is read after the part string ends, not
    * via lastIndexOf. */
  def fromJson(json: String): GraftOffset = {
    val entries = Map.newBuilder[String, Long]
    var i = 0
    var inStr = false
    var objStart = -1
    while (i < json.length) {
      val c = json.charAt(i)
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' => objStart = i
        case '}' if objStart >= 0 =>
          val obj = json.substring(objStart, i + 1)
          val seqKey = obj.lastIndexOf("\"seq\":")
          if (seqKey < 0)
            throw LqlException(s"graft-store: bad offset entry: $obj")
          val digits = obj.substring(seqKey + 6).takeWhile(ch => ch.isDigit || ch == '-')
          entries += PipeService.jsonStr(obj, "part") -> digits.toLong
          objStart = -1
        case _ => ()
      }
      i += 1
    }
    GraftOffset(entries.result())
  }
}

/** One catalog file with the partition's seq bounds (lo exclusive, hi
  * inclusive). */
final case class GraftInputPartition(file: String, part: String,
    loSeq: Long, hiSeq: Long) extends InputPartition

final case class GraftReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(p.asInstanceOf[GraftInputPartition], conf.value)
}

/** Executor-side parquet reader for one store chunk file, via the
  * parquet-java Group API (the file carries exactly the [[Model.schema]]
  * data columns; `part` comes from the catalog, not the file). Row-group
  * and page stats still prune: the builder's record materialization is
  * sequential, but chunk files are bounded by the store's append/compact
  * file sizing, so one InputPartition is one task's worth of rows.
  */
final class GraftPartitionReader(p: GraftInputPartition, conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(p.file))
      .withConf(conf).build()
  private val partUtf8 = UTF8String.fromString(p.part)
  private var row: InternalRow = _

  override def next(): Boolean = {
    var g = reader.read()
    while (g != null) {
      val seq = g.getLong("seq", 0)
      if (seq > p.loSeq && seq <= p.hiSeq) {
        row = convert(g, seq)
        return true
      }
      g = reader.read()
    }
    false
  }

  private def convert(g: Group, seq: Long): InternalRow = {
    val ts = g.getLong("ts", 0)
    val msg = UTF8String.fromBytes(g.getBinary("msg", 0).getBytes)
    val fields =
      if (g.getFieldRepetitionCount("fields") == 0) null
      else {
        val fg = g.getGroup("fields", 0)
        val n = fg.getFieldRepetitionCount("key_value")
        val keys = new Array[Any](n)
        val vals = new Array[Any](n)
        var i = 0
        while (i < n) {
          val kv = fg.getGroup("key_value", i)
          keys(i) = UTF8String.fromBytes(kv.getBinary("key", 0).getBytes)
          vals(i) =
            if (kv.getFieldRepetitionCount("value") == 0) null
            else UTF8String.fromBytes(kv.getBinary("value", 0).getBytes)
          i += 1
        }
        new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
      }
    new GenericInternalRow(Array[Any](ts, msg, fields, seq, partUtf8))
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()
}

/** Hadoop Configuration is not Serializable; ship it via its own
  * write/readFields (what connectors do when they cannot reach Spark's
  * private SerializableConfiguration). */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
