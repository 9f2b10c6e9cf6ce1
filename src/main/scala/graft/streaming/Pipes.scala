package graft.streaming

import graft.lql.Ast._
import graft.lql.{Parser, TagsCompiler, WhereCompiler}
import graft.model.Model
import graft.store.Store
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets
import java.time.Instant

/** A registered continuous query (reference pkg/pipe/service.go:43-51):
  * records from source partitions matching `from`, filtered by `where`, are
  * appended to the partition tagged `{logrange.pipe=<name>}` with the source
  * tags added to each record's fields
  * (reference pkg/pipe/siterator.go:49-63 — Fields.Concat appends the
  * source tag line's pairs after the record's own fields).
  */
final case class PipeDef(name: String, from: Option[Source], where: Option[Expression]) {
  /** Destination tag line (reference pkg/pipe/ppipe.go:224-228). */
  def destLine: String = Model.tagLine(Map(PipeService.PipeTag -> name))
  def fromStr: String = from.map(_.render.trim).getOrElse("")
  def whereStr: String = where.map(_.render.trim).getOrElse("")
}

/** Pipes as Structured Streaming over the [[Store]].
  *
  * The reference implements pipes with a write-event bus + per-(pipe,source)
  * worker goroutines and hand-saved cursor positions
  * (reference pkg/pipe/worker.go:48-104, ppipe.go:63-111). Spark-first, all
  * of that collapses into ONE streaming query per pipe:
  *
  *  - source discovery  = the parquet file stream source over the store's
  *    data dir (new files in new/old partitions are picked up by listing —
  *    replaces the reference's WriteEvent notification bus,
  *    pkg/partition/partition.go:175-206);
  *  - saved positions   = the streaming checkpoint (at-least-once into the
  *    store via foreachBatch, matching the reference's save-after-write
  *    discipline, pkg/pipe/worker.go:73-89);
  *  - source matching   = evaluated per micro-batch on the DISTINCT tag
  *    lines of the batch (driver-side, a handful of strings), never per
  *    row — the batch then filters with a codegen'd `part IN (...)`;
  *  - cascade guard     = partitions tagged `logrange.pipe` are never pipe
  *    sources (reference partition.go:158-159 noEvent).
  *
  * Registration is persisted in `<root>/pipes.jsonl` as the rendered
  * FROM/WHERE forms, exactly like the reference stores `String()` forms
  * (pkg/backend/admin.go:209).
  */
/** @param compactThreshold auto-compact a pipe's destination partition
  *        once it accumulates this many chunk files (each micro-batch
  *        appends one). The compacted files re-enter the pipe's own file
  *        stream as "new" input, but the cascade guard drops pipe-tagged
  *        partitions per batch, so this costs one bounded re-listing —
  *        never duplicate rows. 0 disables. */
final class PipeService(store: Store, clock: () => Instant = () => Instant.now(),
    maxFilesPerTrigger: Int = 1024, compactThreshold: Int = 256) {

  import PipeService._

  private val spark = store.spark
  private val parser = new Parser(clock)
  private val whereC = new WhereCompiler(clock)
  private val fs = new Path(store.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val pipesFile = new Path(store.root, "pipes.jsonl")
  private val pipesBak = new Path(store.root, "pipes.jsonl.bak")

  /** name → running streaming query (this JVM). */
  private val running = scala.collection.concurrent.TrieMap.empty[String, StreamingQuery]

  // --- catalog -----------------------------------------------------------

  def list(): Vector[PipeDef] = {
    // Catalog.load discipline: when the base file is missing (crash during
    // persist) the .bak copy from the previous persist is authoritative
    val src =
      if (fs.exists(pipesFile)) pipesFile
      else if (fs.exists(pipesBak)) pipesBak
      else return Vector.empty
    val in = fs.open(src)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    txt.linesIterator.filter(_.nonEmpty).map(decode).toVector.sortBy(_.name)
  }

  def get(name: String): Option[PipeDef] = list().find(_.name == name)

  /** Crash-safe registration rewrite (Catalog.save pattern): at every
    * instant either the new base, the old base, or its `.bak` is readable —
    * the old delete-then-rename had a window that lost every pipe. */
  private def persist(defs: Seq[PipeDef]): Unit = {
    val tmp = new Path(store.root, "pipes.jsonl.tmp")
    val out = fs.create(tmp, true)
    try out.write(defs.sortBy(_.name).map(encode).mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(pipesBak)) fs.delete(pipesBak, false)
    if (fs.exists(pipesFile)) Store.renameOrThrow(fs, pipesFile, pipesBak)
    Store.renameOrThrow(fs, tmp, pipesFile)
    fs.delete(pipesBak, false)
  }

  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }
  private def encode(p: PipeDef): String =
    s"""{"name":"${esc(p.name)}","from":"${esc(p.fromStr)}","where":"${esc(p.whereStr)}"}"""
  private def decode(line: String): PipeDef = {
    def str(key: String): String = {
      val k = "\"" + key + "\":\""
      val st = line.indexOf(k) + k.length
      val sb = new StringBuilder
      var i = st
      while (line.charAt(i) != '"') {
        if (line.charAt(i) == '\\') {
          line.charAt(i + 1) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case 'n' => sb.append('\n')
            case 'u' => sb.append(Integer.parseInt(line.substring(i + 2, i + 6), 16).toChar)
            case o => sb.append(o)
          }
          i += (if (line.charAt(i + 1) == 'u') 6 else 2)
        } else { sb.append(line.charAt(i)); i += 1 }
      }
      sb.toString
    }
    val name = str("name")
    val fromS = str("from")
    val whereS = str("where")
    // re-parse the rendered forms through the normal LQL parser
    val stmt = "CREATE PIPE " + name +
      (if (fromS.nonEmpty) " FROM " + fromS else "") +
      (if (whereS.nonEmpty) " WHERE " + whereS else "")
    parser.parse(stmt) match {
      case Right(CreatePipe(n, f, w)) => PipeDef(n, f, w)
      case other => throw LqlException(s"corrupted pipe entry '$line': $other")
    }
  }

  // --- lifecycle ---------------------------------------------------------

  /** CREATE PIPE (reference ensurePipe with changeOk=false,
    * pkg/pipe/service.go:234-255): same name + same conditions is a no-op;
    * same name + different conditions is an error. Starts the streaming
    * query. */
  def create(c: CreatePipe): PipeDef = {
    val def0 = PipeDef(c.name, c.from, c.where)
    // validate both conditions compile before registering
    TagsCompiler.compile(c.from)
    c.where.foreach(w => whereC.compile(w, col("ts"), col("msg"), col("fields")))
    get(c.name) match {
      case Some(existing) =>
        if (existing.fromStr != def0.fromStr || existing.whereStr != def0.whereStr)
          throw LqlException(
            s"found pipe ${c.name} with the same name but different conditions")
        start(existing)
        existing
      case None =>
        persist(list() :+ def0)
        start(def0)
        def0
    }
  }

  /** DELETE PIPE (reference pkg/backend/admin.go:220-228): stop the query,
    * drop the registration; the destination partition is kept. */
  def delete(name: String): Unit = {
    val defs = list()
    if (!defs.exists(_.name == name)) throw LqlException(s"pipe $name not found")
    running.remove(name).foreach(_.stop())
    persist(defs.filterNot(_.name == name))
  }

  /** (Re)start streaming queries for every registered pipe (crash/restart
    * recovery — checkpoints resume where each pipe left off). */
  def startAll(): Unit = list().foreach(start)

  /** Stop all queries in this JVM (registrations remain). */
  def stopAll(): Unit = { running.values.foreach(_.stop()); running.clear() }

  /** Block until every running pipe has consumed all available input. */
  def processAllAvailable(): Unit = running.values.foreach(_.processAllAvailable())

  /** The running streaming query behind a pipe (this JVM), for progress
    * inspection. */
  def query(name: String): Option[StreamingQuery] = running.get(name)

  private def start(p: PipeDef): StreamingQuery =
    running.getOrElseUpdate(p.name, {
      val pred = TagsCompiler.compile(p.from)
      val destLine = p.destLine
      // maxFilesPerTrigger bounds per-micro-batch work, so a large backlog
      // (or a fresh checkpoint over an old store) drains incrementally
      // instead of as one giant batch. The file-source listing state still
      // grows with total file count — the 100 TB migration path is CDF /
      // notification-based discovery, as discussed above.
      val stream = spark.readStream.schema(Model.schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(store.dataDir)
      stream.writeStream
        .queryName(s"pipe-${p.name}")
        .option("checkpointLocation", s"${store.root}/pipes/${p.name}/checkpoint")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          processBatch(batch, p, pred, destLine)
        }
        .start()
    })

  /** One micro-batch: match source partitions (driver-side, on the batch's
    * distinct tag lines), filter, stamp source tags into fields, append to
    * the destination partition. At-least-once, like the reference. */
  private def processBatch(batch: DataFrame, p: PipeDef,
      pred: Map[String, String] => Boolean, destLine: String): Unit = {
    val whereCol = p.where.map(w => whereC.compile(w, col("ts"), col("msg"), col("fields")))
    val parts = batch.select("part").distinct().collect().map(_.getString(0))
    val srcParts = parts.filter { line =>
      val tags = Model.parseTags(line).getOrElse(Map.empty)
      !tags.contains(PipeTag) && pred(tags)   // pipes never cascade
    }
    if (srcParts.isEmpty) return

    var df = batch.where(col("part").isin(srcParts.toSeq: _*))
    whereCol.foreach(c => df = df.where(c))

    // source tags as a map literal per selected partition (≤ a few dozen
    // lines per batch — a constant-folded CASE chain, no per-row parsing)
    val known = srcParts.map(l => l -> Model.parseTags(l).getOrElse(Map.empty)).toMap
    val empty = map().cast("map<string,string>")
    val tagsCol = srcParts.foldLeft(empty) { (acc, line) =>
      val tags = known(line)
      val m =
        if (tags.isEmpty) empty
        else map(tags.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      when(col("part") === line, m).otherwise(acc)
    }
    // fields = record fields ++ source tags (reference siterator.go:49-63;
    // on a key clash the tag value wins — maps cannot hold duplicates)
    df = df.withColumn("fields", concatFields(col("fields"), tagsCol))

    // fresh (part, seq) for the destination partition — Store.assignSeq's
    // atomic epochs make this safe even against a concurrent foreground
    // ingest into the same partition
    df = store.assignSeq(df.withColumn("part", lit(destLine)))
    store.append(df.select(col("ts"), col("msg"), col("fields"), col("seq"), col("part")))

    // one appended file per micro-batch adds up — self-maintain the
    // destination partition (the catalog load is memoized, so the check is
    // a driver-side count)
    if (compactThreshold > 0 &&
        store.catalog.load().count(_.part == destLine) >= compactThreshold)
      store.compact(destLine)
  }
}

object PipeService {
  /** Reserved tag marking pipe destinations (reference ppipe.go:224-228). */
  val PipeTag = "logrange.pipe"

  /** map-concat with right-side wins, tolerating null left. */
  def concatFields(fields: Column, tags: Column): Column = {
    val left = coalesce(fields, map().cast("map<string,string>"))
    val lFiltered = filter(map_entries(left),
      e => !array_contains(map_keys(tags), e.getField("key")))
    map_from_entries(concat(lFiltered, map_entries(tags)))
  }
}
