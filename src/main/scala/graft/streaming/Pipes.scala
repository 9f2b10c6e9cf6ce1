package graft.streaming

import graft.lql.Ast._
import graft.lql.{Parser, TagsCompiler, WhereCompiler}
import graft.model.Model
import graft.store.{CatEntry, Store}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

/** Pipes as driver-managed micro-batch loops over the [[Store]]'s catalog.
  *
  * The reference implements pipes with a write-event bus + per-(pipe,source)
  * worker goroutines and hand-saved cursor positions
  * (reference pkg/pipe/worker.go:48-104, ppipe.go:63-111). Spark-first, each
  * pipe is ONE [[PipeWorker]] whose trigger is a normal Spark batch job:
  *
  *  - source discovery  = catalog entries whose footer `maxSeq` exceeds the
  *    pipe's per-partition cursor — O(new data) per trigger, the catalog IS
  *    the store's transaction log (replaces the reference's WriteEvent bus,
  *    pkg/partition/partition.go:175-206, and the earlier Structured
  *    Streaming file source, whose directory-listing state grew with TOTAL
  *    file count and re-emitted compacted files);
  *  - saved positions   = `pipes/<name>/cursors.jsonl`, persisted AFTER the
  *    append (at-least-once, the reference's save-after-write discipline,
  *    pkg/pipe/worker.go:73-89);
  *  - source matching   = evaluated driver-side on catalog tag lines, so a
  *    non-matching partition's files are never even READ (the file source
  *    scanned everything and filtered rows);
  *  - compaction-safe   = rewritten files carry the SAME seqs, so they sit
  *    at or below the cursor and are never reprocessed; a file deleted
  *    mid-trigger by a concurrent compact/TRUNCATE replans against the
  *    fresh catalog (rows are immutable and seq-filtered ⇒ a retry is
  *    exact);
  *  - cascade guard     = partitions tagged `logrange.pipe` are never pipe
  *    sources (reference partition.go:158-159 noEvent).
  *
  * Registration is persisted in `<root>/pipes.jsonl` as the rendered
  * FROM/WHERE forms, exactly like the reference stores `String()` forms
  * (pkg/backend/admin.go:209).
  *
  * Cursor contract: a partition's cursor only advances past seqs that can
  * no longer be preceded — [[Store.appendWithSeq]] keeps each append's
  * epoch "in flight" until it returns, and workers defer catalog entries
  * above [[Store.safeSeqWatermark]], so a higher-epoch append that
  * REGISTERS first (completion order ≠ epoch order) cannot pull the cursor
  * above a still-running lower-epoch append's rows. Bulk loads pinning
  * their own seq must land in a single append (as EventStore does). The
  * one unguarded edge: truncating an ENTIRE store and restarting the JVM
  * reseeds the epoch counter low, so a pre-existing pipe's high cursor
  * would skip the restarted seq range.
  */
/** @param compactThreshold auto-compact a pipe's destination partition
  *        once it accumulates this many chunk files (each micro-batch
  *        appends one). Compaction preserves seqs, so the rewritten files
  *        sit below every cursor — no pipe ever reprocesses them. 0
  *        disables.
  * @param maxFilesPerTrigger bounds a trigger to whole catalog registration
  *        batches (same-`writeTs` groups) totalling at most this many files
  *        (always at least one group), so a backlog drains incrementally.
  *        Groups' seq ranges are disjoint per partition (see cursor
  *        contract), so cutting between groups never strands rows below an
  *        advanced cursor.
  * @param pollMs idle wait between a worker's catalog checks; the memoized
  *        catalog load makes an idle poll a fingerprint comparison.
  * @param cdcDedup enable CDC dedup-on-ingest for this service's pipes
  *        (round-13 directive 7): each trigger content-chunks its rows
  *        ([[graft.llm.Dedup.cdcChunksKeyed]], the one chunking
  *        definition) and drops rows whose EVERY chunk already exists in
  *        the pipe's persisted chunk-hash index
  *        (`pipes/<name>/cdcindex/`, parquet, appended per trigger AFTER
  *        the destination append) — the reference's pipe is a filter,
  *        this makes ours filter ∧ dedup. Crash between append and index
  *        write degrades to plain at-least-once (rows re-judged against
  *        the OLD index on retry — never lost); crash between index
  *        write and cursor save means the retried rows' chunks are
  *        already indexed, so the retry drops them instead of appending
  *        duplicates — the gate actively REPAIRS the at-least-once
  *        window. Token-less rows cannot be content-judged and always
  *        pass. */
final class PipeService(store: Store, clock: () => Instant = () => Instant.now(),
    maxFilesPerTrigger: Int = 1024, compactThreshold: Int = 256,
    pollMs: Long = 250L, cdcDedup: Boolean = false) {

  import PipeService._

  private val spark = store.spark
  private val parser = new Parser(clock)
  private val whereC = new WhereCompiler(clock)
  private val fs = new Path(store.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val pipesFile = new Path(store.root, "pipes.jsonl")
  private val pipesBak = new Path(store.root, "pipes.jsonl.bak")

  /** name → running worker (this JVM). */
  private val running = scala.collection.concurrent.TrieMap.empty[String, PipeWorker]

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

  private def encode(p: PipeDef): String =
    s"""{"name":"${esc(p.name)}","from":"${esc(p.fromStr)}","where":"${esc(p.whereStr)}"}"""
  private def decode(line: String): PipeDef = {
    val name = jsonStr(line, "name")
    val fromS = jsonStr(line, "from")
    val whereS = jsonStr(line, "where")
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

  /** DELETE PIPE (reference pkg/backend/admin.go:220-228): stop the worker,
    * drop the registration AND its cursor state — a later CREATE PIPE with
    * the same name starts from scratch instead of silently resuming the
    * dead pipe's cursors (and skipping everything below them). The
    * destination partition is kept. */
  def delete(name: String): Unit = {
    val defs = list()
    if (!defs.exists(_.name == name)) throw LqlException(s"pipe $name not found")
    running.remove(name).foreach(_.stop())
    persist(defs.filterNot(_.name == name))
    fs.delete(new Path(store.root, s"pipes/$name"), true)
  }

  /** (Re)start workers for every registered pipe (crash/restart recovery —
    * persisted cursors resume where each pipe left off). */
  def startAll(): Unit = list().foreach(start)

  /** Stop all workers in this JVM (registrations remain). */
  def stopAll(): Unit = { running.values.foreach(_.stop()); running.clear() }

  /** Block until every running pipe has consumed all catalog data available
    * at the time of the call. */
  def processAllAvailable(): Unit = running.values.foreach(_.processAllAvailable())

  /** The running worker behind a pipe (this JVM), for progress
    * inspection. */
  def worker(name: String): Option[PipeWorker] = running.get(name)

  private def start(p: PipeDef): PipeWorker =
    running.getOrElseUpdate(p.name, {
      val pred = TagsCompiler.compile(p.from)
      // compiled per TRIGGER, not once: relative datetimes in the WHERE
      // ("ts > '-5m'") must re-anchor against the clock each micro-batch,
      // like the reference re-evaluates conditions per iteration
      val whereCol = () => p.where.map(w => whereC.compile(w, col("ts"), col("msg"), col("fields")))
      val w = new PipeWorker(store, p, pred, whereCol,
        maxFilesPerTrigger, compactThreshold, pollMs, cdcDedup)
      w.startThread()
      w
    })
}

/** One pipe's driver-managed micro-batch loop: discover new data from the
  * store's catalog (entries whose footer `maxSeq` exceeds the pipe's
  * per-partition cursor), run ONE Spark batch job over exactly those files,
  * append to the destination partition, then persist the advanced cursors.
  *
  * This is the reference's worker goroutine re-expressed against Spark's
  * batch engine (reference pkg/pipe/worker.go:48-104): where the reference
  * iterates a journal from a saved position, the worker plans a parquet scan
  * of just the new chunk files — discovery cost is O(new data), not
  * O(total files), and a catalog load that hasn't changed is a memoized
  * fingerprint check.
  */
final class PipeWorker private[streaming] (store: Store, p: PipeDef,
    pred: Map[String, String] => Boolean, whereCol: () => Option[Column],
    maxFilesPerTrigger: Int, compactThreshold: Int, pollMs: Long,
    cdcDedup: Boolean = false) {

  import PipeService._

  private val spark = store.spark
  private val fs = new Path(store.root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val stateDir = new Path(store.root, s"pipes/${p.name}")
  private val curPath = new Path(stateDir, "cursors.jsonl")
  private val curBak = new Path(stateDir, "cursors.jsonl.bak")
  private val cdcIndexDir = new Path(stateDir, "cdcindex")
  private val destLine = p.destLine

  /** The pipe's persisted chunk-hash index (distinct `chunk_hash` rows;
    * empty frame before the first indexed trigger). Readers distinct()
    * it, so crash-residue duplicate segments are harmless. */
  private def cdcIndex(): DataFrame =
    if (fs.exists(cdcIndexDir))
      spark.read.schema("chunk_hash STRING").parquet(cdcIndexDir.toString)
    else spark.range(0).select(lit(null).cast("string").as("chunk_hash"))

  /** Fold the chunk-hash index back to a few segments once per-trigger
    * appends pile up `compactThreshold` data files — without this a
    * long-running cdcDedup pipe re-reads O(triggers) small files twice
    * per trigger. Crash-safe WITHOUT an atomic dir swap: the compacted
    * distinct segments are written to a tmp dir, RENAMED INTO the live
    * dir first, and only then are the old segments deleted — every crash
    * window leaves the index a superset (duplicate hashes), which
    * readers `distinct()` away; no window ever loses a hash (a lost hash
    * would readmit its duplicates downstream). Segment sizing targets
    * ~128 MB so the compacted index stays a parallel scan at scale. */
  private def compactCdcIndex(): Unit = {
    if (compactThreshold <= 0 || !fs.exists(cdcIndexDir)) return
    def dataFiles() = fs.listStatus(cdcIndexDir).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val old = dataFiles()
    if (old.length < compactThreshold) return
    val targetSegs = math.max(1L, old.map(_.getLen).sum / (128L << 20)).toInt
    val tmpDir = new Path(stateDir, "cdcindex-compact-tmp")
    fs.delete(tmpDir, true)
    cdcIndex().distinct().repartition(targetSegs)
      .write.mode("overwrite").parquet(tmpDir.toString)
    fs.listStatus(tmpDir).filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.foreach { s =>
      graft.store.Store.renameOrThrow(fs, s.getPath,
        new Path(cdcIndexDir, s.getPath.getName))
    }
    old.foreach(s =>
      try fs.delete(s.getPath, false) catch { case _: java.io.IOException => () })
    fs.delete(tmpDir, true)
  }

  /** part → highest fully-processed seq (-1 = nothing yet). */
  private val cursors = scala.collection.mutable.HashMap.empty[String, Long]
  loadCursors()

  @volatile private var stopped = false
  private val sleeper = new Object
  @volatile private var batchCount = 0
  @volatile private var fileCount = 0L

  /** Triggers that consumed at least one catalog file (progress
    * observability — replaces StreamingQuery.recentProgress). */
  def batches: Int = batchCount

  /** Total catalog files read across all triggers — the O(new data)
    * discovery test hook: after a drain, one new append must move this by
    * exactly its file count, never by the store's total. */
  def filesConsumed: Long = fileCount

  private val thread = new Thread(() => {
    while (!stopped) {
      val n =
        try trigger()
        catch {
          case _: Throwable if stopped => 0
          case e: Throwable =>
            System.err.println(s"pipe ${p.name} trigger failed: $e"); 0
        }
      if (n == 0 && !stopped)
        sleeper.synchronized { if (!stopped) sleeper.wait(pollMs) }
    }
  }, s"pipe-${p.name}")
  thread.setDaemon(true)

  private[streaming] def startThread(): Unit = thread.start()

  def stop(): Unit = {
    stopped = true
    sleeper.synchronized(sleeper.notifyAll())
    thread.join(60000)
  }

  /** Run triggers until no new catalog data remains (the
    * StreamingQuery.processAllAvailable it replaces). */
  def processAllAvailable(): Unit = while (trigger() > 0) ()

  /** One micro-batch; returns the number of catalog files consumed
    * (0 = idle). Synchronized: the background loop and an explicit
    * processAllAvailable never run two batches concurrently, and a caller's
    * trigger() returning 0 means every prior batch's append+cursor-save has
    * completed. A file deleted mid-trigger by a concurrent compact/TRUNCATE
    * (catalog moves first in both) fails the scan with FileNotFound — the
    * cursor has NOT advanced, so replanning against the fresh catalog is
    * exact: compaction's rewritten files carry the same seqs, truncated
    * rows are gone by intent. */
  def trigger(): Int = synchronized {
    var attempts = 0
    var out = -1
    while (out < 0) {
      try out = triggerOnce()
      catch {
        case e: Throwable if isMissingFile(e) && attempts < 5 =>
          // brief backoff: the concurrent compact/TRUNCATE that deleted the
          // planned file finishes its catalog swap within milliseconds
          attempts += 1
          Thread.sleep(50L * attempts)
      }
    }
    out
  }

  private def triggerOnce(): Int = {
    val tagsCache = scala.collection.mutable.HashMap.empty[String, Map[String, String]]
    def tagsOf(line: String): Map[String, String] =
      tagsCache.getOrElseUpdate(line, Model.parseTags(line).getOrElse(Map.empty))
    // discovery is O(new data), not O(catalog): the O(parts) summaries
    // name the partitions whose seq high-water advanced past the cursor
    // (a part-level maxSeq ≤ cursor means NO chunk can pass the
    // entry-level gate below), then only those partitions' shards load
    // per-chunk detail
    val advanced = store.catalog.partSummaries().valuesIterator.filter { ps =>
      val t = tagsOf(ps.part)
      !t.contains(PipeTag) && pred(t) &&   // pipes never cascade
        ps.maxSeq > cursors.getOrElse(ps.part, -1L)
    }.map(_.part).toSeq
    if (advanced.isEmpty) return 0
    // entries above the in-flight watermark are deferred: a lower-epoch
    // append to the same partition may still be running, and advancing the
    // cursor past it would lose its rows once it registers (registration
    // order is completion order, not epoch order). The watermark is
    // per-partition: appends that declared disjoint targets don't defer
    // us. ONE in-flight snapshot per trigger — taken AFTER entriesForParts
    // materializes the candidate view (the snapshot ordering contract) —
    // serves every partition's check, so a shared multi-driver registry
    // is listed once, not once per partition
    val byPart = store.catalog.entriesForParts(advanced)
    val snap = Store.inFlightSnapshot(store.root)
    val safeCache = scala.collection.mutable.HashMap.empty[String, Long]
    def safeFor(part: String): Long =
      safeCache.getOrElseUpdate(part, Store.watermarkFrom(snap, Some(part)))
    val cand = byPart.valuesIterator.flatten
      .filter(e => e.maxSeq > cursors.getOrElse(e.part, -1L) &&
        e.maxSeq <= safeFor(e.part))
      .toVector
    if (cand.isEmpty) return 0

    // whole registration batches (same writeTs) oldest-first up to the file
    // bound, always at least one group — a group's files may interleave one
    // append's seqs (salted writers), so cutting inside one could strand
    // rows below an advanced cursor; cutting BETWEEN groups cannot (the
    // cursor contract: later appends take higher seq epochs)
    val groups = cand.groupBy(_.writeTs).toSeq.sortBy(_._1).map(_._2)
    val chosen = scala.collection.mutable.ArrayBuffer.empty[CatEntry]
    var i = 0
    while (i < groups.length &&
        (chosen.isEmpty || chosen.size + groups(i).size <= maxFilesPerTrigger)) {
      chosen ++= groups(i); i += 1
    }

    val parts = chosen.map(_.part).distinct.toSeq
    var df = spark.read.option("basePath", store.dataDir).schema(Model.schema)
      .parquet(chosen.map(_.file).toSeq: _*)
    // per-partition cursor + parsed source tags as ONE broadcast side table
    // (a trigger can span thousands of partitions at the 100 TB design
    // point — a literal OR/CASE chain per partition would blow codegen,
    // a broadcast hash join is flat at any width):
    //  - seq gate: rows at or below the cursor (compaction rewrites merged
    //    into a not-yet-processed file) are dropped;
    //  - fields = record fields ++ source tags (reference siterator.go:
    //    49-63; on a key clash the tag value wins — maps cannot hold
    //    duplicates)
    import spark.implicits._
    val meta = parts.map(pt => (pt, cursors.getOrElse(pt, -1L), tagsOf(pt)))
      .toDF("part", "__cur", "__ptags")
    df = df.join(broadcast(meta), "part").where(col("seq") > col("__cur"))
    // WHERE sees the record's own fields (tag stamping happens after the
    // filter, like the reference's siterator)
    whereCol().foreach(c => df = df.where(c))

    // CDC dedup-on-ingest (optional): chunk the surviving rows ONCE,
    // gate against the persisted index, and remember the chunk table for
    // the post-append index update. Rows with no chunks (token-less)
    // have no verdict — the left join keeps them.
    var trigChunks: Option[DataFrame] = None
    var trigCheckpoint: Option[DataFrame] = None
    if (cdcDedup) {
      // a CDC trigger is several jobs (gate join, append, index update);
      // materialize the trigger's rows ONCE so only this read races a
      // concurrent compact/TRUNCATE — every later job reads the
      // checkpointed blocks (bounded by maxFilesPerTrigger), exactly the
      // single-scan exposure a plain pipe trigger has
      df = df.localCheckpoint(true)
      trigCheckpoint = Some(df)
      val chunks = graft.llm.Dedup.cdcChunksKeyed(
        df.select(col("part"), col("seq"), col("msg")),
        Seq("part", "seq"), "msg").persist()
      trigChunks = Some(chunks)
      val verdicts = graft.llm.Dedup.cdcIngestKeepFromChunks(cdcIndex(), chunks)
      df = df.join(verdicts, Seq("part", "seq"), "left")
        .where(coalesce(col("keep"), lit(true)))
        .drop("keep")
    }

    df = df.withColumn("fields", concatFields(col("fields"), col("__ptags")))
      .drop("__cur", "__ptags")

    // fresh (part, seq) for the destination partition — appendWithSeq's
    // atomic epochs make this safe even against a concurrent foreground
    // ingest into the same partition; the SOURCE (part, seq) is the row
    // identity that keeps destination seq order retry-stable
    try {
      store.appendWithSeq(
        df.withColumn("__src_part", col("part"))
          .withColumn("__src_seq", col("seq"))
          .withColumn("part", lit(destLine)),
        partsHint = Some(Set(destLine)),
        orderBy = Seq(col("__src_part"), col("__src_seq")))

      // index update AFTER the destination append (see the cdcDedup
      // ordering contract in PipeService's doc): every chunk hash this
      // trigger SAW — kept and dropped alike fold to the same set, since
      // a dropped row's chunks are in the index already — minus what the
      // index holds, appended as one new parquet segment
      trigChunks.foreach { chunks =>
        val newHashes = chunks.select(col("chunk_hash")).distinct()
          .join(cdcIndex().select(col("chunk_hash")).distinct(),
            Seq("chunk_hash"), "left_anti")
        newHashes.write.mode("append").parquet(cdcIndexDir.toString)
      }
    } finally {
      trigChunks.foreach(_.unpersist())
      // the eager localCheckpoint's executor blocks otherwise live until
      // RDD GC — every job that needed them (gate, append, index) is done
      trigCheckpoint.foreach(org.apache.spark.sql.GraftColumn.releaseLocalCheckpoint)
    }

    // advance + persist cursors AFTER the append (at-least-once — the
    // reference's save-after-write discipline, pkg/pipe/worker.go:73-89)
    chosen.groupBy(_.part).foreach { case (pt, es) =>
      val hi = es.map(_.maxSeq).max
      if (hi > cursors.getOrElse(pt, -1L)) cursors(pt) = hi
    }
    saveCursors()
    batchCount += 1
    fileCount += chosen.size

    // one appended file per micro-batch adds up — self-maintain the
    // destination partition (the sharded per-part read is memoized, so the
    // check is a driver-side count over one shard)
    if (compactThreshold > 0 &&
        store.catalog.entriesForPart(destLine).size >= compactThreshold)
      store.compact(destLine)
    // index self-maintenance sits AFTER the cursor save on purpose: the
    // trigger's delivery contract is already durable, so a compaction
    // failure here may cost small files but can never force redelivery;
    // best-effort for the same reason
    if (cdcDedup)
      try compactCdcIndex()
      catch { case _: java.io.IOException => () }
    chosen.size
  }

  /** A planned file vanished: either the scan failed mid-job
    * (FileNotFoundException) or plan resolution rejected the path
    * (AnalysisException PATH_NOT_FOUND) — both mean a concurrent
    * compact/TRUNCATE moved the catalog while this trigger was planning. */
  private def isMissingFile(e: Throwable): Boolean = {
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 16) {
      t match {
        case _: java.io.FileNotFoundException => return true
        case a: org.apache.spark.sql.AnalysisException
            if a.getCondition == "PATH_NOT_FOUND" => return true
        case s: org.apache.spark.SparkException
            // the executor-side shape of the same race (the reader finds
            // the path gone mid-task rather than at plan time)
            if s.getCondition == "FAILED_READ_FILE.FILE_NOT_EXIST" => return true
        case _ => ()
      }
      t = t.getCause; depth += 1
    }
    e.getMessage != null && (e.getMessage.contains("FileNotFoundException") ||
      e.getMessage.contains("FAILED_READ_FILE.FILE_NOT_EXIST"))
  }

  private def loadCursors(): Unit = {
    val src =
      if (fs.exists(curPath)) curPath
      else if (fs.exists(curBak)) curBak
      else return
    val in = fs.open(src)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    txt.linesIterator.filter(_.nonEmpty).foreach { line =>
      // everything after the part string is `,"seq":N}` — the last ':'
      // always precedes the number (tag lines may themselves contain ':')
      val seq = line.substring(line.lastIndexOf(':') + 1)
        .takeWhile(c => c.isDigit || c == '-').toLong
      cursors(jsonStr(line, "part")) = seq
    }
  }

  /** Same tmp→bak→base swap as the registration file: at every instant one
    * of (new base, old base, bak) is readable — a crash never resets a
    * pipe to reprocess-everything. */
  private def saveCursors(): Unit = {
    if (!fs.exists(stateDir)) fs.mkdirs(stateDir)
    val tmp = new Path(stateDir, "cursors.jsonl.tmp")
    val out = fs.create(tmp, true)
    try out.write(cursors.toSeq.sortBy(_._1).map { case (pt, s) =>
      s"""{"part":"${esc(pt)}","seq":$s}"""
    }.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(curBak)) fs.delete(curBak, false)
    if (fs.exists(curPath)) Store.renameOrThrow(fs, curPath, curBak)
    Store.renameOrThrow(fs, tmp, curPath)
    fs.delete(curBak, false)
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

  private[graft] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }

  /** Extract `"key":"value"` from a single-line JSON record written with
    * [[esc]]. */
  private[graft] def jsonStr(line: String, key: String): String = {
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
}
