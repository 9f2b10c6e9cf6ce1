package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

import java.nio.charset.StandardCharsets

/** Partitions catalog — the Spark analogue of the reference's tag index
  * (reference pkg/tindex/inmem.go:36-66) plus per-chunk stats
  * (reference pkg/partition/partition.go:353-403): one entry per parquet
  * file with record count, byte size, min/max `ts` and max `seq` taken from
  * the parquet footer at ingest time (metadata-only; the data is never
  * re-read).
  *
  * Layout on disk (all JSON-lines):
  *   catalog.jsonl        — compacted base (written by [[save]])
  *   catalog.jsonl.d/     — append segments, one file per ingest batch
  *   catalog.jsonl.bak    — previous base, kept during compaction
  *
  * Durability/scale properties (vs the naive single-file rewrite):
  *  - [[append]] writes ONE new segment file (tmp → rename) — O(batch), not
  *    O(catalog); ingesting N batches costs O(N) total.
  *  - [[save]] (compaction / whole-catalog replace) never has a window with
  *    no readable catalog: tmp is fully written first, the old base survives
  *    as `.bak` until the new base is in place, and [[load]] falls back to
  *    `.bak` when the base is missing.
  *  - [[load]] memoizes against a (path,len,mtime) fingerprint of the
  *    catalog files, so repeated queries don't re-read or re-parse anything
  *    until the catalog actually changes (also picks up cross-JVM changes).
  *  - Entries are keyed by data-file path; [[load]] keeps the newest entry
  *    per file, which makes a crash between base-swap and segment cleanup
  *    harmless (duplicates collapse).
  *
  * At the 100 TB design point this would be a Delta/metastore table, but the
  * access pattern (prune on tiny metadata first, then scan) is identical.
  */
final case class CatEntry(
    part: String,      // canonical tag line
    file: String,      // absolute file path
    records: Long,
    sizeBytes: Long,
    minTs: Long,
    maxTs: Long,
    writeTs: Long,     // wall-clock ns when the entry was added (ingest order)
    maxSeq: Long = -1L) // max seq in the file (footer stats); -1 = unknown

final class Catalog(fs: FileSystem, path: Path) {

  private val segDir = new Path(path.getParent, path.getName + ".d")
  private val bakPath = new Path(path.getParent, path.getName + ".bak")

  // (fingerprint of on-disk state, parsed entries, per-part index)
  @volatile private var cache: (String, Vector[CatEntry], Map[String, Vector[CatEntry]]) = null

  private def catalogFiles(): Seq[FileStatus] = {
    val base =
      if (fs.exists(path)) Seq(fs.getFileStatus(path))
      else if (fs.exists(bakPath)) Seq(fs.getFileStatus(bakPath))
      else Nil
    val segs =
      if (fs.exists(segDir))
        fs.listStatus(segDir).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".jsonl"))
          .sortBy(_.getPath.getName)
      else Nil
    base ++ segs
  }

  private def fingerprint(files: Seq[FileStatus]): String =
    files.map(st => s"${st.getPath}:${st.getLen}:${st.getModificationTime}").mkString(";")

  def load(): Vector[CatEntry] = loadWithIndex()._1

  /** Entries grouped by part line, memoized with [[load]] under the same
    * fingerprint: a scan whose FROM resolves to exact partitions prunes in
    * O(selected parts), not O(total chunk count) — the access-path that
    * keeps a million-chunk catalog out of every query's driver path. */
  def partIndex(): Map[String, Vector[CatEntry]] = loadWithIndex()._2

  private def loadWithIndex(): (Vector[CatEntry], Map[String, Vector[CatEntry]]) = {
    val files = catalogFiles()
    val fp = fingerprint(files)
    val c = cache
    if (c != null && c._1 == fp) return (c._2, c._3)
    val raw = files.flatMap { st =>
      val in = fs.open(st.getPath)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      txt.linesIterator.filter(_.nonEmpty).map(decode)
    }
    // newest entry per data file wins (crash-residue duplicates collapse)
    val entries = raw.groupBy(_.file).valuesIterator.map(_.maxBy(_.writeTs)).toVector
      .sortBy(e => (e.part, e.writeTs, e.file))
    // groupBy preserves the sorted per-part order; index shares the entry
    // objects with the vector (one parse, two views)
    val idx = entries.groupBy(_.part)
    cache = (fp, entries, idx)
    (entries, idx)
  }

  private val lock = Catalog.lockFor(path.toString)

  /** Append one ingest batch as a new segment file — O(batch). */
  def append(newEntries: Seq[CatEntry]): Unit = lock.synchronized {
    if (newEntries.isEmpty) return
    if (!fs.exists(segDir)) fs.mkdirs(segDir)
    val name = f"seg-${System.nanoTime()}%019d-${java.util.UUID.randomUUID().toString.take(8)}.jsonl"
    val tmp = new Path(segDir, name + ".tmp")
    writeFile(tmp, newEntries)
    Store.renameOrThrow(fs, tmp, new Path(segDir, name))
    cache = null
  }

  /** Atomic read-modify-write: drop entries for `dropFiles`, add `add`.
    * Runs under the same in-JVM lock as [[append]], so a concurrent
    * append's segment can never be lost to the base-rewrite's segment
    * cleanup — the race a caller-side load/filter/save would have
    * (maintenance ops like TRUNCATE/compact racing a pipe's append). */
  def replace(dropFiles: Set[String], add: Seq[CatEntry]): Unit = lock.synchronized {
    save(load().filterNot(e => dropFiles.contains(e.file)) ++ add)
  }

  /** Replace the whole catalog (compaction; [[replace]]'s rewrite).
    * Crash-safe: at every instant either the new base, the old base, or the
    * `.bak` copy is readable. */
  def save(entries: Seq[CatEntry]): Unit = lock.synchronized {
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    writeFile(tmp, entries)
    if (fs.exists(bakPath)) fs.delete(bakPath, false)
    if (fs.exists(path)) Store.renameOrThrow(fs, path, bakPath)
    Store.renameOrThrow(fs, tmp, path)
    if (fs.exists(segDir)) fs.delete(segDir, true)
    fs.delete(bakPath, false)
    cache = null
  }

  private def writeFile(p: Path, entries: Seq[CatEntry]): Unit = {
    val out = fs.create(p, true)
    try out.write(entries.map(encode).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // minimal JSON codec (flat record of strings/longs; no external deps)
  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }
  private def encode(e: CatEntry): String =
    s"""{"part":"${esc(e.part)}","file":"${esc(e.file)}","records":${e.records},""" +
      s""""sizeBytes":${e.sizeBytes},"minTs":${e.minTs},"maxTs":${e.maxTs},""" +
      s""""writeTs":${e.writeTs},"maxSeq":${e.maxSeq}}"""

  private def decode(line: String): CatEntry = {
    // fields are written in a fixed order by encode; parse positionally-safe
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
    def num(key: String, default: Long = 0L): Long = {
      val k = "\"" + key + "\":"
      val at = line.indexOf(k)
      if (at < 0) return default
      val st = at + k.length
      var i = st
      while (i < line.length && (line.charAt(i).isDigit || line.charAt(i) == '-')) i += 1
      line.substring(st, i).toLong
    }
    CatEntry(str("part"), str("file"), num("records"), num("sizeBytes"),
      num("minTs"), num("maxTs"), num("writeTs"), num("maxSeq", -1L))
  }
}

object Catalog {
  // one lock per catalog path, shared across Catalog instances in the JVM
  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]
  private[store] def lockFor(path: String): Object =
    locks.getOrElseUpdate(path, new Object)

  def apply(conf: Configuration, root: String): Catalog = {
    val p = new Path(root, "catalog.jsonl")
    new Catalog(p.getFileSystem(conf), p)
  }
}
