package graft.store

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** Partitions catalog — the Spark analogue of the reference's tag index
  * (reference pkg/tindex/inmem.go:36-66) plus per-chunk stats
  * (reference pkg/partition/partition.go:353-403): one entry per parquet
  * file with record count, byte size and the min/max `ts` taken from the
  * parquet footer at ingest time (metadata-only; the data is never re-read).
  *
  * Persisted as a JSON-lines file under the store root. The catalog is tiny
  * (partitions × files), driver-resident, and rewritten atomically — at the
  * 100 TB design point this would be a Delta/metastore table, but the access
  * pattern (prune first, then scan) is the same.
  */
final case class CatEntry(
    part: String,      // canonical tag line
    file: String,      // absolute file path
    records: Long,
    sizeBytes: Long,
    minTs: Long,
    maxTs: Long,
    writeTs: Long)     // wall-clock ns when the entry was added (ingest order)

final class Catalog(fs: FileSystem, path: Path) {

  def load(): Vector[CatEntry] = {
    if (!fs.exists(path)) return Vector.empty
    val in = fs.open(path)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    txt.linesIterator.filter(_.nonEmpty).map(decode).toVector
  }

  def save(entries: Seq[CatEntry]): Unit = {
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(entries.map(encode).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(path)) fs.delete(path, false)
    fs.rename(tmp, path)
  }

  def append(newEntries: Seq[CatEntry]): Unit = save(load() ++ newEntries)

  // minimal JSON codec (flat record of strings/longs; no external deps)
  private def esc(s: String) = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  }
  private def encode(e: CatEntry): String =
    s"""{"part":"${esc(e.part)}","file":"${esc(e.file)}","records":${e.records},""" +
      s""""sizeBytes":${e.sizeBytes},"minTs":${e.minTs},"maxTs":${e.maxTs},"writeTs":${e.writeTs}}"""

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
    def num(key: String): Long = {
      val k = "\"" + key + "\":"
      val st = line.indexOf(k) + k.length
      var i = st
      while (i < line.length && (line.charAt(i).isDigit || line.charAt(i) == '-')) i += 1
      line.substring(st, i).toLong
    }
    CatEntry(str("part"), str("file"), num("records"), num("sizeBytes"),
      num("minTs"), num("maxTs"), num("writeTs"))
  }
}

object Catalog {
  def apply(conf: Configuration, root: String): Catalog = {
    val p = new Path(root, "catalog.jsonl")
    new Catalog(p.getFileSystem(conf), p)
  }
}
