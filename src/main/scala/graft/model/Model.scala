package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.immutable.SortedMap

/** The canonical record of the engine.
  *
  * Mirrors the reference's LogEvent (reference pkg/model/logevent.go:24-35):
  * an int64-nanosecond timestamp, a message and per-record string fields.
  * Tags are constant per partition and live in the partition key (the
  * canonical sorted tag line), exactly like the reference keys journals by
  * tag line (reference pkg/tindex/inmem.go:36-66).
  */
final case class LogEvent(
    ts: Long,                  // nanoseconds since epoch
    msg: String,
    fields: Map[String, String])

object Model {

  /** Canonical storage schema — the one table every operator reads/writes.
    * `part` is the canonical sorted tag line and the physical partition
    * column; `seq` is a monotonic per-ingest record index used as the
    * deterministic tie-break of the total order (ts, part, seq), standing in
    * for the reference's journal append order
    * (reference pkg/model/mixer.go:47-49 prefers the left/earlier source on
    * ts ties).
    */
  val schema: StructType = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("msg", StringType, nullable = false),
    StructField("fields", MapType(StringType, StringType), nullable = true),
    StructField("seq", LongType, nullable = false),
    StructField("part", StringType, nullable = false)
  ))

  // ---------------------------------------------------------------------
  // Go strconv.Quote / Unquote (the subset the reference can produce in tag
  // lines and kv-strings; reference pkg/model/tag/tags.go:168-171 quotes a
  // value when it is empty or contains '=' or ',').
  // ---------------------------------------------------------------------

  def goQuote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c >= ' ' && c < 0x7f => sb.append(c)
      case c if c < 0x100 => sb.append(f"\\x$c%02x")
      case c => sb.append(f"\\u$c%04x")
    }
    sb.append('"')
    sb.toString
  }

  def goUnquote(s: String): String = {
    if (s.length < 2 || s.head != '"' || s.last != '"') return s
    val body = s.substring(1, s.length - 1)
    val sb = new StringBuilder(body.length)
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '\\' && i + 1 < body.length) {
        body.charAt(i + 1) match {
          case '"'  => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'x' if i + 3 < body.length =>
            sb.append(Integer.parseInt(body.substring(i + 2, i + 4), 16).toChar); i += 4
          case 'u' if i + 5 < body.length =>
            sb.append(Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar); i += 6
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** True iff the value must be quoted inside a tag line
    * (reference pkg/model/tag/tags.go:168-170: empty, or contains '=' / ','). */
  private def needsTagQuote(v: String): Boolean =
    v.isEmpty || v.indexOf('=') >= 0 || v.indexOf(',') >= 0

  // ---------------------------------------------------------------------
  // Tag lines
  // ---------------------------------------------------------------------

  /** Canonical tag line: keys sorted ascending, `k=v` joined by ',', values
    * Go-quoted when empty or containing '=' or ','
    * (reference pkg/model/tag/tags.go:147-175). */
  def tagLine(tags: Map[String, String]): String =
    SortedMap.from(tags).iterator
      .map { case (k, v) => k + "=" + (if (needsTagQuote(v)) goQuote(v) else v) }
      .mkString(",")

  /** Parse a tag set string, with or without curly braces, into a map.
    * Mirrors reference pkg/utils/kvstring/kvstring.go ToMap/SplitString:
    * '='/',' separators must alternate, quoted values may contain either,
    * keys must be non-empty, keys/values are space-trimmed. */
  def parseTags(s0: String): Either[String, Map[String, String]] = {
    // RemoveCurlyBraces (kvstring.go:33-66)
    var s = s0.trim
    if (s.startsWith("{")) {
      if (!s.endsWith("}")) return Left(s"improperly formatted tags string $s0")
      s = s.substring(1, s.length - 1).trim
    } else if (s.endsWith("}")) return Left(s"improperly formatted tags string $s0")
    if (s.isEmpty) return Right(Map.empty)

    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var inStr = false
    var expectKv = true // next separator must be '='
    var st = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') inStr = !inStr
      else if (c == '\\' && inStr) i += 1
      else if ((c == '=' || c == ',') && !inStr) {
        val expected = if (expectKv) '=' else ','
        if (c != expected) return Left(s"unexpected separator at $i of $s")
        expectKv = !expectKv
        parts += s.substring(st, i)
        st = i + 1
      }
      i += 1
    }
    if (inStr) return Left(s"unexpected end of string $s: quotation is not closed")
    parts += s.substring(st)
    if ((parts.length & 1) == 1) return Left("the tag must be a pair of <key>=<value>")
    val b = Map.newBuilder[String, String]
    var j = 0
    while (j < parts.length) {
      val k = parts(j).trim
      val vRaw = parts(j + 1).trim
      if (k.isEmpty) return Left(s"tag name could not be empty (value=$vRaw)")
      val v = if (vRaw.startsWith("\"")) goUnquote(vRaw) else vRaw
      b += k -> v
      j += 2
    }
    Right(b.result())
  }

  /** Subset check: all tags of `sub` present with equal values in `sup`
    * (reference pkg/model/tag/tags.go:100-103 — FROM {tags} is a subset
    * match, NOT equality). */
  def subsetOf(sub: Map[String, String], sup: Map[String, String]): Boolean =
    sub.forall { case (k, v) => sup.get(k).contains(v) }

  // ---------------------------------------------------------------------
  // Fields kv-string
  // ---------------------------------------------------------------------

  /** Fields as `k=v,k2=v2` preserving entry order, values Go-quoted when
    * they contain ',' or '=' (reference pkg/model/field/field.go:213-236 —
    * note: keys are never quoted and, unlike tag lines, empty values stay
    * unquoted). */
  def fieldsKvString(fields: Seq[(String, String)]): String =
    fields.iterator.map { case (k, v) =>
      k + "=" + (if (v.indexOf(',') >= 0 || v.indexOf('=') >= 0) goQuote(v) else v)
    }.mkString(",")

  /** Column form of [[fieldsKvString]] over a MapType(String,String) column.
    * Preserves map entry order (Spark keeps insertion order of map values).
    * Quoting covers the separators plus backslash/quote escapes — the
    * values the engine stores are parser-produced strings, so control
    * characters are already normalized at ingest.
    */
  def fieldsKvCol(fields: Column): Column = {
    val rendered = transform(map_entries(fields), e => {
      val k = e.getField("key")
      val v = e.getField("value")
      val escaped = regexp_replace(regexp_replace(v, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
      val quoted = concat(lit("\""), escaped, lit("\""))
      concat(k, lit("="), when(v.contains(",") || v.contains("="), quoted).otherwise(v))
    })
    when(fields.isNull, lit("")).otherwise(array_join(rendered, ","))
  }

  /** Column form of [[tagLine]] over a MapType(String,String) column:
    * sorted keys, quote-when-needed (empty/','/'='). */
  def tagLineCol(tags: Column): Column = {
    val entries = array_sort(map_entries(tags)) // sorts by key (first struct field)
    val rendered = transform(entries, e => {
      val k = e.getField("key")
      val v = e.getField("value")
      val escaped = regexp_replace(regexp_replace(v, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
      val quoted = concat(lit("\""), escaped, lit("\""))
      concat(k, lit("="), when(v === "" || v.contains(",") || v.contains("="), quoted).otherwise(v))
    })
    when(tags.isNull, lit("")).otherwise(array_join(rendered, ","))
  }
}
