package graft.lql

import graft.lql.Ast.LqlException
import graft.model.Model
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SELECT's only projection: the format-template mini-language
  * (reference pkg/model/leformatter.go:63-170):
  * `{msg}` `{msg.json()}` `{ts}` `{ts.format(<go layout>)}` `{vars}`
  * `{vars:name}` plus constants; `{{`/`{}` escape literal braces.
  *
  * Compiled to a single `concat` Column — pure built-in expressions, fully
  * codegen-friendly; no UDF in the path.
  */
object FormatCompiler {

  sealed private trait Fld
  private case class FConst(s: String) extends Fld
  private case class FTs(goLayout: String) extends Fld
  private case class FMsg(json: Boolean) extends Fld
  private case class FVar(name: String) extends Fld
  private case object FVars extends Fld

  /** Default SELECT format (reference client/shell/command.go:369-371). */
  val DefaultFormat = "{msg}\n"

  /** Parse the template into fields — a direct port of the reference's
    * two-state scanner (leformatter.go:63-128), including the `{{`/`{}`
    * escape quirks. */
  private def parseTemplate(fstr: String): List[Fld] = {
    val fields = scala.collection.mutable.ListBuffer.empty[Fld]
    var state = 0
    var startIdx = 0
    var i = 0
    while (i < fstr.length) {
      val c = fstr.charAt(i)
      state match {
        case 0 =>
          if (c == '{') {
            if (i - startIdx > 0) fields += FConst(fstr.substring(startIdx, i))
            state = 1
            startIdx = i + 1
          }
        case 1 =>
          if (c == '{') {
            if (startIdx == i) state = 0
            else throw LqlException(s"""unexpected { without closing the previous one "${fstr.take(i + 1)}..."""")
          } else if (c == '}') {
            if (startIdx == i) state = 0
            else {
              val vRaw = fstr.substring(startIdx, i).trim
              val cv = vRaw.toLowerCase
              if (cv == "msg") fields += FMsg(json = false)
              else if (cv == "msg.json()") fields += FMsg(json = true)
              else if (cv == "ts") fields += FTs("2006-01-02T15:04:05Z07:00") // RFC3339
              else if (cv.startsWith("ts.format(") && vRaw.length > 10 && vRaw.last == ')')
                fields += FTs(vRaw.substring(10, vRaw.length - 1))
              else if (cv == "vars") fields += FVars
              else if (cv.startsWith("vars:") && vRaw.length > 5) fields += FVar(vRaw.substring(5))
              else throw LqlException(s"unknown field {$vRaw}. Expected values are: " +
                "{msg}, {msg.<json()>}, {vars}, {ts}, {ts.<format(ts format)>}, {vars:<tag or field name>}")
              startIdx = i + 1
              state = 0
            }
          }
      }
      i += 1
    }
    if (state != 0) throw LqlException("unexpected end of string, '}' is not found")
    if (startIdx < fstr.length) fields += FConst(fstr.substring(startIdx))
    fields.toList
  }

  /** Go time layout → java.time DateTimeFormatter pattern for the common
    * tokens (longest-first replacement, same strategy as the reference's
    * own format translation in date.go:243-251). */
  def goLayoutToJava(layout: String): String = {
    val table = Seq(
      "2006" -> "yyyy",
      "January" -> "MMMM", "Jan" -> "MMM",
      "Monday" -> "EEEE", "Mon" -> "EEE",
      ".000000000" -> ".SSSSSSSSS", ".000000" -> ".SSSSSS", ".000" -> ".SSS",
      "15" -> "HH", "03" -> "hh", "04" -> "mm", "05" -> "ss",
      "01" -> "MM", "02" -> "dd",
      "Z07:00" -> "XXX", "-07:00" -> "xxx", "-0700" -> "xx",
      "MST" -> "zz",
      "PM" -> "a", "pm" -> "a",
      "3" -> "h", "4" -> "m", "5" -> "s", "1" -> "M", "2" -> "d"
    )
    val sb = new StringBuilder
    var i = 0
    while (i < layout.length) {
      table.find { case (go, _) => layout.startsWith(go, i) } match {
        case Some((go, java)) => sb.append(java); i += go.length
        case None =>
          val c = layout.charAt(i)
          if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
          i += 1
      }
    }
    sb.toString
  }

  /** JSON string escape as a Column (reference utils.EscapeJsonStr):
    * backslash, quote and common control chars. */
  private def jsonEscape(c: Column): Column = {
    var r = regexp_replace(c, "\\\\", "\\\\\\\\")
    r = regexp_replace(r, "\"", "\\\\\"")
    r = regexp_replace(r, "\n", "\\\\n")
    r = regexp_replace(r, "\r", "\\\\r")
    regexp_replace(r, "\t", "\\\\t")
  }

  /** Compile the template to one string Column.
    *
    * @param ts Long nanoseconds column
    * @param tagLine canonical tag line (the partition value)
    * @param tags tag map column
    * @param fields fields map column
    */
  def compile(fstr: String, ts: Column, msg: Column, tagLine: Column,
              tags: Column, fields: Column): Column = {
    val parts: List[Column] = parseTemplate(fstr).map {
      case FConst(s) => lit(s)
      case FMsg(false) => msg
      case FMsg(true) => jsonEscape(msg)
      case FTs(goLayout) =>
        // ns → µs via INTEGRAL division (a double `/` would lose low bits
        // of int64 nanos); session TZ is UTC engine-wide.
        val micros = call_function("div", ts, lit(1000L))
        date_format(timestamp_micros(micros), goLayoutToJava(goLayout))
      case FVar(name) =>
        // Field value wins unless empty/missing, then the tag value
        // (leformatter.go:151-160).
        val f = coalesce(element_at(fields, name), lit(""))
        val t = coalesce(element_at(tags, name), lit(""))
        when(f =!= "", f).otherwise(t)
      case FVars =>
        val kv = Model.fieldsKvCol(fields)
        when(kv === "", tagLine).otherwise(concat(tagLine, lit(","), kv))
    }
    if (parts.isEmpty) lit("") else concat(parts: _*)
  }
}
