package graft.lql

import java.time._
import java.util.regex.Pattern

/** Interpreter for the reference's date-format mini-language
  * (reference pkg/scanner/parser/date/date.go:143-171 term table,
  * :262-313 matching): each format like `YYYY-MM-DD HH:mm:ss` compiles to a
  * locating regex plus a positional parser. Used by both the LQL datetime
  * constants (reference pkg/lql/datetime.go:29-112) and the `text` ingest
  * parser (reference pkg/scanner/parser/line_parser.go).
  */
object GoDates {

  /** A parsed date, possibly missing year/date/zone parts
    * (reference date.go:296-313 adjustYear/adjustDate). */
  final case class Parsed(
      year: Option[Int], month: Option[Int], day: Option[Int],
      hour: Int, minute: Int, second: Int, nanos: Int,
      offsetSeconds: Option[Int]) {

    /** Resolve against `now` (UTC clock) exactly like the reference:
      * time-only formats get today's date; missing year gets the current
      * year, minus one if the month is in the future (date.go:296-313). */
    def resolve(now: Instant): Instant = {
      val nowUtc = LocalDateTime.ofInstant(now, ZoneOffset.UTC)
      val (y, mo, d) =
        if (month.isEmpty) (nowUtc.getYear, nowUtc.getMonthValue, nowUtc.getDayOfMonth)
        else {
          val yy = year.getOrElse {
            if (month.get > nowUtc.getMonthValue) nowUtc.getYear - 1 else nowUtc.getYear
          }
          (yy, month.get, day.getOrElse(1))
        }
      val off = ZoneOffset.ofTotalSeconds(offsetSeconds.getOrElse(0))
      LocalDateTime.of(y, mo, d, hour, minute, second, nanos).toInstant(off)
    }
  }

  sealed private trait Term { def regex: String }
  private case object TYear4 extends Term { val regex = "[1-2]\\d{3}" }
  private case object TYear2 extends Term { val regex = "\\d{2}" }
  private case object TMonthFull extends Term { val regex = "[A-Z][a-z]{2,8}" }
  private case object TMonthAbbr extends Term { val regex = "[A-Z][a-z]{2}" }
  private case object TMonth2 extends Term { val regex = "[0-3]\\d" }
  private case object TMonth1 extends Term { val regex = "\\d{1,2}" }
  private case object TWeekdayFull extends Term { val regex = "[A-Z][a-z]{5,7}" }
  private case object TWeekdayAbbr extends Term { val regex = "[A-Z][a-z]{2}" }
  private case object TDay2 extends Term { val regex = "\\d{2}" }
  private case object TDayPad extends Term { val regex = "(?: \\d{1}|\\d{2})" }
  private case object TDay1 extends Term { val regex = "\\d{1,2}" }
  private case object THour24 extends Term { val regex = "\\d{2}" }
  private case object THour12p extends Term { val regex = "\\d{2}" }
  private case object THour12 extends Term { val regex = "\\d{1,2}" }
  private case object TMin2 extends Term { val regex = "\\d{2}" }
  private case object TMin1 extends Term { val regex = "\\d{1,2}" }
  private case object TSec2 extends Term { val regex = "\\d{2}" }
  private case object TSec1 extends Term { val regex = "\\d{1,2}" }
  private case object TFrac extends Term { val regex = "\\.\\d{3,}" }
  private case object TAmPm extends Term { val regex = "(?:am|AM|pm|PM)" }
  private case object TZoneColon extends Term { val regex = "[+-][0-9]{2}:[0-9]{2}" }
  private case object TZone4 extends Term { val regex = "[+-][0-9]{4}" }
  private case object TZoneAbbr extends Term { val regex = "[A-Z]{3}" }
  private case object TZoneZ extends Term { val regex = "Z[0-9]{2}:[0-9]{2}" }
  private final case class TLit(s: String) extends Term {
    def regex: String = Pattern.quote(s)
  }

  // Longest-first replacement order (reference date.go:141-171 comment:
  // "Descending order of the 'alike' symbols is important").
  private val termTable: Seq[(String, Term)] = Seq(
    "YYYY" -> TYear4, "YY" -> TYear2,
    "MMMM" -> TMonthFull, "MMM" -> TMonthAbbr, "MM" -> TMonth2, "M" -> TMonth1,
    "DDDD" -> TWeekdayFull, "DDD" -> TWeekdayAbbr, "DD" -> TDay2, "_D" -> TDayPad, "D" -> TDay1,
    "HH" -> THour24, "hh" -> THour12p, "h" -> THour12,
    "mm" -> TMin2, "m" -> TMin1,
    "ss" -> TSec2, "s" -> TSec1,
    ".SSS" -> TFrac, "P" -> TAmPm,
    "ZZZZZ" -> TZoneColon, "ZZZZ" -> TZone4, "ZZZ" -> TZoneAbbr, "ZZ" -> TZoneZ
  )

  private val months = Seq("january", "february", "march", "april", "may", "june",
    "july", "august", "september", "october", "november", "december")

  final class Format private[GoDates] (val frmt: String, terms: List[Term]) {
    val noDate: Boolean = !frmt.exists(c => c == 'Y' || c == 'M' || c == 'D')
    val hasYear: Boolean = !noDate && frmt.contains('Y')

    private val locator: Pattern = Pattern.compile(terms.map(_.regex).mkString)
    private val anchored: Pattern = Pattern.compile("^" + terms.map("(" + _.regex + ")").mkString + "$")

    /** Find the leftmost occurrence of this format in `s` and parse it;
      * returns the Parsed value, or None. */
    def parse(s: String): Option[Parsed] = {
      val m = locator.matcher(s)
      if (!m.find()) return None
      val am = anchored.matcher(s.substring(m.start, m.end))
      if (!am.matches()) return None

      var year, month, day = Option.empty[Int]
      var hour, minute, second, nanos = 0
      var pm = false
      var hour12 = false
      var offset = Option.empty[Int]

      terms.zipWithIndex.foreach { case (t, i) =>
        val g = am.group(i + 1)
        t match {
          case TYear4 => year = Some(g.toInt)
          case TYear2 =>
            val v = g.toInt
            year = Some(if (v >= 69) 1900 + v else 2000 + v) // Go layout "06" pivot
          case TMonthFull =>
            val idx = months.indexWhere(_.equalsIgnoreCase(g))
            if (idx < 0) return None
            month = Some(idx + 1)
          case TMonthAbbr =>
            val idx = months.indexWhere(_.take(3).equalsIgnoreCase(g))
            if (idx < 0) return None
            month = Some(idx + 1)
          case TMonth2 | TMonth1 =>
            val v = g.toInt; if (v < 1 || v > 12) return None
            month = Some(v)
          case TWeekdayFull | TWeekdayAbbr => () // validated by regex, ignored
          case TDay2 | TDay1 | TDayPad =>
            val v = g.trim.toInt; if (v < 1 || v > 31) return None
            day = Some(v)
          case THour24 =>
            val v = g.toInt; if (v > 23) return None
            hour = v
          case THour12p | THour12 =>
            val v = g.toInt; if (v < 1 || v > 12) return None
            hour = v; hour12 = true
          case TMin2 | TMin1 =>
            val v = g.toInt; if (v > 59) return None
            minute = v
          case TSec2 | TSec1 =>
            val v = g.toInt; if (v > 59) return None
            second = v
          case TFrac =>
            val digits = g.drop(1).take(9)
            nanos = (digits + "0" * (9 - digits.length)).toInt
          case TAmPm => pm = g.equalsIgnoreCase("pm")
          case TZoneColon =>
            val sign = if (g.charAt(0) == '-') -1 else 1
            offset = Some(sign * (g.substring(1, 3).toInt * 3600 + g.substring(4, 6).toInt * 60))
          case TZone4 =>
            val sign = if (g.charAt(0) == '-') -1 else 1
            offset = Some(sign * (g.substring(1, 3).toInt * 3600 + g.substring(3, 5).toInt * 60))
          case TZoneAbbr =>
            // Named zone abbreviations resolve to UTC, like Go's
            // time.Parse with an unloadable zone name.
            offset = Some(0)
          case TZoneZ =>
            offset = Some(g.substring(1, 3).toInt * 3600 + g.substring(4, 6).toInt * 60)
          case TLit(_) => ()
        }
      }
      if (hour12) {
        if (pm && hour != 12) hour += 12
        if (!pm && hour == 12) hour = 0
      }
      Some(Parsed(year, month, day, hour, minute, second, nanos, offset))
    }
  }

  /** Tokenize a format string into terms via longest-first replacement. */
  def compile(frmt: String): Format = {
    val terms = scala.collection.mutable.ListBuffer.empty[Term]
    val lit = new StringBuilder
    var i = 0
    while (i < frmt.length) {
      termTable.find { case (name, _) => frmt.startsWith(name, i) } match {
        case Some((name, t)) =>
          if (lit.nonEmpty) { terms += TLit(lit.toString); lit.clear() }
          terms += t
          i += name.length
        case None =>
          lit.append(frmt.charAt(i)); i += 1
      }
    }
    if (lit.nonEmpty) terms += TLit(lit.toString)
    new Format(frmt, terms.toList)
  }

  /** The LQL datetime format table (reference pkg/lql/datetime.go:29-112). */
  val lqlFormats: Seq[Format] = Seq(
    "MMM D, YYYY h:mm:ss P",
    "DDD MMM _D HH:mm:ss YYYY",
    "DDD MMM _D HH:mm:ss MST YYYY",
    "DDD MMM DD HH:mm:ss ZZZZ YYYY",
    "DDDD, YY-MMM-DD HH:mm:ss ZZZ",
    "DDD, DD MMM YYYY HH:mm:ss ZZZ",
    "DDD, DD MMM YYYY HH:mm:ss ZZZZ",
    "DDD, D MMM YYYY HH:mm:ss ZZZZ",
    "DD MMM YYYY, HH:mm",
    "YYYY-MMM-DD",
    "DD MMMM YYYY",
    "DD/MM/YYYY HH:mm:ss.SSS",
    "DD/MM/YYYY HH:mm:ss",
    "D/MM/YYYY HH:mm:ss",
    "DD/M/YYYY HH:mm:ss",
    "D/M/YYYY HH:mm:ss",
    "D/M/YYYY hh:mm:ss P",
    "DD/MM/YYYY HH:mm",
    "D/M/YYYY HH:mm",
    "D/M/YY HH:mm",
    "D/M/YYYY hh:mm P",
    "D/M/YYYY h:mm P",
    "DD/MMM/YYYY:HH:mm:ss ZZZZ",
    "DD/MM/YYYY",
    "D/MM/YYYY",
    "DD/MM/YY",
    "D/M/YY",
    "YYYY/MM/DD HH:mm:ss.SSS",
    "YYYY/MM/DD HH:mm:ss",
    "YYYY/MM/D HH:mm:ss",
    "YYYY/M/DD HH:mm:ss",
    "YYYY/MM/DD HH:mm",
    "YYYY/M/D HH:mm",
    "YYYY/MM/DD",
    "YYYY/M/DD",
    "YYYY-MM-DDTHH:mm:ss.SSSZZZZ",
    "YYYY-MM-DDTHH:mm:ss.SSSZ",
    "YYYY-MM-DDTHH:mm:ssZZZZZ",
    "YYYY-MM-DDTHH:mm:ssZZZZ",
    "YYYY-MM-DDTHH:mm:ssZ",
    "YYYY-MM-DDTHH:mm:ss",
    "YYYY-MM-DD HH:mm:ss.SSS ZZZZ ZZZ",
    "YYYY-MM-DD HH:mm:ss.SSS ZZZZ",
    "YYYY-MM-DD HH:mm:ss ZZZZZ",
    "YYYY-MM-DD HH:mm:ssZZZZZ",
    "YYYY-MM-DD HH:mm:ss ZZZZ ZZZ",
    "YYYY-MM-DD HH:mm:ss ZZZZ",
    "YYYY-MM-DD HH:mm:ss ZZZ",
    "YYYY-MM-DD hh:mm:ss P",
    "YYYY-MM-DD HH:mm:ss",
    "YYYY-MM-DD  HH:mm:ss",
    "YYYY-MM-DD HH:mm",
    "YYYY-MM-DD",
    "MM.DD.YYYY",
    "MM.DD.YY",
    "DDD MMM _D HH:mm:ss.SSS",
    "DDD MMM DD HH:mm:ss.SSS",
    "MMM DD HH:mm:ss",
    "MMM _D HH:mm:ss",
    "HH:mm:ss.SSS ZZZZ",
    "HH:mm:ss ZZZZ",
    "HH:mm ZZZZ",
    "HH:mm:ss.SSS ZZZ",
    "HH:mm:ss ZZZ",
    "HH:mm ZZZ",
    "HH:mm:ss.SSS",
    "HH:mm:ss",
    "HH:mm"
  ).map(compile)

  /** The scanner's default format list is identical (reference
    * date.go:68-141 KnownFormats == the lql list). */
  val knownFormats: Seq[Format] = lqlFormats

  /** Parse a date with the given formats, leftmost match of the first
    * matching format; resolve missing parts against `now`. */
  def parseWith(formats: Seq[Format], s: String, now: Instant): Option[Instant] =
    formats.iterator.flatMap(f => f.parse(s).map(_.resolve(now))).nextOption()
}

/** LQL datetime constants: absolute (format table), relative (`-1.5h`),
  * specials (`minute|hour|day|week`), or raw unix nanos
  * (reference pkg/lql/datetime.go:114-213). The clock is injectable so
  * tests can pin `now`.
  */
final class LqlDateTime(now: () => Instant) {

  /** Returns epoch nanos. */
  def parse(dt0: String): Either[String, Long] = {
    val dt = dt0.trim.toLowerCase
    parseRelative(dt)
      .orElse(parseSpecial(dt))
      .orElse {
        // The reference lowercases before the format table
        // (datetime.go:139), which can never match the case-sensitive
        // month/`T` regexes; we additionally try the original casing so
        // ISO-`T` and month-name forms behave as documented.
        GoDates.parseWith(GoDates.lqlFormats, dt0.trim, now())
          .orElse(GoDates.parseWith(GoDates.lqlFormats, dt, now()))
          .map(i => i.getEpochSecond * 1000000000L + i.getNano)
      }
      .orElse(dt.toLongOption)
      .toRight(s"""could not parse value "$dt0" as relative or absolute timestamp""")
  }

  /** `-<float>(m|h|d)` → now minus duration (datetime.go:163-188). */
  private def parseRelative(dt: String): Option[Long] = {
    if (dt.isEmpty || dt.charAt(0) != '-') return None
    val unitNs: Long = dt.last match {
      case 'm' => 60L * 1000000000L
      case 'h' => 3600L * 1000000000L
      case 'd' => 24L * 3600L * 1000000000L
      case _   => return None
    }
    val body = dt.substring(1, dt.length - 1)
    // Go strconv.ParseFloat rejects surrounding/inner whitespace
    // (" - 1234 h" and "-1234 h" are errors, datetime_test.go:36-44);
    // Scala's toDoubleOption would silently trim it.
    if (body != body.trim || body.isEmpty) return None
    body.toDoubleOption.map { v =>
      val n = now()
      n.getEpochSecond * 1000000000L + n.getNano - (v * unitNs).toLong
    }
  }

  /** minute|hour|day|week (datetime.go:191-213). Note the reference's
    * `minute` subtracts whole seconds but keeps sub-second nanos — kept. */
  private def parseSpecial(dt: String): Option[Long] = {
    val n = now()
    val nowNs = n.getEpochSecond * 1000000000L + n.getNano
    val utc = LocalDateTime.ofInstant(n, ZoneOffset.UTC)
    val secNs = 1000000000L
    dt match {
      case "minute" => Some(nowNs - utc.getSecond * secNs)
      case "hour"   => Some(nowNs - utc.getMinute * 60L * secNs - utc.getSecond * secNs - utc.getNano)
      case "day"    => Some(nowNs - utc.getHour * 3600L * secNs - utc.getMinute * 60L * secNs - utc.getSecond * secNs - utc.getNano)
      case "week"   =>
        val wd = utc.getDayOfWeek.getValue % 7 // Go Weekday: Sunday=0
        val h = utc.getHour + 24L * wd
        Some(nowNs - h * 3600L * secNs - utc.getMinute * 60L * secNs - utc.getSecond * secNs - utc.getNano)
      case _ => None
    }
  }
}
