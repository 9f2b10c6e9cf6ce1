package graft

import graft.lql.LqlDateTime
import org.scalatest.funsuite.AnyFunSuite

import java.time.Instant

/** The reference's datetime corpus (reference pkg/lql/datetime_test.go)
  * against a pinned clock — exact-value assertions instead of the Go test's
  * now-window checks.
  *
  * Pinned now = 2024-03-15T10:30:45.5Z (a Friday).
  */
class DateTimeSpec extends AnyFunSuite {

  private val now = Instant.parse("2024-03-15T10:30:45.500Z")
  private val nowNs = now.getEpochSecond * 1000000000L + now.getNano
  private val dt = new LqlDateTime(() => now)

  private def ns(iso: String): Long = {
    val i = Instant.parse(iso)
    i.getEpochSecond * 1000000000L + i.getNano
  }

  private def parsed(s: String): Long =
    dt.parse(s).fold(m => fail(s"'$s' should parse: $m"), identity)

  // --- relative (reference TestParseRalativeDateTime) --------------------

  test("relative: rejects inner spaces") {
    assert(dt.parse(" - 1234 h").isLeft)
    assert(dt.parse(" -1234 h").isLeft)
  }

  test("relative minutes/hours/days resolve to now minus duration") {
    assert(parsed("-0.01m") == nowNs - 600000000L)          // 0.6 s
    assert(parsed("-1m") == nowNs - 60L * 1000000000L)
    assert(parsed("-1.9m") == nowNs - 114L * 1000000000L)
    assert(parsed("-2.1m") == nowNs - 126L * 1000000000L)
    assert(parsed("-1.1h") == nowNs - 3960L * 1000000000L)
    assert(parsed("-5.5d") == nowNs - (5.5 * 86400).toLong * 1000000000L)
  }

  // --- specials (reference TestParseConstantsDateTime semantics) ----------

  test("minute = start of current minute (sub-second nanos kept, as the reference does)") {
    assert(parsed("minute") == ns("2024-03-15T10:30:00.500Z"))
  }
  test("hour = start of current hour") {
    assert(parsed("hour") == ns("2024-03-15T10:00:00Z"))
  }
  test("day = start of current day") {
    assert(parsed("day") == ns("2024-03-15T00:00:00Z"))
  }
  test("week = start of current week, weeks start Sunday (Go Weekday)") {
    assert(parsed("week") == ns("2024-03-10T00:00:00Z"))
  }
  test("specials are case-insensitive and trimmed (reference TestParseLqlDateTime)") {
    assert(parsed(" minute ") == parsed("minute"))
    assert(parsed(" HOUR ") == parsed("hour"))
    assert(parsed("Day") == parsed("day"))
  }

  // --- absolute formats ----------------------------------------------------

  test("full datetime with zone offset") {
    assert(parsed("2019-01-01 22:25:34 -0700") == ns("2019-01-02T05:25:34Z"))
  }
  test("datetime without zone is UTC") {
    assert(parsed("2019-03-11 12:34:43") == ns("2019-03-11T12:34:43Z"))
  }
  test("time-only forms resolve to today's date (reference adjustDate)") {
    assert(parsed("22:25 -0700") == ns("2024-03-16T05:25:00Z"))
    assert(parsed("22:25 +0700") == ns("2024-03-15T15:25:00Z"))
    assert(parsed("22:25:34.534 -0700") == ns("2024-03-16T05:25:34.534Z"))
  }
  test("date-only forms") {
    assert(parsed("2019-03-11") == ns("2019-03-11T00:00:00Z"))
    assert(parsed("11/03/2019 12:00:00") == ns("2019-03-11T12:00:00Z")) // DD/MM/YYYY
  }
  test("ISO-T form") {
    assert(parsed("2019-03-11T12:34:43") == ns("2019-03-11T12:34:43Z"))
  }
  test("missing year resolves to current year, previous year when month is ahead") {
    // March 15 now: "Mar 11" is this year; a future month rolls back a year
    assert(parsed("Mar 11 08:00:00") == ns("2024-03-11T08:00:00Z"))
    assert(parsed("Dec 11 08:00:00") == ns("2023-12-11T08:00:00Z"))
  }

  // --- raw nanos -----------------------------------------------------------

  test("bare int64 is unix nanos") {
    assert(parsed("1552307683000000000") == 1552307683000000000L)
    assert(parsed("123") == 123L)
  }

  test("unparsable input errors") {
    assert(dt.parse("not a date at all").isLeft)
    assert(dt.parse("").isLeft)
  }
}
