package graft

import graft.lql.Ast._
import graft.lql.Parser
import org.scalatest.funsuite.AnyFunSuite

import java.time.Instant

/** The reference's parser conformance corpus (reference
  * pkg/lql/parser_test.go:31-83) as a parse → render → parse → render
  * fixpoint property (testOk, parser_test.go:194-210).
  */
class ParserRoundTripSpec extends AnyFunSuite {

  // nano-rich clock: rendered datetimes print a ≥3-digit fraction, which is
  // what the reference's frac regex `.\d{3,}` (date.go:164) can re-parse —
  // trailing-zero fractions are a latent no-round-trip edge in the
  // reference too (Go time.String() trims them)
  private val clock = () => Instant.parse("2024-03-15T10:30:45.123456789Z")
  private val parser = new Parser(clock)

  private def ok(lql: String): Lql = {
    val l = parser.parse(lql).fold(m => fail(s"'$lql' should parse, got: $m"), identity)
    val l2 = parser.parse(l.render).fold(
      m => fail(s"rendered '${l.render}' of '$lql' should re-parse, got: $m"), identity)
    assert(l.render == l2.render, s"round-trip of '$lql' not stable")
    l
  }

  private val corpus = Seq(
    """select "all"""",
    "select limit 100",
    """select "all" limit 100""",
    "select offset 123 ",
    "select 'format-%ts-%pod' limit 100",
    "select 'format-%ts-%pod' position tail limit 100",
    "select 'format-%ts-%pod' position 'head' limit 100",
    "select position head limit 100",
    "select position asdf limit 100",
    "select position 'hasdf123' limit 100",
    "select WHERE NOT a='1234' limit 100",
    "select WHERE NOT (a=\"12\\\\'34\" AND c=abc) limit 100",
    "select WHERE NOT a='1234' AND c=abc limit 100",
    "select WHERE NOT a='1234' AND not c=abc limit 100",
    "select WHERE (NOT (a='1234' AND c=abc)) or x=123 limit 100",
    "select WHERE (NOT (a='1234' AND c=abc)) or not x=123 limit 100",
    "select WHERE (NOT (a='1234' AND c=abc)) or not (x=123) limit 100",
    "select WHERE (NOT (a='1234' AND c=abc)) or not (x=123 or c = abc) limit 100",
    "select WHERE a='1234' AND bbb>=adfadf234798 or xxx = yyy limit 100",
    "select WHERE a='1234' AND bbb like 'adfadf234798*' or xxx = yyy limit 10",
    "SELECT from a=b OR b contains 'r' WHERE filename=\"system.log\" or filename=\"wifi.log\" OFFSET 0 LIMIT -1",
    "SELECT From a=b AND c=d WHERE filename=\"system.log\" or filename=\"wifi.log\" OFFSET 0 LIMIT -1",
    """SELECT FROM a>b WHERE from='this is tag value' or filename="wifi.log" OFFSET 0 LIMIT -1""",
    """SELECT Range "2019-03-11 12:34:43"""",
    """SELECT Range "-1.0m"""",
    """SELECT Range [:"-1.0m"]""",
    """SELECT Range ["minute":"-1.0m"]""",
    "show PARTITIONS",
    """SHOW PARTITIONs from1="abc"""",
    """SHOW PARTITIONs from1="abc" offset 10""",
    """SHOW PARTITIONs from1="abc" offset 10 limit 1""",
    "SHOW PARTITIONs offset 10 limit 1",
    "SHOW PARTITIONs limit 1",
    "SHOW pipes",
    "SHOW Pipes offset 10 limit 1",
    "SHOW Pipes offset 10",
    "SHOW Pipes limit 1",
    "create Pipe asb",
    "create Pipe aaa from {a=1,b=2}",
    "create Pipe aaa from a=1 or b=2 where ts=1",
    "create Pipe aaa where ts=1",
    "describe partition {fff=aaa}",
    "describe partition {file=anme,c=d}",
    "describe pipe aaa",
    "delete pipe aaa",
    "truncate",
    "truncate {fff=aaa}",
    "truncate file=anme AND c=d minsize 3G maxsize 20 ",
    "truncate dryrun {fff=aaa} before '2019-03-11 12:34:43'",
    "truncate dryrun {fff=aaa} before '2019-03-11 12:34:43' maxdbsize 13G",
    "truncate dryrun maxdbsize 13G"
  )

  corpus.foreach { lql =>
    test(s"round-trip: $lql") { ok(lql) }
  }

  test("params are captured (reference TestParams)") {
    ok("Select 'abc' where a = '123' position tail offset -10 limit 13") match {
      case s: Select =>
        assert(s.format.contains("abc"))
        assert(s.position.contains("tail"))
        assert(s.offset.contains(-10L))
        assert(s.limit.contains(13L))
      case other => fail(s"expected Select, got $other")
    }
  }

  test("quoted and bare positions (reference TestPosition)") {
    val posId = "AAAABXNyY0lkAAAE0gAAAAAAAeIqAAAAGHNyYzEyMzQ3OUAkJV8gQTIzNEF6cUlkMgAAAA4AAAAAAAAE0g=="
    ok(s"Select 'abc' where a = '123' position '$posId' offset -10 limit 13") match {
      case s: Select => assert(s.position.contains(posId))
      case other     => fail(s"expected Select, got $other")
    }
    ok("Select 'abc' where a = '123' position 'tail' offset -10 limit 13") match {
      case s: Select => assert(s.position.contains("tail"))
      case other     => fail(s"expected Select, got $other")
    }
  }

  test("tags sources parse (reference TestParseTagsSource)") {
    assert(parser.parseSource("""{ asdfd="sf ,\\=df" , d=d }""").isRight)
    assert(parser.parseSource("""{asdfd="sf,\\=df",c="",b=12\34.1234.1324.1234,d=asdf}""").isRight)
    parser.parseSource("a = b and c like 'asdf*'") match {
      case Right(ExprSource(_)) => ()
      case other                => fail(s"expected expression source, got $other")
    }
  }

  test("where expression parses (reference TestParseWhere)") {
    assert(parser.parseExpr("a=adsf and b=adsf").isRight)
  }

  test("condition render round-trips (reference TestConditionString)") {
    Seq("a like 123", """a like '12"3'""", "a=b", "a=bcd").foreach { c =>
      val e1 = parser.parseExpr(c).fold(m => fail(s"'$c': $m"), identity)
      val e2 = parser.parseExpr(e1.render).fold(m => fail(s"'${e1.render}': $m"), identity)
      assert(e1.render == e2.render)
    }
  }

  test("range bounds land in the right slots (reference TestParsingRange)") {
    def rangeOf(lql: String): TimeRange = ok(lql) match {
      case s: Select => s.range.getOrElse(fail(s"no range in $lql"))
      case other     => fail(s"expected Select, got $other")
    }
    val r1 = rangeOf("""SELECT range "-123.3m"""")
    assert(r1.t1.nonEmpty && r1.t2.isEmpty)
    val r2 = rangeOf("""SELECT range [:"-123.3m"]""")
    assert(r2.t1.isEmpty && r2.t2.nonEmpty)
    val r3 = rangeOf("""SELECT range ["-23h":"-123.3m"]""")
    assert(r3.t1.nonEmpty && r3.t2.nonEmpty)
  }

  test("garbage statements are rejected") {
    Seq("", "grant all", "select limit", "describe", "show", "create pipe",
      "truncate minsize", "select range []").foreach { bad =>
      assert(parser.parse(bad).isLeft, s"'$bad' should not parse")
    }
  }

  test("fuzz: random token soup never escapes as a non-parse exception") {
    val rnd = new scala.util.Random(97)
    val vocab = Seq("select", "show", "describe", "truncate", "create",
      "delete", "pipe", "partitions", "from", "range", "where", "position",
      "offset", "limit", "and", "or", "not", "contains", "like", "prefix",
      "suffix", "upper", "lower", "msg", "ts", "fields:app", "head", "tail",
      "{name=x}", "{", "}", "(", ")", "[", "]", ":", ",", "=", "!=", "<",
      ">", "<=", ">=", "'a b'", "\"q\"", "10m", "-3.5d", "minute", "1G",
      "*", "???", "\\", "0x12", "9999999999999999999999", "éµ")
    for (round <- 1 to 500) {
      val stmt = Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
      try parser.parse(stmt) // Left(...) is fine; throwing is the bug
      catch {
        case e: Throwable =>
          fail(s"parser threw ${e.getClass.getSimpleName} on '$stmt': ${e.getMessage}")
      }
    }
  }
}
