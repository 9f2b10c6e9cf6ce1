package graft

import graft.lql.{Glob, GoDates, LqlDateTime}
import org.scalatest.funsuite.AnyFunSuite

/** Robustness fuzz over the remaining free-text input surfaces: every
  * parser must reject bad input through its typed channel
  * (Either/Option), never by escaping with an arbitrary exception.
  */
class InputFuzzSpec extends AnyFunSuite {

  private def soup(rnd: scala.util.Random, vocab: Seq[String], n: Int): String =
    Seq.fill(1 + rnd.nextInt(n))(vocab(rnd.nextInt(vocab.size))).mkString

  test("fuzz: datetime parsing never throws on random datetime-ish strings") {
    val rnd = new scala.util.Random(31)
    val dates = new LqlDateTime(() => java.time.Instant.parse("2024-01-15T12:00:00Z"))
    val vocab = Seq("2024", "-", ":", ".", "/", " ", "T", "Z", "+", "07",
      "13", "99", "0", "m", "h", "d", "w", "minute", "day", "ns",
      "999999999999999999999", "é", "\\", "'")
    for (_ <- 1 to 800) {
      val s = soup(rnd, vocab, 8)
      try {
        dates.parse(s)
        GoDates.parseWith(GoDates.knownFormats, s,
          java.time.Instant.parse("2024-01-15T12:00:00Z"))
      } catch {
        case e: Throwable =>
          fail(s"datetime parse threw ${e.getClass.getSimpleName} on '$s'")
      }
    }
  }

  test("fuzz: Glob.toRegex never throws, and produced regexes compile") {
    val rnd = new scala.util.Random(57)
    val vocab = Seq("*", "?", "[", "]", "[a-z]", "[^x]", "\\", "a", "b",
      ".", "(", ")", "{", "}", "-", "^", "$", "é")
    for (_ <- 1 to 800) {
      val g = soup(rnd, vocab, 8)
      try Glob.toRegex(g) match {
        case Right(re) => java.util.regex.Pattern.compile(re) // must be valid
        case Left(_) => () // typed rejection is fine
      } catch {
        case e: Throwable =>
          fail(s"Glob '$g' -> ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
  }
}
