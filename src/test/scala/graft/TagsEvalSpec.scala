package graft

import graft.lql.{Parser, TagsCompiler}
import graft.model.Model
import org.scalatest.funsuite.AnyFunSuite

import java.time.Instant

/** The reference's FROM/tags predicate table (reference
  * pkg/lql/tagseval_test.go:38-55) against [[TagsCompiler]].
  */
class TagsEvalSpec extends AnyFunSuite {

  private val parser = new Parser(() => Instant.parse("2024-03-15T10:30:45.500Z"))

  private val tagSet: Map[String, String] =
    Model.parseTags("name=app1,ip=1.2.3.4,ttt=ddfe").toOption.get

  private def check(exp: String, expected: Boolean): Unit = {
    val src = parser.parseSource(exp).fold(m => fail(s"'$exp' should parse: $m"), identity)
    val pred = TagsCompiler.compile(Some(src))
    assert(pred(tagSet) == expected, s"'$exp' over $tagSet")
  }

  private val table = Seq(
    "{a=b}" -> false,
    "{name=\"app1\"}" -> true,
    "{ip=1.2.3.4,name=app1}" -> true,
    "{name=app1,ip=1.2.3.4}" -> true,
    "{name=app1,ip=1.2.3.4,ttt=ddfe}" -> true,
    "{name=app1,ip=1.2.3.4,ttt=ddeefe}" -> false,
    "name=app1" -> true,
    "name=app1 and ip like '1*'" -> true,
    "name=APP1" -> false,
    "Upper(name) = APP1" -> true,
    "Lower(name) = app1" -> true,
    "name=app13 or ip=\"1.2.3.4\"" -> true,
    "name=app13 or name=app14 or ttt=ddfe" -> true,
    "c=''" -> true // missing tag compares as ""
  )

  table.foreach { case (exp, expected) =>
    test(s"$exp -> $expected") { check(exp, expected) }
  }

  test("subset match is not equality") {
    // {a=1} matches a partition {a=1,b=2} (reference tags.go:100-103)
    val sup = Map("a" -> "1", "b" -> "2")
    assert(Model.subsetOf(Map("a" -> "1"), sup))
    assert(!Model.subsetOf(Map("a" -> "1", "c" -> "3"), sup))
    assert(Model.subsetOf(Map.empty, sup))
  }

  test("comparisons are lexicographic on strings, never numeric") {
    val t = Map("v" -> "9")
    def pred(e: String) =
      TagsCompiler.compile(Some(parser.parseSource(e).toOption.get))
    assert(pred("v > '10'")(t))  // "9" > "10" lexicographically
    assert(!pred("v < '10'")(t))
  }
}
