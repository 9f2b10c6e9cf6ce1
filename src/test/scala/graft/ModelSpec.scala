package graft

import graft.model.Model
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Tag-line canonicalization, tag parsing and kv-string rendering
  * (reference pkg/model/tag/tags.go:147-175, pkg/utils/kvstring,
  * pkg/model/field/field.go:213-236), including a scalacheck round-trip
  * property over adversarial values.
  */
class ModelSpec extends AnyFunSuite {

  test("tag line sorts keys and joins with ','") {
    assert(Model.tagLine(Map("b" -> "2", "a" -> "1")) == "a=1,b=2")
  }

  test("values with '=' ',' or empty are quoted (reference tags.go:168-170)") {
    assert(Model.tagLine(Map("a" -> "x=y")) == "a=\"x=y\"")
    assert(Model.tagLine(Map("a" -> "x,y")) == "a=\"x,y\"")
    assert(Model.tagLine(Map("a" -> "")) == "a=\"\"")
    assert(Model.tagLine(Map("a" -> "plain")) == "a=plain")
  }

  test("parseTags handles braces, spaces and quoted values") {
    assert(Model.parseTags("{a=1,b=2}") == Right(Map("a" -> "1", "b" -> "2")))
    assert(Model.parseTags(" a = 1 , b = 2 ") == Right(Map("a" -> "1", "b" -> "2")))
    assert(Model.parseTags("""a="x,y",b=2""") == Right(Map("a" -> "x,y", "b" -> "2")))
    assert(Model.parseTags("""a="x=y"""") == Right(Map("a" -> "x=y")))
  }

  test("parseTags rejects malformed input") {
    assert(Model.parseTags("{a=1").isLeft)         // unbalanced brace
    assert(Model.parseTags("a").isLeft)            // no value
    assert(Model.parseTags("=1").isLeft)           // empty key
    assert(Model.parseTags("a=1,b").isLeft)        // odd pair
    assert(Model.parseTags("""a="unclosed""").isLeft)
  }

  test("tag values containing '+' survive the round trip (store path-escape regression)") {
    val m = Map("v" -> "1+2", "w" -> "a b")
    assert(Model.parseTags(Model.tagLine(m)) == Right(m))
  }

  private val keyGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  // The reference quotes a tag value only when it is empty or contains
  // '='/',' (tags.go:168-170) — values containing '"' or '\' therefore
  // don't survive its own line→parse round trip either; the property
  // mirrors exactly the reference-quotable domain.
  private val valGen = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('=', ',', '+', ' ', '.', '-', '_')
  )).map(_.mkString.trim) // parseTags trims values; generate pre-trimmed

  test("property: parseTags(tagLine(m)) == m") {
    val prop = Prop.forAllNoShrink(Gen.mapOf(Gen.zip(keyGen, valGen)).map(_.take(6))) { m =>
      Model.parseTags(Model.tagLine(m)) == Right(m)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("fields kv-string quotes only separators and keeps entry order") {
    assert(Model.fieldsKvString(Seq("k" -> "v", "a" -> "b")) == "k=v,a=b")
    assert(Model.fieldsKvString(Seq("k" -> "v,w")) == "k=\"v,w\"")
    assert(Model.fieldsKvString(Seq("k" -> "v=w")) == "k=\"v=w\"")
    // unlike tag lines, empty field values stay unquoted (field.go:213-236)
    assert(Model.fieldsKvString(Seq("k" -> "")) == "k=")
  }

  test("goQuote / goUnquote round trip") {
    Seq("plain", "with \"quotes\"", "back\\slash", "tab\there", "nl\nthere")
      .foreach { s => assert(Model.goUnquote(Model.goQuote(s)) == s) }
  }
}
