package graft

import graft.lql.FormatCompiler
import graft.lql.Ast.LqlException
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Format-template mini-language semantics (reference
  * pkg/model/leformatter.go): field kinds, brace escapes, json escaping,
  * vars fallback order, unknown-field errors.
  */
class FormatSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("msg", StringType, nullable = false),
    StructField("part", StringType, nullable = false),
    StructField("tags", MapType(StringType, StringType)),
    StructField("fields", MapType(StringType, StringType))
  ))

  private def render(fmt: String, msg: String = "hello \"w\"\nx",
      fields: Map[String, String] = Map("user" -> "u1", "k" -> "")): String = {
    val df = spark.createDataFrame(java.util.List.of(
      Row(1704164645123456789L, msg, "host=h1,name=app",
        Map("host" -> "h1", "name" -> "app"), fields)), schema)
    df.select(FormatCompiler.compile(fmt, col("ts"), col("msg"), col("part"),
      col("tags"), col("fields")).as("line")).head.getString(0)
  }

  test("{msg} verbatim; {msg.json()} escapes quotes/newlines/backslashes") {
    assert(render("{msg}") == "hello \"w\"\nx")
    assert(render("{msg.json()}") == "hello \\\"w\\\"\\nx")
    assert(render("{msg.json()}", msg = "a\\b\tc") == "a\\\\b\\tc")
  }

  test("{ts} is RFC3339; {ts.format(...)} uses the Go layout") {
    assert(render("{ts}") == "2024-01-02T03:04:05Z")
    assert(render("{ts.format(2006-01-02 15:04:05)}") == "2024-01-02 03:04:05")
    assert(render("{ts.format(Jan 2 2006)}") == "Jan 2 2024")
  }

  test("{vars:x}: field value wins, empty/missing falls back to tag, then empty") {
    assert(render("{vars:user}") == "u1")    // field present
    assert(render("{vars:host}") == "h1")    // no such field -> tag
    assert(render("{vars:k}") == "")         // empty field -> no tag k -> ""
    assert(render("{vars:nope}") == "")
  }

  test("{vars} = tag line + fields kv-string; tag line alone when fields empty") {
    assert(render("{vars}") == "host=h1,name=app,user=u1,k=")
    assert(render("{vars}", fields = Map.empty) == "host=h1,name=app")
  }

  test("brace escapes: {{ is literal {, {} is literal }") {
    assert(render("a{{b") == "a{b")
    assert(render("a{}b") == "a}b")
  }

  test("unknown fields and unterminated braces are parse errors") {
    assertThrows[LqlException](render("{bogus}"))
    assertThrows[LqlException](render("{msg"))
  }
}
