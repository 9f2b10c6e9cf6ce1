package graft

import graft.lql.{Parser, WhereCompiler}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.time.Instant

/** The reference's WHERE predicate table (reference
  * pkg/lql/whereeval_test.go:44-68) evaluated through [[WhereCompiler]] on a
  * real single-row DataFrame — the compiled Column IS the unit under test.
  */
class WhereEvalSpec extends AnyFunSuite {

  private val clock = () => Instant.parse("2024-03-15T10:30:45.500Z")
  private val parser = new Parser(clock)
  private val whereC = new WhereCompiler(clock)

  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("ts", LongType, nullable = false),
    StructField("msg", StringType, nullable = false),
    StructField("fields", MapType(StringType, StringType), nullable = true)
  ))

  /** le = {Timestamp: 123, Msg: "aaaabbbb", Fields: {f1: val1, f2: val2}}
    * (whereeval_test.go:45-46). */
  private lazy val le = spark.createDataFrame(
    java.util.List.of(Row(123L, "aaaabbbb", Map("f1" -> "val1", "f2" -> "val2"))),
    schema)

  private def eval(exp: String): Boolean = {
    val e = parser.parseExpr(exp).fold(m => fail(s"'$exp' should parse: $m"), identity)
    val c = whereC.compile(e, col("ts"), col("msg"), col("fields"))
    le.where(c).count() == 1
  }

  private val table = Seq(
    "msg like \"aaa*\"" -> true,
    "msg like \"AAA*\"" -> false,
    "upper(msg) like \"AAA*\"" -> true,
    "lower(upper(msg)) like \"AAA*\"" -> false,
    "msg contains ab" -> true,
    "msg prefix aa" -> true,
    "msg prefix ab" -> false,
    "msg suffix ab" -> false,
    "msg suffix bb" -> true,
    "ts <= 123 and msg suffix bb" -> true,
    "ts > 123 " -> false,
    "ts < 123 and msg suffix bb" -> false,
    "ts < 123 or msg suffix bb" -> true,
    "fields:f1 != aaa" -> true,
    "fields:f13 != aaa" -> true,
    "fields:f1 = val1 and fields:f2=val2" -> true,
    "fields:f1 = VAL1 and fields:f2=val2" -> false,
    "upper(fields:f1) = VAL1 and fields:f2=val2" -> true,
    "fields:f1 = val1 and fields:f2=val2 and fields:f3 = \"\"" -> true,
    "fields:f1 = val1 and fields:f2=val3" -> false
  )

  table.foreach { case (exp, expected) =>
    test(s"$exp -> $expected") { assert(eval(exp) == expected) }
  }

  test("ts rejects = and != (reference whereeval.go:169-171)") {
    Seq("ts = 123", "ts != 123").foreach { exp =>
      val e = parser.parseExpr(exp).toOption.get
      assertThrows[Exception] {
        whereC.compile(e, col("ts"), col("msg"), col("fields"))
      }
    }
  }

  test("malformed glob fails at compile time, not per row") {
    val e = parser.parseExpr("msg like '[a-'").toOption.get
    assertThrows[Exception] {
      whereC.compile(e, col("ts"), col("msg"), col("fields"))
    }
  }

  test("field comparison is lexicographic, not numeric") {
    val e = parser.parseExpr("fields:f1 > 'val'").toOption.get
    assert(le.where(whereC.compile(e, col("ts"), col("msg"), col("fields"))).count() == 1)
    val e2 = parser.parseExpr("fields:f1 > 'z'").toOption.get
    assert(le.where(whereC.compile(e2, col("ts"), col("msg"), col("fields"))).count() == 0)
  }
}
