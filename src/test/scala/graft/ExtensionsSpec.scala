package graft

import graft.functions.{GraftExtensions, VectorExpressions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions: the SQL forms must
  * be bit-identical to the Column API (same Expression nodes), and shape
  * parameters must be literals.
  */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.install(s)
    s
  }

  test("graft_dot_product matches the Column API and codegen survives SQL") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val sql = spark.sql("SELECT graft_dot_product(a, b) AS d FROM vecs").head().getDouble(0)
    val col = df.select(VectorExpressions.dot_product($"a", $"b").as("d")).head().getDouble(0)
    assert(sql == 32.0 && col == 32.0)
    // float arrays and length mismatch (null) through SQL too
    val f = Seq((Array(1.0f, 2.0f), Array(3.0, 4.0))).toDF("a", "b")
    f.createOrReplaceTempView("vecs_f")
    assert(spark.sql("SELECT graft_dot_product(a, b) FROM vecs_f").head().getDouble(0) == 11.0)
    assert(spark.sql("SELECT graft_dot_product(array(1.0D), array(1.0D, 2.0D))").head().isNullAt(0))
  }

  test("graft_minhash_band_keys / graft_simhash_fold match the Column API") {
    import spark.implicits._
    val df = Seq(Tuple1(Array("a b c", "b c d", "c d e"))).toDF("sh")
    df.createOrReplaceTempView("shingles")
    val sql = spark.sql("SELECT graft_minhash_band_keys(sh, 4, 2) AS k FROM shingles")
      .head().getSeq[Long](0)
    val col = df.select(VectorExpressions.minhash_band_keys($"sh", 4, 2).as("k"))
      .head().getSeq[Long](0)
    assert(sql == col && sql.length == 4)

    val h = Seq(Tuple1(Array(0b1011L, 0b0011L, 0b0110L))).toDF("hs")
    h.createOrReplaceTempView("hashes")
    val sqlS = spark.sql("SELECT graft_simhash_fold(hs, 4) AS s FROM hashes").head().getLong(0)
    val colS = h.select(VectorExpressions.simhash_fold($"hs", 4).as("s")).head().getLong(0)
    assert(sqlS == colS && sqlS == 0b0011L)
  }

  test("shape parameters must be integer literals") {
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_simhash_fold(array(1L), cast(rand()*4 AS int))").collect()
    }
    assert(ex.getMessage.contains("integer literal"))
  }

  test("the extensions class itself injects the same function set") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; same list as install()
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ==
      Seq("graft_dot_product", "graft_minhash_band_keys", "graft_simhash_fold",
        "graft_sorted_intersect_count", "graft_sorted_max_run_length"))
  }
}
