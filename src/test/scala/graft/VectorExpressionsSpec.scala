package graft

import graft.functions.VectorExpressions.dot_product
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native DotProduct expression: value correctness against the
  * left-to-right reference, float/double element handling, null
  * propagation, and agreement between codegen and interpreted paths. */
class VectorExpressionsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dot_product matches left-to-right double accumulation") {
    val a = Array(1.5f, -2.25f, 3.0f, 0.125f)
    val b = Array(4.0f, 0.5f, -1.0f, 8.0f)
    val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    val got = Seq((a, b)).toDF("a", "b")
      .select(dot_product(col("a"), col("b")).as("d")).head.getDouble(0)
    assert(got == expected)
  }

  test("dot_product with a double-literal side (the LSH plane case)") {
    val v = Array(1.0f, 2.0f, 3.0f)
    val plane = array(lit(0.5), lit(-1.0), lit(2.0))
    val got = Seq(Tuple1(v)).toDF("v")
      .select(dot_product(col("v"), plane).as("d")).head.getDouble(0)
    assert(got == 1.0 * 0.5 - 2.0 + 6.0)
  }

  test("dot_product propagates null inputs") {
    val row = Seq((Array(1.0f), Option.empty[Array[Float]])).toDF("a", "b")
      .select(dot_product(col("a"), col("b")).as("d")).head
    assert(row.isNullAt(0))
  }

  test("dot_product yields NULL on length mismatch and null elements (HOF parity)") {
    val mismatch = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
      .select(dot_product(col("a"), col("b")).as("d")).head
    assert(mismatch.isNullAt(0), "ragged arrays must be NULL, not a partial dot")
    val withNullElem = Seq((Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
      .select(dot_product(col("a"), col("b")).as("d")).head
    assert(withNullElem.isNullAt(0), "a null element must poison the result like zip_with")
  }

  test("minhash_band_keys is bit-identical to the nested-HOF formulation") {
    val bands = 32
    val r = 3
    val docs = Seq(
      Tuple1(Array("the quick fox", "quick fox jumps", "fox jumps over")),
      Tuple1(Array("a b c")),
      Tuple1(Array.empty[String])).toDF("sh")
    val hof = docs.select(transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, transform(
        sequence(b * r, (b + 1) * r - 1),
        i => array_min(transform(col("sh"), g => xxhash64(i, g)))))).as("keys"))
      .collect().map(_.getSeq[Long](0))
    val native = docs.select(
      graft.functions.VectorExpressions.minhash_band_keys(col("sh"), bands, r).as("keys"))
      .collect().map(_.getSeq[Long](0))
    assert(native.toSeq == hof.toSeq)
  }

  test("simhash_fold is bit-identical to the nested-aggregate formulation") {
    val bits = 60
    val docs = Seq(
      Tuple1(Array(0x0123456789abcdL, 0x0fedcba9876543L, 0x0aaaaaaaaaaaaaL)),
      Tuple1(Array(1L)),
      Tuple1(Array.empty[Long])).toDF("hs")
    val hof = docs.select(expr(
      s"""aggregate(sequence(0, ${bits - 1}), 0L, (acc, i) -> acc +
         |  IF(aggregate(hs, 0L,
         |       (s, h) -> s + IF((h div shiftleft(1L, i)) % 2 = 1, 1L, -1L)) > 0,
         |     shiftleft(1L, i), 0L))""".stripMargin).as("f"))
      .collect().map(_.getLong(0)).toSeq
    val native = docs.select(
      graft.functions.VectorExpressions.simhash_fold(col("hs"), bits).as("f"))
      .collect().map(_.getLong(0)).toSeq
    assert(native == hof)
  }

  test("codegen and interpreted evaluation agree") {
    val df = (1 to 50).map { i =>
      (Array.tabulate(64)(j => (i * 31 + j).toFloat / 7f),
        Array.tabulate(64)(j => (j * 13 - i).toFloat / 3f))
    }.toDF("a", "b")
    val viaExpr = df.select(dot_product(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    // reference: interpreted HOF with the same accumulation order
    val viaHof = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x).as("d")).collect().map(_.getDouble(0)).toSeq
    assert(viaExpr == viaHof)
  }

  test("sorted_intersect_count equals size(array_intersect) on sorted sets") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      def set() = (0 until rnd.nextInt(40))
        .map(_ => s"w${rnd.nextInt(30)} w${rnd.nextInt(30)}").distinct.sorted.toArray
      (set(), set())
    } :+ ((Array.empty[String], Array("a b"))) :+ ((Array("a b"), Array.empty[String]))
    val df = rows.toDF("a", "b")
    val native = df.select(
      graft.functions.VectorExpressions.sorted_intersect_count(col("a"), col("b")).as("c"))
      .collect().map(_.getInt(0)).toSeq
    val builtin = df.select(size(array_intersect(col("a"), col("b"))).as("c"))
      .collect().map(_.getInt(0)).toSeq
    assert(native == builtin)
    // SQL registration path
    graft.functions.GraftExtensions.install(spark)
    val viaSql = df.selectExpr("graft_sorted_intersect_count(a, b) as c")
      .collect().map(_.getInt(0)).toSeq
    assert(viaSql == builtin)
  }

  test("squared_distance is bit-identical to the HOF form it replaced") {
    import graft.functions.VectorExpressions.squared_distance
    val df = (1 to 50).map { i =>
      (Array.tabulate(48)(j => (i * 17 + j).toDouble / 11.0),
        Array.tabulate(48)(j => (j * 29 - i).toDouble / 5.0))
    }.toDF("a", "b")
    val native = df.select(squared_distance(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    // the exact expression Clustering.sqDist used before the swap
    val hof = df.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v).as("d")).collect().map(_.getDouble(0)).toSeq
    assert(native == hof)
    // null/length parity with the HOF form
    val edge = Seq(
      (Array(1.0, 2.0), Array(1.0)), // ragged
      (Array(1.0), Array(4.0))
    ).toDF("a", "b").select(squared_distance(col("a"), col("b")).as("d")).collect()
    assert(edge(0).isNullAt(0), "ragged arrays must be NULL")
    assert(edge(1).getDouble(0) == 9.0)
    // float inputs accumulate through double exactly like dot_product
    val f = Seq((Array(1.5f, -2.0f), Array(0.5f, 3.0f))).toDF("a", "b")
      .select(squared_distance(col("a"), col("b")).as("d")).head.getDouble(0)
    assert(f == 1.0 + 25.0)
  }

  test("log2_fix replays the integer shift-and-square algorithm exactly") {
    import graft.functions.{Log2Fix, VectorExpressions}
    // reference: an independent BigInt transliteration of the spec
    def ref(num: Long, den: Long): Long = {
      def bl(v: Long) = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val d = bl(num) - bl(den)
      val k = if ((num >> d) >= den) d else d - 1
      val sh = math.max(0, bl(num) - 34)
      val a = BigInt(num >> sh)
      val b = if (k >= sh) BigInt(den) << (k - sh) else BigInt(den >> (sh - k))
      var m = (a << 28) / b
      var bits = BigInt(0)
      (0 until 20).foreach { _ =>
        m = (m * m) >> 28
        if (m >= (BigInt(1) << 29)) { m >>= 1; bits = (bits << 1) | 1 }
        else bits = bits << 1
      }
      ((BigInt(k) << 20) | bits).toLong
    }
    val rnd = new scala.util.Random(11)
    val cases = Seq((1L, 1L), (2L, 1L), (3L, 2L), (1000000000000L, 1L),
      (1000000000000L, 999999999999L), ((1L << 40) + 123L, 991L)) ++
      (1 to 300).map { _ =>
        val den = 1L + math.abs(rnd.nextLong()) % 1000000000000L
        val num = den + math.abs(rnd.nextLong()) % (1000000000000L - den + 1)
        (num, den)
      }
    // kernel matches the reference...
    cases.foreach { case (n, d) =>
      assert(Log2Fix.eval(n, d) == ref(n, d), s"kernel mismatch at ($n, $d)")
    }
    // ...and approximates true log2 to ~1e-6 (sanity, not the contract)
    cases.foreach { case (n, d) =>
      val approx = Log2Fix.eval(n, d).toDouble / (1L << 20)
      assert(math.abs(approx - math.log(n.toDouble / d) / math.log(2.0)) < 2e-6)
    }
    // expression path (codegen) equals the kernel; nulls on bad domains
    val df = cases.toDF("num", "den")
    val viaExpr = df.select(VectorExpressions.log2_fix(col("num"), col("den")).as("l"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaExpr == cases.map { case (n, d) => Log2Fix.eval(n, d) })
    val bad = Seq((1L, 2L), (5L, 0L), (5L, -1L)).toDF("num", "den")
      .select(VectorExpressions.log2_fix(col("num"), col("den")).as("l")).collect()
    assert(bad.forall(_.isNullAt(0)), "num<den or den<=0 must be NULL")
  }

  test("exp2_fix replays the pinned constant ladder exactly and inverts log2_fix") {
    import graft.functions.{Exp2Fix, Log2Fix, VectorExpressions}
    // reference: an independent BigInt transliteration of the spec
    def ref(x20: Long): Long = {
      val k = (x20 >> 20).toInt
      val f = x20 & 0xFFFFFL
      var r = BigInt(1) << 20
      (1 to 20).foreach { i =>
        if (((f >> (20 - i)) & 1L) == 1L) r = (r * Exp2Fix.C(i)) >> 20
      }
      (r << k).toLong
    }
    val rnd = new scala.util.Random(17)
    val cases = Seq(0L, 1L, 1L << 20, 2L << 20, (1L << 20) - 1, Exp2Fix.MaxX20) ++
      (1 to 300).map(_ => math.abs(rnd.nextLong()) % (Exp2Fix.MaxX20 + 1))
    cases.foreach { x =>
      assert(Exp2Fix.eval(x) == ref(x), s"kernel mismatch at $x")
    }
    // exact at integer x (pure shift), ~1e-5-relative elsewhere (sanity)
    (0 to 41).foreach { k =>
      assert(Exp2Fix.eval(k.toLong << 20) == (1L << 20) << k)
    }
    cases.foreach { x =>
      val approx = Exp2Fix.eval(x).toDouble / (1L << 20)
      val truth = math.pow(2.0, x.toDouble / (1L << 20))
      assert(math.abs(approx - truth) / truth < 2e-5, s"drift at $x")
    }
    // monotone (softmax ordering preservation is the whole point)
    val sorted = cases.sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(Exp2Fix.eval(a) <= Exp2Fix.eval(b))
    }
    // round-trips log2_fix within the combined tolerance
    Seq(1L, 7L, 1000L, 999999937L, 1L << 40).foreach { n =>
      val e = Exp2Fix.eval(Log2Fix.eval(n, 1L))
      assert(math.abs(e.toDouble / (1L << 20) - n.toDouble) / n.toDouble < 3e-5)
    }
    // expression path (codegen) equals the kernel; nulls outside the domain
    val df = cases.toDF("x")
    val viaExpr = df.select(VectorExpressions.exp2_fix(col("x")).as("e"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaExpr == cases.map(Exp2Fix.eval))
    val bad = Seq(-1L, Exp2Fix.MaxX20 + 1).toDF("x")
      .select(VectorExpressions.exp2_fix(col("x")).as("e")).collect()
    assert(bad.forall(_.isNullAt(0)), "negative or >MaxX20 must be NULL")
  }

  test("shift-quantized softmax normalization stays int64-exact at extreme weights") {
    // the DoReMi normalization algebra on weights spanning the full e20
    // range: a common right shift to NormBits bits keeps w*1e6 and the
    // sum inside int64 while preserving order
    import graft.llm.DoReMi
    val ws = Seq(1L << 20, 1L << 40, (1L << 61) - 1, 3L << 58, 1L << 21)
    val df = ws.toDF("w_e20")
    val mx = df.agg(max("w_e20").as("mx"))
    val out = df.crossJoin(mx)
      .withColumn("sh",
        greatest(lit(0), length(bin(col("mx"))) - 1 - DoReMi.NormBits))
      .withColumn("wr", expr("shiftright(w_e20, sh)"))
    val tot = out.agg(sum("wr").as("t"))
    val shares = out.crossJoin(tot)
      .select(col("w_e20"), expr("wr * 1000000 div t").as("weight_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // no overflow: all shares in [0, 1e6]; the dominant weight takes ~all
    assert(shares.values.forall(s => s >= 0L && s <= 1000000L))
    assert(shares((1L << 61) - 1) > 600000L)
    // order preserved, small weights quantize to zero (documented)
    assert(shares(1L << 20) == 0L && shares(1L << 40) == 0L)
    assert(shares(3L << 58) > shares(1L << 40))
  }
}
