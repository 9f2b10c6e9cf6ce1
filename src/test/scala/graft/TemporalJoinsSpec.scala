package graft

import graft.operators.TemporalJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the union-sort as-of join and the bucketed
  * point-in-interval join on hand-built frames, plus plan-shape checks
  * (no nested-loop join may appear — that is the entire point of the
  * operators).
  */
class TemporalJoinsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOf: latest prior-or-equal right row per key, null when none") {
    val left = Seq(
      (1L, 100L, "p1"), // before any right row -> null
      (1L, 200L, "p2"), // matches r@150
      (1L, 300L, "p3"), // equal-ts right row visible -> r@300
      (2L, 250L, "p4"), // other key isolated -> r@240
      (3L, 999L, "p5")  // key with no right rows at all
    ).toDF("k", "ts", "lp")
    val right = Seq(
      (1L, 150L, "a"), (1L, 300L, "b"), (1L, 400L, "c"),
      (2L, 240L, "d"), (2L, 260L, "e")
    ).toDF("k", "ts", "rp")

    val got = TemporalJoins.asOf(left, right, "k", "ts")
      .select("lp", "r_ts", "r_rp").collect()
      .map(r => r.getString(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getString(2))).toMap
    assert(got("p1") == (-1L, null))
    assert(got("p2") == (150L, "a"))
    assert(got("p3") == (300L, "b"))
    assert(got("p4") == (240L, "d"))
    assert(got("p5") == (-1L, null))
  }

  test("asOf: left payload and multiple left rows at equal ts survive") {
    val left = Seq((1L, 10L, 7L), (1L, 10L, 8L)).toDF("k", "ts", "id")
    val right = Seq((1L, 10L, 99L)).toDF("k", "ts", "v")
    val out = TemporalJoins.asOf(left, right, "k", "ts")
    assert(out.count() == 2)
    assert(out.select("r_v").collect().forall(_.getLong(0) == 99L))
  }

  test("asOf plan: one exchange, a window, and NO join node") {
    val left = Seq((1L, 100L, "x")).toDF("k", "ts", "lp")
    val right = Seq((1L, 50L, "y")).toDF("k", "ts", "rp")
    val plan = TemporalJoins.asOf(left, right, "k", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      s"asOf must not plan a join at all:\n$plan")
    assert(plan.contains("Window"), s"expected window carry:\n$plan")
  }

  test("asOf salted == unsalted on a skewed fixture (one dominant key)") {
    import scala.util.Random
    val rnd = new Random(5)
    // key 1 dominates; right rows at multiples of 10
    val left = ((1 to 400).map(i => (1L, rnd.nextInt(1000).toLong, i.toLong)) ++
      Seq((2L, 77L, 9001L), (3L, 5L, 9002L)))
      .toDF("k", "ts", "id")
    val right = ((0 to 99).map(i => (1L, i * 10L, i.toLong)) ++
      Seq((2L, 70L, 900L))).toDF("k", "ts", "v")
    def run(salts: Int) =
      TemporalJoins.asOf(left, right, "k", "ts", salts)
        .select("id", "r_ts", "r_v").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val base = run(1)
    assert(base.size == 402)
    assert(run(8) == base, "salting must not change the result")
    assert(run(3) == base, "any salt count must agree")
  }

  test("pointInInterval: boundary semantics [start, end), zero-match rows kept") {
    val points = Seq(
      (1L, 100L, 11L), (1L, 150L, 12L), (1L, 200L, 13L), // 200 == end -> out
      (2L, 100L, 21L)
    ).toDF("k", "ts", "pid")
    val intervals = Seq(
      (1L, 100L, 200L, "i1"), // matches ts 100 (inclusive) and 150
      (1L, 500L, 600L, "i2"), // no points
      (2L, 150L, 250L, "i3")  // wrong-key 150 excluded; no same-key points
    ).toDF("k", "s", "e", "iv")

    val pairs = TemporalJoins.pointInInterval(points, intervals,
      "k", "ts", "s", "e", bucketWidth = 100L)
    val counts = pairs.groupBy("iv").agg(count(col("p_pid")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("i1" -> 2L, "i2" -> 0L, "i3" -> 0L))
    val matched = pairs.where(col("p_pid").isNotNull)
      .select("p_pid").collect().map(_.getLong(0)).toSet
    assert(matched == Set(11L, 12L))
  }

  test("pointInInterval: each point pairs at most once per interval (no bucket dup)") {
    // interval spans 3 buckets (len == 2*width), point in middle bucket
    val points = Seq((1L, 150L, 1L)).toDF("k", "ts", "pid")
    val intervals = Seq((1L, 60L, 260L, "i")).toDF("k", "s", "e", "iv")
    val pairs = TemporalJoins.pointInInterval(points, intervals,
      "k", "ts", "s", "e", bucketWidth = 100L)
    assert(pairs.where(col("p_pid").isNotNull).count() == 1)
    // a matched interval emits ONLY its pairs — no null rows from the
    // other (unmatched) bucket replicas
    assert(pairs.count() == 1, "matched interval must not add null rows")
  }

  test("pointInInterval: unmatched multi-bucket interval emits exactly one null row") {
    val points = Seq((2L, 150L, 1L)).toDF("k", "ts", "pid") // wrong key
    val intervals = Seq((1L, 60L, 260L, "i")).toDF("k", "s", "e", "iv")
    val out = TemporalJoins.pointInInterval(points, intervals,
      "k", "ts", "s", "e", bucketWidth = 100L)
    assert(out.count() == 1)
    assert(out.where(col("p_pid").isNull).count() == 1)
  }

  test("randomized differential: asOf and pointInInterval match naive references") {
    val rnd = new scala.util.Random(42)
    for (round <- 1 to 6) {
      val nl = 1 + rnd.nextInt(12)
      val nr = rnd.nextInt(10)
      val left = (1 to nl).map(i =>
        (1L + rnd.nextInt(3), rnd.nextInt(20).toLong, i.toLong))
      // unique (key, ts) on the right, as asOf requires
      val right = (1 to nr).map(_ =>
        (1L + rnd.nextInt(3), rnd.nextInt(20).toLong))
        .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, 100L + i) }
      val lDf = left.toDF("k", "ts", "id")
      val rDf = right.toDF("k", "ts", "v")

      val salts = 1 + rnd.nextInt(3)
      val got = TemporalJoins.asOf(lDf, rDf, "k", "ts", salts)
        .select("id", "r_v").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val want = left.map { case (k, lts, id) =>
        val prior = right.filter(r => r._1 == k && r._2 <= lts)
        id -> (if (prior.isEmpty) -1L else prior.maxBy(_._2)._3)
      }.toMap
      assert(got == want, s"asOf mismatch round $round (salts=$salts): " +
        s"left=$left right=$right")

      // intervals from the same generator; width 5, bucket width 5
      val iv = (1 to (1 + rnd.nextInt(5))).map(i =>
        (1L + rnd.nextInt(3), rnd.nextInt(20).toLong, 1000L + i))
        .map { case (k, s, id) => (k, s, s + 5L, id) }
      val pts = left.map { case (k, t, id) => (k, t, id) }
      val gotPairs = TemporalJoins.pointInInterval(
          pts.toDF("k", "ts", "pid"), iv.toDF("k", "s", "e", "iv"),
          "k", "ts", "s", "e", bucketWidth = 5L)
        .where(col("p_pid").isNotNull)
        .select("iv", "p_pid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val wantPairs = (for {
        (ik, s, e, iid) <- iv
        (pk, t, pid) <- pts
        if pk == ik && t >= s && t < e
      } yield (iid, pid)).toSet
      assert(gotPairs == wantPairs,
        s"interval mismatch round $round: iv=$iv pts=$pts")
    }
  }

  test("pointInInterval plan: equi-join, not nested loop") {
    val points = Seq((1L, 100L, 1L)).toDF("k", "ts", "pid")
    val intervals = Seq((1L, 50L, 150L, "i")).toDF("k", "s", "e", "iv")
    val plan = TemporalJoins.pointInInterval(points, intervals,
      "k", "ts", "s", "e", bucketWidth = 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"bucketed interval join must be an equi-join:\n$plan")
  }
}
