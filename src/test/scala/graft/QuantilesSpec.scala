package graft

import graft.operators.Quantiles
import org.scalatest.funsuite.AnyFunSuite

/** Exact order-statistic contract: k = max(1, ceil(q·n)) in integer
  * arithmetic, k-th smallest over the ascending order — verified against a
  * naive sorted-array reference on random multisets (ties are the whole
  * point of the histogram design), plus grouped and edge cases.
  */
class QuantilesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naive(xs: Seq[Long], qE4: Long): (Long, Long) = {
    val sorted = xs.sorted
    val n = xs.size.toLong
    val k = math.max(1L, (qE4 * n + 9999L) / 10000L)
    (k, sorted((k - 1).toInt))
  }

  test("randomized differential: orderStats matches the sorted-array reference") {
    val rnd = new scala.util.Random(17)
    (0 until 5).foreach { round =>
      // heavy ties: values drawn from a small domain
      val xs = Seq.fill(200 + rnd.nextInt(300))(rnd.nextInt(40).toLong - 7L)
      val qs = Seq(1L, 100L, 2500L, 5000L, 9900L, 10000L)
      val got = Quantiles.orderStats(xs.toDF("v"), "v", qs)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      qs.foreach { q =>
        assert(got(q) == naive(xs, q), s"round $round q=$q n=${xs.size}")
      }
      assert(got.values.forall(_ != null) && got.size == qs.size)
    }
  }

  test("orderStats edges: q=1e4 is the max, tiny q clamps to the min, empty input is empty") {
    val xs = Seq(5L, 5L, 1L, 9L)
    val got = Quantiles.orderStats(xs.toDF("v"), "v", Seq(1L, 10000L))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) == 1L && got(10000L) == 9L)
    assert(Quantiles.orderStats(Seq.empty[Long].toDF("v"), "v", Seq(5000L)).count() == 0)
  }

  test("groupedOrderStats: multi-quantile rows match the reference at every (group, q)") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 300).map(_ => (s"g${rnd.nextInt(4)}", rnd.nextInt(15).toLong))
    val qs = Seq(2500L, 5000L, 7500L, 9500L)
    val got = Quantiles.groupedOrderStats(rows.toDF("g", "v"), "g", "v", qs)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val grps = rows.groupBy(_._1)
    assert(got.size == grps.size * qs.size, "one row per (group, quantile)")
    for ((g, grp) <- grps; q <- qs) {
      val xs = grp.map(_._2)
      val (k, v) = naive(xs, q)
      assert(got((g, q)) == ((xs.size.toLong, k, v)), s"group $g q $q")
    }
  }

  test("groupedOrderStat: per-group medians match the per-group reference") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 400).map { _ =>
      val g = s"g${rnd.nextInt(7)}"
      (g, rnd.nextInt(25).toLong)
    }
    val got = Quantiles.groupedOrderStat(rows.toDF("g", "v"), "g", "v", 5000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val xs = grp.map(_._2)
      val (k, v) = naive(xs, 5000L)
      assert(got(g) == ((xs.size.toLong, k, v)), s"group $g")
    }
    assert(got.size == rows.map(_._1).distinct.size, "exactly one row per group")
  }

  test("plan shape: orderStats resolves ranks on the histogram with NO window at all") {
    // the whole point vs `row_number() OVER (ORDER BY v)` / exact
    // `percentile`: rank resolution must run on the histogram via the
    // two-pass prefix sum, never as a single-task window/sort over the
    // CORPUS. r18: n is inlined as a LITERAL from the prefix sum's own
    // pass-1 driver collect (its exclusive scan's last offset IS
    // sum(c)), so the plan must contain the prefix-sum lineage (the
    // Scan[obj] RDD boundary), the literal n, and NO Window node
    // anywhere — the r17 global n-window over the histogram was itself
    // a single-task funnel for near-unique value columns (ADVICE r17).
    val xs = (0 until 1000).map(i => (i % 37).toLong)
    val plan = Quantiles.orderStats(xs.toDF("v"), "v", Seq(5000L))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Scan[obj"),
      s"rank resolution must consume the prefix-summed histogram:\n$plan")
    assert(!plan.contains("Window"),
      s"no window of any kind may remain in the orderStats plan:\n$plan")
    assert(plan.contains("1000 AS n"),
      s"n must be inlined as a literal from the prefix-sum collect:\n$plan")
    // rank resolution joins the tiny q table via broadcast against the
    // prefix-summed histogram; a plan that sorted/windowed the corpus
    // here would put those nodes above it
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast rank join over the prefix-sum lineage:\n$plan")
  }

  test("plan shape: groupedOrderStat's window runs over histogram rows, after the aggregate") {
    val rows = (0 until 500).map(i => (s"g${i % 5}", (i % 11).toLong))
    val qe = Quantiles.groupedOrderStat(rows.toDF("g", "v"), "g", "v", 5000L)
      .queryExecution.executedPlan.toString
    val aggAt = qe.indexOf("HashAggregate")
    val winAt = qe.indexOf("Window")
    assert(aggAt >= 0 && winAt >= 0 && winAt < aggAt,
      s"Window must consume the aggregate's output (plan tree prints top-down):\n$qe")
  }

  test("length outliers: bounds are the exact p1/p99 and the filter is strict") {
    val docs = (1L to 1000L).map(i => (i, "t", "en", "src", i)) // n_chars = 1..1000
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.llm.Curation.lengthOutliers(docs).collect()
    // k(p1) = ceil(0.01*1000) = 10 -> lo = 10; k(p99) = 990 -> hi = 990
    assert(out.forall(r => r.getLong(2) == 10L && r.getLong(3) == 990L))
    val flagged = out.map(_.getLong(0)).sorted
    assert(flagged.toSeq == ((1L to 9L) ++ (991L to 1000L)), "strictly outside [lo, hi]")
  }

  test("q26 MAD: composed order stats equal the scalar median-of-deviations") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.Analytics.q26Mad(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.nonEmpty)
    val rows = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"),
        graft.Tables.fx(col("value"), 2).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def kth(xs: Seq[Long], qE4: Long): Long = {
      val s = xs.sorted
      s(Quantiles.kOf(qE4, s.length.toLong).toInt - 1)
    }
    val want = rows.groupBy(_._1).map { case (t, g) =>
      val vs = g.map(_._2)
      val med = kth(vs, 5000L)
      t -> ((vs.length.toLong, med, kth(vs.map(x => math.abs(x - med)), 5000L)))
    }
    assert(out == want, "MAD must equal the scalar composition")
  }

  test("robust stats fuzz: trim/MAD match scalar references on random tiny groups") {
    import org.apache.spark.sql.functions._
    // random corpora hammer the edges: n < 10 (lo = 0 -> plain mean),
    // all-identical values (MAD = 0), negatives, duplicate-heavy
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(900 + seed)
      val rows = (0 until 3 + rnd.nextInt(4)).flatMap { g =>
        val n = 1 + rnd.nextInt(40)
        val base = rnd.nextInt(200) - 100
        (0 until n).map(_ => (s"t$g",
          (if (rnd.nextInt(4) == 0) base else base + rnd.nextInt(7) - 3).toLong))
      }
      import spark.implicits._
      val df = rows.toDF("event_type", "v")
      // the PRODUCTION core (factored for exactly this), not a copy
      val got = graft.queries.Analytics.trimmedMeanFrom(df)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      val want = rows.groupBy(_._1).map { case (t, g) =>
        val s = g.map(_._2).sorted
        val lo = s.length / 10
        val k = s.slice(lo, s.length - lo)
        t -> k.sum / k.length
      }
      assert(got == want, s"seed=$seed trimmed mean")
      // MAD: scalar composition on the same groups
      val mad = Quantiles.groupedOrderStat(
          df.join(broadcast(Quantiles.groupedOrderStat(df, "event_type", "v", 5000L)
            .select(col("event_type"), col("value").as("m"))), "event_type")
            .select(col("event_type"), abs(col("v") - col("m")).as("d")),
          "event_type", "d", 5000L)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      val wantMad = rows.groupBy(_._1).map { case (t, g) =>
        val s = g.map(_._2).sorted
        val med = s(Quantiles.kOf(5000L, s.length.toLong).toInt - 1)
        val ds = g.map(x => math.abs(x._2 - med)).sorted
        t -> ds(Quantiles.kOf(5000L, ds.length.toLong).toInt - 1)
      }
      assert(mad == wantMad, s"seed=$seed MAD")
    }
  }

  test("q25 trimmed mean: histogram form equals the scalar sort-trim-average") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.Analytics
      .q25TrimmedMean(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.nonEmpty)
    val rows = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"),
        graft.Tables.fx(col("value"), 2).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).map { case (t, g) =>
      val sorted = g.map(_._2).sorted
      val n = sorted.length.toLong
      val lo = (n / 10).toInt
      val kept = sorted.slice(lo, sorted.length - lo)
      t -> ((n, kept.length.toLong, kept.sum, kept.sum / kept.length))
    }
    assert(out == want, "histogram trim must equal the scalar sort-trim")
    // robustness: an injected extreme outlier must not move the result
    val spiked = rows :+ (rows.head._1, 1000000000L)
    val tt = rows.head._1
    val ref = {
      val g = spiked.filter(_._1 == tt).map(_._2).sorted
      val lo = (g.length / 10)
      val k = g.slice(lo, g.length - lo); k.sum / k.length
    }
    // the outlier lands in the dropped top decile at this n
    assert(math.abs(ref - want(tt)._4) <= math.abs(want(tt)._4) / 100 + 1,
      "one extreme outlier must be trimmed away (robustness)")
  }
}
