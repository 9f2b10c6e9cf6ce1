package graft

import graft.operators.TimeSeries
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("gapFill: dense grid, carry-forward, deterministic in-bucket winner") {
    // bucket width 10: k1 events in buckets 0 (two, tie on ts -> ord 9
    // wins) and 3; k2 only bucket 1; global grid spans buckets 0..3
    val events = Seq(
      (1L, 5L, 1L, 100L), (1L, 5L, 9L, 200L), // same ts, higher ord wins
      (1L, 31L, 2L, 300L),
      (2L, 12L, 3L, 400L)
    ).toDF("k", "ts", "ord", "v")

    val out = TimeSeries.gapFill(events, "k", "ts", "ord", "v", 10L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap

    assert(out.size == 8, s"2 keys x 4 buckets, got ${out.size}")
    assert(out((1L, 0L)) == ((2L, 200L)), "tie broken by ord, count 2")
    assert(out((1L, 1L)) == ((0L, 200L)), "empty bucket carries value")
    assert(out((1L, 2L)) == ((0L, 200L)))
    assert(out((1L, 3L)) == ((1L, 300L)))
    assert(out((2L, 0L)) == ((0L, -1L)), "null before the key's first event")
    assert(out((2L, 1L)) == ((1L, 400L)))
    assert(out((2L, 3L)) == ((0L, 400L)))
  }

  test("randomized differential: gapFill matches a naive reference") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 5) {
      val rows = (1 to (1 + rnd.nextInt(15))).map(i =>
        (1L + rnd.nextInt(3), rnd.nextInt(40).toLong, i.toLong,
          rnd.nextInt(100).toLong))
      val df = rows.toDF("k", "ts", "ord", "v")
      val got = TimeSeries.gapFill(df, "k", "ts", "ord", "v", 10L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap

      val b0 = rows.map(_._2 / 10).min
      val b1 = rows.map(_._2 / 10).max
      val keys = rows.map(_._1).distinct
      val want = (for (k <- keys; b <- b0 to b1) yield {
        val inBucket = rows.filter(r => r._1 == k && r._2 / 10 == b)
        val n = inBucket.size.toLong
        // carry: latest event (ts, ord) at or before bucket end
        val prior = rows.filter(r => r._1 == k && r._2 / 10 <= b)
        val vff = if (prior.isEmpty) -1L else prior.maxBy(r => (r._2, r._3))._4
        (k, b) -> ((n, vff))
      }).toMap
      assert(got == want, s"gapFill mismatch round $round: rows=$rows")
    }
  }

  test("gapFill per-key bounds: sparse key does not densify to the global span") {
    // k1 active in buckets 0..2, k2 only in buckets 100..101: the global
    // grid would emit 2 x 102 = 204 rows; per-key emits 3 + 2 = 5
    val events = Seq(
      (1L, 5L, 1L, 10L), (1L, 25L, 2L, 30L),
      (2L, 1005L, 3L, 50L), (2L, 1015L, 4L, 70L)
    ).toDF("k", "ts", "ord", "v")
    val out = TimeSeries.gapFill(events, "k", "ts", "ord", "v", 10L,
        bounds = TimeSeries.PerKeyBounds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out.size == 5, s"per-key grid should be 3+2 rows, got ${out.size}")
    assert(out((1L, 0L)) == ((1L, 10L)))
    assert(out((1L, 1L)) == ((0L, 10L)), "in-span gap still fills and carries")
    assert(out((1L, 2L)) == ((1L, 30L)))
    assert(out((2L, 100L)) == ((1L, 50L)), "k2's grid starts at its own min")
    assert(out((2L, 101L)) == ((1L, 70L)))
    // and the global default on the same input does densify both keys
    assert(TimeSeries.gapFill(events, "k", "ts", "ord", "v", 10L).count() == 204L)
  }

  test("gapFill fixed bounds: explicit window, out-of-range events ignored") {
    val events = Seq(
      (1L, 5L, 1L, 10L),   // bucket 0 — before the window
      (1L, 35L, 2L, 30L),  // bucket 3 — inside
      (2L, 95L, 3L, 50L)   // bucket 9 — after the window
    ).toDF("k", "ts", "ord", "v")
    val out = TimeSeries.gapFill(events, "k", "ts", "ord", "v", 10L,
        bounds = TimeSeries.FixedBounds(2L, 5L))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(out.size == 4, s"1 in-window key x 4 fixed buckets, got ${out.size}")
    assert(out((1L, 2L)) == ((0L, -1L)), "pre-window event does NOT carry in")
    assert(out((1L, 3L)) == ((1L, 30L)))
    assert(out((1L, 5L)) == ((0L, 30L)))
    assert(!out.keySet.exists(_._1 == 2L),
      "a key whose events all fall outside the window emits no rows")
  }

  test("gapFill fixed bounds: inverted window is rejected, not silently reversed") {
    val events = Seq((1L, 5L, 1L, 10L)).toDF("k", "ts", "ord", "v")
    val e = intercept[IllegalArgumentException] {
      TimeSeries.gapFill(events, "k", "ts", "ord", "v", 10L,
        bounds = TimeSeries.FixedBounds(5L, 2L))
    }
    assert(e.getMessage.contains("b0 <= b1"))
  }

  test("gapFill per-key bounds: empty input stays empty, fully lazy") {
    val empty = Seq.empty[(Long, Long, Long, Long)].toDF("k", "ts", "ord", "v")
    val out = TimeSeries.gapFill(empty, "k", "ts", "ord", "v", 10L,
      bounds = TimeSeries.PerKeyBounds)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("k", "bucket", "n", "v_ff"))
  }

  test("gapFill: empty input yields empty output with the pinned schema") {
    val empty = Seq.empty[(Long, Long, Long, Long)].toDF("k", "ts", "ord", "v")
    val out = TimeSeries.gapFill(empty, "k", "ts", "ord", "v", 10L)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("k", "bucket", "n", "v_ff"))
  }

  test("q16 rolling: trailing 7-row frame matches a naive reference on sf0.001") {
    val rows = graft.queries.Analytics.q16Rolling(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, series) =>
      val s = series.sortBy(_._2)
      s.indices.foreach { i =>
        val frame = s.slice(math.max(0, i - 6), i + 1)
        assert(s(i)._4 == frame.map(_._3).sum,
          s"roll_n mismatch at ${s(i)._1}/${s(i)._2}")
        assert(s(i)._6 == s(i)._5 / s(i)._4, "roll_avg must be the integer div")
      }
    }
  }

  test("q22 ewma: matches the scalar recurrence, per type, on sf0.001") {
    val rows = graft.queries.Analytics.q22Ewma(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, series) =>
      val s = series.sortBy(_._2)
      var ew = s.head._3 * 1000000L
      assert(s.head._4 == ew, s"$t: seed must be n_1 * 1e6")
      s.tail.foreach { case (_, b, n, got) =>
        ew = ew + (n * 1000000L - ew) / 8L
        assert(got == ew, s"$t/$b: ewma recurrence mismatch")
      }
    }
    // smoothing actually smooths: the ewma series' range is within the
    // raw series' range for every type
    rows.groupBy(_._1).foreach { case (_, series) =>
      val n6 = series.map(_._3 * 1000000L)
      assert(series.map(_._4).forall(v => v >= n6.min - 8 && v <= n6.max + 8))
    }
  }

  test("q23 transitions: matches a naive per-user walk on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables.load(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val naive = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Array(a, b) => (a._4, b._4)
      }
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val fromTotals = naive.groupBy(_._1._1)
      .map { case (f, m) => f -> m.values.sum }
    val got = graft.queries.Analytics.q23Transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == naive.keySet)
    naive.foreach { case (k, n) =>
      val (gn, gf, gp) = got(k)
      assert(gn == n, s"count mismatch at $k")
      assert(gf == fromTotals(k._1), s"row total mismatch at $k")
      assert(gp == n * 10000L / fromTotals(k._1), s"p_e4 mismatch at $k")
    }
    // probabilities are a valid distribution per from_type (sum within
    // the truncation slack of 1e4)
    got.toSeq.groupBy(_._1._1).foreach { case (f, rows) =>
      val s = rows.map(_._2._3).sum
      assert(s <= 10000L && s > 10000L - rows.length,
        s"$f: p_e4 must sum to 1e4 within truncation slack, got $s")
    }
  }

  test("transitions: randomized differential with forced timestamp ties") {
    // heavy ts collisions: event_id is the only deterministic order —
    // a plan that orders by ts alone diverges from the reference here
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val types = Vector("a", "b", "c")
      val rows = (0 until 60).map { i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(5).toLong * 100L, i.toLong,
          types(rnd.nextInt(types.length)))
      }
      val naive = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
        es.sortBy(e => (e._2, e._3)).sliding(2).collect {
          case Seq(a, b) => (a._4, b._4)
        }
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val fromTot = naive.groupBy(_._1._1).view
        .mapValues(_.values.sum).toMap
      val got = graft.queries.Analytics.transitionsFrom(
          rows.toDF("user_id", "ts", "event_id", "event_type"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got.keySet == naive.keySet, s"seed=$seed")
      naive.foreach { case (k, n) =>
        assert(got(k) == ((n, fromTot(k._1), n * 10000L / fromTot(k._1))),
          s"seed=$seed at $k")
      }
    }
  }

  test("spike detection: the integer test is a true 3-sigma bound (not 3·sqrt(W)·sigma)") {
    val spark = TestSpark.spark
    import spark.implicits._
    def spikesAt(series: Seq[Long]): Set[Long] =
      graft.queries.Analytics.spikesFrom(
          series.zipWithIndex.map { case (n, h) => (h.toLong, "t", n) }
            .toDF("hour_bucket", "event_type", "n"))
        .collect().map(_.getLong(1)).toSet
    // trailing {10,10,10,10,10,16}: mean 11, population sigma ~2.24.
    // n=21 is ~4.5 sigma above — a 3-sigma test MUST flag it (the buggy
    // extra factor of W demanded ~7.35 sigma and silently missed it)
    assert(spikesAt(Seq(10, 10, 10, 10, 10, 16, 21)) == Set(6L))
    // n=17 is ~2.7 sigma — must NOT flag
    assert(spikesAt(Seq(10, 10, 10, 10, 10, 16, 17)) == Set.empty)
    // constant history: sigma 0, any strictly-greater value flags
    assert(spikesAt(Seq(10, 10, 10, 10, 10, 10, 11)) == Set(6L))
    // fewer than 6 trailing buckets: never flags
    assert(spikesAt(Seq(1, 1, 1, 100)) == Set.empty)
    // envelope guard: counts at/over 1.6e8 fail loudly, not wrap silently
    val err = intercept[Exception](spikesAt(Seq.fill(7)(200000000L)))
    assert(err.getMessage != null)
  }

  test("q28 histogram: buckets partition every row, boundary lands in the last bucket") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.Analytics
      .q28Histogram(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val b = graft.queries.Analytics.HistBuckets
    val byType = out.groupBy(_._1)
    val rows = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"),
        graft.Tables.fx(col("value"), 2).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val totals = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    byType.foreach { case (t, g) =>
      assert(g.length == b, s"$t must densify to $b buckets")
      assert(g.map(_._5).sum == totals(t), s"$t buckets must partition all rows")
      // contiguous, non-overlapping bounds
      val s = g.sortBy(_._2)
      for (Seq(a, c) <- s.sliding(2).map(_.toSeq))
        assert(c._3 == a._4 + 1, s"$t bounds must tile: $a then $c")
    }
    // planted boundary: span exactly divisible by B (0..2000, width 100)
    // — the max value must CLAMP into the last bucket, not fall off
    import spark.implicits._
    val planted = graft.queries.Analytics.histogramFrom(
        Seq(("t", 0L), ("t", 2000L)).toDF("event_type", "v"))
      .collect().map(r => (r.getLong(1), r.getLong(4))).toMap
    assert(planted(0L) == 1L && planted(b - 1) == 1L &&
      planted.values.sum == 2L, s"boundary row must clamp into bucket ${b - 1}: $planted")
  }

  test("q27 correlation: planted perfect/anti/constant cases + scalar parity") {
    import org.apache.spark.sql.functions._
    // corpus parity against a scalar recomputation of the same formula
    val out = graft.queries.Analytics
      .q27Correlation(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out.nonEmpty)
    val rows = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_type"),
        graft.Tables.fx(col("value"), 2).cast("long").as("x"),
        regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (t, g) =>
      val n = g.length.toLong
      val (sx, sy) = (g.map(_._2).sum, g.map(_._3).sum)
      val sxy = g.map(e => e._2 * e._3).sum
      val (sxx, syy) = (g.map(e => e._2 * e._2).sum, g.map(e => e._3 * e._3).sum)
      val (num, d1, d2) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
      t -> (if (d1 > 0 && d2 > 0)
        Some(math.floor(num.toDouble * 10000.0 /
          math.sqrt(d1.toDouble * d2.toDouble) + 0.5).toLong)
      else None)
    }
    assert(out == want, "corr must match the scalar moment formula")

    // planted: y = 2x -> +10000; y = -x + 100 -> -10000; constant -> null
    def mk(rows: Seq[(String, Long, Long)]) = {
      import spark.implicits._
      rows.map { case (t, x, y) => (t, x / 100.0, s"k=$y") }
        .toDF("event_type", "value", "props")
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
        .withColumn("event_id", monotonically_increasing_id())
        .withColumn("user_id", lit(1L))
    }
    // the PRODUCTION moment core (factored for exactly this), fed the
    // same projection the entry builds
    val e = mk((1L to 20L).map(i => ("p", i * 100, 2 * i)) ++
        (1L to 20L).map(i => ("m", i * 100, 100 - i)) ++
        (1L to 20L).map(i => ("c", i * 100, 7L)))
      .select(col("event_type"),
        graft.Tables.fx(col("value"), 2).cast("long").as("x"),
        expr("cast(regexp_extract(props, '[0-9]+', 0) as long)").as("y"))
    val got = graft.queries.Analytics.correlationFrom(e)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got("p") == Some(10000L), s"perfect correlation: $got")
    assert(got("m") == Some(-10000L), s"perfect anti-correlation: $got")
    assert(got("c") == None, s"zero variance must be null: $got")
  }

  test("q27 correlation: moment envelope trips loudly, decimal cross terms compute exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def run(xs: Seq[(Long, Long)]) =
      graft.queries.Analytics.correlationFrom(
        xs.map { case (x, y) => ("t", x, y) }.toDF("event_type", "x", "y"))
        .collect()
    def got(xs: Seq[(Long, Long)]): Option[Long] = {
      val r = run(xs)
      assert(r.length == 1)
      if (r(0).isNullAt(2)) None else Some(r(0).getLong(2))
    }
    // exact BigInt twin of the production algebra (BigInt→double is the
    // same correctly-rounded conversion Decimal(38,0)→double makes)
    def want(xs: Seq[(Long, Long)]): Option[Long] = {
      val n = BigInt(xs.length)
      val sx = xs.map(e => BigInt(e._1)).sum
      val sy = xs.map(e => BigInt(e._2)).sum
      val sxy = xs.map(e => BigInt(e._1) * e._2).sum
      val sxx = xs.map(e => BigInt(e._1) * e._1).sum
      val syy = xs.map(e => BigInt(e._2) * e._2).sum
      val (num, d1, d2) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
      if (d1 > 0 && d2 > 0)
        Some(math.floor(num.toDouble * 10000.0 /
          math.sqrt(d1.toDouble * d2.toDouble) + 0.5).toLong)
      else None
    }
    // the ADVICE r10 scenario — 200k rows of |x| ~ 3e6: sxx ~ 1.8e18 fits
    // int64 but n·sxx ~ 3.6e23 does not. The old all-int64 envelope
    // aborted this LEGITIMATE group; the Decimal(38,0) cross terms now
    // compute it exactly (r11 ADVICE), verified against the BigInt twin.
    val big = (1L to 200000L).map(i => (3000000L + i % 7, i % 100))
    assert(got(big) == want(big), "large-magnitude group must compute exactly")
    // |sx| far past the old 2^31-1 bound (d) — also just computes now
    val wideSum = (1L to 3000L).map(i => (1000000L + i, i % 50))
    assert(got(wideSum) == want(wideSum), "sx past 2^31 must compute exactly")
    // per-row product overflow (mx > sqrt 2^63): under ANSI (the Spark 4
    // default) the multiply itself raises first; with ANSI off, bound (a)
    // of the guard trips — loud either way, never silently wrong
    val e2 = intercept[Exception] { run(Seq((4000000000L, 4000000000L),
      (4000000001L, 1L))) }
    assert(e2.getMessage.contains("moment envelope") ||
      e2.getMessage.contains("ARITHMETIC_OVERFLOW"), e2.getMessage)
    // moment-SUM overflow risk (bound (b)): one row at mx = 3e9 keeps the
    // per-row square inside int64, but n·mx² = 5.4e21 says a sum COULD
    // wrap — must abort loudly, int64 moments are the exactness contract
    val e3 = intercept[Exception] {
      run(Seq((3000000000L, 1L)) ++ Seq.fill(599)((0L, 1L))) }
    assert(e3.getMessage.contains("moment envelope"), e3.getMessage)
    // and a comfortably in-envelope group still computes
    assert(got((1L to 1000L).map(i => (i, 2 * i))) == Some(10000L))
  }

  test("q24 user sequences: cap, count and hash match a scalar reference") {
    import org.apache.spark.sql.functions._
    val out = graft.queries.Analytics
      .q24UserSequences(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out.nonEmpty)
    // scalar reference over the same normalized events
    val rows = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = rows.groupBy(_._1).map { case (u, g) =>
      // the production triple sort (ts, event_id, event_type) — ties on
      // (ts, event_id) are broken identically on both engines
      val ordered = g.sortBy(e => (e._2, e._3, e._4)).map(_._4)
      val capped = ordered.take(graft.queries.Analytics.SeqMaxLen)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(capped.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      u -> ((g.size.toLong, capped.size.toLong, md))
    }
    assert(out == want, "sequence hashes must match the scalar walk")
    assert(out.values.forall(_._2 <= graft.queries.Analytics.SeqMaxLen))
  }
}
