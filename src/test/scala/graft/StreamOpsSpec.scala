package graft

import graft.store.Store
import graft.streaming.StreamOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Watermarked event-time aggregation and gap-sessionization over a
  * graft-store stream: append-mode rows must emit exactly once (when the
  * watermark closes the window/session), survive checkpointed resume, and
  * never include still-open state.
  */
class StreamOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def freshStore(): Store =
    new Store(spark, Files.createTempDirectory("graft-sops").toString)

  private def ingest(store: Store, tags: Map[String, String], user: String,
      tsSeconds: Seq[Long]): Unit = {
    import spark.implicits._
    store.write(tags, Map("user" -> user),
      tsSeconds.map(s => (s * 1000000000L, s"m$s")).toDF("ts", "msg"))
  }

  private def stream(store: Store): DataFrame =
    spark.readStream.format("graft-store").option("root", store.root).load()

  /** Run AvailableNow drains of `src` (each sees the watermark advanced by
    * the previous) until one produces no output, collecting everything. */
  private def drainAll[T](src: DataFrame, checkpoint: String,
      out: DataFrame => Seq[T]): Seq[T] = {
    val all = scala.collection.mutable.ArrayBuffer.empty[T]
    var rounds = 0
    var last = -1
    while (rounds < 4 && last != 0) {
      rounds += 1
      last = {
        val got = scala.collection.mutable.ArrayBuffer.empty[T]
        val query = src.writeStream.foreachBatch { (df: DataFrame, _: Long) =>
          got.synchronized(got ++= out(df)); ()
        }.option("checkpointLocation", checkpoint)
          .trigger(Trigger.AvailableNow()).start()
        query.awaitTermination(60000)
        all ++= got
        got.size
      }
    }
    all.toSeq
  }

  test("windowedCounts: batch semantics + streaming append emits each window once") {
    val store = freshStore()
    // window = 1 hour; phase 1 fills [0h,1h) for two partitions
    ingest(store, Map("app" -> "w1"), "u", Seq(100, 101, 102))
    ingest(store, Map("app" -> "w2"), "u", Seq(50))

    // batch mode: same code path, watermark is a no-op, all windows emitted
    val batch = StreamOps.windowedCounts(
      spark.read.format("graft-store").option("root", store.root).load(),
      "1 hour", "5 seconds")
      .select(col("part"), col("records")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(batch == Set(("app=w1", 3L), ("app=w2", 1L)))

    // streaming append mode: the [0,1h) windows emit only after the
    // watermark passes 1h — i.e. once the phase-2 append lands
    val cp = Files.createTempDirectory("graft-sops-cp").toString
    def windows(): DataFrame =
      StreamOps.windowedCounts(stream(store), "1 hour", "5 seconds")
    val p1 = drainAll[(String, Long)](windows(), cp,
      df => df.collect().map(r => (r.getString(1), r.getLong(2))).toSeq)
    assert(p1.isEmpty, s"no window is closed yet: $p1")

    ingest(store, Map("app" -> "w1"), "u", Seq(7300)) // 2h+: closes [0,1h)
    val p2 = drainAll[(String, Long)](windows(), cp,
      df => df.collect().map(r => (r.getString(1), r.getLong(2))).toSeq)
    assert(p2.toSet == Set(("app=w1", 3L), ("app=w2", 1L)),
      s"exactly the closed [0,1h) windows, each once: $p2")
  }

  test("windowDistinct: streaming sketch equals the batch sketch per closed window") {
    val store = freshStore()
    // [0,1h): users u0..u4 (5 distinct); [1h,2h): u0 only
    (0 until 5).foreach(i =>
      ingest(store, Map("app" -> "wd"), s"u$i", Seq(100L + i, 200L + i)))
    ingest(store, Map("app" -> "wd"), "u0", Seq(3700))

    val batchDf = spark.read.format("graft-store").option("root", store.root).load()
    val batch = StreamOps.windowDistinct(batchDf, "user", "1 hour", "5 seconds")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the default rsd (0.02) is exact at these cardinalities
    assert(batch(0L) == 5L && batch(3600000000L) == 1L)

    // streaming: [0,1h) closes once the 1h+ event's watermark lands
    val cp = Files.createTempDirectory("graft-sops-wd").toString
    def q(): DataFrame =
      StreamOps.windowDistinct(stream(store), "user", "1 hour", "5 seconds")
    val p1 = drainAll[(Long, Long)](q(), cp,
      df => df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(p1.toSet == Set((0L, 5L)),
      s"exactly the closed [0,1h) window, sketch == batch sketch: $p1")

    ingest(store, Map("app" -> "wd"), "u1", Seq(7300)) // closes [1h,2h)
    val p2 = drainAll[(Long, Long)](q(), cp,
      df => df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(p2.toSet == Set((3600000000L, 1L)), s"second window once: $p2")
  }

  test("windowDrift: streaming PSI equals batch per closed window, zero for the baseline mix") {
    val store = freshStore()
    // [0,1h): 3 click + 1 view; [1h,2h): 1 click + 3 view (inverted mix)
    ingest(store, Map("name" -> "click"), "u", Seq(100, 200, 300))
    ingest(store, Map("name" -> "view"), "u", Seq(400))
    ingest(store, Map("name" -> "click"), "u", Seq(3700))
    ingest(store, Map("name" -> "view"), "u", Seq(3800, 3900, 4000))

    val batchDf = spark.read.format("graft-store").option("root", store.root).load()
    // the profile is STATIC by contract — pin it to a literal table so
    // the late closing ingest below cannot drift the baseline itself
    // (a lazy plan over the store would re-read it per micro-batch)
    val baseline = {
      import spark.implicits._
      StreamOps.driftBaseline(batchDf).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq.toDF("part", "cb")
    }
    val batch = StreamOps.windowDrift(batchDf, baseline, "1 hour", "5 seconds")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(batch.keySet == Set(0L, 3600000000L))
    // the two windows mirror each other against the 50/50 baseline:
    // identical (n, v) and identical positive drift either way
    assert(batch(0L) == batch(3600000000L))
    assert(batch(0L)._3 > 0L, s"skewed mix must score positive PSI: $batch")

    // a window whose mix EQUALS the baseline scores exactly zero: the
    // smoothed probabilities and both log ratios all cancel only when
    // the proportions match (power-of-two ratios keep Log2Fix exact)
    val even = freshStore()
    ingest(even, Map("name" -> "click"), "u", Seq(100, 200))
    ingest(even, Map("name" -> "view"), "u", Seq(300, 400))
    val evenDf = spark.read.format("graft-store").option("root", even.root).load()
    val ePsi = StreamOps.windowDrift(evenDf, StreamOps.driftBaseline(evenDf),
      "1 hour", "5 seconds").collect()
    assert(ePsi.length == 1 && ePsi.head.getLong(3) == 0L,
      s"baseline-identical window must score 0: ${ePsi.toSeq}")

    // streaming: append emits each closed window's score exactly once,
    // equal to the batch computation over the same baseline
    val cp = Files.createTempDirectory("graft-sops-drift").toString
    def q(): DataFrame =
      StreamOps.windowDrift(stream(store), baseline, "1 hour", "5 seconds")
    val p1 = drainAll[(Long, Long, Long, Long, Long)](q(), cp,
      df => df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq)
    assert(p1.toSet ==
      Set((0L, batch(0L)._1, batch(0L)._2, batch(0L)._3, batch(0L)._4)),
      s"exactly the closed [0,1h) score, equal to batch: $p1")
    ingest(store, Map("name" -> "click"), "u", Seq(7300)) // closes [1h,2h)
    val p2 = drainAll[(Long, Long, Long, Long, Long)](q(), cp,
      df => df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq)
    assert(p2.map(_._1).toSet == Set(3600000000L) &&
      p2.head == ((3600000000L, batch(3600000000L)._1, batch(3600000000L)._2,
        batch(3600000000L)._3, batch(3600000000L)._4)),
      s"second window once, equal to batch: $p2")
  }

  test("sessionize: batch path gives the same sessions the stream closes") {
    val store = freshStore()
    // u1: two sessions (gap 10s exceeded between 102 and 200); u2: one
    ingest(store, Map("app" -> "s"), "u1", Seq(100, 101, 102, 200, 203))
    ingest(store, Map("app" -> "s"), "u2", Seq(100))
    val batch = StreamOps.sessionize(
      spark.read.format("graft-store").option("root", store.root).load(),
      "user", gapSeconds = 10, watermarkDelay = "5 seconds")
      .collect().map(s => (s.key, s.startTs / 1000000000L,
        s.endTs / 1000000000L, s.events)).toSet
    assert(batch == Set(("u1", 100L, 102L, 3L), ("u1", 200L, 203L, 2L),
      ("u2", 100L, 100L, 1L)))
  }

  test("sessionize: gap-closed sessions emit exactly once, open state never leaks") {
    val store = freshStore()
    ingest(store, Map("app" -> "s"), "u1", Seq(100, 101, 102))
    ingest(store, Map("app" -> "s"), "u2", Seq(100))
    val cp = Files.createTempDirectory("graft-sops-cp").toString
    def drainSessions(): Seq[(String, Long, Long, Long)] =
      drainAll[(String, Long, Long, Long)](
        StreamOps.sessionize(stream(store), "user",
          gapSeconds = 10, watermarkDelay = "5 seconds").toDF(), cp,
        df => df.collect().map(r => (r.getString(1),
          r.getLong(2) / 1000000000L, r.getLong(3) / 1000000000L, r.getLong(4))).toSeq)
    val p1 = drainSessions()
    assert(p1.isEmpty, s"nothing past watermark+gap yet: $p1")

    // u1's second burst starts a new session in-batch (gap exceeded), so
    // the first closes immediately; u2's closes by event-time timeout once
    // the watermark passes 100+gap
    ingest(store, Map("app" -> "s"), "u1", Seq(200, 203))
    val p2 = drainSessions()
    assert(p2.toSet == Set(("u1", 100L, 102L, 3L), ("u2", 100L, 100L, 1L)),
      s"both phase-1 sessions closed exactly once: $p2")
    assert(!p2.exists(_._2 == 200L), "the open session (200..203) must not emit")
  }

  test("dedupFirst: emits each key's earliest event exactly once, late replays drop") {
    val store = freshStore()
    ingest(store, Map("app" -> "d"), "u1", Seq(100, 105, 110))
    ingest(store, Map("app" -> "d"), "u2", Seq(200))
    // batch mode: one winner per key
    val batch = StreamOps.dedupFirst(
      spark.read.format("graft-store").option("root", store.root).load(),
      "user", "5 seconds")
      .collect().map(f => (f.key, f.firstTs / 1000000000L)).toSet
    assert(batch == Set(("u1", 100L), ("u2", 200L)))

    val cp = Files.createTempDirectory("graft-sops-cp").toString
    def drainFirsts(): Seq[(String, Long)] =
      drainAll[(String, Long)](
        StreamOps.dedupFirst(stream(store), "user", "5 seconds").toDF(), cp,
        df => df.collect().map(r =>
          (r.getString(1), r.getLong(2) / 1000000000L)).toSeq)
    // watermark after phase 1 = 110-5 = 105: passes u1's winner (100) but
    // not u2's (200)
    val p1 = drainFirsts()
    assert(p1 == Seq(("u1", 100L)), s"only u1's winner is past watermark: $p1")

    // an out-of-order 150 for u2 (above watermark) REPLACES the buffered
    // 200 before emission; the 300 advances the watermark past both
    ingest(store, Map("app" -> "d"), "u2", Seq(150))
    ingest(store, Map("app" -> "d"), "u1", Seq(300))
    val p2 = drainFirsts()
    assert(p2 == Seq(("u2", 150L)),
      s"u2 emits its min-ts winner once; u1's tombstone suppresses: $p2")

    // everything now at/below the tombstones: nothing further, ever
    ingest(store, Map("app" -> "d"), "u1", Seq(400))
    ingest(store, Map("app" -> "d"), "u2", Seq(400))
    val p3 = drainFirsts()
    assert(p3.isEmpty, s"emitted keys never re-emit: $p3")
  }

  test("windowTopKey: chained stateful aggs emit each window's winner exactly once") {
    val store = freshStore()
    // window [0h,1h): u1 x3, u2 x2 -> winner u1/3; tie check in [1h,2h):
    // u1 x2, u2 x2 -> winner = larger key u2
    ingest(store, Map("app" -> "t"), "u1", Seq(100, 200, 300))
    ingest(store, Map("app" -> "t"), "u2", Seq(400, 500))
    ingest(store, Map("app" -> "t"), "u1", Seq(3700, 3800))
    ingest(store, Map("app" -> "t"), "u2", Seq(3900, 4000))

    // batch: same call, same winners
    val batch = StreamOps.windowTopKey(
      spark.read.format("graft-store").option("root", store.root).load(),
      "user", "1 hour", "5 seconds")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(batch == Set((0L, "u1", 3L), (3600000000L, "u2", 2L)), s"batch: $batch")

    val cp = Files.createTempDirectory("graft-sops-wt-cp").toString
    def drain(): Seq[(Long, String, Long)] =
      drainAll[(Long, String, Long)](
        StreamOps.windowTopKey(stream(store), "user", "1 hour", "5 seconds"),
        cp, df => df.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2))).toSeq)
    // watermark 4000-5 s: closes [0,1h), not [1h,2h)
    val p1 = drain()
    assert(p1 == Seq((0L, "u1", 3L)), s"only the closed window emits: $p1")
    // push the watermark past 2h: the second window's winner emits once
    ingest(store, Map("app" -> "t"), "u3", Seq(7300))
    val p2 = drain()
    assert(p2 == Seq((3600000000L, "u2", 2L)), s"tie -> larger key, once: $p2")
  }

  test("windowTopK: ranked leaderboard emits once per closed window, ties to larger key") {
    val store = freshStore()
    // [0,1h): u1 x3, u2 x2, u3 x2, u4 x1 -> top3 = u1/3, u3/2 (tie ->
    // larger key first), u2/2; u4 cut at k=3
    ingest(store, Map("app" -> "tk"), "u1", Seq(100, 200, 300))
    ingest(store, Map("app" -> "tk"), "u2", Seq(400, 500))
    ingest(store, Map("app" -> "tk"), "u3", Seq(600, 700))
    ingest(store, Map("app" -> "tk"), "u4", Seq(800))

    val batch = StreamOps.windowTopK(
      spark.read.format("graft-store").option("root", store.root).load(),
      "user", "1 hour", "5 seconds", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(batch.toSeq.sortBy(_._2) == Seq(
      (0L, 1L, "u1", 3L), (0L, 2L, "u3", 2L), (0L, 3L, "u2", 2L)),
      s"ranked top-3 with the larger-key tie-break: ${batch.toSeq}")

    val cp = Files.createTempDirectory("graft-sops-tk").toString
    def drain(): Seq[(Long, Long, String, Long)] =
      drainAll[(Long, Long, String, Long)](
        StreamOps.windowTopK(stream(store), "user", "1 hour", "5 seconds", 3),
        cp, df => df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSeq)
    val p1 = drain()
    assert(p1.isEmpty, s"window still open: $p1")
    ingest(store, Map("app" -> "tk"), "u9", Seq(7300)) // closes [0,1h)
    val p2 = drain()
    assert(p2.sortBy(_._2) == batch.toSeq.sortBy(_._2),
      s"streamed leaderboard == batch, exactly once: $p2")
  }

  test("windowQuantile: chained histogram aggs emit each window's exact p90 once") {
    val store = freshStore()
    // window [0,1h): values 1..10 -> n=10, k=ceil(0.9*10)=9 -> p90 = 9
    (1 to 10).foreach(v => ingest(store, Map("app" -> "q"), v.toString, Seq(100L + v)))
    // window [1h,2h): values {5,5,7} -> n=3, k=ceil(2.7)=3 -> p90 = 7
    ingest(store, Map("app" -> "q"), "5", Seq(3700, 3710))
    ingest(store, Map("app" -> "q"), "7", Seq(3800))

    val batch = StreamOps.windowQuantile(
      spark.read.format("graft-store").option("root", store.root).load(),
      "user", "1 hour", "5 seconds", qE4 = 9000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch == Set((0L, 10L, 9L, 9L), (3600000000L, 3L, 3L, 7L)),
      s"batch: $batch")

    val cp = Files.createTempDirectory("graft-sops-wq-cp").toString
    def drain(): Seq[(Long, Long, Long, Long)] =
      drainAll[(Long, Long, Long, Long)](
        StreamOps.windowQuantile(stream(store), "user", "1 hour", "5 seconds",
          qE4 = 9000L),
        cp, df => df.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq)
    // watermark 3800-5 s: closes [0,1h) only
    val p1 = drain()
    assert(p1 == Seq((0L, 10L, 9L, 9L)), s"only the closed window emits: $p1")
    // advance the watermark past 2h: the second window emits exactly once
    ingest(store, Map("app" -> "q"), "1", Seq(7300))
    val p2 = drain()
    assert(p2 == Seq((3600000000L, 3L, 3L, 7L)), s"second window once: $p2")
  }

  test("incrementalDedup: history keys are suppressed, novel keys emit their earliest once") {
    val histStore = freshStore()
    ingest(histStore, Map("app" -> "i"), "u1", Seq(10, 20))
    ingest(histStore, Map("app" -> "i"), "u2", Seq(30))
    val history = spark.read.format("graft-store").option("root", histStore.root).load()

    val store = freshStore()
    ingest(store, Map("app" -> "i"), "u1", Seq(100))      // known -> never emits
    ingest(store, Map("app" -> "i"), "u3", Seq(210, 200)) // novel -> earliest wins
    // (210 puts the watermark at 205 > the winner's 200, so the novel
    // key finalizes within the first drain sequence)

    // batch: anti-join + first-occurrence
    val batch = StreamOps.incrementalDedup(
      spark.read.format("graft-store").option("root", store.root).load(),
      history, "user", "5 seconds")
      .collect().map(f => (f.key, f.firstTs / 1000000000L)).toSet
    assert(batch == Set(("u3", 200L)), s"only the novel key's earliest: $batch")

    // streaming: same result, emitted exactly once across drains
    val cp = Files.createTempDirectory("graft-sops-incr-cp").toString
    def drain(): Seq[(String, Long)] =
      drainAll[(String, Long)](
        StreamOps.incrementalDedup(stream(store), history, "user", "5 seconds").toDF(),
        cp, df => df.collect().map(r =>
          (r.getString(1), r.getLong(2) / 1000000000L)).toSeq)
    val p1 = drain()
    assert(p1 == Seq(("u3", 200L)), s"stream must match batch: $p1")

    // a later u3 event and a fresh novel u4: only u4 emits (u3 tombstoned),
    // and the known u1 stays suppressed through new batches
    ingest(store, Map("app" -> "i"), "u3", Seq(300))
    ingest(store, Map("app" -> "i"), "u1", Seq(301))
    ingest(store, Map("app" -> "i"), "u4", Seq(302, 400))
    val p2 = drain()
    assert(p2 == Seq(("u4", 302L)), s"tombstones + history suppression hold: $p2")
  }

  test("randomized differential: batch sessionize matches a naive reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 5) {
      val rows = (1 to (2 + rnd.nextInt(20))).map { i =>
        (s"app=s${rnd.nextInt(2)}", Map("user" -> s"u${rnd.nextInt(3)}"),
          rnd.nextInt(50).toLong * 1000000000L, i.toLong)
      }
      val df = rows.toDF("part", "fields", "ts", "seq")
      val got = StreamOps.sessionize(df, "user", gapSeconds = 5,
          watermarkDelay = "1 second")
        .collect().map(s => (s.part, s.key, s.startTs, s.endTs, s.events)).toSet

      val want = rows.groupBy(r => (r._1, r._2("user"))).flatMap {
        case ((part, key), grp) =>
          val ts = grp.map(_._3).sorted
          val sessions = scala.collection.mutable.ArrayBuffer.empty[Vector[Long]]
          ts.foreach { t =>
            if (sessions.nonEmpty && t - sessions.last.last <= 5000000000L)
              sessions(sessions.length - 1) = sessions.last :+ t
            else sessions += Vector(t)
          }
          sessions.map(s => (part, key, s.head, s.last, s.size.toLong))
      }.toSet
      assert(got == want, s"sessionize mismatch round $round: rows=$rows")
    }
  }

  test("transitions: pairs finalize only past the watermark; out-of-order events split chains") {
    val store = freshStore()
    val cp = Files.createTempDirectory("graft-sops-cp").toString
    def drainSteps(): Seq[(Long, Long)] =
      drainAll[(Long, Long)](
        StreamOps.transitions(stream(store), "user", "2 minutes").toDF(), cp,
        df => df.collect().map(r =>
          (r.getLong(2) / 1000000000L, r.getLong(4) / 1000000000L)).toSeq)

    // phase 1: events at 100 and 200 (different parts). Watermark after
    // the drain is 200-120=80 — nothing final, nothing emits.
    ingest(store, Map("app" -> "t1"), "u1", Seq(100))
    ingest(store, Map("app" -> "t2"), "u1", Seq(200))
    assert(drainSteps().isEmpty, "no successor is past the watermark yet")

    // phase 2: 150 arrives OUT OF ORDER but above the watermark (80) —
    // it must land mid-chain and split the would-be (100 -> 200) pair.
    ingest(store, Map("app" -> "t3"), "u1", Seq(150))
    assert(drainSteps().isEmpty, "watermark has not advanced")

    // phase 3: 400 pushes the watermark to 280 — 100/150/200 all final:
    // exactly the split pairs emit, (200 -> 400) stays pending.
    ingest(store, Map("app" -> "t1"), "u1", Seq(400))
    assert(drainSteps().toSet == Set((100L, 150L), (150L, 200L)),
      "the out-of-order event must have split the chain before finalization")

    // phase 4: 600 pushes the watermark to 480 — the bridged (200 -> 400)
    // pair emits exactly once (bridge retention across batches).
    ingest(store, Map("app" -> "t2"), "u1", Seq(600))
    assert(drainSteps().toSet == Set((200L, 400L)))

    // batch mode over the same store agrees on every emitted pair, and
    // the only missing one is the final pair whose successor the
    // watermark never passed
    val batch = StreamOps.transitions(
        spark.read.format("graft-store").option("root", store.root).load(),
        "user", "2 minutes")
      .collect().map(s => (s.fromTs / 1000000000L, s.toTs / 1000000000L)).toSet
    assert(batch == Set((100L, 150L), (150L, 200L), (200L, 400L), (400L, 600L)))
  }

  test("transitions: parts ride along and keys never cross") {
    val store = freshStore()
    ingest(store, Map("app" -> "a"), "u1", Seq(100, 300))
    ingest(store, Map("app" -> "b"), "u2", Seq(200))
    val batch = StreamOps.transitions(
        spark.read.format("graft-store").option("root", store.root).load(),
        "user", "1 minute")
      .collect().map(s => (s.key, s.fromPart, s.fromTs / 1000000000L,
        s.toPart, s.toTs / 1000000000L))
    // u2's lone event yields no step; u1's two events pair within app=a
    assert(batch.length == 1)
    assert(batch.head._1 == "u1" && batch.head._3 == 100L && batch.head._5 == 300L)
    assert(batch.head._2 == batch.head._4, "both u1 events are in app=a")
  }

  test("transitions: randomized bounded-disorder soak — streamed pairs are exactly the finalized batch prefix") {
    // event times arrive in chunks with intra-chunk shuffling bounded
    // WELL below the watermark delay, so no event is ever late-dropped:
    // every streamed pair must then appear in batch, and the streamed
    // set must be exactly the batch pairs whose successor the final
    // watermark strictly passed (nothing early, nothing lost)
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val store = freshStore()
      val cp = Files.createTempDirectory("graft-sops-cp").toString
      val users = Seq("u1", "u2")
      val delaySec = 60L
      var t = 1000L
      val src = StreamOps.transitions(stream(store), "user", s"$delaySec seconds")
      // toSeq (the successor's unique store seq) discriminates pairs that
      // share (key, from-sec, to-sec) under timestamp ties
      def drain(): Seq[(String, Long, Long, Long)] =
        drainAll[(String, Long, Long, Long)](src.toDF(), cp,
          df => df.collect().map(r => (r.getString(0),
            r.getLong(2) / 1000000000L, r.getLong(4) / 1000000000L,
            r.getLong(5))).toSeq)
      val streamed =
        scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
      val allTs = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (_ <- 0 until 4) {
        // chunk: 3-6 events, times increasing with jitter << delay
        val times = (0 until 3 + rnd.nextInt(4)).map { _ =>
          t += 5 + rnd.nextInt(10); t + rnd.nextInt(15) // ±15 s disorder
        }
        allTs ++= times
        times.foreach { ts =>
          ingest(store, Map("app" -> s"p${rnd.nextInt(3)}"),
            users(rnd.nextInt(users.length)), Seq(ts))
        }
        streamed ++= drain()
      }
      streamed ++= drain()
      val batchRows = StreamOps.transitions(
          spark.read.format("graft-store").option("root", store.root).load(),
          "user", s"$delaySec seconds")
        .collect()
      val batch = batchRows.map(s =>
        (s.key, s.fromTs / 1000000000L, s.toTs / 1000000000L, s.toSeq)).toSet
      // final watermark: the global max INGESTED event time (chain-tail
      // events advance it too, even though no pair carries them as `to`)
      // minus the delay, ms grain, strict pass
      val wmMs = allTs.max * 1000L - delaySec * 1000L
      val expected = batchRows
        .filter(_.toTs / 1000000L < wmMs)
        .map(s => (s.key, s.fromTs / 1000000000L, s.toTs / 1000000000L, s.toSeq))
        .toSet
      assert(streamed.size == streamed.toSet.size,
        s"seed=$seed: a pair emitted twice: $streamed")
      assert(streamed.toSet.subsetOf(batch),
        s"seed=$seed: streamed pair absent from batch")
      assert(streamed.toSet == expected,
        s"seed=$seed: streamed must be exactly the finalized prefix " +
          s"(missing=${expected -- streamed.toSet} extra=${streamed.toSet -- expected})")
    }
  }

  test("intervalJoin: stream-stream pairs match the batch result exactly") {
    val store = freshStore()
    // clicks at 100, 500; views at 102, 150, 400 (for u1) — within 60s of
    // click@100: views 102, 150; view@400 matches nothing; u2 isolated
    ingest(store, Map("kind" -> "click"), "u1", Seq(100, 500))
    ingest(store, Map("kind" -> "view"), "u1", Seq(102, 150, 400))
    ingest(store, Map("kind" -> "click"), "u2", Seq(100))
    ingest(store, Map("kind" -> "view"), "u2", Seq(520))

    def sides(df: DataFrame): (DataFrame, DataFrame) =
      (df.filter(col("part") === "kind=click"),
        df.filter(col("part") === "kind=view"))

    val (bc, bv) = sides(
      spark.read.format("graft-store").option("root", store.root).load())
    val batch = StreamOps.intervalJoin(bc, bv, "user", 60, "5 seconds")
      .collect().map(r => (r.getString(0),
        r.getLong(1) / 1000000000L, r.getLong(3) / 1000000000L)).toSet
    // u1 click@100 pairs with views 102 and 150; click@500 has no view in
    // [500,560); u2's view@520 is outside u2's click@100 window (and the
    // key equality keeps it away from u1's clicks)
    assert(batch == Set(("u1", 100L, 102L), ("u1", 100L, 150L)),
      s"unexpected batch pairs: $batch")

    val cp = Files.createTempDirectory("graft-sops-cp").toString
    def drainPairs(): Seq[(String, Long, Long)] = {
      val (sc, sv) = sides(stream(store))
      drainAll[(String, Long, Long)](
        StreamOps.intervalJoin(sc, sv, "user", 60, "5 seconds"), cp,
        df => df.collect().map(r => (r.getString(0),
          r.getLong(1) / 1000000000L, r.getLong(3) / 1000000000L)).toSeq)
    }
    val got = drainPairs()
    assert(got.toSet == batch,
      s"stream pairs ${got.toSet} != batch $batch")
    assert(got.size == got.toSet.size, s"no duplicate emissions: $got")
  }

  test("intervalJoin left_outer: unmatched clicks emit null rows, stream == batch") {
    val store = freshStore()
    ingest(store, Map("kind" -> "click"), "u1", Seq(100, 500))
    ingest(store, Map("kind" -> "view"), "u1", Seq(110))
    // the query watermark is the MIN across both watermarked inputs, so
    // BOTH sides need a far-future event before the unmatched click@500's
    // null row can emit in streaming mode (u2's click and view pair up)
    ingest(store, Map("kind" -> "view"), "u2", Seq(5000))
    ingest(store, Map("kind" -> "click"), "u2", Seq(5000))

    def sides(df: DataFrame): (DataFrame, DataFrame) =
      (df.filter(col("part") === "kind=click"),
        df.filter(col("part") === "kind=view"))
    def shape(rows: Seq[org.apache.spark.sql.Row]): Set[(String, Long, Long)] =
      rows.map(r => (r.getString(0), r.getLong(1) / 1000000000L,
        if (r.isNullAt(3)) -1L else r.getLong(3) / 1000000000L)).toSet

    val (bc, bv) = sides(
      spark.read.format("graft-store").option("root", store.root).load())
    val batch = shape(
      StreamOps.intervalJoin(bc, bv, "user", 60, "5 seconds", "left_outer")
        .collect().toSeq)
    assert(batch == Set(("u1", 100L, 110L), ("u1", 500L, -1L),
      ("u2", 5000L, 5000L)), s"unexpected batch outer pairs: $batch")

    val cp = Files.createTempDirectory("graft-sops-cp").toString
    val (sc, sv) = sides(stream(store))
    val got = drainAll[(String, Long, Long)](
      StreamOps.intervalJoin(sc, sv, "user", 60, "5 seconds", "left_outer"), cp,
      df => shape(df.collect().toSeq).toSeq)
    assert(got.toSet == batch, s"stream outer ${got.toSet} != batch $batch")
  }
}
