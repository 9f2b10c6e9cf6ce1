package graft

import graft.engine.Engine
import graft.store.Store
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial delivery-semantics locks for the graft-store stream under
  * concurrent maintenance (the round-7 review race, plus a randomized
  * soak): offsets must never regress and no committed row may be
  * re-emitted, even when compaction merges consumed chunks with
  * watermark-deferred ones while a lower-epoch append is in flight, and
  * even while TRUNCATE deletes chunks under a running drain.
  */
class StoreStreamSoakSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One Trigger.AvailableNow drain against `cp`, recording rows PER
    * BATCH ID (overwrite on redelivery — the standard idempotent-sink
    * contract, so a Spark-side batch retry can never masquerade as a
    * source-side duplicate). Retries the whole query on read failures
    * (TRUNCATE/compaction may delete a planned file mid-read; the failed
    * batch is uncommitted, so a retry cannot lose rows). */
  private def drain(root: String, cp: String,
      sink: scala.collection.mutable.Map[Long, Seq[(String, Long, String)]],
      retries: Int = 5): Unit = {
    var attempt = 0
    var ok = false
    while (!ok) {
      attempt += 1
      try {
        val q = spark.readStream.format("graft-store").option("root", root).load()
          .writeStream.foreachBatch { (df: DataFrame, batchId: Long) =>
            val rows = df.select("part", "seq", "msg").collect()
              .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
            sink.synchronized { sink(batchId) = rows }
            ()
          }
          .option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow()).start()
        try {
          if (!q.awaitTermination(180000)) fail("drain did not terminate")
        } finally q.stop()
        ok = true
      } catch {
        // a genuine hang must fail immediately, not burn 5 more drains
        case e: org.scalatest.exceptions.TestFailedException => throw e
        case e: Throwable if attempt <= retries =>
          info(s"drain attempt $attempt failed (file churned under read?): $e")
      }
    }
  }

  private def flat(sink: scala.collection.mutable.Map[Long, Seq[(String, Long, String)]]) =
    sink.synchronized(sink.toSeq).sortBy(_._1).flatMap(_._2)

  test("round-7 race: compaction hiding the partition behind the watermark never regresses the offset") {
    val root = java.nio.file.Files.createTempDirectory("graft-race").toString
    val st = new Store(spark, root)
    val part = "app=race"
    val cp = s"$root/cp"
    val sink = scala.collection.mutable.Map.empty[Long, Seq[(String, Long, String)]]

    // batch A, fully drained and committed
    st.write(Map("app" -> "race"), Map.empty,
      (0 until 3).map(i => (1000000000L + i * 1000000000L, s"a$i")).toDF("ts", "msg"))
    drain(root, cp, sink)
    val afterA = flat(sink)
    assert(afterA.map(_._3).sorted == Seq("a0", "a1", "a2"))

    // batch B lands (higher epoch) ...
    st.write(Map("app" -> "race"), Map.empty,
      (0 until 3).map(i => (50000000000L + i * 1000000000L, s"b$i")).toDF("ts", "msg"))
    val maxSeqB = st.catalog.load().filter(_.part == part).map(_.maxSeq).max
    val epochB = maxSeqB >> Store.SeqEpochShift
    // ... and an append with an epoch <= B's is (still) in flight against
    // the same partition, holding the safe-seq watermark below B's seqs
    Store.inFlightFor(root)
      .put(epochB, Store.InFlight(System.nanoTime(), Some(Set(part))))

    try {
      // compaction merges the CONSUMED A-chunk with the DEFERRED B-chunk:
      // the partition's only catalog entry is now above the watermark —
      // the exact round-7 scenario that used to drop the partition from
      // the offset and re-emit A once the in-flight epoch resolved
      st.compact(part)
      drain(root, cp, sink)
      val mid = flat(sink)
      assert(mid.map(_._3).sorted == Seq("a0", "a1", "a2"),
        s"deferred-partition drain must emit nothing new, got ${mid.map(_._3)}")
    } finally Store.inFlightFor(root).remove(epochB)

    // in-flight resolved: exactly B arrives, A is NOT re-emitted
    drain(root, cp, sink)
    val all = flat(sink)
    assert(all.map(_._3).sorted == Seq("a0", "a1", "a2", "b0", "b1", "b2"),
      s"expected A once + B once, got ${all.map(_._3).sorted}")
    assert(all.map(_._2).distinct.size == all.size, "duplicate seqs delivered")
  }

  test("randomized soak: appends + compaction + TRUNCATE under repeated drains deliver exactly once") {
    val root = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val st = new Store(spark, root)
    val e = new Engine(st)
    val part = "app=soak"
    val cp = s"$root/cp"
    val sink = scala.collection.mutable.Map.empty[Long, Seq[(String, Long, String)]]
    val appended = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val frontier = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var done = false
    @volatile var churnErr: Option[Throwable] = None

    val appender = new Thread(() => {
      try {
        for (k <- 0 until 20) {
          val base = (k + 1) * 100000000000L // 100 s apart
          val msgs = (0 until 5).map(i => s"m$k-$i")
          msgs.foreach(appended.add)
          st.write(Map("app" -> "soak"), Map.empty,
            msgs.zipWithIndex.map { case (m, i) => (base + i * 1000000000L, m) }
              .toDF("ts", "msg"))
          frontier.set(base)
          Thread.sleep(new scala.util.Random(k).nextInt(50).toLong)
        }
      } finally done = true
    })
    val churner = new Thread(() => {
      val rnd = new scala.util.Random(7)
      while (!done) {
        try {
          if (rnd.nextBoolean()) st.compact(part)
          else {
            // truncate chunks wholly before a point well behind the append
            // frontier — rows lost before delivery are permitted (that is
            // TRUNCATE's contract); duplicates never are
            val cut = frontier.get() / 2
            if (cut > 0) {
              val iso = java.time.Instant.ofEpochSecond(
                cut / 1000000000L, cut % 1000000000L).toString
              e.execute(s"""TRUNCATE {app=soak} BEFORE "$iso"""").collect()
            }
          }
        } catch { case t: Throwable => churnErr = churnErr.orElse(Some(t)) }
        Thread.sleep(rnd.nextInt(70).toLong)
      }
    })

    appender.start(); churner.start()
    // Mid-churn drains may exhaust their retry budget under heavy suite
    // load (every attempt can hit a freshly-compacted/truncated file); a
    // failed drain is an UNCOMMITTED batch, so tolerating it here loses
    // nothing — the strict post-churn drains below carry the
    // completeness and exactly-once assertions. Hangs still fail fast.
    // Count attempts vs swallows: a transient race losing SOME drains is
    // the tolerated mode; EVERY mid-churn drain failing means a
    // persistent (non-transient) failure the post-churn assertions would
    // only see as a data effect — surface it here with the last cause.
    var drainAttempts = 0
    var drainSwallowed = 0
    var lastSwallowed: Option[Throwable] = None
    while (!done) {
      drainAttempts += 1
      try drain(root, cp, sink)
      catch {
        case e: org.scalatest.exceptions.TestFailedException => throw e
        // NonFatal only: an OOM/interrupt must surface with its real
        // cause, not resurface later as an unrelated assertion failure
        case scala.util.control.NonFatal(t) =>
          drainSwallowed += 1; lastSwallowed = Some(t)
      }
    }
    appender.join(60000); churner.join(60000)
    assert(drainAttempts > 0, "churn window closed before any drain ran")
    assert(drainSwallowed < drainAttempts,
      s"every mid-churn drain failed ($drainSwallowed/$drainAttempts) — " +
        s"persistent failure, not a transient race; last: $lastSwallowed")
    // post-churn drains: everything still in the store must surface
    drain(root, cp, sink)
    drain(root, cp, sink)

    churnErr.foreach(t => fail(s"churn thread failed: $t"))
    val all = flat(sink)
    assert(all.nonEmpty, "soak delivered nothing")
    // exactly-once: a (part, seq) may appear in at most ONE batch
    val dup = all.groupBy(r => (r._1, r._2)).filter(_._2.size > 1)
    assert(dup.isEmpty, s"rows delivered more than once: ${dup.keys.take(5)}")
    // delivered messages are genuine
    assert(all.forall(r => appended.contains(r._3)),
      "delivered a message that was never appended")
    // completeness for survivors: every row still in the store was delivered
    val remaining = spark.read.format("graft-store").option("root", root).load()
      .select("seq", "msg").collect().map(r => (r.getLong(0), r.getString(1)))
    val deliveredSeqs = all.map(r => (r._2, r._3)).toSet
    val missing = remaining.filterNot(deliveredSeqs.contains)
    assert(missing.isEmpty,
      s"${missing.length} surviving rows never delivered: ${missing.take(5).toSeq}")
  }
}
