package graft

import graft.engine.Engine
import graft.lql.Ast.CreatePipe
import graft.lql.Parser
import graft.model.Model
import graft.store.Store
import graft.streaming.{PipeService, PipeWorker}
import org.scalatest.funsuite.AnyFunSuite

/** Long-running pipe soak (VERDICT r11 directive 6 / r10 directive 7): the
  * reference's pipes are resident worker goroutines
  * (pkg/pipe/worker.go:48-104), but every prior pipe gate drove
  * [[PipeWorker]] with explicit `processAllAvailable` drains — the
  * AvailableNow shape, which never exercises the BACKGROUND polling loop
  * racing ingest, compaction and TRUNCATE across many triggers. Here the
  * worker thread runs free at a 15 ms poll while an appender and a churner
  * hammer the source partition, and delivery must still be exactly-once:
  *  - no message is ever delivered twice (TRUNCATE may legitimately drop
  *    rows BEFORE delivery — that is its contract — but a duplicate is
  *    always a cursor bug);
  *  - every row still in the source at the end is delivered;
  *  - the background loop really did the work in MANY small triggers
  *    (not one big drain), and the destination self-compacted under its
  *    chunk threshold while cursors kept advancing. */
class PipeSoakSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ProcessingTime-style pipe worker races ingest + compact + TRUNCATE, exactly-once") {
    val root = java.nio.file.Files.createTempDirectory("graft-pipesoak").toString
    val st = new Store(spark, root)
    val e = new Engine(st)
    val part = "app=psoak"
    // tight poll + low self-compaction threshold: the soak should cross
    // many background triggers AND dest compactions in a few seconds
    val svc = new PipeService(st, pollMs = 15L, maxFilesPerTrigger = 8,
      compactThreshold = 4)
    val parsed = new Parser(() => java.time.Instant.now())
      .parse("CREATE PIPE psoak FROM {app=psoak}")
      .toOption.get.asInstanceOf[CreatePipe]
    svc.create(parsed) // starts the background worker before any data exists
    val worker: PipeWorker = svc.worker("psoak").get

    val appended = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val frontier = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var done = false
    @volatile var churnErr: Option[Throwable] = None

    val appender = new Thread(() => {
      try {
        for (k <- 0 until 25) {
          val base = (k + 1) * 100000000000L // 100 s apart
          val msgs = (0 until 4).map(i => s"p$k-$i")
          msgs.foreach(appended.add)
          st.write(Map("app" -> "psoak"), Map.empty,
            msgs.zipWithIndex.map { case (m, i) => (base + i * 1000000000L, m) }
              .toDF("ts", "msg"))
          frontier.set(base)
          Thread.sleep(new scala.util.Random(k).nextInt(40).toLong)
        }
      } finally done = true
    }, "psoak-appender")

    val churner = new Thread(() => {
      val rnd = new scala.util.Random(11)
      while (!done) {
        try {
          if (rnd.nextBoolean()) st.compact(part)
          else {
            val cut = frontier.get() / 2
            if (cut > 0) {
              val iso = java.time.Instant.ofEpochSecond(
                cut / 1000000000L, cut % 1000000000L).toString
              e.execute(s"""TRUNCATE {app=psoak} BEFORE "$iso"""").collect()
            }
          }
        } catch { case t: Throwable => churnErr = churnErr.orElse(Some(t)) }
        Thread.sleep(rnd.nextInt(60).toLong)
      }
    }, "psoak-churner")

    appender.start(); churner.start()
    appender.join(120000); churner.join(120000)
    assert(done, "appender did not finish")
    val backgroundBatches = worker.batches
    // final catch-up drain, then freeze the worker for the assertions
    svc.processAllAvailable()
    svc.processAllAvailable()
    svc.stopAll()
    churnErr.foreach(t => fail(s"churn thread failed: $t"))

    val destLine = Model.tagLine(Map(PipeService.PipeTag -> "psoak"))
    val delivered = st.read(Seq(destLine)).select("msg").collect()
      .map(_.getString(0)).toSeq
    assert(delivered.nonEmpty, "soak delivered nothing")
    // exactly-once: messages are globally unique at the source, so any
    // repeat in the destination is a cursor/delivery bug
    val dup = delivered.groupBy(identity).filter(_._2.size > 1)
    assert(dup.isEmpty, s"messages delivered more than once: ${dup.keys.take(5)}")
    // genuineness + completeness for survivors
    val deliveredSet = delivered.toSet
    assert(deliveredSet.subsetOf(appended.asScala()),
      "delivered a message that was never appended")
    val remaining = st.read(Seq(part)).select("msg").collect().map(_.getString(0))
    val missing = remaining.filterNot(deliveredSet.contains)
    assert(missing.isEmpty,
      s"${missing.length} surviving source rows never delivered: ${missing.take(5).toSeq}")
    // the BACKGROUND loop did the work across many triggers — a single
    // catch-up drain consuming everything would make this soak vacuous
    assert(backgroundBatches >= 5,
      s"background worker ran only $backgroundBatches triggers — the " +
        "polling loop never raced the churn")
  }

  test("CDC dedup-on-ingest pipe: soak exactly-once with the gate on; known content drops, partial novelty passes") {
    val root = java.nio.file.Files.createTempDirectory("graft-pipecdc").toString
    val st = new Store(spark, root)
    val e = new Engine(st)
    val part = "app=pcdc"
    val svc = new PipeService(st, pollMs = 15L, maxFilesPerTrigger = 8,
      compactThreshold = 4, cdcDedup = true)
    val parsed = new Parser(() => java.time.Instant.now())
      .parse("CREATE PIPE pcdc FROM {app=pcdc}")
      .toOption.get.asInstanceOf[CreatePipe]
    svc.create(parsed)
    val worker: PipeWorker = svc.worker("pcdc").get

    val appended = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val frontier = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var done = false
    @volatile var churnErr: Option[Throwable] = None

    // every 4th round REPEATS round k-4's contents verbatim — whether the
    // repeat is gated (crossed a trigger boundary) or passes (same
    // trigger as its original) is scheduling-dependent; the SOAK
    // assertions below are therefore about exactly-once and gate safety,
    // and the deterministic dedup assertions follow in the epilogue
    def roundMsgs(k: Int): Seq[String] =
      // k-3 ≡ 1 (mod 4) is itself never a repeat round, so every repeated
      // content appears EXACTLY twice in the source (original + repeat)
      if (k >= 4 && k % 4 == 0) roundMsgs(k - 3)
      else (0 until 3).map(i => s"cdc unique payload $k token$i")

    // slower cadence than the base soak: a CDC trigger is ~4 Spark jobs
    // (chunk persist, gate join, append, index update) — the window must
    // leave room for whole triggers to land BETWEEN churn deletions
    val appender = new Thread(() => {
      try {
        for (k <- 0 until 28) {
          val base = (k + 1) * 100000000000L
          val msgs = roundMsgs(k)
          msgs.foreach(appended.add)
          st.write(Map("app" -> "pcdc"), Map.empty,
            msgs.zipWithIndex.map { case (m, i) => (base + i * 1000000000L, m) }
              .toDF("ts", "msg"))
          frontier.set(base)
          Thread.sleep(40L + new scala.util.Random(k).nextInt(140).toLong)
        }
      } finally done = true
    }, "pcdc-appender")

    val churner = new Thread(() => {
      val rnd = new scala.util.Random(23)
      while (!done) {
        try {
          if (rnd.nextBoolean()) st.compact(part)
          else {
            val cut = frontier.get() / 2
            if (cut > 0) {
              val iso = java.time.Instant.ofEpochSecond(
                cut / 1000000000L, cut % 1000000000L).toString
              e.execute(s"""TRUNCATE {app=pcdc} BEFORE "$iso"""").collect()
            }
          }
        } catch { case t: Throwable => churnErr = churnErr.orElse(Some(t)) }
        Thread.sleep(60L + rnd.nextInt(120).toLong)
      }
    }, "pcdc-churner")

    appender.start(); churner.start()
    appender.join(120000); churner.join(120000)
    assert(done, "appender did not finish")
    val backgroundBatches = worker.batches
    svc.processAllAvailable()
    svc.processAllAvailable()
    churnErr.foreach(t => fail(s"churn thread failed: $t"))

    val destLine = Model.tagLine(Map(PipeService.PipeTag -> "pcdc"))
    def delivered(): Seq[String] =
      st.read(Seq(destLine)).select("msg").collect().map(_.getString(0)).toSeq
    val soak = delivered()
    assert(soak.nonEmpty, "CDC soak delivered nothing")
    // gate safety under churn: nothing foreign, and no content ever
    // delivered more often than it was appended (the gate can only DROP)
    assert(soak.toSet.subsetOf(appended.asScala()),
      "delivered a message that was never appended")
    val appCount = appended.asScala().map(m => m -> 1).toMap // contents unique per round set
    soak.groupBy(identity).foreach { case (m, copies) =>
      // a content appears at most twice in the source (original + one
      // repeat round); more copies than that is a cursor/delivery bug
      assert(copies.size <= 2, s"content '$m' delivered ${copies.size}x (max 2 in source)")
    }
    assert(appCount.nonEmpty)
    // completeness for surviving DISTINCT content: anything still in the
    // source must exist in the destination at least once (the gate drops
    // REPEATS, never first occurrences)
    val remaining = st.read(Seq(part)).select("msg").collect().map(_.getString(0))
    val deliveredSet = soak.toSet
    val missing = remaining.filterNot(deliveredSet.contains)
    assert(missing.isEmpty,
      s"${missing.length} surviving source contents never delivered: ${missing.take(5).toSeq}")
    // lower floor than the base soak's 5: CDC triggers are multi-job and
    // the churn eats more of them — 3 still proves the BACKGROUND loop
    // raced the churn rather than one catch-up drain doing everything
    assert(backgroundBatches >= 3,
      s"background worker ran only $backgroundBatches triggers")

    // ---- deterministic dedup epilogue (drain-bounded triggers) ----
    // a full repeat of ALREADY-DELIVERED content must be dropped by the
    // gate; a message sharing tokens with history but carrying a fresh
    // payload chunk must pass (partial novelty is not a duplicate)
    val known = soak.head
    val before = delivered().size
    st.write(Map("app" -> "pcdc"), Map.empty,
      Seq((900000000000000L, known),
        (900000000001000L, s"$known fresh epilogue payload alpha beta"))
        .toDF("ts", "msg"))
    svc.processAllAvailable()
    svc.stopAll()
    val after = delivered()
    assert(after.size == before + 1,
      s"expected exactly the novel row to pass (before=$before after=${after.size})")
    assert(after.count(_ == known) == soak.count(_ == known),
      "a fully-known content slipped past the CDC gate")
    assert(after.exists(_.endsWith("fresh epilogue payload alpha beta")),
      "the partially-novel row was wrongly dropped")

    // index self-maintenance: with one appended segment per indexed
    // trigger and compactThreshold=4, the soak's ~25 rounds MUST have
    // compacted — a long-running pipe may never accumulate O(triggers)
    // small files (and compaction may never lose a hash: the epilogue's
    // known-content drop above already proves the index still works)
    val idxDir = new java.io.File(s"$root/pipes/pcdc/cdcindex")
    val idxSegs = Option(idxDir.listFiles()).getOrElse(Array.empty)
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(idxSegs > 0, "CDC index missing after the soak")
    assert(idxSegs < 8,
      s"CDC index never compacted: $idxSegs segments for ~25 indexed triggers")
  }

  test("multi-driver CDC pipe: remote leases defer the gate, expiry releases it; exactly-once + dedup") {
    // round-14 directive 5: enableMultiDriver (r13) and cdcDedup pipes
    // (r13) shipped separately — compose them. Driver B appends under a
    // FILE lease while driver A's CDC pipe consumes; the pipe must defer
    // every row above B's epoch watermark while the lease is live
    // (including A's own later appends — seq order is delivery order),
    // then, when B CRASHES and the lease ages out, deliver everything
    // exactly once with the CDC gate still dropping known content.
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import graft.store.{FileEpochAllocator, FileInFlightRegistry}
    val root = java.nio.file.Files.createTempDirectory("graft-mdcdc").toString
    val conf = new Configuration()
    val localFs = new Path("/tmp").getFileSystem(conf)
    Store.enableMultiDriver(root, conf)
    val st = new Store(spark, root)
    val part = "app=mdcdc"
    val svc = new PipeService(st, pollMs = 1000000L, // explicit drains only
      maxFilesPerTrigger = 8, compactThreshold = 4, cdcDedup = true)
    val parsed = new Parser(() => java.time.Instant.now())
      .parse("CREATE PIPE mdcdc FROM {app=mdcdc}")
      .toOption.get.asInstanceOf[CreatePipe]
    svc.create(parsed)
    val destLine = Model.tagLine(Map(PipeService.PipeTag -> "mdcdc"))
    def delivered(): Seq[String] =
      st.read(Seq(destLine)).select("msg").collect().map(_.getString(0)).toSeq

    val known = "shared known content alpha beta gamma"
    // phase 1 — driver A: unique payloads + the known content, piped
    st.write(Map("app" -> "mdcdc"), Map.empty,
      ((0 until 6).map(i => (1000000000L + i * 1000000000L, s"payload a$i"))
        :+ (7000000000L, known)).toDF("ts", "msg"))
    svc.processAllAvailable()
    val phase1 = delivered()
    assert(phase1.sorted == ((0 until 6).map(i => s"payload a$i") :+ known).sorted)

    // phase 2 — driver B: separate allocator + registry instances
    // sharing ONLY the filesystem; claims an epoch, appends fresh
    // payloads AND a repeat of the known content, then CRASHES (no end)
    val allocB = new FileEpochAllocator(localFs, new Path(root, ".epochs"), seed = -1L)
    val regB = new FileInFlightRegistry(localFs,
      new Path(FileInFlightRegistry.dirFor(root)))
    val tokB = regB.preBegin(Some(Set(part)))
    val epochB = allocB.next()
    regB.begin(epochB, Some(Set(part)), tokB)
    st.write(Map("app" -> "mdcdc"), Map.empty,
      ((0 until 4).map(i => (20000000000L + i * 1000000000L, s"payload b$i",
        (epochB << Store.SeqEpochShift) + i))
        :+ ((24000000000L, known, (epochB << Store.SeqEpochShift) + 4)))
        .toDF("ts", "msg", "seq"))
    // driver A appends MORE (a higher epoch) while B is in flight
    st.write(Map("app" -> "mdcdc"), Map.empty,
      Seq((30000000000L, "payload a6"), (31000000000L, known))
        .toDF("ts", "msg"))
    // with B's lease live, the pipe must sit on its hands for this part
    svc.processAllAvailable()
    assert(delivered().sorted == phase1.sorted,
      s"pipe advanced past a remote in-flight epoch: ${delivered().sorted}")

    // phase 3 — B never returns: age the lease past expiry ON THE
    // FILESYSTEM CLOCK (mtime backdate; expiry compares fs-mtime to a
    // fs-probe mtime, so this is exactly the crash-expiry path)
    val leaseDir = new Path(FileInFlightRegistry.dirFor(root))
    localFs.listStatus(leaseDir).foreach { s =>
      if (s.getPath.getName.startsWith("ifl-") || s.getPath.getName.startsWith("pre-"))
        localFs.setTimes(s.getPath,
          s.getModificationTime - Store.EpochLeaseNanos / 1000000L - 60000L, -1)
    }
    svc.processAllAvailable()
    svc.stopAll()
    val fin = delivered()
    // exactly-once: B's fresh payloads and A's a6 arrive once; the known
    // content stays delivered ONCE (B's and A's repeats both gated)
    val expect = (0 until 7).map(i => s"payload a$i") ++
      (0 until 4).map(i => s"payload b$i") :+ known
    assert(fin.sorted == expect.sorted,
      s"expected exactly-once + dedup, got ${fin.sorted}")
    // and the destination's seqs are unique (no double delivery at all)
    val seqs = st.read(Seq(destLine)).select("seq").collect().map(_.getLong(0))
    assert(seqs.distinct.length == seqs.length)
  }

  test("TRUNCATE races a live multi-driver lease: no stall, no replay, lease reaps cleanly") {
    // round-15 directive 5 — the last uncomposed pair: r13 soaked
    // ingest+compact+TRUNCATE on one driver, r14 soaked multi-driver CDC;
    // here TRUNCATE (live, MAXDBSIZE whole-partition delete) fires while
    // driver B holds an UNEXPIRED lease on the truncated partition. The
    // consumer must neither stall forever nor replay, and the lease must
    // reap cleanly once B's crash ages it out.
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    import graft.store.{FileEpochAllocator, FileInFlightRegistry}
    val root = java.nio.file.Files.createTempDirectory("graft-tlease").toString
    val conf = new Configuration()
    val localFs = new Path("/tmp").getFileSystem(conf)
    Store.enableMultiDriver(root, conf)
    val st = new Store(spark, root)
    val e = new Engine(st)
    val part = "app=tlease"
    val svc = new PipeService(st, pollMs = 1000000L, // explicit drains only
      maxFilesPerTrigger = 8, compactThreshold = 4)
    val parsed = new Parser(() => java.time.Instant.now())
      .parse("CREATE PIPE tlease FROM {app=tlease}")
      .toOption.get.asInstanceOf[CreatePipe]
    svc.create(parsed)
    val destLine = Model.tagLine(Map(PipeService.PipeTag -> "tlease"))
    def delivered(): Seq[String] =
      st.read(Seq(destLine)).select("msg").collect().map(_.getString(0)).toSeq

    // phase 1 — driver A appends, pipe drains
    st.write(Map("app" -> "tlease"), Map.empty,
      (0 until 6).map(i => (1000000000L + i * 1000000000L, s"payload a$i"))
        .toDF("ts", "msg"))
    svc.processAllAvailable()
    val phase1 = delivered()
    assert(phase1.sorted == (0 until 6).map(i => s"payload a$i").sorted)

    // phase 2 — driver B claims an epoch and appends under a LIVE lease;
    // driver A appends more at a higher epoch (deferred too: seq order)
    val allocB = new FileEpochAllocator(localFs, new Path(root, ".epochs"), seed = -1L)
    val regB = new FileInFlightRegistry(localFs,
      new Path(FileInFlightRegistry.dirFor(root)))
    val tokB = regB.preBegin(Some(Set(part)))
    val epochB = allocB.next()
    regB.begin(epochB, Some(Set(part)), tokB)
    st.write(Map("app" -> "tlease"), Map.empty,
      (0 until 4).map(i => (20000000000L + i * 1000000000L, s"payload b$i",
        (epochB << Store.SeqEpochShift) + i)).toDF("ts", "msg", "seq"))
    st.write(Map("app" -> "tlease"), Map.empty,
      Seq((30000000000L, "payload a6")).toDF("ts", "msg"))
    svc.processAllAvailable()
    assert(delivered().sorted == phase1.sorted,
      "pipe advanced past a remote in-flight epoch")

    // phase 3 — TRUNCATE live, whole-partition MAXDBSIZE delete, WHILE
    // the lease is live: the source partition (B's undelivered rows and
    // A's deferred a6 included) goes away — TRUNCATE's contract
    val rep = e.execute("TRUNCATE {app=tlease} MAXDBSIZE 1").collect()
    assert(rep.length == 1 && rep(0).getAs[Boolean]("deleted"),
      s"MAXDBSIZE should delete the source partition wholly: ${rep.toSeq}")
    svc.processAllAvailable() // lease still live: no stall, no replay
    assert(delivered().sorted == phase1.sorted,
      "TRUNCATE under a live lease must not replay or deliver truncated rows")

    // phase 4 — B never returns: age the lease out on the FS clock and
    // drain; nothing may replay (the truncated rows are gone for good)
    val leaseDir = new Path(FileInFlightRegistry.dirFor(root))
    localFs.listStatus(leaseDir).foreach { s =>
      if (s.getPath.getName.startsWith("ifl-") || s.getPath.getName.startsWith("pre-"))
        localFs.setTimes(s.getPath,
          s.getModificationTime - Store.EpochLeaseNanos / 1000000L - 60000L, -1)
    }
    svc.processAllAvailable()
    assert(delivered().sorted == phase1.sorted)
    // the expiry sweep reaped B's lease files
    assert(regB.entries().isEmpty, "expired lease survived the sweep")
    val leaseFiles = localFs.listStatus(leaseDir)
      .map(_.getPath.getName).filter(n => n.startsWith("ifl-") || n.startsWith("pre-"))
    assert(leaseFiles.isEmpty, s"lease files not reaped: ${leaseFiles.toSeq}")

    // phase 5 — life goes on: fresh appends flow exactly once past the
    // truncated region (the cursor advanced cleanly over deleted chunks)
    st.write(Map("app" -> "tlease"), Map.empty,
      Seq((40000000000L, "payload a7"), (41000000000L, "payload a8"))
        .toDF("ts", "msg"))
    svc.processAllAvailable()
    svc.stopAll()
    val fin = delivered()
    assert(fin.sorted == (phase1 ++ Seq("payload a7", "payload a8")).sorted,
      s"post-truncate appends must deliver exactly once: ${fin.sorted}")
    val seqs = st.read(Seq(destLine)).select("seq").collect().map(_.getLong(0))
    assert(seqs.distinct.length == seqs.length, "duplicate delivery seq")
  }

  private implicit class KeySetOps(
      ks: java.util.Set[String]) {
    def asScala(): Set[String] = {
      val b = Set.newBuilder[String]
      ks.forEach(s => b += s)
      b.result()
    }
  }
}
