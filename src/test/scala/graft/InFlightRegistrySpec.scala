package graft

import graft.store.{FileEpochAllocator, FileInFlightRegistry, InFlightEntry, Store}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The externalized in-flight lease (round-13 directive 2): a SECOND
  * driver's in-flight append to a partition this driver's consumers read
  * must defer their cursors exactly like a local one — the per-JVM
  * watermark's documented multi-driver gap, closed by
  * [[FileInFlightRegistry]] + [[Store.useInFlightRegistry]]. */
class InFlightRegistrySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def localFs = new Path("/tmp").getFileSystem(new Configuration())

  private def tmpDir(prefix: String): Path =
    new Path(java.nio.file.Files.createTempDirectory(prefix).toString)

  test("lease protocol: announce/claim/release visible across instances; parts round-trip") {
    val dir = tmpDir("graft-ifl")
    val a = new FileInFlightRegistry(localFs, dir)
    val b = new FileInFlightRegistry(localFs, dir) // "the other driver"

    assert(b.entries().isEmpty)
    // announce: epoch unknown — consumers must defer everything matching
    val parts = Set("app=x,env=p", "app=y\nweird,env=p") // newline survives esc
    val tok = a.preBegin(Some(parts))
    assert(b.entries() == Seq(InFlightEntry(None, Some(parts))))
    assert(Store.watermarkFrom(b.entries(), Some("app=x,env=p")) == -1L)
    // a part OUTSIDE the declared targets is not deferred
    assert(Store.watermarkFrom(b.entries(), Some("app=z")) == Long.MaxValue)
    // claim: the epoch bounds the watermark
    a.begin(7L, Some(parts), tok)
    assert(b.entries() == Seq(InFlightEntry(Some(7L), Some(parts))))
    assert(Store.watermarkFrom(b.entries(), Some("app=x,env=p")) ==
      (7L << Store.SeqEpochShift) - 1)
    // release: nothing in flight
    a.end(7L)
    assert(b.entries().isEmpty)
    // unknown targets defer every part
    val tok2 = a.preBegin(None)
    a.begin(9L, None, tok2)
    assert(Store.watermarkFrom(b.entries(), Some("anything")) ==
      (9L << Store.SeqEpochShift) - 1)
    a.end(9L)
    // aborted announcement releases immediately (no 10-min dead lease)
    val tok3 = a.preBegin(Some(Set("app=x")))
    a.abort(tok3)
    assert(b.entries().isEmpty)
  }

  test("an unreadable lease file defers ALL parts, never fewer") {
    val dir = tmpDir("graft-iflbad")
    val r = new FileInFlightRegistry(localFs, dir)
    // a garbage claim file (e.g. a crashed writer's torn state would be a
    // .tmp and ignored; this is a VISIBLE file with unparseable content —
    // readParts must fall back to targets-unknown)
    val out = localFs.create(new Path(dir, "ifl-0000000000000000005"), true)
    out.close() // empty content
    val es = r.entries()
    assert(es == Seq(InFlightEntry(Some(5L), None)))
    assert(Store.watermarkFrom(es, Some("any=part")) ==
      (5L << Store.SeqEpochShift) - 1)
  }

  test("two-driver append: driver B's in-flight lease defers driver A's stream mid-trigger; exactly-once") {
    val root = java.nio.file.Files.createTempDirectory("graft-2drv").toString
    val part = "app=2drv"
    val epochDir = new Path(root, "epochs")
    Store.useEpochAllocator(root,
      seed => new FileEpochAllocator(localFs, epochDir, seed))
    Store.useInFlightRegistry(root,
      new FileInFlightRegistry(localFs, new Path(FileInFlightRegistry.dirFor(root))))
    val st = new Store(spark, root)
    val cp = s"$root/cp"
    val sink = scala.collection.mutable.Map.empty[Long, Seq[(String, Long, String)]]

    // batch 1 through driver A's normal path, drained and committed
    st.write(Map("app" -> "2drv"), Map.empty,
      (0 until 3).map(i => (1000000000L + i * 1000000000L, s"a$i")).toDF("ts", "msg"))
    drain(root, cp, sink)
    assert(flat(sink).map(_._3).sorted == Seq("a0", "a1", "a2"))

    // ---- driver B: separate allocator + registry instances sharing ONLY
    // the filesystem (no JVM state in common with A's consumers) ----
    val allocB = new FileEpochAllocator(localFs, epochDir, seed = -1L)
    val regB = new FileInFlightRegistry(localFs,
      new Path(FileInFlightRegistry.dirFor(root)))
    val tokB = regB.preBegin(Some(Set(part)))
    // while B is announced-but-unclaimed, A must defer EVERYTHING on part
    assert(Store.safeSeqWatermarkFor(root, part) == -1L,
      "announced-but-unclaimed remote append must defer conservatively")
    val epochB = allocB.next()
    regB.begin(epochB, Some(Set(part)), tokB)
    assert(Store.safeSeqWatermarkFor(root, part) ==
      (epochB << Store.SeqEpochShift) - 1,
      "remote claimed lease must bound the local watermark")

    // driver A appends batch 2 — allocates an epoch ABOVE B's and
    // registers while B is still in flight (the skipped-row scenario)
    st.write(Map("app" -> "2drv"), Map.empty,
      (0 until 3).map(i => (50000000000L + i * 1000000000L, s"c$i")).toDF("ts", "msg"))
    val maxSeqA = st.catalog.load().filter(_.part == part).map(_.maxSeq).max
    assert((maxSeqA >> Store.SeqEpochShift) > epochB,
      "test setup: A's epoch must exceed B's for the race to be real")

    // mid-trigger drain: batch 2 is registered but must NOT be emitted —
    // B's lower-epoch rows would otherwise be stranded below the cursor
    drain(root, cp, sink)
    assert(flat(sink).map(_._3).sorted == Seq("a0", "a1", "a2"),
      s"drain advanced past a remote in-flight epoch: ${flat(sink).map(_._3)}")

    // driver B completes: rows with explicit epoch-B seqs (the append
    // path without seq assignment — B minted these in its own JVM), then
    // releases the lease
    st.write(Map("app" -> "2drv"), Map.empty,
      (0 until 3).map(i => (20000000000L + i * 1000000000L, s"b$i",
        (epochB << Store.SeqEpochShift) + i)).toDF("ts", "msg", "seq"))
    regB.end(epochB)
    assert(Store.safeSeqWatermarkFor(root, part) == Long.MaxValue)

    // everything flows, exactly once, B's rows included
    drain(root, cp, sink)
    val all = flat(sink)
    assert(all.map(_._3).sorted == Seq("a0", "a1", "a2", "b0", "b1", "b2", "c0", "c1", "c2"),
      s"expected a+b+c exactly once, got ${all.map(_._3).sorted}")
    assert(all.map(_._2).distinct.size == all.size, "duplicate seqs delivered")
  }

  test("enableMultiDriver installs both halves; writes mint file-claimed epochs and leases clean up") {
    val root = java.nio.file.Files.createTempDirectory("graft-mdrv").toString
    Store.enableMultiDriver(root, new Configuration())
    val st = new Store(spark, root)
    st.write(Map("app" -> "md"), Map.empty,
      (0 until 3).map(i => (1000000000L + i, s"m$i")).toDF("ts", "msg"))
    // epochs really came from the file allocator
    val epochDir = new Path(root, ".epochs")
    assert(localFs.exists(epochDir) && localFs.listStatus(epochDir).nonEmpty,
      "no epoch claim files — the file allocator was not installed")
    // the lease released cleanly: nothing in flight, watermark wide open
    assert(Store.safeSeqWatermarkFor(root, "app=md") == Long.MaxValue)
    assert(new FileInFlightRegistry(localFs,
      new Path(FileInFlightRegistry.dirFor(root))).entries().isEmpty)
    // rows landed, (part, seq) unique (a fresh store's first epoch is 0)
    val rows = st.read(Seq("app=md")).select("seq").collect().map(_.getLong(0))
    assert(rows.length == 3 && rows.distinct.length == 3)
  }

  /** One Trigger.AvailableNow drain (the StoreStreamSoakSpec pattern). */
  private def drain(root: String, cp: String,
      sink: scala.collection.mutable.Map[Long, Seq[(String, Long, String)]]): Unit = {
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
  }

  private def flat(sink: scala.collection.mutable.Map[Long, Seq[(String, Long, String)]]) =
    sink.synchronized(sink.toSeq).sortBy(_._1).flatMap(_._2)
}
