package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}

/** Allocates the per-append seq EPOCHS of [[Store.assignSeq]] (the high
  * bits above [[Store.SeqEpochShift]]). The contract is the uniqueness
  * half of the (part, seq) identity: every `next()` across EVERY
  * allocator sharing a store's backing sequence returns a distinct,
  * strictly-increasing value — two concurrent writers (a pipe's streaming
  * append racing a foreground ingest, or two DRIVERS on one store) can
  * then never mint colliding seqs, while later epochs still sort after
  * earlier ones so continuation tokens keep paging in append order.
  *
  * [[JvmEpochAllocator]] is the single-driver default (every append to a
  * root flows through one driver JVM — the documented design point);
  * [[FileEpochAllocator]] is the multi-driver shape: epochs are claimed
  * by atomic create-if-absent files on the shared filesystem, the same
  * primitive an HDFS NameNode or an object store's conditional put gives
  * you, and what a metastore sequence/transaction log replaces wholesale
  * at the 100 TB design point. Install one per root with
  * [[Store.useEpochAllocator]] BEFORE the store's first seq-assigning
  * append (reference analogue: the journal controller's single writer,
  * pkg/partition/partition.go:175-206, which this generalizes). */
trait EpochAllocator {
  /** The next epoch: strictly greater than anything this allocator — or
    * any allocator sharing the backing sequence — has returned. */
  def next(): Long
}

/** Process-local allocator: a plain atomic counter seeded above the
  * catalog's persisted high-water epoch. Exactly the pre-interface
  * behavior — the `lql_*` slate runs unchanged on it. */
final class JvmEpochAllocator(seed: Long) extends EpochAllocator {
  private val counter = new java.util.concurrent.atomic.AtomicLong(seed)
  def next(): Long = counter.incrementAndGet()
}

/** Shared-filesystem allocator for multi-driver stores: epoch N belongs
  * to whoever atomically creates `<dir>/epoch-N` first. Collisions are
  * impossible by the create-if-absent primitive (POSIX `O_EXCL` locally;
  * the atomic namespace create on HDFS; a conditional put on an object
  * store), not by any in-process lock — so two allocators in two JVMs
  * that have never heard of each other still mint disjoint epochs.
  *
  * Claim-file growth is bounded by a high-water rollup: every
  * [[FileEpochAllocator.RollupEvery]] claims the allocator persists
  * `hw` = its latest epoch and deletes claims at or below the PREVIOUS
  * rollup's high-water. The one-generation lag is what makes deletion
  * safe: a racing allocator's scan always sees either the deleted claims
  * themselves or the high-water file that superseded them, so its next
  * attempt is strictly above both — it can never re-claim a deleted
  * number. */
final class FileEpochAllocator(fs: FileSystem, dir: Path, seed: Long)
    extends EpochAllocator {

  import FileEpochAllocator._

  if (!fs.exists(dir)) fs.mkdirs(dir)

  private var cursor = math.max(seed, scanFloor())
  private var lastRollup = readHw()

  def next(): Long = synchronized {
    var n = math.max(cursor, scanFloor()) + 1
    var attempts = 0
    while (attempts < MaxAttempts) {
      if (tryClaim(new Path(dir, claimName(n)))) {
        cursor = n
        if (n - lastRollup >= RollupEvery) rollup(n)
        return n
      }
      // someone else owns n (or anything newer): rescan and move above
      n = math.max(n, scanFloor()) + 1
      attempts += 1
    }
    throw new IllegalStateException(
      s"could not claim an epoch after $MaxAttempts attempts under $dir")
  }

  /** Highest epoch visible on disk: the high-water file or any claim. */
  private def scanFloor(): Long =
    claimNames().foldLeft(readHw()) { (m, n) =>
      math.max(m, n.substring(ClaimPrefix.length).toLong)
    }

  /** Claim names, retrying the listing: a concurrent allocator's rollup
    * can delete a file between the directory list and its stat. */
  private def claimNames(): Seq[String] = {
    var attempts = 0
    while (true) {
      try return fs.listStatus(dir).iterator.map(_.getPath.getName)
        .filter(_.startsWith(ClaimPrefix)).toSeq
      catch {
        case _: java.io.FileNotFoundException if attempts < MaxAttempts =>
          attempts += 1
      }
    }
    Nil // unreachable
  }

  /** The persisted high-water, -1 when absent or UNREADABLE: a concurrent
    * rollup's truncate-and-rewrite window can expose an empty/partial
    * file. Tolerating it is safe — claims of the current generation are
    * only deleted AFTER the hw write closes, so whenever the hw read
    * fails (or reads a stale prefix) the surviving claim files still
    * carry the true floor and [[scanFloor]]'s max recovers it. */
  private def readHw(): Long = {
    val p = new Path(dir, HwName)
    try {
      if (!fs.exists(p)) return -1L
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      if (txt.isEmpty) -1L else txt.toLong
    } catch {
      case _: java.io.IOException => -1L
      case _: NumberFormatException => -1L
    }
  }

  private def rollup(n: Long): Unit = {
    // write hw FIRST (overwrite — monotonically increasing values only),
    // then drop claims a full generation behind it (see class doc)
    val out = fs.create(new Path(dir, HwName), true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
    val floor = lastRollup
    claimNames().foreach { name =>
      if (name.substring(ClaimPrefix.length).toLong <= floor)
        fs.delete(new Path(dir, name), false) // false = already gone: fine
    }
    lastRollup = n
  }

  /** Atomic create-if-absent. Hadoop's local-FS `create(overwrite=false)`
    * is check-then-act, so local paths go through NIO's `createFile`
    * (`O_CREAT|O_EXCL` — genuinely atomic); everything else relies on the
    * filesystem's own atomic namespace create (HDFS) and is documented as
    * requiring one. */
  private def tryClaim(p: Path): Boolean = {
    val uri = p.toUri
    if (uri.getScheme == null || uri.getScheme == "file") {
      try {
        java.nio.file.Files.createFile(java.nio.file.Paths.get(uri.getPath))
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    } else {
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
  }
}

object FileEpochAllocator {
  private[store] val ClaimPrefix = "epoch-"
  private[store] val HwName = "hw"
  private[store] val RollupEvery = 64L
  private[store] val MaxAttempts = 100000

  private[store] def claimName(n: Long): String = f"$ClaimPrefix$n%019d"
}
