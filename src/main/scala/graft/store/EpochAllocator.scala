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
  * pkg/partition/partition.go:175-206, which this generalizes).
  *
  * Scope note: a shared allocator makes cross-driver (part, seq)
  * UNIQUENESS hold; the registration-order watermark
  * ([[Store.safeSeqWatermarkFor]]) that streaming consumers use to
  * defer not-yet-registered lower epochs is externalized the SAME way
  * by [[InFlightRegistry]] — install a [[FileInFlightRegistry]]
  * alongside this allocator ([[Store.useInFlightRegistry]]) and a
  * second driver's in-flight appends defer the first driver's pipes and
  * streaming offsets exactly like local ones (lease files on the shared
  * filesystem carrying the declared target parts, announced BEFORE the
  * epoch claim so a consumer can never see a higher registered epoch
  * without the lower lease). A multi-driver deployment without the
  * registry installed retains the old caveat: consumers only defer on
  * their own driver's appends. */
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
  * impossible by the create-if-absent primitive (POSIX `O_CREAT|O_EXCL`
  * when the FILESYSTEM is the local one; the atomic namespace create on
  * HDFS; a conditional put on an object store), not by any in-process
  * lock — so two allocators in two JVMs that have never heard of each
  * other still mint disjoint epochs.
  *
  * Claim-file growth is bounded by a high-water rollup: every
  * [[FileEpochAllocator.RollupEvery]] claims the allocator records its
  * latest epoch as an exclusive-create marker file `hw-N` (the VALUE is
  * the name — there is no content to read, so no truncate/partial-read
  * window and no way for two writers to splice bytes) and deletes claims
  * at or below the PREVIOUS rollup's high-water. The one-generation lag
  * is what makes deletion safe: a racing allocator's scan always sees
  * either the deleted claims themselves or a high-water marker at or
  * above them, so its next attempt is strictly above both — it can never
  * re-claim a deleted number. Superseded `hw-*` markers are deleted
  * best-effort once a newer one exists. */
final class FileEpochAllocator(fs: FileSystem, dir: Path, seed: Long)
    extends EpochAllocator {

  import FileEpochAllocator._

  if (!fs.exists(dir)) fs.mkdirs(dir)

  private var cursor = math.max(seed, scanFloor())
  private var lastRollup = cursor

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

  /** Highest epoch visible on disk: any hw marker or any claim. */
  private def scanFloor(): Long =
    listNames().foldLeft(-1L) { (m, name) =>
      val n =
        if (name.startsWith(ClaimPrefix)) name.substring(ClaimPrefix.length).toLong
        else if (name.startsWith(HwPrefix)) name.substring(HwPrefix.length).toLong
        else -1L
      math.max(m, n)
    }

  /** Directory listing, retrying the race where a concurrent allocator's
    * rollup deletes a file between the directory list and its stat. */
  private def listNames(): Seq[String] = {
    var attempts = 0
    while (true) {
      try return fs.listStatus(dir).iterator.map(_.getPath.getName).toSeq
      catch {
        case _: java.io.FileNotFoundException if attempts < MaxAttempts =>
          attempts += 1
      }
    }
    Nil // unreachable
  }

  /** Best-effort maintenance — an epoch was already claimed when this
    * runs, so no failure here may fail the caller's append. The hw marker
    * must land BEFORE any claim is deleted (that ordering is the whole
    * deletion-safety argument); if its create fails, skip the deletes and
    * leave `lastRollup` alone so a later claim retries the rollup. */
  private def rollup(n: Long): Unit = {
    try { if (!tryClaim(new Path(dir, hwName(n)))) return }
    catch { case _: java.io.IOException => return }
    val floor = lastRollup
    lastRollup = n
    try listNames().foreach { name =>
      val stale =
        (name.startsWith(ClaimPrefix) && name.substring(ClaimPrefix.length).toLong <= floor) ||
        (name.startsWith(HwPrefix) && name.substring(HwPrefix.length).toLong < n)
      if (stale) fs.delete(new Path(dir, name), false) // false = already gone: fine
    } catch { case _: java.io.IOException => () } // claims linger, harmless
  }

  /** Atomic create-if-absent. Hadoop's local-FS `create(overwrite=false)`
    * is check-then-act, so when the FILESYSTEM is local the claim goes
    * through NIO's `createFile` (`O_CREAT|O_EXCL` — genuinely atomic) at
    * the fs-qualified path; every other filesystem relies on its own
    * atomic namespace create (HDFS) and is documented as requiring one.
    * Only already-exists outcomes mean "owned by someone else"; any other
    * IOException (permissions, quota, safe-mode) propagates — retrying it
    * as contention would spin the claim loop against a dead filesystem. */
  private def tryClaim(p: Path): Boolean =
    if (fs.getUri.getScheme == "file") {
      try {
        val local = java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
        java.nio.file.Files.createFile(local)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try { fs.create(p, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: org.apache.hadoop.ipc.RemoteException
            if e.getClassName.endsWith("AlreadyBeingCreatedException") ||
               e.getClassName.endsWith("FileAlreadyExistsException") => false
      }
    }
}

object FileEpochAllocator {
  private[store] val ClaimPrefix = "epoch-"
  private[store] val HwPrefix = "hw-"
  private[store] val RollupEvery = 64L
  private[store] val MaxAttempts = 100000

  private[store] def claimName(n: Long): String = f"$ClaimPrefix$n%019d"
  private[store] def hwName(n: Long): String = f"$HwPrefix$n%019d"
}
