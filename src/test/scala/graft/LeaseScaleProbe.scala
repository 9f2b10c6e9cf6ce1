package graft

import graft.store.{FileInFlightRegistry, Store}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Scale probe for the shared-filesystem lease registry (round-14
  * directive 6): [[FileInFlightRegistry.entries]] runs once per
  * consumer trigger and pays one probe-file write + one directory
  * listing + one content read PER LIVE LEASE (+ one delete per expired
  * file on first sight). This probe builds a lease dir at the
  * concurrency the design must absorb — hundreds of concurrent
  * appenders, thousands of crash-abandoned lease files — and measures:
  *
  *   - reap cost: the FIRST entries() call that sweeps E expired files
  *     (a consumer arriving after a fleet-wide crash);
  *   - steady per-trigger cost: entries() with L live leases and a
  *     clean dir — what every trigger pays forever.
  *
  * `sbt "Test/runMain graft.LeaseScaleProbe [live] [expired]"`
  * (defaults 500 live / 5000 expired). Prints one JSON line and
  * enforces: steady entries() < 1 s at 500 live leases, reap of 5000
  * expired < 30 s — both on the local-FS worst case of one RPC per
  * file.
  *
  * Measured on this host (PLANS.md round 14): 500 live → steady
  * entries() 133 ms; 2000 live → 416 ms (~210–270 µs per live lease,
  * linear — one open+read+close each); 5000-expired reap 1.6 s
  * (~0.3 ms/delete). The per-trigger term is linear in LIVE leases
  * only (expired files are deleted exactly once, by whoever sees them
  * first), so the local-FS registry holds to ~4×10³ concurrent
  * appenders at a 1 s trigger budget; past that — or on object stores
  * where per-file reads are ~10 ms RPCs (→ ~100 leases/s) — the
  * documented swap is the same transactional-metastore move as the
  * catalog's (one LIST + batched GETs, or a lease table). */
object LeaseScaleProbe {
  def main(args: Array[String]): Unit = {
    val live = if (args.length > 0) args(0).toInt else 500
    val expired = if (args.length > 1) args(1).toInt else 5000
    val dirF = java.nio.file.Files.createTempDirectory("graft-leaseprobe").toFile
    try run(live, expired, dirF, latencyMs = 0)
    finally { rm(dirF); () }
    // object-store phase (round-15 directive 4): the SAME protocol under
    // an injected ~10 ms per-RPC filesystem — the trait doc's object-store
    // assumption, now measured instead of extrapolated
    val dirF2 = java.nio.file.Files.createTempDirectory("graft-leaseprobe-os").toFile
    try run(live = 64, expired = 100, dirF2, latencyMs = 10)
    finally { rm(dirF2); () }
  }

  /** A [[FilterFileSystem]] that sleeps `latencyMs` before every
    * metadata/data RPC — the standard object-store cost model (each
    * open/create/list/stat/delete/rename is one ~10 ms HTTP round
    * trip). Streams themselves run at local speed: lease files are
    * tens of bytes, so the per-request latency IS the cost, exactly
    * as on S3-likes. */
  private final class LatencyFs(under: org.apache.hadoop.fs.FileSystem,
      latencyMs: Long) extends org.apache.hadoop.fs.FilterFileSystem(under) {
    private def rpc(): Unit = Thread.sleep(latencyMs)
    override def open(f: Path, bufferSize: Int) = { rpc(); super.open(f, bufferSize) }
    override def create(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission,
        overwrite: Boolean, bufferSize: Int, replication: Short, blockSize: Long,
        progress: org.apache.hadoop.util.Progressable) = {
      rpc()
      super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
    }
    override def listStatus(f: Path) = { rpc(); super.listStatus(f) }
    override def getFileStatus(f: Path) = { rpc(); super.getFileStatus(f) }
    override def delete(f: Path, recursive: Boolean) = { rpc(); super.delete(f, recursive) }
    override def rename(src: Path, dst: Path) = { rpc(); super.rename(src, dst) }
    override def setTimes(f: Path, mtime: Long, atime: Long) = { rpc(); super.setTimes(f, mtime, atime) }
    override def mkdirs(f: Path, permission: org.apache.hadoop.fs.permission.FsPermission) = {
      rpc(); super.mkdirs(f, permission)
    }
  }

  private def run(live: Int, expired: Int, dirF: java.io.File,
      latencyMs: Long): Unit = {
    val conf = new Configuration()
    val dir = new Path(dirF.getAbsolutePath)
    val fs0 = dir.getFileSystem(conf)
    val fs = if (latencyMs > 0) new LatencyFs(fs0, latencyMs) else fs0
    val reg = new FileInFlightRegistry(fs, dir)

    // L live leases, each announced then claimed (two writes + a delete,
    // the real protocol) across 50 distinct target parts
    var i = 0
    while (i < live) {
      val pre = reg.preBegin(Some(Set(s"app=svc${i % 50}")))
      reg.begin(i.toLong, Some(Set(s"app=svc${i % 50}")), pre)
      i += 1
    }
    // E crash-abandoned lease files, aged past expiry on the fs clock
    val oldMs = System.currentTimeMillis() - Store.EpochLeaseNanos / 1000000L - 3600000L
    var j = 0
    while (j < expired) {
      val p = new Path(dir, f"ifl-${1000000L + j}%019d")
      val out = fs.create(p, true)
      try out.write('*'.toInt) finally out.close()
      fs.setTimes(p, oldMs, -1)
      j += 1
    }

    val t0 = System.nanoTime()
    val first = reg.entries()
    val reapSec = (System.nanoTime() - t0) / 1e9
    require(first.size == live, s"expected $live live leases, got ${first.size}")

    // steady state: the reap is done, every call now pays probe + list +
    // L content reads — the per-trigger term
    val reps = if (latencyMs > 0) 3 else 10
    val t1 = System.nanoTime()
    var k = 0
    while (k < reps) {
      val e = reg.entries()
      require(e.size == live, s"steady call saw ${e.size} leases")
      k += 1
    }
    val steadySec = (System.nanoTime() - t1) / 1e9 / reps

    // the dir really is clean: live leases + the clock probe only
    val left = fs.listStatus(dir).length
    require(left == live + 1, s"expected $live leases + probe, dir holds $left")

    // max live leases a 1 s per-trigger budget sustains, assuming the
    // measured linear cost (RPC model: probe create+stat + list + one
    // open per live lease)
    val crossover1s = (live / steadySec).toLong
    println(s"""{"probe":"lease_scale","latency_ms":$latencyMs,""" +
      s""""live":$live,"expired":$expired,""" +
      f""""reap_sec":$reapSec%.3f,"steady_entries_sec":$steadySec%.4f,""" +
      f""""per_lease_us":${steadySec * 1e6 / math.max(1, live)}%.1f,""" +
      s""""crossover_leases_1s":$crossover1s}""")
    if (latencyMs == 0) {
      require(steadySec < 1.0,
        f"per-trigger entries() $steadySec%.3f s at $live live leases blows the 1 s budget")
      require(reapSec < 30.0,
        f"reap of $expired expired files took $reapSec%.1f s (> 30 s budget)")
    } else {
      // object-store budgets: the measured steady cost must sit near the
      // RPC model ((live + ~3 fixed RPCs) × latency, generous 2.5× band
      // for scheduler jitter), and the measured 1 s crossover must land
      // in the ~10² band the InFlightRegistry trait doc claims — this
      // probe is what turns that claim from arithmetic into measurement
      require(steadySec >= live * latencyMs / 1000.0,
        f"steady $steadySec%.3f s beat the $latencyMs ms RPC floor — latency not injected?")
      require(steadySec < (live + 10) * latencyMs * 2.5 / 1000.0,
        f"steady $steadySec%.3f s at $live leases is far above the RPC model")
      require(crossover1s >= 50 && crossover1s <= 200,
        s"object-store 1 s crossover $crossover1s outside the documented ~10² band")
    }
  }

  private def rm(f: java.io.File): Boolean = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }
}
