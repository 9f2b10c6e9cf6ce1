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
    try run(live, expired, dirF)
    finally { rm(dirF); () }
  }

  private def run(live: Int, expired: Int, dirF: java.io.File): Unit = {
    val conf = new Configuration()
    val dir = new Path(dirF.getAbsolutePath)
    val fs = dir.getFileSystem(conf)
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
    val reps = 10
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

    println(s"""{"probe":"lease_scale","live":$live,"expired":$expired,""" +
      f""""reap_sec":$reapSec%.3f,"steady_entries_sec":$steadySec%.4f,""" +
      f""""per_lease_us":${steadySec * 1e6 / math.max(1, live)}%.1f}""")
    require(steadySec < 1.0,
      f"per-trigger entries() $steadySec%.3f s at $live live leases blows the 1 s budget")
    require(reapSec < 30.0,
      f"reap of $expired expired files took $reapSec%.1f s (> 30 s budget)")
  }

  private def rm(f: java.io.File): Boolean = {
    if (f.isDirectory) f.listFiles().foreach(rm)
    f.delete()
  }
}
