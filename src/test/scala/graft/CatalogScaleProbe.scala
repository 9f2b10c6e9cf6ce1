package graft

import graft.store.{CatEntry, Catalog}

/** Scale probe for the driver-side catalog — the engine's acknowledged
  * next 100 TB boundary (a million-chunk store must still load and prune
  * within driver budget). Builds a synthetic catalog of N entries across P
  * parts (99% compacted base + 100 append segments, the steady state a
  * store reaches between compactions), then measures:
  *   - cold load (parse + duplicate-collapse + sort + index build)
  *   - warm load (fingerprint-memoized hit)
  *   - per-part prune via [[Catalog.partIndex]] vs the full linear scan
  *   - resident heap cost of the parsed entries
  *
  * `sbt "Test/runMain graft.CatalogScaleProbe [entries] [parts]"`
  * (defaults 1,000,000 entries / 20,000 parts). Prints one JSON line and
  * enforces the budget: cold load < 30 s, indexed prune < 50 ms.
  */
object CatalogScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val parts = if (args.length > 1) args(1).toInt else 20000
    val dir = java.nio.file.Files.createTempDirectory("graft-catprobe").toFile
    try run(n, parts, dir)
    finally rm(dir)
  }

  private def run(n: Int, parts: Int, dir: java.io.File): Unit = {
    val cat = Catalog(new org.apache.hadoop.conf.Configuration(), dir.getAbsolutePath)
    val now = System.nanoTime()
    def entry(i: Int): CatEntry = CatEntry(
      part = s"app=svc${i % parts},env=prod",
      file = s"${dir.getAbsolutePath}/data/chunk-$i.parquet",
      records = 100000L, sizeBytes = 128L << 20,
      minTs = i * 1000000L, maxTs = i * 1000000L + 999999L,
      writeTs = now + i, maxSeq = i.toLong)

    val baseN = n * 99 / 100
    val tb0 = System.nanoTime()
    cat.save((0 until baseN).map(entry))
    val segBatch = math.max(1, (n - baseN) / 100)
    var k = baseN
    while (k < n) {
      cat.append((k until math.min(n, k + segBatch)).map(entry))
      k += segBatch
    }
    val buildMs = (System.nanoTime() - tb0) / 1e6

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e6)
    }
    val rt = Runtime.getRuntime
    def usedMb(): Long = { System.gc(); (rt.totalMemory - rt.freeMemory) >> 20 }

    // a fresh Catalog instance: cold = parse everything from disk
    val cold = Catalog(new org.apache.hadoop.conf.Configuration(), dir.getAbsolutePath)
    val m0 = usedMb()
    val (entries, coldMs) = time(cold.load())
    val m1 = usedMb()
    val (_, warmMs) = time(cold.load())
    val idx = cold.partIndex() // memoized with load — no extra parse

    val target = s"app=svc${parts / 2},env=prod"
    val (viaIdx, idxMs) = time(idx.getOrElse(target, Vector.empty))
    val (viaScan, scanMs) = time(entries.filter(_.part == target))
    require(viaIdx == viaScan, "index and full scan disagree")
    require(entries.size == n, s"expected $n entries, loaded ${entries.size}")

    println(f"""{"entries":${entries.size},"parts":$parts,"build_ms":$buildMs%.0f,"cold_load_ms":$coldMs%.0f,"warm_load_ms":$warmMs%.3f,"prune_index_ms":$idxMs%.3f,"prune_scan_ms":$scanMs%.1f,"chunks_for_part":${viaIdx.size},"heap_mb":${m1 - m0}}""")

    // the documented driver budget for a million-chunk catalog
    require(coldMs < 30000, f"cold load $coldMs%.0f ms blows the 30 s budget")
    require(idxMs < 50, f"indexed prune $idxMs%.3f ms blows the 50 ms budget")
  }

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete()
  }
}
