package graft

import graft.store.{CatEntry, Catalog}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Catalog durability/scalability contract: O(batch) segment appends,
  * crash-safe compaction (`.bak` fallback), duplicate collapse, fingerprint
  * cache invalidation, codec round-trip of adversarial strings.
  */
class CatalogSpec extends AnyFunSuite {

  private def freshCatalog(): (Catalog, java.io.File) = {
    val dir = Files.createTempDirectory("graft-cat").toFile
    (Catalog.fresh(new Configuration(), dir.getAbsolutePath), dir)
  }

  private def entry(part: String, file: String, seq: Long = 7): CatEntry =
    CatEntry(part, file, records = 10, sizeBytes = 100, minTs = 1, maxTs = 2,
      writeTs = System.nanoTime(), maxSeq = seq)

  test("append accumulates across batches; load sees all") {
    val (cat, _) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1"), entry("a=1", "/f2")))
    cat.append(Seq(entry("b=2", "/f3")))
    val loaded = cat.load()
    assert(loaded.map(_.file).toSet == Set("/f1", "/f2", "/f3"))
  }

  test("append writes one segment per batch, not a full rewrite") {
    val (cat, dir) = freshCatalog()
    (1 to 5).foreach(i => cat.append(Seq(entry("a=1", s"/f$i"))))
    val segs = new java.io.File(dir, "catalog.jsonl.d").listFiles()
    assert(segs != null && segs.count(_.getName.endsWith(".jsonl")) == 5)
    assert(cat.load().size == 5)
  }

  test("save compacts segments into the sharded base") {
    val (cat, dir) = freshCatalog()
    (1 to 3).foreach(i => cat.append(Seq(entry("a=1", s"/f$i"))))
    cat.save(cat.load())
    val segDir = new java.io.File(dir, "catalog.jsonl.d")
    assert(!segDir.exists() || segDir.listFiles().isEmpty)
    val shards = new java.io.File(dir, "catalog.jsonl.shards")
    assert(shards.isDirectory && shards.listFiles().nonEmpty)
    assert(cat.load().size == 3)
  }

  test("load falls back to .shards.bak when the base dir is missing (crash window)") {
    val (cat, dir) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1")))
    cat.save(cat.load())
    // simulate a crash between `rename(shards, bak)` and `rename(tmp, shards)`
    val base = new java.io.File(dir, "catalog.jsonl.shards")
    val bak = new java.io.File(dir, "catalog.jsonl.shards.bak")
    assert(base.renameTo(bak))
    val cat2 = Catalog.fresh(new Configuration(), dir.getAbsolutePath)
    assert(cat2.load().map(_.file) == Vector("/f1"))
    assert(cat2.entriesForPart("a=1").map(_.file) == Vector("/f1"))
  }

  test("save while .shards.bak is the only base (prior-swap crash) never loses the catalog") {
    val (cat, dir) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1")))
    cat.save(cat.load())
    // simulate the prior save dying between its two renames
    val base = new java.io.File(dir, "catalog.jsonl.shards")
    val bak = new java.io.File(dir, "catalog.jsonl.shards.bak")
    assert(base.renameTo(bak))
    // a fresh instance compacts from this recovery state — the old code
    // deleted .shards.bak (the only base) before installing the new one
    val cat2 = Catalog.fresh(new Configuration(), dir.getAbsolutePath)
    cat2.save(cat2.load() :+ entry("b=2", "/f2"))
    assert(cat2.load().map(_.file).toSet == Set("/f1", "/f2"))
    assert(!bak.exists())
  }

  test("a crash before segment cleanup cannot resurrect entries replace() dropped") {
    val (cat, dir) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1"), entry("a=1", "/f2")))
    // TRUNCATE-shape: drop /f1, keep /f2 — then simulate the crash window
    // by recreating the consumed segment files after replace() cleaned them
    val segDir = new java.io.File(dir, "catalog.jsonl.d")
    val segs = segDir.listFiles().filter(_.getName.endsWith(".jsonl"))
      .map(f => f.getName -> Files.readString(f.toPath)).toMap
    cat.replace(Set("/f1"), Nil)
    segDir.mkdirs()
    segs.foreach { case (name, txt) =>
      Files.writeString(new java.io.File(segDir, name).toPath, txt)
    }
    // both a fresh full load and the sharded per-part read must keep /f1
    // dead: its newest entry lives only in a CONSUMED segment
    val cat2 = Catalog.fresh(new Configuration(), dir.getAbsolutePath)
    assert(cat2.load().map(_.file) == Vector("/f2"))
    assert(cat2.entriesForPart("a=1").map(_.file) == Vector("/f2"))
    // and the next save must keep them dead too (consumed list carries
    // forward even though the residue segments still exist)
    cat2.save(cat2.load())
    segDir.mkdirs()
    segs.foreach { case (name, txt) =>
      Files.writeString(new java.io.File(segDir, name).toPath, txt)
    }
    val cat3 = Catalog.fresh(new Configuration(), dir.getAbsolutePath)
    assert(cat3.load().map(_.file) == Vector("/f2"))
  }

  test("legacy single-file base reads through load and entriesForPart; save migrates it") {
    val (_, dir) = freshCatalog()
    // hand-written legacy layout: base file + one segment
    Files.writeString(new java.io.File(dir, "catalog.jsonl").toPath,
      """{"part":"a=1","file":"/f1","records":1,"sizeBytes":1,"minTs":0,"maxTs":0,"writeTs":1,"maxSeq":3}""" + "\n")
    val cat = Catalog.fresh(new Configuration(), dir.getAbsolutePath)
    cat.append(Seq(entry("b=2", "/f2")))
    assert(cat.load().map(_.file).toSet == Set("/f1", "/f2"))
    assert(cat.entriesForPart("a=1").map(_.file) == Vector("/f1"))
    cat.save(cat.load())
    assert(!new java.io.File(dir, "catalog.jsonl").exists(),
      "save must migrate the legacy base into the sharded layout")
    assert(new java.io.File(dir, "catalog.jsonl.shards").isDirectory)
    assert(cat.load().map(_.file).toSet == Set("/f1", "/f2"))
  }

  test("entriesForPart matches the full scan across base shards and segments") {
    val (cat, _) = freshCatalog()
    val parts = (0 until 40).map(i => s"app=svc$i,env=prod")
    cat.save(parts.zipWithIndex.map { case (p, i) => entry(p, s"/base$i") })
    cat.append(parts.take(7).zipWithIndex.map { case (p, i) => entry(p, s"/seg$i") })
    // a duplicate for /base0 in a segment must collapse to the newest
    cat.append(Seq(entry(parts.head, "/base0").copy(records = 99, writeTs = Long.MaxValue - 1)))
    val full = cat.load()
    parts.foreach { p =>
      assert(cat.entriesForPart(p) == full.filter(_.part == p), s"mismatch for $p")
    }
    assert(cat.entriesForPart(parts.head).exists(e => e.file == "/base0" && e.records == 99))
    assert(cat.entriesForPart("app=absent,env=prod").isEmpty)
    val idx = cat.entriesForParts(parts.take(9))
    assert(idx == parts.take(9).map(p => p -> full.filter(_.part == p)).toMap)
  }

  test("entriesForPart invalidates when another Catalog instance writes") {
    val (cat, dir) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1")))
    assert(cat.entriesForPart("a=1").size == 1)
    val cat2 = Catalog.fresh(new Configuration(), dir.getAbsolutePath)
    cat2.append(Seq(entry("a=1", "/f2")))
    assert(cat.entriesForPart("a=1").size == 2,
      "shard fingerprint must detect cat2's segment")
  }

  test("duplicate entries for one data file collapse to the newest") {
    val (cat, _) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1").copy(records = 1, writeTs = 100)))
    cat.append(Seq(entry("a=1", "/f1").copy(records = 2, writeTs = 200)))
    val loaded = cat.load()
    assert(loaded.size == 1 && loaded.head.records == 2)
  }

  test("cache invalidates when another Catalog instance writes") {
    val (cat, dir) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1")))
    assert(cat.load().size == 1)
    val cat2 = Catalog.fresh(new Configuration(), dir.getAbsolutePath)
    cat2.append(Seq(entry("a=1", "/f2")))
    assert(cat.load().size == 2) // cat's fingerprint must detect cat2's segment
  }

  test("partIndex mirrors the full scan and invalidates with it") {
    val (cat, _) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1"), entry("b=2", "/f2"), entry("a=1", "/f3")))
    val idx = cat.partIndex()
    assert(idx == cat.load().groupBy(_.part))
    assert(idx("a=1").map(_.file).toSet == Set("/f1", "/f3"))
    cat.append(Seq(entry("c=3", "/f4")))
    assert(cat.partIndex()("c=3").map(_.file) == Vector("/f4"),
      "index must rebuild when the on-disk catalog changes")
  }

  test("scale probe smoke: builds, prunes, and holds budgets at 20k entries") {
    // guards the probe itself (and the sharded read path it measures)
    // from bitrot — the full 10^6/10^7 runs stay manual
    CatalogScaleProbe.main(Array("20000", "500"))
  }

  /** partSummaries must equal the load()-derived per-part aggregate in
    * EVERY layout state: sidecar-backed base, segments-only, mixed,
    * legacy single file, and a base written before sidecars existed. */
  private def naiveSummaries(cat: Catalog) =
    cat.load().groupBy(_.part).map { case (p, es) =>
      p -> ((es.size.toLong, es.map(_.sizeBytes).sum, es.map(_.records).sum,
        es.map(_.maxSeq).max, es.map(_.writeTs).max))
    }

  private def gotSummaries(cat: Catalog) =
    cat.partSummaries().map { case (p, ps) =>
      p -> ((ps.chunks, ps.sizeBytes, ps.records, ps.maxSeq, ps.maxWriteTs))
    }

  test("partSummaries: sidecar-backed base + segment overlay matches the full load") {
    val (cat, _) = freshCatalog()
    cat.save((1 to 50).map(i => entry(s"a=${i % 7}", s"/f$i", seq = i.toLong)))
    cat.append(Seq(entry("a=1", "/g1", seq = 99), entry("z=9", "/g2", seq = 3)))
    cat.append(Seq(entry("a=3", "/g3", seq = 55)))
    assert(gotSummaries(cat) == naiveSummaries(cat))
  }

  test("partSummaries: segments-only and legacy single-file layouts fall back correctly") {
    val (cat, _) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1"), entry("b=2", "/f2")))
    assert(gotSummaries(cat) == naiveSummaries(cat), "segments only")
    // legacy single file: write the old layout directly
    val (cat2, dir2) = freshCatalog()
    val legacy = new java.io.File(dir2, "catalog.jsonl")
    val w = new java.io.PrintWriter(legacy, "UTF-8")
    w.println("""{"part":"p=1","file":"/l1","records":5,"sizeBytes":50,"minTs":1,"maxTs":2,"writeTs":10,"maxSeq":4}""")
    w.println("""{"part":"p=1","file":"/l2","records":6,"sizeBytes":60,"minTs":1,"maxTs":2,"writeTs":11,"maxSeq":9}""")
    w.close()
    assert(gotSummaries(cat2) == naiveSummaries(cat2), "legacy single file")
  }

  test("partSummaries: a base without sidecars (pre-summary layout) parses the shards") {
    val (cat, dir) = freshCatalog()
    cat.save((1 to 20).map(i => entry(s"a=${i % 3}", s"/f$i", seq = i.toLong)))
    // simulate a pre-summary base: delete every sidecar
    val shards = new java.io.File(dir, "catalog.jsonl.shards").listFiles()
    shards.filter(_.getName.endsWith(".sum")).foreach(f => assert(f.delete()))
    val cold = Catalog.fresh(new Configuration(), dir.getAbsolutePath)
    assert(gotSummaries(cold) == naiveSummaries(cold))
  }

  test("partSummaries invalidates on append/replace from another instance") {
    val (cat, dir) = freshCatalog()
    cat.save(Seq(entry("a=1", "/f1", seq = 1)))
    assert(gotSummaries(cat) == naiveSummaries(cat))
    val other = Catalog.fresh(new Configuration(), dir.getAbsolutePath)
    other.append(Seq(entry("a=1", "/f2", seq = 2)))
    assert(gotSummaries(cat) == naiveSummaries(cat), "sees the foreign append")
    other.replace(Set("/f1"), Nil)
    assert(gotSummaries(cat) == naiveSummaries(cat), "sees the foreign replace")
    assert(!cat.partSummaries().contains("a=1") ||
      cat.partSummaries()("a=1").chunks == 1)
  }

  test("codec round-trips adversarial part/file strings") {
    val (cat, _) = freshCatalog()
    val nasty = "a=\"x,y\",b=back\\slash,c=\"quo\\\"te\",d=new\nline"
    cat.append(Seq(entry(nasty, "/weird \"file\"\npath")))
    val loaded = cat.load()
    assert(loaded.head.part == nasty)
    assert(loaded.head.file == "/weird \"file\"\npath")
  }

  test("fuzz: random adversarial entries round-trip the sequential fast decoder") {
    val (cat, _) = freshCatalog()
    val rnd = new scala.util.Random(31)
    def nastyString(): String = {
      val pool = "ab=,\"\\\né中 "
      (0 until 1 + rnd.nextInt(20)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
    val entries = (0 until 200).map { i =>
      CatEntry(nastyString(), s"/f$i-${nastyString()}", rnd.nextLong(),
        rnd.nextLong(), rnd.nextLong(), rnd.nextLong(),
        writeTs = i.toLong, maxSeq = rnd.nextLong())
    }
    cat.save(entries)
    val loaded = cat.load()
    // files are unique by construction, so nothing collapses
    assert(loaded.toSet == entries.toSet,
      s"missing=${entries.toSet -- loaded.toSet}")
  }

  test("maxSeq survives the round trip; missing maxSeq defaults to -1") {
    val (cat, dir) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1", seq = 42)))
    assert(cat.load().head.maxSeq == 42)
    // hand-written legacy line without maxSeq
    val legacy = new java.io.File(dir, "catalog.jsonl.d/seg-legacy.jsonl")
    Files.writeString(legacy.toPath,
      """{"part":"a=1","file":"/f9","records":1,"sizeBytes":1,"minTs":0,"maxTs":0,"writeTs":1}""" + "\n")
    val cat2 = Catalog.fresh(new Configuration(), dir.getAbsolutePath)
    assert(cat2.load().find(_.file == "/f9").get.maxSeq == -1)
  }
}
