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
    (Catalog(new Configuration(), dir.getAbsolutePath), dir)
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

  test("save compacts segments into the base file") {
    val (cat, dir) = freshCatalog()
    (1 to 3).foreach(i => cat.append(Seq(entry("a=1", s"/f$i"))))
    cat.save(cat.load())
    val segDir = new java.io.File(dir, "catalog.jsonl.d")
    assert(!segDir.exists() || segDir.listFiles().isEmpty)
    assert(new java.io.File(dir, "catalog.jsonl").exists())
    assert(cat.load().size == 3)
  }

  test("load falls back to .bak when the base file is missing (crash window)") {
    val (cat, dir) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1")))
    cat.save(cat.load())
    // simulate a crash between `rename(path, bak)` and `rename(tmp, path)`
    val base = new java.io.File(dir, "catalog.jsonl")
    val bak = new java.io.File(dir, "catalog.jsonl.bak")
    assert(base.renameTo(bak))
    val cat2 = Catalog(new Configuration(), dir.getAbsolutePath)
    assert(cat2.load().map(_.file) == Vector("/f1"))
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
    val cat2 = Catalog(new Configuration(), dir.getAbsolutePath)
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

  test("codec round-trips adversarial part/file strings") {
    val (cat, _) = freshCatalog()
    val nasty = "a=\"x,y\",b=back\\slash,c=\"quo\\\"te\",d=new\nline"
    cat.append(Seq(entry(nasty, "/weird \"file\"\npath")))
    val loaded = cat.load()
    assert(loaded.head.part == nasty)
    assert(loaded.head.file == "/weird \"file\"\npath")
  }

  test("maxSeq survives the round trip; missing maxSeq defaults to -1") {
    val (cat, dir) = freshCatalog()
    cat.append(Seq(entry("a=1", "/f1", seq = 42)))
    assert(cat.load().head.maxSeq == 42)
    // hand-written legacy line without maxSeq
    val legacy = new java.io.File(dir, "catalog.jsonl.d/seg-legacy.jsonl")
    Files.writeString(legacy.toPath,
      """{"part":"a=1","file":"/f9","records":1,"sizeBytes":1,"minTs":0,"maxTs":0,"writeTs":1}""" + "\n")
    val cat2 = Catalog(new Configuration(), dir.getAbsolutePath)
    assert(cat2.load().find(_.file == "/f9").get.maxSeq == -1)
  }
}
