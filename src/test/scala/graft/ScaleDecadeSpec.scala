package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fourth-decade (sf1) gating of the scale-sensitive floors (VERDICT r11
  * directive 2 / r10 directive 1): the rp precedent — recall decayed
  * exactly one decade above its tuning scale, twice (dOut=16 at sf0.1,
  * then dOut=32 at sf1) — says a floor is only as good as the largest
  * scale it was checked at. These tests run on the deterministic
  * [[ScaleData]] sf1 extrapolation (20k vectors, 50k docs, 1M events;
  * generated on first run, cached under .testdata/).
  *
  * Measured 2026-08-14 (ScaleProbeMain, also in PLANS.md): lsh 0.80,
  * ivf 0.98, rp 0.84 (after the dOut 32→48 / pool 80x→240x re-tune;
  * 0.54 before), sq8 1.00, production banding density 5.0e-4, simhash
  * 33,956 distinct fingerprints / 50k docs, events 56,022 distinct e2
  * values / 1M rows.
  *
  * Round 15 (directive 1): the decade is selectable —
  * `GRAFT_SCALE_DECADE=10 sbt "testOnly graft.ScaleDecadeSpec"` runs the
  * SAME floors/invariants on the sf10 rung (500k docs / 200k vectors /
  * 10M events; ~2 GB, generated on first run). Default stays sf1 so the
  * regular suite's wall-clock is unchanged; the sf10 run is the
  * per-round ladder campaign, results pinned in PLANS.md. */
class ScaleDecadeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  /** 1 (sf1, default) or 10 (sf10) — every count-sensitive assertion
    * below scales by this. */
  private val scale = sys.env.get("GRAFT_SCALE_DECADE").map(_.toInt).getOrElse(1)
  private lazy val dir = ScaleData.ensure(spark, scale)
  private lazy val emb =
    spark.read.parquet(s"$dir/embeddings.parquet").cache()
  private lazy val docs =
    spark.read.parquet(s"$dir/documents.parquet").cache()

  import graft.llm.{SimHash, Similarity}

  private def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    d.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  private lazy val exact = pairs(Similarity.bruteForceTopK(emb))

  test("ANN recall floors hold at the sf1 decade (lsh/ivf/rp/sq8/pq/ivfpq)") {
    // the same floors annFloorsE4 pins for the llm_ann_recall gate —
    // asserted here one decade ABOVE the largest driver-gated scale
    val floors = Seq[(String, Double, () => org.apache.spark.sql.DataFrame)](
      // numPlanes = 4 = the gate entry's explicit config (the callable
      // default is now ProductionTopKParams, tuned for CLUSTERED corpora)
      ("lsh", 0.50, () => Similarity.lshTopK(emb, numPlanes = 4, maxProbeHamming = 2)),
      ("ivf", 0.40, () => Similarity.ivfTopK(emb)),
      ("rp", 0.75, () => Similarity.rpTopK(emb)),
      ("sq8", 0.90, () => Similarity.sq8TopK(emb)),
      // ksub=64/pool=320x measured 0.92 at sf10 (PqProbe, 2026-08-16 —
      // the round-15 re-tune after 32/160x decayed to 0.72 there)
      ("pq", 0.75, () => Similarity.pqTopK(emb)),
      // ksub=64/pool=320x after the same re-tune (the old 32/160x
      // thinned to 0.76 at sf10)
      ("ivfpq", 0.75, () => Similarity.ivfPqTopK(emb)))
    assert(exact.nonEmpty)
    for ((name, floor, mk) <- floors) {
      val recall = (exact & pairs(mk())).size.toDouble / exact.size
      info(f"sf$scale $name recall@5 = $recall%.3f (floor $floor)")
      assert(recall >= floor,
        s"$name recall@5 $recall decayed below the $floor floor at sf1 — " +
          "re-tune its params one decade ahead (the rp dOut precedent)")
    }
  }

  test("IVF probe-budget sweep floors hold at the sf1 decade; full probe stays the identity") {
    // measured 2026-08-15 (IvfSweepProbe): .94/.94/.98/1.00/1.00 at sf1 —
    // the same conservative floors the llm_ann_sweep gate pins
    val floors = Seq(1 -> 0.50, 2 -> 0.55, 4 -> 0.60, 8 -> 0.70)
    for ((np, floor) <- floors) {
      val rec = (exact & pairs(Similarity.ivfTopK(emb, nProbe = np))).size.toDouble / exact.size
      info(f"sf$scale ivf nprobe=$np recall@5 = $rec%.3f (floor $floor)")
      assert(rec >= floor, s"sweep floor broke at sf1 for nProbe=$np: $rec")
    }
    assert(pairs(Similarity.ivfTopK(emb, nProbe = 16)) == exact,
      "full probe must remain the brute-force identity at sf1")
  }

  test("production near-dup banding still prunes to <1% density at sf1") {
    val n = emb.count()
    val (pb, pr) = Similarity.ProductionNearDupParams
    val cand = Similarity.nearDupCandidates(emb, pb, pr, 13L).count()
    val density = cand / (n * (n - 1) / 2.0)
    info(f"sf$scale production banding density = $density%.6f ($cand pairs)")
    assert(density < 0.01,
      s"16x16 banding candidate density $density at sf1 — banding broken")
  }

  test("simhash band collisions stay subquadratic on the 31-word vocab at sf1") {
    // the 60-bit fingerprint of a 31-word-vocab corpus has limited
    // entropy; the pigeonhole bands must still prune. Collision PAIRS
    // (the candidate-join size) are computed from band-group counts —
    // sum c·(c−1)/2 — without materializing the join. hammingDedup
    // self-joins DISTINCT fingerprints (the identical-print collapse),
    // so the operator's join size is the distinct-print collision count;
    // the doc-level count documents what the collapse saves (measured
    // 67.4M → 5.25M, 12.8×, at this decade).
    val n = docs.count()
    val fp = SimHash.fingerprints(docs)
    val bands = 3
    val bits = 60 / bands
    val mask = (1L << bits) - 1
    def collisions(df: org.apache.spark.sql.DataFrame): Long = df
      .select(posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), i -> " +
          s"shiftright(simhash, i * $bits) & $mask)")).as(Seq("band", "bkey")))
      .groupBy("band", "bkey").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2"))).head.getLong(0)
    val docPairs = collisions(fp)
    val printPairs = collisions(fp.select("simhash").distinct())
    val allPairs = n.toDouble * (n - 1) / 2.0
    info(f"sf$scale simhash band collisions: doc-level ${docPairs / allPairs}%.4f " +
      f"($docPairs), distinct-print ${printPairs / allPairs}%.4f ($printPairs)")
    assert(printPairs / allPairs < 0.01,
      s"distinct-print band candidate density ${printPairs / allPairs} at " +
        "sf1 is heading quadratic — the identical-print collapse no longer prunes")
    assert(printPairs * 5 < docPairs,
      "the identical-print collapse should cut the band join by >5x on a " +
        "low-entropy corpus; if this fails the collapse regressed")
    // and the full verdict operator completes with per-doc output
    val verdicts = SimHash.hammingDedup(docs).count()
    assert(verdicts > 0 && verdicts <= n)
  }

  test("v3 planted cross-half near-dups make incremental dedup non-vacuous at sf1") {
    // the round-13 sf1 campaign found llm_dedup_incr_near vacuously
    // green (0 rows in BOTH engines: the 617 exact-dup rule pairs
    // ADJACENT ids, which never cross the snapshot midpoint). The v3
    // generator plants ~20 incoming-half docs carrying their history
    // twin's text + one word (3-gram Jaccard ≥ 0.89 > the 0.8 gate) —
    // the entry must now find every plant, and the applied accept must
    // drop exactly the verdict ids
    val verdicts = graft.queries.LlmQueries.entries("llm_dedup_incr_near")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val numDocs = ScaleData.NumDocs * scale
    val half = numDocs / 2
    val planted = (half until numDocs).filter(_ % 1231L == 0L)
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(verdicts.contains(id), s"planted cross-half near-dup $id not found")
    }
    assert(verdicts.nonEmpty && verdicts.size < 200 * scale,
      s"verdict table should be plant-sized, got ${verdicts.size}")
    verdicts.keys.foreach(i => assert(i >= half, s"verdict $i on the history side"))
    val accepted = graft.queries.LlmQueries.entries("llm_dedup_incr_apply")(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(verdicts.keySet.intersect(accepted).isEmpty,
      "applied accept kept a doc the verdict table rejected")
    assert(accepted.size + verdicts.size == (numDocs - half),
      "accept + reject must partition the incoming half")
  }

  test("histogram/MAD order-stat state stays value-bounded (not row-bounded) at sf1") {
    // q17/q18/q26/q28 build distinct-value-sized histograms; the e2
    // integerization bounds distinct values by the VALUE RANGE (56,022
    // for [0, 560.21]) no matter how many rows the decade adds — 1M rows
    // must not mean 1M state entries
    val ev = Tables.load(spark, dir, "events")
    val rows = ev.count()
    val dv = ev.selectExpr("cast(floor(value * 100 + 0.5) as bigint) v")
      .where("v is not null").distinct().count()
    info(s"sf$scale events: $rows rows, $dv distinct e2 values")
    assert(rows >= 1000000L * scale)
    assert(dv <= 56100L,
      s"distinct e2 values $dv exceed the value-range bound — the " +
        "order-stat histogram state would now scale with rows")
  }
}
