package graft

/** One-off measurement harness for the PQ ANN floors (run manually:
  * `Test/runMain graft.PqProbe [decade ...]` — no args = every driver
  * decade plus sf1; name decades (e.g. `sf10`) to focus the sweep) —
  * recall@5 of [[graft.llm.Similarity.pqTopK]] vs brute force, so the
  * llm_sim_topk_pq floor is a measured decision recorded in PLANS.md.
  * Round 15: sf10 added after the ladder's third rung caught pq recall
  * at 0.72 under the 0.75 floor (ksub=32/pool=160x, tuned at sf1) —
  * the same one-decade-above decay rp hit twice. */
object PqProbe {

  /** The llm_ann_recall floor every family must clear at every decade. */
  val RecallFloor = 0.75

  /** Forward-margin canary (round-16 directive 4, the third repetition
    * of "recall decays one decade above tuning"): measure the
    * PRODUCTION defaults at two adjacent decades, take the measured
    * per-family decay across that decade pair, and require the larger
    * decade to hold `floor + max(0, decay)` — i.e. if the same decay
    * repeats at the NEXT decade (it did, three rounds running), the
    * floor still holds there. A failure here predicts the sf100 break
    * at tuning time instead of discovering it in a future campaign.
    * Run: `Test/runMain graft.PqProbe --canary` (sf1 + sf10 production
    * defaults only — much cheaper than the full sweep). */
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import graft.llm.Similarity
    def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (args.contains("--canary")) {
      val recalls = for (scale <- Seq(1, 10)) yield {
        val dir = ScaleData.ensure(spark, scale)
        val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
        val exact = pairs(Similarity.bruteForceTopK(emb))
        val r = Map(
          "pq" -> (exact & pairs(Similarity.pqTopK(emb))).size.toDouble / exact.size,
          "rp" -> (exact & pairs(Similarity.rpTopK(emb))).size.toDouble / exact.size,
          "ivfpq" -> (exact & pairs(Similarity.ivfPqTopK(emb))).size.toDouble / exact.size)
        emb.unpersist()
        r.foreach { case (n, v) =>
          println(f"[pqprobe] canary sf$scale $n recall@5 = $v%.3f") }
        r
      }
      val Seq(lo, hi) = recalls
      val failures = Seq("pq", "rp", "ivfpq").flatMap { n =>
        val decay = math.max(0.0, lo(n) - hi(n))
        val need = RecallFloor + decay
        println(f"[pqprobe] canary $n: sf1=${lo(n)}%.3f sf10=${hi(n)}%.3f " +
          f"decay/decade=$decay%.3f forward-margin need=$need%.3f " +
          (if (hi(n) >= need) "OK" else "FAIL"))
        if (hi(n) >= need) None
        else Some(s"$n: sf10 recall ${hi(n)} < floor $RecallFloor + measured " +
          s"decay/decade $decay — the sf100 decade is PREDICTED to break; " +
          "re-tune one decade ahead now (the rp/pq precedent)")
      }
      require(failures.isEmpty, failures.mkString("; "))
      println("[pqprobe] canary PASS: every family holds floor + decay/decade " +
        "at sf10 — the next decade is predicted safe under repeated decay")
      spark.stop()
      return
    }
    val dirs = Seq(
      "sf0.001" -> (() => "/root/testdata/sf0.001"),
      "sf0.01" -> (() => "/root/testdata/sf0.01"),
      "sf0.1" -> (() => "/root/testdata/sf0.1"),
      "sf1" -> (() => ScaleData.ensure(spark)),
      "sf10" -> (() => ScaleData.ensure(spark, 10)))
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    for ((name, mkDir) <- dirs) {
      val dir = mkDir()
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
      val exact = pairs(Similarity.bruteForceTopK(emb))
      for ((ks, pf) <- Seq((16, 40), (16, 160), (32, 40), (32, 160),
          (32, 320), (32, 640), (64, 160), (64, 320))) {
        val t = System.nanoTime()
        val r = (exact & pairs(Similarity.pqTopK(emb, ksub = ks, poolFactor = pf)))
          .size.toDouble / exact.size
        println(f"[pqprobe] $name n=${emb.count()} pq ksub=$ks pool=${pf}x recall@5 = $r%.3f (${(System.nanoTime() - t) / 1e9}%.1fs)")
      }
      for ((np, pf) <- Seq((4, 160), (6, 160), (8, 160), (4, 320),
          (8, 320), (4, 640))) {
        val t = System.nanoTime()
        val r = (exact & pairs(Similarity.ivfPqTopK(emb, nProbe = np, poolFactor = pf)))
          .size.toDouble / exact.size
        println(f"[pqprobe] $name n=${emb.count()} ivfpq nProbe=$np pool=${pf}x recall@5 = $r%.3f (${(System.nanoTime() - t) / 1e9}%.1fs)")
      }
      // rp rides along (same JL ~log-n discipline; its sf10 margin is one
      // decade thin — 0.76 vs the 0.75 floor at dOut=48/pool=240x)
      for ((dOut, pf) <- Seq((48, 240), (64, 240), (64, 480))) {
        val t = System.nanoTime()
        val r = (exact & pairs(Similarity.rpTopK(emb, dOut = dOut, poolFactor = pf)))
          .size.toDouble / exact.size
        println(f"[pqprobe] $name n=${emb.count()} rp dOut=$dOut pool=${pf}x recall@5 = $r%.3f (${(System.nanoTime() - t) / 1e9}%.1fs)")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
