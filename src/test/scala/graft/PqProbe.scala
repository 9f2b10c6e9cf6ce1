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
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import graft.llm.Similarity
    def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
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
