package graft

/** One-off measurement harness for the PQ ANN floors (run manually:
  * `Test/runMain graft.PqProbe`) — recall@5 of [[graft.llm.Similarity.pqTopK]]
  * vs brute force at every driver decade plus the sf1 extrapolation, so
  * the llm_sim_topk_pq floor is a measured decision recorded in PLANS.md. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import graft.llm.Similarity
    def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dirs = Seq(
      "sf0.001" -> "/root/testdata/sf0.001",
      "sf0.01" -> "/root/testdata/sf0.01",
      "sf0.1" -> "/root/testdata/sf0.1",
      "sf1" -> ScaleData.ensure(spark))
    for ((name, dir) <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
      val exact = pairs(Similarity.bruteForceTopK(emb))
      for ((ks, pf) <- Seq((16, 40), (16, 160), (32, 40), (32, 160), (32, 320))) {
        val t = System.nanoTime()
        val r = (exact & pairs(Similarity.pqTopK(emb, ksub = ks, poolFactor = pf)))
          .size.toDouble / exact.size
        println(f"[pqprobe] $name n=${emb.count()} pq ksub=$ks pool=${pf}x recall@5 = $r%.3f (${(System.nanoTime() - t) / 1e9}%.1fs)")
      }
      for ((np, pf) <- Seq((4, 160), (6, 160), (8, 160))) {
        val t = System.nanoTime()
        val r = (exact & pairs(Similarity.ivfPqTopK(emb, nProbe = np, poolFactor = pf)))
          .size.toDouble / exact.size
        println(f"[pqprobe] $name n=${emb.count()} ivfpq nProbe=$np pool=${pf}x recall@5 = $r%.3f (${(System.nanoTime() - t) / 1e9}%.1fs)")
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
