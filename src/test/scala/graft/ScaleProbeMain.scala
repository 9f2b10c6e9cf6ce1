package graft

/** One-off measurement harness for a ScaleData decade (run manually:
  * `Test/runMain graft.ScaleProbeMain [scale]`, default 1 = sf1) —
  * prints the scale-sensitive quantities ScaleDecadeSpec pins, so floor
  * re-tuning is a measured decision recorded in PLANS.md, not a guess. */
object ScaleProbeMain {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(1)
    val spark = TestSpark.spark
    val t0 = System.nanoTime()
    val dir = ScaleData.ensure(spark, scale)
    println(s"[scaleprobe] ensure: ${(System.nanoTime() - t0) / 1e9}%.1f".replace("%.1f", ""))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    println(s"[scaleprobe] emb=${emb.count()} docs=${docs.count()}")

    import graft.llm.{Similarity, SimHash}
    def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var t = System.nanoTime()
    val exact = pairs(Similarity.bruteForceTopK(emb))
    println(s"[scaleprobe] brute ${(System.nanoTime() - t) / 1e9}s")
    for ((name, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "lsh" -> (() => Similarity.lshTopK(emb, numPlanes = 4, maxProbeHamming = 2)),
        "ivf" -> (() => Similarity.ivfTopK(emb)),
        "rp" -> (() => Similarity.rpTopK(emb)),
        "sq8" -> (() => Similarity.sq8TopK(emb)))) {
      t = System.nanoTime()
      val r = (exact & pairs(mk())).size.toDouble / exact.size
      println(f"[scaleprobe] $name recall@5 = $r%.3f  (${(System.nanoTime() - t) / 1e9}%.1fs)")
    }
    t = System.nanoTime()
    val n = emb.count()
    val (pb, pr) = Similarity.ProductionNearDupParams
    val prod = Similarity.nearDupCandidates(emb, pb, pr, 13L).count()
    println(f"[scaleprobe] prod banding density = ${prod / (n * (n - 1) / 2.0)}%.6f ($prod pairs, ${(System.nanoTime() - t) / 1e9}%.1fs)")

    t = System.nanoTime()
    val fp = SimHash.fingerprints(docs)
    val nd = docs.count()
    val distinctFp = fp.select("simhash").distinct().count()
    println(s"[scaleprobe] simhash distinct fingerprints = $distinctFp of $nd")
    val verdicts = SimHash.hammingDedup(docs).count()
    println(f"[scaleprobe] simhash hammingDedup verdicts = $verdicts (${(System.nanoTime() - t) / 1e9}%.1fs)")

    val ev = Tables.load(spark, dir, "events")
    val dv = ev.selectExpr("cast(floor(value * 100 + 0.5) as bigint) v")
      .where("v is not null").distinct().count()
    println(s"[scaleprobe] events distinct e2 values = $dv of ${ev.count()} rows")
    spark.stop()
  }
}
