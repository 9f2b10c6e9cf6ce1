package graft

import graft.llm.Similarity
import org.apache.spark.sql.SparkSession

/** Dev probe: IVF recall@5 per nProbe at a given sf — floor calibration
  * for the llm_ann_sweep gate.
  * `sbt "Test/runMain graft.IvfSweepProbe <sfDir>"` */
object IvfSweepProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    def pairs(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(emb))
    for (np <- Seq(1, 2, 4, 8, 16)) {
      val rec = (exact & pairs(Similarity.ivfTopK(emb, nProbe = np))).size.toDouble / exact.size
      println(f"[sweep] $sfDir nprobe=$np recall@5=$rec%.4f")
    }
    spark.stop()
  }
}
