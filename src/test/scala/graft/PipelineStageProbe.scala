package graft

import graft.llm.Curation
import org.apache.spark.sql.functions._

/** Per-stage survivor counts of the curation pipeline at an arbitrary
  * corpus dir — the diagnostic for "which gate emptied the pipeline at
  * a new decade". Usage:
  * `sbt "Test/runMain graft.PipelineStageProbe <dir>"`. */
object PipelineStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val dir = args(0)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val n = d.count()
    def c(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      println(f"[stage] $name%-16s ${df.count()}%8d / $n")
    c("gopher", graft.llm.Repetition.gopherFilter(d).where(col("keep")))
    c("model", Curation.qualityScore(d).where(col("keep")))
    c("blocklist", Curation.blocklistFilter(d).where(col("keep")))
    c("cap_keep", Curation.pipelineCapKeep(d))
    c("mixture", Curation.mixtureKeep(d))
    c("sampled", Curation.stratifiedSample(d))
    c("span_drop", graft.llm.Mining.dupSpans(d)
      .where(col("dup_frac_e4") >= graft.llm.Mining.DupSpanDropE4))
    c("contaminated", Curation.decontaminate(d))
  }
}
