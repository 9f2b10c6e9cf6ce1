package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-split probe for the forced-prefix ngram gate (round-17
  * optimization): times shingle build / prefix assembly / candidate
  * join+bound / exact verify separately so the optimization targets the
  * stage that actually dominates.
  * `sbt "Test/runMain graft.PpjoinProbe <sfDir> [cpus]"` */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ppjoin] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$r")
      r
    }
    for (round <- 1 to 1) {
      println(s"[ppjoin] === round $round ===")
      val stages = graft.llm.Dedup.ppjoinStageProbe(spark, sfDir)
      stages.foreach { case (name, thunk) => t(name)(thunk()) }
    }
    spark.stop()
  }
}
