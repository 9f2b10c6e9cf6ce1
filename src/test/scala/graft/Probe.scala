package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: explain + time a single SparkEntry query.
  * `sbt "Test/runMain graft.Probe <entry> <sfDir> [cpus]"`
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 2) args(2) else "8"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // comma-separated entry list: each runs twice (cold, warm) in order
    val names = name.split(",").toSeq
    for (n <- names; tag <- Seq("cold", "warm")) {
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      println(s"[probe] $n $tag rows=$rows sec=${(System.nanoTime() - t0) / 1e9}")
    }
    if (names.size == 1)
      SparkEntry.queries(names.head)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
