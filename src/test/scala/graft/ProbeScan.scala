package graft

import org.apache.spark.sql.SparkSession

/** Raw connector scan throughput: full-width hash over every column,
  * repeated; first iteration is JIT-cold. */
object ProbeScan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.store.EventStore.engine(spark, sfDir)
    val root = graft.store.EventStore.storeRoot(sfDir)
    def scan() = spark.read.format("graft-store").option("root", root).load()
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = scan()
        .selectExpr("bit_xor(xxhash64(part, msg, ts, seq, element_at(fields, 'user'))) as h",
          "count(1) as n").head().getLong(1)
      println(s"[scan] full$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = scan().count()
      println(s"[scan] count$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    // big-file variant: same rows, one file per partition — isolates the
    // PER-ROW materialization cost from per-task/file-open overhead
    val bigRoot = java.nio.file.Files.createTempDirectory("graft-bigscan").toString
    val big = new graft.store.Store(spark, bigRoot)
    big.append(graft.store.EventStore.mappedRows(spark, sfDir),
      maxRecordsPerFile = 10000000)
    def bigScan() = spark.read.format("graft-store").option("root", bigRoot).load()
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = bigScan()
        .selectExpr("bit_xor(xxhash64(part, msg, ts, seq, element_at(fields, 'user'))) as h",
          "count(1) as n").head().getLong(1)
      println(s"[scan] bigfull$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
