package graft

import org.apache.spark.sql.SparkSession

/** Decomposes Bench's `store_build_sec` (round-16 directive 1: the one
  * genuinely-above-ambient mover in the r16 median capture, 12.4 s at
  * r14 → ~25-27 s at r15/r16 on an ambient 1.26× host drift) into its
  * six steps, so the doubling is attributed to a step instead of to
  * "the build". Mirrors Bench.scala's build phase exactly, in order.
  * Run: `Test/runMain graft.BuildPhaseProbe [sfDir]` — twice if you
  * want a warm-marker (_BUILT present) vs cold-store split. */
object BuildPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[buildprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    timed("EventStore.engine")(graft.store.EventStore.engine(spark, sfDir))
    timed("PipeStore.engine")(graft.store.PipeStore.engine(spark, sfDir))
    timed("IngestStore.engine")(graft.store.IngestStore.engine(spark, sfDir))
    timed("warm minhash/simhash") {
      val docsWarm = spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
      graft.llm.Dedup.nearDuplicates(docsWarm).count()
      graft.llm.SimHash.fingerprints(docsWarm).count()
    }
    timed("warm graft-store batch scan") {
      spark.read.format("graft-store")
        .option("root", graft.store.EventStore.storeRoot(sfDir))
        .load().limit(2048).selectExpr("count(xxhash64(part, msg, ts, seq))").head()
    }
    timed("warm streaming drain") {
      import spark.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft-bprobe").toString
      val st = new graft.store.Store(spark, root)
      st.write(Map("app" -> "warm"), Map.empty,
        Seq((1000000000L, "w0", 1L)).toDF("ts", "msg", "seq"))
      val q = spark.readStream.format("graft-store").option("root", root).load()
        .writeStream.foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) => { df.count(); () })
        .option("checkpointLocation", s"$root/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination(60000)
      finally q.stop()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(new java.io.File(root))
    }
    spark.stop()
  }
}
