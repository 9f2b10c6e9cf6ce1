package graft

import graft.llm.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The CDC dedup-on-ingest gate ([[Dedup.cdcGateVerdicts]]) must produce
  * the SAME chunk verdicts on a streaming incoming frame as on a batch
  * one, judge each chunk exactly once in the micro-batch its doc arrives
  * in, and plan with ZERO stateful operators — chunking is per-doc array
  * work and the history lookup is a stream-static join, so a production
  * pipeline gates a crawl's chunks as it lands (the StreamCurationSpec
  * contract, applied to dedup).
  */
class StreamCdcSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("CDC gate verdicts: batch ≡ stream, once per chunk, zero state") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("ga", "gb", "gc", "gd", "ge")
    def text() = (0 until 140).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val histTexts = (0 until 5).map(_ => text())
    val history = Dedup.cdcChunks(
      histTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .cache()
    // incoming: one exact history copy + fresh docs, laid out as several
    // parquet files so maxFilesPerTrigger drives multiple micro-batches
    val incoming = ((100L, histTexts.head) +:
      (101L to 106L).map(id => (id, text()))).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-scdc").toString
    incoming.repartition(4).write.mode("overwrite").parquet(dir)

    def rows(df: DataFrame): Set[(Long, Long, Long, Boolean)] =
      df.select("doc_id", "chunk_idx", "n_tok", "is_dup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    val batch = rows(Dedup.cdcGateVerdicts(history, spark.read.parquet(dir)))
    assert(batch.exists(_._4) && batch.exists(!_._4),
      "fixture must exercise both verdicts")
    assert(batch.filter(_._1 == 100L).forall(_._4),
      "the planted history copy's chunks must all gate")

    val sdf = spark.readStream.schema(incoming.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, (Long, Long, Long, Boolean))]
    val q = Dedup.cdcGateVerdicts(history, sdf).writeStream
      .foreachBatch { (df: DataFrame, b: Long) =>
        got.synchronized {
          got ++= df.select("doc_id", "chunk_idx", "n_tok", "is_dup").collect()
            .map(r => b -> ((r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))))
        }
        ()
      }
      .option("checkpointLocation", Files.createTempDirectory("graft-scdc-ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "stream must drain")

    assert(got.map(_._2).toSet == batch, "stream verdicts must equal batch")
    assert(got.size == batch.size, "each chunk judged exactly once")
    assert(got.map(_._1).distinct.size >= 2, "multiple micro-batches must have run")
    assert(q.recentProgress.flatMap(_.stateOperators).isEmpty,
      "the gate must plan with zero stateful operators")
  }
}
