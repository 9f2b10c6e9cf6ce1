package graft

import graft.llm.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The stateless per-doc curation gate (`Curation.curationVerdicts`) must
  * produce the SAME verdicts on a streaming DataFrame as on a batch one,
  * judge each document exactly once in the micro-batch it arrives in, and
  * plan with ZERO stateful operators — that statelessness is the whole
  * contract that lets a production pipeline curate a crawl as it lands.
  */
class StreamCurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("curation verdicts: batch ≡ stream, once per doc, zero state") {
    // lay the corpus out as several parquet files so maxFilesPerTrigger
    // drives multiple micro-batches (arrival-order independence)
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = Files.createTempDirectory("graft-scur").toString
    src.repartition(4).write.mode("overwrite").parquet(dir)

    val batch = Curation.curationVerdicts(spark.read.parquet(dir))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(batch.exists(_._3) && batch.exists(!_._3),
      "fixture must exercise both verdicts")

    val sdf = spark.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, (Long, String, Boolean))]
    val q = Curation.curationVerdicts(sdf).writeStream
      .foreachBatch { (df: DataFrame, b: Long) =>
        got.synchronized {
          got ++= df.collect()
            .map(r => b -> ((r.getLong(0), r.getString(1), r.getBoolean(2))))
        }
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft-scur-ck").toString)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(180000), "stream must drain")

    assert(got.map(_._2).toSet == batch, "stream verdicts must equal batch")
    assert(got.size == batch.size, "each doc judged exactly once")
    assert(got.map(_._1).distinct.size >= 2,
      "multiple micro-batches must have run")
    // stateless by plan: no stateful operator ever appears
    assert(q.recentProgress.flatMap(_.stateOperators).isEmpty,
      "the gate must plan with zero stateful operators")
  }
}
