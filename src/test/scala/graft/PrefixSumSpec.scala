package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrefixSumSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cumBefore matches the single-task window on random data") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map(i => (i.toLong * 3 + 7, rnd.nextInt(100).toLong))
    val df = rows.toDF("k", "v")
    val got = PrefixSum.cumBefore(df, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want = df.withColumn("cb", coalesce(
        sum(col("v")).over(Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("cumBefore is invariant to the partition count") {
    val rows = (0 until 200).map(i => (i.toLong, (i % 13).toLong))
    val df = rows.toDF("k", "v")
    val at1 = PrefixSum.cumBefore(df, "k", "v", partitions = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val at7 = PrefixSum.cumBefore(df, "k", "v", partitions = 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    val at32 = PrefixSum.cumBefore(df, "k", "v", partitions = 32)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq
    assert(at1 == at7 && at7 == at32)
  }

  test("cumBefore: empty input, single row") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.cumBefore(empty, "k", "v").count() == 0)
    val one = Seq((5L, 9L)).toDF("k", "v")
    val r = PrefixSum.cumBefore(one, "k", "v").collect()
    assert(r.length == 1 && r.head.getLong(2) == 0L)
  }

  test("pack: shards respect the running-budget boundary") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.llm.Curation.pack(docs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    var running = 0L
    out.foreach { case (id, n, cb, shard) =>
      assert(cb == running, s"doc $id cum_before $cb, expected $running")
      assert(shard == running / graft.llm.Curation.PackBudget)
      running += n
    }
  }
}
