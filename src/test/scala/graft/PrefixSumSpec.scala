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

  test("groupedCumBefore matches the per-group window on random data") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 600).map(i =>
      (i.toLong * 5 + 1, s"src${rnd.nextInt(5)}", rnd.nextInt(50).toLong))
    val df = rows.toDF("k", "g", "v")
    val got = PrefixSum.groupedCumBefore(df, "k", "g", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val want = df.withColumn("cb", coalesce(
        sum(col("v")).over(Window.partitionBy("g").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == want)
  }

  test("groupedCumBefore is invariant to the partition count") {
    val rows = (0 until 300).map(i => (i.toLong, s"s${i % 4}", (i % 11).toLong))
    val df = rows.toDF("k", "g", "v")
    def run(p: Int) = PrefixSum.groupedCumBefore(df, "k", "g", "v", partitions = p)
      .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq
    assert(run(1) == run(7) && run(7) == run(32))
  }

  test("groupedCumBefore: empty input and single-group input") {
    val empty = Seq.empty[(Long, String, Long)].toDF("k", "g", "v")
    assert(PrefixSum.groupedCumBefore(empty, "k", "g", "v").count() == 0)
    val one = (0 until 8).map(i => (i.toLong, "only", 3L)).toDF("k", "g", "v")
    val r = PrefixSum.groupedCumBefore(one, "k", "g", "v")
      .collect().map(x => (x.getLong(0), x.getLong(3))).sortBy(_._1)
    assert(r.map(_._2).toSeq == (0 until 8).map(_ * 3L))
  }

  test("groupedRank matches the per-group window on random data") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 400).map(i =>
      (rnd.nextLong() >>> 1, i.toLong, rnd.nextInt(4).toLong))
    val df = rows.toDF("k1", "k2", "g")
    val got = PrefixSum.groupedRank(df, "k1", "k2", "g", "r")
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    val want = df.withColumn("r", row_number().over(
        Window.partitionBy("g").orderBy("k1", "k2")).cast("long") - 1L)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    assert(got == want)
  }

  test("groupedRank is invariant to the partition count") {
    val rows = (0 until 300).map(i => ((i * 37 % 300).toLong, i.toLong, (i % 3).toLong))
    val df = rows.toDF("k1", "k2", "g")
    def run(p: Int) = PrefixSum.groupedRank(df, "k1", "k2", "g", "r", partitions = p)
      .collect().map(r => (r.getLong(1), r.getLong(3))).sortBy(_._1).toSeq
    assert(run(1) == run(5) && run(5) == run(32))
  }

  test("groupedRank: empty input and single-group input") {
    val empty = Seq.empty[(Long, Long, Long)].toDF("k1", "k2", "g")
    assert(PrefixSum.groupedRank(empty, "k1", "k2", "g").count() == 0)
    val one = (0 until 10).map(i => (i.toLong, i.toLong, 7L)).toDF("k1", "k2", "g")
    val r = PrefixSum.groupedRank(one, "k1", "k2", "g")
      .collect().map(x => (x.getLong(0), x.getLong(3))).sortBy(_._1)
    assert(r.map(_._2).toSeq == (0L until 10L))
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
