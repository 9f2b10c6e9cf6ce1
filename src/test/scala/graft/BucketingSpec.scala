package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located bucketed joins: the whole point is the PLAN — no exchange
  * below the join — so that is what the spec pins, plus result equality
  * with the plain shuffled join.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("bucketed join plans no exchange below the join, results match shuffled join") {
    // at gate scale Spark would broadcast the small side (also shuffle-free,
    // but not what this test pins); force the sort-merge path a fact-fact
    // join takes at 100 TB
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (ot, lt) = Bucketing.bucketedTables(spark, dir)
      val joined = spark.table(lt)
        .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinPos = plan.indexOf("Join")
      assert(joinPos >= 0, s"expected a join:\n$plan")
      assert(!plan.substring(joinPos).contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")

      val plain = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderpriority"))
      assert(joined.collect().map(_.toString).sorted.toSeq ==
        plain.collect().map(_.toString).sorted.toSeq)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed aggregate entry matches the plain-join result") {
    val viaBuckets = Bucketing.bucketedJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(graft.Tables.fx(col("l_extendedprice") * (lit(1) - col("l_discount")), 4))
        .as("revenue_e4"), count(lit(1)).as("n_items"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaBuckets == plain)
  }
}
