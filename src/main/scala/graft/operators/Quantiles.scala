package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics.
  *
  * Spark's exact `percentile` aggregate buffers every value of a group in
  * one aggregation buffer, and a global `row_number() OVER (ORDER BY v)`
  * collapses the corpus into a single task — both correct, both useless at
  * 100 TB. This computes the k-th order statistic from the VALUE HISTOGRAM
  * instead: group by the (integerized) value — a map-side-combined
  * aggregate whose output is DISTINCT-VALUE-sized, not corpus-sized — then
  * resolve rank k against the histogram's running count and pick the
  * unique value v with cum_before < k <= cum_before + count(v). The
  * corpus streams exactly once; everything downstream is bounded by the
  * number of distinct values (for fixed-point metrics: the value domain,
  * e.g. ~1e5 for an e2-scaled [0,1000) measure), never by row count.
  * Global stats run the running count through the two-pass distributed
  * prefix sum ([[PrefixSum.cumBefore]]) so not even the histogram needs a
  * single-task window; grouped stats use a per-group window over
  * histogram rows (distributed across groups, per-task work bounded by a
  * group's distinct values).
  *
  * Quantile contract (engine-neutral, exact): rank k(q) = ceil(q·n)
  * clamped to >= 1, computed in INTEGER arithmetic from q as an e4
  * fixed-point weight — k = max(1, (q_e4·n + 9999) div 10000), 1-based
  * over the ascending order; the result is the k-th smallest value. The
  * DuckDB oracles state the same contract as window SQL, so both engines
  * agree bit-for-bit with no floating-point rounding hazard at any n.
  */
object Quantiles {

  /** THE rank contract — k = max(1, ceil(q·n)) in integer arithmetic, q
    * in e4 fixed point — in its three forms. Every consumer (this file,
    * the analytics/curation/stream oracles, StreamOps.windowQuantile)
    * goes through one of these so the contract cannot silently fork. */
  def kOf(qE4: Long, n: Long): Long = math.max(1L, (qE4 * n + 9999L) / 10000L)

  /** DuckDB-SQL form (`//` floors like integer `div` on the positive
    * domain both sides operate in). */
  def kSql(qE4Expr: String, nExpr: String): String =
    s"greatest(1, ($qE4Expr * $nExpr + 9999) // 10000)"

  /** Spark Column form over SQL sub-expressions (`div`, the integral
    * division — `/` would be double division). */
  def kColExpr(qExpr: String, nExpr: String): org.apache.spark.sql.Column =
    greatest(lit(1L), expr(s"($qExpr * $nExpr + 9999) div 10000"))

  /** [[kColExpr]] with a literal quantile over a LongType count column. */
  def kCol(qE4: Long, nColName: String): org.apache.spark.sql.Column =
    kColExpr(qE4.toString, s"`$nColName`")

  /** Global order statistics: one output row per requested quantile —
    * (q_e4, n, k, value). Empty input yields no rows; null values are
    * excluded — they neither count toward n nor rank (a null histogram
    * row would otherwise shift every rank and crash the prefix-sum
    * decoder with an opaque NPE). */
  def orderStats(df: DataFrame, valCol: String, qsE4: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valCol).cast("long").as("v")).filter(col("v").isNotNull)
    val hist = v.groupBy("v").agg(count(lit(1)).as("c"))
    // n rides out of the prefix sum's OWN pass-1 driver collect (r18):
    // the exclusive scan's last offset IS sum(c), so n costs nothing —
    // no extra corpus pass (the r17 concern that introduced a window
    // here) and no unpartitioned `sum() OVER ()` window funneling the
    // distinct-value histogram into one task (the ADVICE r17 concern:
    // for near-unique long values the histogram approaches corpus
    // size). Same integer rank contract, n now a literal.
    val (cum, n) = PrefixSum.cumBeforeWithTotal(hist, "v", "c") // (v, c, cum_before)
    val qdf = qsE4.map(Tuple1(_)).toDF("q_e4")
    cum
      .withColumn("n", lit(n))
      .join(broadcast(qdf))
      .withColumn("k", kColExpr("q_e4", "n"))
      .filter(col("cum_before") < col("k") && col("k") <= col("cum_before") + col("c"))
      .select(col("q_e4"), col("n"), col("k"), col("v").as("value"))
  }

  /** Per-group order statistic at one quantile: one row per group —
    * (grpCol, n, k, value). */
  def groupedOrderStat(df: DataFrame, grpCol: String, valCol: String,
      qE4: Long): DataFrame =
    groupedOrderStats(df, grpCol, valCol, Seq(qE4))
      .select(col(grpCol), col("n"), col("k"), col("value"))

  /** Per-group order statistics at several quantiles: one row per
    * (group, quantile) — (grpCol, q_e4, n, k, value). The window runs
    * over HISTOGRAM rows partitioned by group: fully parallel across
    * groups, a task's work bounded by one group's distinct values, not
    * its row count; the quantile list rides in as a broadcast literal
    * against the same windowed histogram, so asking for four quantiles
    * costs the same corpus work as one. */
  def groupedOrderStats(df: DataFrame, grpCol: String, valCol: String,
      qsE4: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // null exclusion matches orderStats (post-cast, so an uncastable
    // value is excluded rather than ranked as null)
    val hist = df.select(col(grpCol), col(valCol).cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col(grpCol), col("v"))
      .agg(count(lit(1)).as("c"))
    val byG = Window.partitionBy(grpCol)
    val w = byG.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val qdf = qsE4.map(Tuple1(_)).toDF("q_e4")
    hist
      .withColumn("cle", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(byG))
      .join(broadcast(qdf))
      .withColumn("k", kColExpr("q_e4", "n"))
      .filter(col("cle") - col("c") < col("k") && col("k") <= col("cle"))
      .select(col(grpCol), col("q_e4"), col("n"), col("k"), col("v").as("value"))
  }
}
