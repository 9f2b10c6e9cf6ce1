package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact global running totals, distributed.
  *
  * Spark's own window for `sum(...) OVER (ORDER BY k)` with no PARTITION BY
  * collapses the whole input into ONE task — correct, and useless at scale.
  * This is the classic two-pass distributed prefix sum instead:
  * range-partition on the order column, one pass reduces each partition to
  * its local total (P longs to the driver — KBs at any corpus size), scan
  * those into per-partition offsets, and a second pass streams each
  * partition once adding its offset to a local running total. Wall-clock is
  * two scans at full parallelism; nothing ever concentrates.
  *
  * This is one of the few operators where imperative per-partition logic is
  * genuinely required — the running total is inherently sequential WITHIN a
  * partition — so the two passes run as `mapPartitionsWithIndex` over the
  * sorted partitions. The result depends only on the global order, not on
  * where range-partition boundaries fall, so the output is deterministic
  * even though the sampled boundaries are not.
  */
object PrefixSum {

  /** `outCol` = sum of `valCol` over all rows STRICTLY preceding in
    * `orderCol` order (0 for the first row). Both columns are read as
    * longs; `orderCol` must be globally unique (it defines the order).
    * The output is EXACTLY the three columns (orderCol, valCol, outCol) —
    * any other input column is dropped; join the result back on `orderCol`
    * (unique by contract) to re-attach them. */
  def cumBefore(df: DataFrame, orderCol: String, valCol: String,
      outCol: String = "cum_before", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val base = df
      .select(col(orderCol).cast("long").as("k"), col(valCol).cast("long").as("v"))
      .repartitionByRange(p, col("k"))
      .sortWithinPartitions("k")
      .as[(Long, Long)]
      .persist()
    graft.llm.OpCaches.track(s"prefixsum.$orderCol.$valCol", Seq(base.toDF()))
    // pass 1: per-partition totals (tiny) -> exclusive scan = offsets
    val sums = base.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: stream each partition adding its offset
    base.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var run = bc.value(i)
        it.map { case (k, v) => val before = run; run += v; (k, v, before) }
      }
      .toDF(orderCol, valCol, outCol)
  }
}
