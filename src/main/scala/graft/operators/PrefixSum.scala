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
      outCol: String = "cum_before", partitions: Int = 0): DataFrame =
    cumBeforeWithTotal(df, orderCol, valCol, outCol, partitions)._1

  /** [[cumBefore]] plus the GRAND TOTAL of `valCol`, for free: pass 1
    * already collects the per-partition subtotals to the driver to build
    * the offsets, and the exclusive scan's last element IS the global
    * sum. Callers that would otherwise attach the total as an
    * unpartitioned `sum() OVER ()` window — which funnels the whole
    * (distinct-value-sized, unbounded-growth) input into ONE task, the
    * exact anti-pattern this operator exists to avoid — inline it as a
    * literal instead (r18; the Quantiles.orderStats consumer). */
  def cumBeforeWithTotal(df: DataFrame, orderCol: String, valCol: String,
      outCol: String = "cum_before", partitions: Int = 0): (DataFrame, Long) = {
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
    (base.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var run = bc.value(i)
        it.map { case (k, v) => val before = run; run += v; (k, v, before) }
      }
      .toDF(orderCol, valCol, outCol), offsets.last)
  }

  /** `outCol` = sum of `valCol` over rows of the SAME `groupCol` value
    * strictly preceding in `ordCol` order — i.e.
    * `sum(v) OVER (PARTITION BY g ORDER BY ord) - v`, but WITHOUT
    * partitioning by group (a G-ary window puts each group's whole
    * membership in one task; see [[groupedRank]]). Range-partitions on
    * the ORDER key — balanced regardless of group sizes — with
    * per-(partition, group) subtotal offsets (P×G longs to the driver,
    * so `groupCol` must be LOW-CARDINALITY by design: sources, splits,
    * shard ids). `ordCol` must be globally unique; ord/val read as
    * longs, group as string. Output is exactly
    * (ordCol, groupCol, valCol, outCol). */
  def groupedCumBefore(df: DataFrame, ordCol: String, groupCol: String,
      valCol: String, outCol: String = "cum_before",
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val base = df
      .select(col(ordCol).cast("long").as("k"),
        col(groupCol).cast("string").as("g"), col(valCol).cast("long").as("v"))
      .repartitionByRange(p, col("k"))
      .sortWithinPartitions("k")
      .as[(Long, String, Long)]
      .persist()
    graft.llm.OpCaches.track(s"prefixsum.cum.$ordCol.$groupCol", Seq(base.toDF()))
    val sums = base.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { case (_, g, v) => m.update(g, m.getOrElse(g, 0L) + v) }
        Iterator((i, m.toMap))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = sums.scanLeft(Map.empty[String, Long]) { (acc, m) =>
      m.foldLeft(acc) { case (a, (g, s)) => a.updated(g, a.getOrElse(g, 0L) + s) }
    }.init
    val bc = spark.sparkContext.broadcast(offsets)
    base.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        val run = scala.collection.mutable.HashMap(bc.value(i).toSeq: _*)
        it.map { case (k, g, v) =>
          val before = run.getOrElse(g, 0L)
          run.update(g, before + v)
          (k, g, v, before)
        }
      }
      .toDF(ordCol, groupCol, valCol, outCol)
  }

  /** `outCol` = 0-based rank WITHIN the row's `groupCol` value, in global
    * (`ord1`, `ord2`) order — i.e.
    * `row_number() OVER (PARTITION BY g ORDER BY ord1, ord2) - 1`, but
    * WITHOUT partitioning by group: a G-ary window puts each group's whole
    * membership in one task (for a 3-bucket curriculum that is the entire
    * corpus in 3 tasks). Here the data range-partitions on the ORDER key
    * instead — balanced regardless of group sizes — and the per-group
    * running counters generalize [[cumBefore]]'s scalar: pass 1 reduces
    * each partition to its per-group counts (P×G longs to the driver —
    * `groupCol` must be LOW-CARDINALITY by design: difficulty buckets,
    * split names, shard ids), the exclusive scan yields per-(partition,
    * group) offsets, pass 2 streams with a per-group counter map.
    * (`ord1`, `ord2`) must be unique per row (ord2 the tie-breaker);
    * all three columns are read as longs; output is exactly
    * (ord1, ord2, groupCol, outCol). */
  def groupedRank(df: DataFrame, ord1: String, ord2: String,
      groupCol: String, outCol: String = "grp_rank",
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val p = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val base = df
      .select(col(ord1).cast("long").as("k1"), col(ord2).cast("long").as("k2"),
        col(groupCol).cast("long").as("g"))
      .repartitionByRange(p, col("k1"), col("k2"))
      .sortWithinPartitions("k1", "k2")
      .as[(Long, Long, Long)]
      .persist()
    graft.llm.OpCaches.track(s"prefixsum.rank.$ord1.$groupCol", Seq(base.toDF()))
    val counts = base.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        val m = scala.collection.mutable.HashMap.empty[Long, Long]
        it.foreach { case (_, _, g) => m.update(g, m.getOrElse(g, 0L) + 1L) }
        Iterator((i, m.toMap))
      }
      .collect().sortBy(_._1).map(_._2)
    // exclusive scan per group across partitions
    val offsets = counts.scanLeft(Map.empty[Long, Long]) { (acc, m) =>
      m.foldLeft(acc) { case (a, (g, c)) => a.updated(g, a.getOrElse(g, 0L) + c) }
    }.init
    val bc = spark.sparkContext.broadcast(offsets)
    base.rdd
      .mapPartitionsWithIndex { case (i, it) =>
        val run = scala.collection.mutable.HashMap(bc.value(i).toSeq: _*)
        it.map { case (k1, k2, g) =>
          val r = run.getOrElse(g, 0L)
          run.update(g, r + 1L)
          (k1, k2, g, r)
        }
      }
      .toDF(ord1, ord2, groupCol, outCol)
  }
}
