package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's built-in join strategies don't cover
  * well: as-of (latest-prior match) and point-in-interval joins.
  *
  * Spark plans an inequality-only join condition as a broadcast
  * nested-loop (or cartesian) join — O(|L|·|R|) per key and a driver
  * OOM once neither side broadcasts. Both operators here avoid the
  * inequality join entirely:
  *
  *  - [[asOf]] is the union-sort form: tag both sides, union, one
  *    shuffle on the key, one per-partition sort, and a running
  *    `last(..., ignoreNulls)` window carries the most recent right row
  *    forward into each left row. Cost: ONE exchange + sort, O(n log n)
  *    per key group, no join node at all. This is the shape that
  *    survives 100 TB: the exchange partitions by key, so a
  *    1000-executor cluster streams each key group once. (Hot-key skew
  *    behaves like any window function — AQE can't split a single key;
  *    salt the key and replicate right-side rows per salt if one key
  *    dominates.)
  *
  *  - [[pointInInterval]] buckets event time at a width >= the max
  *    interval length, explodes each interval to the buckets it
  *    overlaps (<= 2 when len <= width), and equi-joins points on
  *    (key, bucket) with the range predicate left as a residual filter.
  *    Each point lives in exactly ONE bucket, so no dedup is needed.
  *    Cost: one shuffle of each side on (key, bucket) — a plain
  *    shuffled hash/sort-merge join Catalyst and AQE fully optimize —
  *    instead of a nested loop.
  *
  * No reference counterpart (logrange has no join operator at all);
  * these are the temporal primitives an observability / training-data
  * pipeline needs (attach "latest config before event", "count views
  * within an hour of a click").
  */
object TemporalJoins {

  /** As-of join: for every row of `left`, find the single row of
    * `right` with the greatest `tsCol` <= the left row's `tsCol` for
    * the same `keyCol` (ties at equal ts: the right row is visible to
    * left rows at the same ts).
    *
    * `right` must be unique per (key, ts) — pre-aggregate if not; with
    * duplicate (key, ts) right rows the carried payload among the
    * duplicates is unspecified.
    *
    * `salts > 1` is the hot-key escape hatch: one key dominating the
    * input makes any per-key operator (window functions included — AQE
    * cannot split a single key) a one-task straggler. Salting splits
    * each key's LEFT rows across `salts` sub-partitions (hashed on ts,
    * so a sub-partition is still one task's sort) and REPLICATES the
    * right side into every salt, so each sub-partition carries the full
    * right history and produces exactly the unsalted result. Cost:
    * |right| × salts rows through the exchange — the standard trade
    * (right sides of as-of joins are usually the small/slow-changing
    * side: configs, dimensions, reference prices).
    *
    * Output: all `left` columns, plus each non-key right payload column
    * prefixed `r_` (null when no prior right row exists).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      salts: Int = 1): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val payload = right.columns.filter(c => c != keyCol && c != tsCol)
    val rStruct = struct((tsCol +: payload.toSeq).map(col): _*)
    val rNull = struct((tsCol +: payload.toSeq).map(c =>
      lit(null).cast(right.schema(c).dataType).as(c)): _*)

    // Align both sides to (key, ts, __side, __r, __salt, leftPayload...);
    // the right side carries its payload inside __r and nulls for the
    // left payload, so unionByName stays positional-safe.
    val leftPayloadCols = left.columns.filter(c => c != keyCol && c != tsCol)
    // when(false, ...) makes __r NULL itself (a struct of null fields is
    // non-null and would defeat last(..., ignoreNulls) below).
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r", when(lit(false), rNull))
      .withColumn("__salt",
        if (salts == 1) lit(0) else pmod(xxhash64(col(tsCol)), lit(salts)).cast("int"))
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__r", rStruct)
      .withColumn("__salt",
        if (salts == 1) lit(0) else explode(sequence(lit(0), lit(salts - 1))))
      .select(Seq(col(keyCol), col(tsCol), col("__side"), col("__r"), col("__salt")) ++
        leftPayloadCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Right rows sort before left rows at equal ts (side 0 < 1), so an
    // equal-ts right row is already carried when the left row is read.
    val w = Window.partitionBy(col(keyCol), col("__salt"))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = last(col("__r"), ignoreNulls = true).over(w)

    val out = l.unionByName(r)
      .withColumn("__carried", carried)
      .filter(col("__side") === 1)
    val rOut = Seq(col(s"__carried.$tsCol").as(s"r_$tsCol")) ++
      payload.map(c => col(s"__carried.$c").as(s"r_$c"))
    out.select(left.columns.map(col).toSeq ++ rOut: _*)
  }

  /** Point-in-interval join: pairs every `points` row (key, ts) with
    * every `intervals` row (key, [startCol, endCol)) containing it,
    * left-outer on intervals (an interval with no points still emits
    * one row with null point columns, so downstream counts see zeros).
    *
    * `bucketWidth` (same unit as the ts columns) must be >= the longest
    * interval; each interval explodes to `(end - start) / width + 1`
    * bucket rows (2 for len == width).
    *
    * Output: all `intervals` columns, plus each non-key point column
    * prefixed `p_`.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keyCol: String,
      tsCol: String, startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    // Integer `div`, not `/`: ns-scale longs exceed 2^53 and would lose
    // precision through double division.
    val iv = intervals
      .withColumn("__bucket",
        explode(sequence(expr(s"CAST($startCol AS BIGINT) div $bucketWidth"),
          // end is exclusive, but an interval ending exactly on a bucket
          // boundary still can't match points of the next bucket, so the
          // residual filter makes the extra bucket row harmless.
          expr(s"CAST($endCol AS BIGINT) div $bucketWidth"))))
    val ptPayload = points.columns.filter(c => c != keyCol).toSeq
    val pt = points
      .withColumn("__bucket", expr(s"CAST($tsCol AS BIGINT) div $bucketWidth"))
      .select(Seq(col(keyCol).as("__pk"), col("__bucket")) ++
        ptPayload.map(c => col(c).as(s"p_$c")): _*)
    iv.join(pt,
        iv("__bucket") === pt("__bucket") && col(keyCol) === col("__pk") &&
          col(s"p_$tsCol") >= col(startCol) && col(s"p_$tsCol") < col(endCol),
        "left_outer")
      // every bucket replica of an interval survives the outer join even
      // when unmatched (null-padded); keep null rows ONLY for intervals
      // that matched nothing in ANY bucket, and then only the first
      // replica's — so a point-less interval emits exactly one row and a
      // matched interval emits exactly its pairs (the contract above).
      // Replicas are grouped by (key, start, end) — a synthetic
      // monotonically_increasing_id would be re-assigned on a stage retry
      // with nondeterministic upstream order, splitting one interval's
      // replicas across window groups; content identity is retry-stable.
      // (key, start, end) alone DETERMINES an interval's match set, so
      // rows coinciding on the triple (even with different payloads)
      // matched identically and sharing a window group is harmless — and
      // the narrow key keeps payload columns (possibly wide or
      // non-orderable, e.g. maps) out of the window exchange.
      .withColumn("__any",
        max(col(s"p_$tsCol").isNotNull.cast("int"))
          .over(Window.partitionBy(col(keyCol), col(startCol), col(endCol))))
      .filter(col(s"p_$tsCol").isNotNull ||
        (col("__any") === 0 &&
          iv("__bucket") === expr(s"CAST($startCol AS BIGINT) div $bucketWidth")))
      .select(intervals.columns.map(col).toSeq ++ ptPayload.map(c => col(s"p_$c")): _*)
  }
}
