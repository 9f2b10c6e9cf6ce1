package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: densify an event stream onto a fixed bucket
  * grid per key, carrying the last observed value forward through empty
  * buckets — what a dashboard needs to draw a continuous line (or a
  * feature pipeline to emit aligned samples) from irregular events.
  * Spark has no native gap-fill; this composes one from native pieces,
  * so every stage stays inside whole-stage codegen.
  *
  * Plan shape: the bucket bounds are ONE tiny driver-side agg (two
  * longs); the grid generates per key via `explode(sequence(...))` — no
  * cross join node, rows materialize inside the scan stage; actuals
  * aggregate once on (key, bucket) with map-side partials (`max_by`
  * picks the in-bucket winner deterministically by (ts, ord)); the
  * left join aligns grid and actuals on (key, bucket); the
  * carry-forward is a running `last(ignoreNulls)` window per key.
  * Everything shuffles on (key, bucket) or key — grid size is
  * keys × buckets regardless of event count, so the heavy input stream
  * is touched exactly once, in the aggregate.
  */
object TimeSeries {

  /** @param events frame with `keyCol`, `tsCol` (long, any unit),
    *               `ordCol` (tie-break within a ts), `valCol` (long)
    * @return (keyCol, bucket, n, v_ff): per key × bucket, the event
    *         count and the carried-forward last value (null until the
    *         key's first event) */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      valCol: String, bucketWidth: Long): DataFrame = {
    val e = events
      .select(col(keyCol), col(tsCol), col(ordCol), col(valCol))
      .withColumn("__b", expr(s"$tsCol div $bucketWidth"))
    val bounds = e.agg(min("__b"), max("__b")).head()
    if (bounds.isNullAt(0))
      // empty-input schema must match the non-empty one, including the
      // caller's actual key/value types
      return e.sparkSession.createDataFrame(
        e.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(keyCol, events.schema(keyCol).dataType),
          org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("v_ff", events.schema(valCol).dataType))))
    val (b0, b1) = (bounds.getLong(0), bounds.getLong(1))

    val grid = e.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(b0), lit(b1))).as("__b"))
    val act = e.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__n"),
        expr(s"max_by($valCol, struct($tsCol, $ordCol))").as("__lastv"))
    val w = Window.partitionBy(keyCol).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(act, Seq(keyCol, "__b"), "left_outer")
      .select(col(keyCol), col("__b").as("bucket"),
        coalesce(col("__n"), lit(0L)).as("n"),
        last(col("__lastv"), ignoreNulls = true).over(w).as("v_ff"))
  }
}
