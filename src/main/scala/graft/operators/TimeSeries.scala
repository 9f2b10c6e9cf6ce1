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
  * longs) in global mode, a lazy per-key aggregate in per-key mode, or
  * caller constants; the grid generates per key via
  * `explode(sequence(...))` — no cross join node, rows materialize
  * inside the scan stage; actuals
  * aggregate once on (key, bucket) with map-side partials (`max_by`
  * picks the in-bucket winner deterministically by (ts, ord)); the
  * left join aligns grid and actuals on (key, bucket); the
  * carry-forward is a running `last(ignoreNulls)` window per key.
  * Everything shuffles on (key, bucket) or key — grid size is
  * keys × buckets regardless of event count, so the heavy input stream
  * is touched exactly once, in the aggregate.
  */
object TimeSeries {

  /** Grid-extent policy for [[gapFill]].
    *
    * [[GlobalBounds]] spans every key over the corpus-wide [min,max]
    * bucket range — the dashboard-aligned default, but at scale it is a
    * keys × global-span blowup: a key active for one hour inside a
    * year-long corpus densifies to the full year (8760 hourly buckets of
    * padding for ONE key). [[PerKeyBounds]] bounds each key's grid to its
    * own [min,max] — grid size tracks each key's actual activity span,
    * and the plan stays fully lazy (no driver-side bounds agg).
    * [[FixedBounds]] pins an explicit [b0,b1] bucket range (ts div
    * bucketWidth units) — the query-a-time-window shape; events outside
    * the range are ignored entirely: they neither carry values in nor
    * nominate their key, so a key with no in-window events emits no rows.
    */
  sealed trait GridBounds
  case object GlobalBounds extends GridBounds
  case object PerKeyBounds extends GridBounds
  final case class FixedBounds(b0: Long, b1: Long) extends GridBounds

  /** @param events frame with `keyCol`, `tsCol` (long, any unit),
    *               `ordCol` (tie-break within a ts), `valCol` (long)
    * @param bounds grid-extent policy (see [[GridBounds]])
    * @return (keyCol, bucket, n, v_ff): per key × bucket, the event
    *         count and the carried-forward last value (null until the
    *         key's first event) */
  def gapFill(events: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      valCol: String, bucketWidth: Long,
      bounds: GridBounds = GlobalBounds): DataFrame = {
    val e = events
      .select(col(keyCol), col(tsCol), col(ordCol), col(valCol))
      .withColumn("__b", expr(s"$tsCol div $bucketWidth"))
    val act = e.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__n"),
        expr(s"max_by($valCol, struct($tsCol, $ordCol))").as("__lastv"))
    // r17 note — a one-corpus-pass form was attempted and REVERTED: the
    // grid cannot share act's exchange. Deriving the grid from act via
    // groupBy(key) collapses (min/max are duplicate-insensitive, so the
    // optimizer rewrites the two-level aggregate into an independent
    // corpus aggregate), and deriving it via per-key windows survives
    // rewriting but column pruning narrows the grid-side copy of act to
    // keys-only — a DIFFERENT subtree, so ReuseExchange never fires and
    // the window only added an exchange+sort (plan-verified both ways).
    // Two passes — one narrow (key/ts) for the grid, one full for act —
    // are this operator's practical floor without materializing act.
    val grid = bounds match {
      case PerKeyBounds =>
        // one (key → min,max) aggregate feeds the explode — no driver agg,
        // and a sparse key cannot blow up to the global span
        e.groupBy(col(keyCol))
          .agg(min("__b").as("__kb0"), max("__b").as("__kb1"))
          .select(col(keyCol),
            explode(sequence(col("__kb0"), col("__kb1"))).as("__b"))
      case FixedBounds(b0, b1) =>
        // sequence() silently steps BACKWARD when start > stop, which
        // would turn an inverted window into the full reversed grid
        require(b0 <= b1, s"FixedBounds requires b0 <= b1, got [$b0, $b1]")
        // keys are nominated by IN-WINDOW events only — a key whose events
        // all fall outside [b0,b1] must not emit a padded all-empty grid
        e.filter(col("__b").between(b0, b1)).select(col(keyCol)).distinct()
          .select(col(keyCol), explode(sequence(lit(b0), lit(b1))).as("__b"))
      case GlobalBounds =>
        val gb = e.agg(min("__b"), max("__b")).head()
        if (gb.isNullAt(0))
          // empty-input schema must match the non-empty one, including the
          // caller's actual key/value types
          return e.sparkSession.createDataFrame(
            e.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField(keyCol, events.schema(keyCol).dataType),
              org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType, nullable = false),
              org.apache.spark.sql.types.StructField("v_ff", events.schema(valCol).dataType))))
        e.select(col(keyCol)).distinct()
          .select(col(keyCol),
            explode(sequence(lit(gb.getLong(0)), lit(gb.getLong(1)))).as("__b"))
    }
    val w = Window.partitionBy(keyCol).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(act, Seq(keyCol, "__b"), "left_outer")
      .select(col(keyCol), col("__b").as("bucket"),
        coalesce(col("__n"), lit(0L)).as("n"),
        last(col("__lastv"), ignoreNulls = true).over(w).as("v_ff"))
  }
}
