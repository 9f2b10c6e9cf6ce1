package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{load, fx}

/** Core analytic query slate over the synthetic TPC-H-ish tables.
  *
  * Design rules (scale-first):
  *  - dimension tables (region/nation/customer/supplier/part) are
  *    broadcast — no shuffle of the fact side for those joins;
  *  - fact-fact joins (orders ⋈ lineitem) shuffle on the join key and
  *    rely on AQE for skew; at 100 TB both sides would be bucketed by
  *    orderkey, which this plan shape inherits for free;
  *  - money aggregates are integerized per row (see Tables.fx) so the
  *    sums are exact and deterministic under any partitioning.
  */
object Analytics {

  /** TPC-H Q1 flavor: full-scan aggregation with map-side partial agg. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(fx(col("l_quantity"), 2)).as("sum_qty_e2"),
        sum(fx(col("l_extendedprice"), 2)).as("sum_base_e2"),
        sum(fx(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)).as("sum_disc_e4"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3 flavor: selective dim filter → broadcast join → top-k. */
  def q2Topk(spark: SparkSession, dir: String): DataFrame = {
    val cust = load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = load(spark, dir, "orders")
    val li = load(spark, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      .agg(sum(fx(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)).as("revenue_e4"))
      .orderBy(desc("revenue_e4"), asc("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 flavor: 5-way join, all dims broadcast, one fact shuffle. */
  def q3Join5(spark: SparkSession, dir: String): DataFrame = {
    val region = load(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = load(spark, dir, "nation")
    val cust = load(spark, dir, "customer")
    val ord = load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val li = load(spark, dir, "lineitem")
    val dims = cust
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(sum(fx(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)).as("revenue_e4"),
        count(lit(1)).as("n_items"))
      .orderBy(desc("revenue_e4"), asc("n_name"))
  }

  /** EXISTS → left-semi join (no row multiplication, no distinct). */
  def q4Semi(spark: SparkSession, dir: String): DataFrame = {
    val ord = load(spark, dir, "orders")
    val bigLines = load(spark, dir, "lineitem").filter(col("l_quantity") >= 48)
      .select(col("l_orderkey"))
    ord.join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6 flavor: tight filter + scalar aggregate; filters push to parquet. */
  def q5FilterAgg(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(sum(fx(col("l_extendedprice") * col("l_discount"), 4)).as("revenue_e4"),
        count(lit(1)).as("n_rows"))

  /** Window function: first 3 shipments per supplier (deterministic order). */
  def q6Window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    load(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"))
      .orderBy("l_suppkey", "rn")
  }

  /** count(distinct) — expands to two-stage partial aggregation. */
  def q7Distinct(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  /** Event-time bucketing on the Long-ns timestamp (integer division —
    * no timestamp conversion in the hot path). */
  def q8EventsHourly(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("hour_bucket", expr("ts div 3600000000000"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(fx(col("value"), 2)).as("sum_value_e2"))
      .orderBy("hour_bucket", "event_type")

  /** Trailing 7-bucket rolling aggregate over the hourly event series —
    * the moving-average operator family (ROWS frame, not RANGE: a bucket
    * rolls over the previous six PRESENT buckets; the gap-fill operator
    * is the densify step when calendar-frame semantics are wanted).
    *
    * Scale note: the ONLY corpus-scale pass is the map-side-combined
    * hourly aggregate; the window then runs over the aggregated series,
    * whose size is (time buckets × event types) — corpus-size-INDEPENDENT
    * — so the low-cardinality partitionBy is not a single-task hazard
    * here, unlike a window over raw events (which is what PrefixSum
    * exists for). The rolling average is an integer div of two exact
    * integer rolling sums. */
  def q16Rolling(spark: SparkSession, dir: String): DataFrame = {
    val hourly = load(spark, dir, "events")
      .withColumn("hour_bucket", expr("ts div 3600000000000"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(fx(col("value"), 2)).as("v_e2"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_bucket"))
      .rowsBetween(-6, Window.currentRow)
    hourly
      .select(col("event_type"), col("hour_bucket"), col("n"),
        sum(col("n")).over(w).as("roll_n"),
        sum(col("v_e2")).over(w).as("roll_value_e2"))
      .withColumn("roll_avg_e2", expr("roll_value_e2 div roll_n"))
  }

  /** NOT EXISTS → left-anti join (filtered right side so it's non-empty). */
  def q9Anti(spark: SparkSession, dir: String): DataFrame = {
    val cust = load(spark, dir, "customer")
    val ord = load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** As-of join: each purchase event ← the same user's most recent
    * click at-or-before it (µs grain). Union-sort form — ONE exchange
    * on user_id, no join node, no nested loop (TemporalJoins.asOf);
    * the DuckDB oracle is its native ASOF LEFT JOIN. */
  def q10Asof(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events").withColumn("ts_us", expr("ts div 1000"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    // clicks deduped to one row per (user, µs) — asOf requires unique
    // (key, ts); max(event_id) is the deterministic tie-break.
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("event_id")).as("click_id"))
    // salts = 2 gates the hot-key-salted path against the ASOF oracle
    // end-to-end (the spec separately proves salted == unsalted)
    graft.operators.TemporalJoins.asOf(purchases, clicks, "user_id", "ts_us",
        salts = 2)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("r_click_id").as("click_id"),
        (col("ts_us") - col("r_ts_us")).as("gap_us"))
  }

  /** Point-in-interval join: views falling in the 24 h window after
    * each click by the same user, counted per click. Bucketed
    * equi-join (TemporalJoins.pointInInterval) — one (key, bucket)
    * shuffle per side instead of the nested-loop plan Spark picks for
    * a raw inequality join. */
  def q11Interval(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = load(spark, dir, "events").withColumn("ts_us", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us").as("start_us"),
        (col("ts_us") + lit(dayUs)).as("end_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"))
    graft.operators.TemporalJoins.pointInInterval(views, clicks, "user_id",
        "ts_us", "start_us", "end_us", dayUs)
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(col("p_ts_us")).as("n_views"))
  }

  /** Multi-level aggregation: ROLLUP over (returnflag, linestatus) with a
    * grouping_id disambiguating subtotal rows from genuine nulls. One
    * shuffle — Spark expands the rollup to grouping sets inside the same
    * partial-aggregate pass, so the fact table streams once regardless of
    * how many levels roll up. */
  def q13Rollup(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"), count(lit(1)).as("n"),
        sum(fx(col("l_quantity"), 2)).as("qty_e2"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("n"), col("qty_e2"))

  /** Gap-filled hourly resampling of the events stream per user:
    * carry-forward last value through empty hours (TimeSeries.gapFill —
    * grid via explode(sequence), one aggregate over the event stream,
    * running last(ignoreNulls) carry). */
  def q14Gapfill(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.gapFill(
        load(spark, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"), fx(col("value"), 2).cast("long").as("v")),
        "user_id", "ts_us", "event_id", "v", bucketWidth = 3600000000L)
      .select(col("user_id"), col("bucket").as("hour"), col("n"), col("v_ff"))

  /** Same resampling with PER-KEY grid bounds — each user's grid spans
    * only their own [first,last] active hour (the scale-safe mode: grid
    * size tracks per-key activity, not keys × global span, and the plan
    * is fully lazy — no driver-side bounds agg). */
  def q14GapfillPerKey(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeries.gapFill(
        load(spark, dir, "events")
          .select(col("user_id"), expr("ts div 1000").as("ts_us"),
            col("event_id"), fx(col("value"), 2).cast("long").as("v")),
        "user_id", "ts_us", "event_id", "v", bucketWidth = 3600000000L,
        bounds = graft.operators.TimeSeries.PerKeyBounds)
      .select(col("user_id"), col("bucket").as("hour"), col("n"), col("v_ff"))

  /** Exact global quantiles of the event value (e2 fixed point) at
    * p25/p50/p90/p99 — the histogram + distributed-prefix-sum order
    * statistic (operators.Quantiles): corpus streams once into a
    * distinct-value-sized aggregate; no global sort, no single-task
    * window, no value buffering. */
  def q17Quantiles(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.orderStats(
        load(spark, dir, "events").select(fx(col("value"), 2).cast("long").as("v_e2")),
        "v_e2", Seq(2500L, 5000L, 9000L, 9900L))
      .withColumnRenamed("value", "value_e2")

  /** Exact per-source median document length — the grouped order
    * statistic: one histogram aggregate, a per-group window over
    * histogram rows (parallel across groups, task work bounded by a
    * group's distinct values, not its row count). */
  def q18GroupedMedian(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Quantiles.groupedOrderStat(
        load(spark, dir, "documents").select(col("source"), col("n_chars")),
        "source", "n_chars", 5000L)
      .withColumnRenamed("value", "median_chars")

  /** Greedy-earliest funnel over the event stream: how many users reach
    * each stage of click → view → purchase, where stage i+1 must occur
    * STRICTLY after the user's earliest completion of stage i (the
    * standard deterministic funnel definition — earliest-path, so the
    * result is unique and oracle-checkable).
    *
    * Scale shape: one min-aggregate per stage, each keyed by user_id —
    * the stage tables are user-sized, not event-sized, and every join is
    * user-keyed on already-aggregated sides; the event scan streams once
    * per stage through a pushed event_type filter. No windows, no
    * per-user buffering. */
  def q19Funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("tus"))
    def stage(tpe: String, prev: Option[DataFrame]): DataFrame = {
      val base = ev.filter(col("event_type") === tpe)
      val gated = prev match {
        case Some(p) => base.join(p, Seq("user_id"))
          .filter(col("tus") > col("t")).drop("t")
        case None => base
      }
      gated.groupBy(col("user_id")).agg(min(col("tus")).as("t"))
    }
    // r17: s1/s2 are PERSISTED (user-sized min-aggregates, the
    // production checkpoint a staged funnel writes): each feeds both the
    // next stage's gate and its own count row, and uncached the lazy
    // union re-planned the whole upstream chain per reference — the
    // event table was scanned 6x (click 3x, view 2x, purchase 1x)
    // instead of once per stage. Counts and gating are unchanged.
    val s1 = stage("click", None).persist()
    val s2 = stage("view", Some(s1)).persist()
    val s3 = stage("purchase", Some(s2))
    // retention until the NEXT invocation re-tracks is intended (the
    // repo-wide OpCaches convention): the returned union is lazy, so the
    // caches must outlive this call; the user-sized tables are the
    // session's standing funnel checkpoint, re-read by warm re-runs
    graft.llm.OpCaches.track("analytics.q19funnel", Seq(s1, s2))
    Seq(("1_click", s1), ("2_view", s2), ("3_purchase", s3))
      .map { case (name, df) => df.agg(count(lit(1)).as("n"))
        .select(lit(name).as("stage"), col("n").as("n_users")) }
      .reduce(_ unionAll _)
  }

  /** Hourly cohort retention: users grouped by their FIRST-ever active
    * hour (the cohort), counted at each later hour they return —
    * (cohort_hour, offset_hours, n_users). Two aggregates and one
    * user-keyed join of user-sized tables; the distinct-(user, hour)
    * activity set is the only corpus-scale aggregate and it map-side
    * combines. */
  def q20Retention(spark: SparkSession, dir: String): DataFrame = {
    val act = load(spark, dir, "events")
      .select(col("user_id"), expr("ts div 3600000000000").as("h"))
      .distinct()
    val cohort = act.groupBy(col("user_id")).agg(min(col("h")).as("h0"))
    // act is distinct on (user, h) and h ≡ cohort + offset within a group,
    // so each user contributes at most one row per group: a plain count
    // equals countDistinct(user_id) without the two-phase distinct expand
    act.join(cohort, Seq("user_id"))
      .groupBy(col("h0").as("cohort_hour"), (col("h") - col("h0")).as("offset_hours"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Trailing-window spike detection over the hourly event-type series:
    * an hour is a spike when its count exceeds the trailing-6-bucket mean
    * by more than 3 standard deviations — evaluated in EXACT integer
    * arithmetic by multiplying the test through: with s1 = Σnᵢ,
    * s2 = Σnᵢ², W = trailing-bucket count, flag iff
    * W·n > s1  AND  (W·n − s1)² > 9·(W·s2 − s1²)  (see [[spikesFrom]] for
    * the derivation and int64 envelope). No division, no doubles, no
    * engine-dependent rounding — the oracle states the same inequality.
    * Requires a full trailing window (W = 6) so early hours never flag
    * off tiny samples.
    *
    * Scale: the only corpus pass is the hourly aggregate; the window runs
    * over the (buckets × types) series — corpus-size-independent, the
    * q16_rolling argument. */
  def q21Spikes(spark: SparkSession, dir: String): DataFrame =
    spikesFrom(load(spark, dir, "events")
      .withColumn("hour_bucket", expr("ts div 3600000000000"))
      .groupBy(col("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n")))

  /** Exponentially-weighted moving average of the hourly event rate per
    * type, in EXACT integer arithmetic: with α = 1/8 and the rate scaled
    * e6, `s_1 = n_1·10^6` and `s_t = s_{t-1} + (n_t·10^6 − s_{t-1}) div 8`
    * — a pinned rational recurrence both engines replay bit-identically
    * (a float EWMA would accumulate engine-dependent rounding).
    *
    * An EWMA is a genuine RECURRENCE, not a frame aggregate — no
    * `rowsBetween` window computes it. Scale shape: the only corpus
    * pass is the hourly count; the recurrence then runs INSIDE one
    * higher-order fold over each type's sorted series (buckets × types
    * rows — aggregate-sized, corpus-size-independent), one exchange
    * total. The DuckDB twin replays the same recurrence as a recursive
    * CTE stepping rn → rn + 1. Output: (event_type, hour_bucket, n,
    * ewma_e6). */
  def q22Ewma(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("hour_bucket", expr("ts div 3600000000000"))
      .groupBy(col("event_type"), col("hour_bucket"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("hour_bucket"), col("n"))))
        .as("h"))
      .select(col("event_type"), explode(expr(
        """aggregate(h,
             cast(array() as array<struct<hour_bucket: bigint, n: bigint,
                                          ewma_e6: bigint>>),
             (acc, x) -> array_append(acc, named_struct(
               'hour_bucket', x.hour_bucket, 'n', x.n,
               'ewma_e6', if(size(acc) = 0, x.n * 1000000,
                 element_at(acc, -1).ewma_e6 +
                   (x.n * 1000000 - element_at(acc, -1).ewma_e6) div 8))))"""))
        .as("x"))
      .select(col("event_type"), col("x.hour_bucket").as("hour_bucket"),
        col("x.n").as("n"), col("x.ewma_e6").as("ewma_e6"))

  /** First-order user-journey transition matrix (Markov chain estimate):
    * each user's event stream, ordered by (ts, event_id) — event_id
    * breaks timestamp ties deterministically — yields adjacent
    * `from_type → to_type` steps; the output is the global transition
    * count matrix with row-normalized probabilities in e4 (truncating
    * integer div, engine-neutral). The funnel/retention entries measure
    * WHERE users end up; this measures HOW they move — the standard
    * next-event model behind journey analysis and anomaly baselines.
    *
    * Plan shape: ONE shuffle on user_id for the lead() window (the same
    * exchange sessionization pays — at 100 TB both would share a
    * user-bucketed layout); the per-(from,to) aggregate partial-combines
    * map-side to ≤ types² rows per partition, and the row-total window
    * runs over the aggregated types²-sized matrix — corpus-size-
    * independent. Skew: one hyperactive user serializes only its own
    * partition's window walk, never the aggregate. */
  def q23Transitions(spark: SparkSession, dir: String): DataFrame =
    transitionsFrom(load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))

  /** [[q23Transitions]]' core over a (user_id, ts, event_id, event_type)
    * frame — factored so the tie-break contract (event_id orders equal
    * timestamps) is unit-testable on adversarial inputs. */
  private[graft] def transitionsFrom(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    steps
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy("from_type")))
      .withColumn("p_e4", expr("n * 10000 div n_from"))
      .select("from_type", "to_type", "n", "n_from", "p_e4")
  }

  /** [[q21Spikes]]' core over an (event_type, hour_bucket, n) series —
    * factored so the sigma algebra is unit-testable. Derivation: with
    * population variance σ² = (W·s2 − s1²)/W², the test n > s1/W + 3σ
    * multiplied through by W is (W·n − s1) > 3·√(W·s2 − s1²), squared:
    * (W·n − s1)² > 9·(W·s2 − s1²). Int64-exact for per-bucket counts up
    * to ~1.6e8 (324·M² ≤ 2^63); the assert_true guard fails loudly past
    * that envelope (DuckDB errors on BIGINT overflow natively) — beyond
    * it, bucket finer or rescale. */
  private[graft] def spikesFrom(hourly: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_bucket"))
      .rowsBetween(-6, -1)
    hourly
      .withColumn("_g", assert_true(col("n") < lit(160000000L),
        lit("q21_spikes int64 envelope exceeded: per-bucket count >= 1.6e8")))
      .filter(col("_g").isNull)
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .withColumn("cnt", count(col("n")).over(w))
      .filter(col("cnt") === 6)
      .withColumn("dev", col("cnt") * col("n") - col("s1"))
      .filter(col("dev") > 0 &&
        col("dev") * col("dev") >
          lit(9L) * (col("cnt") * col("s2") - col("s1") * col("s1")))
      .select(col("event_type"), col("hour_bucket"), col("n"), col("s1"), col("s2"))
  }

  /** Sequence-length cap for [[q24UserSequences]]. */
  val SeqMaxLen = 50

  /** Behavioral-sequence dataset construction: one row per user with
    * the (ts, event_id)-ordered event-type sequence CAPPED at
    * [[SeqMaxLen]] events — the training-example builder for
    * sequential/recommendation models. Output `(user_id, n_events,
    * seq_len, seq_hash)` with the hash over the comma-joined capped
    * sequence, so any reordering, truncation-point or tie-break drift
    * breaks the gate.
    *
    * Scale shape: ONE user-keyed exchange + sort (the q23/sessionize
    * shape, shareable with a user-bucketed layout); the rank filter
    * bounds what the collect ever buffers to [[SeqMaxLen]] rows per
    * user BEFORE aggregation — a chatty user costs 50 collected
    * elements, not their history (the skew bound a naive
    * collect_list-then-slice lacks); counts ride the same window. */
  def q24UserSequences(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    // event_type rides as the TERTIARY sort key on both the rank window
    // and the collected struct (and in the oracle's windows/string_agg)
    // so a (ts, event_id) tie cannot make the rn<=cap cut or the joined
    // sequence engine-dependent — the full triple is a total order over
    // identical rows, so any residual tie is value-identical.
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"), col("event_type"))
    e.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("user_id")))
      .where(col("rn") <= SeqMaxLen)
      .groupBy(col("user_id"))
      .agg(first(col("n")).cast("long").as("n_events"),
        count(lit(1)).cast("long").as("seq_len"),
        md5(array_join(transform(
          sort_array(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type")), ",").cast("binary")).as("seq_hash"))
      .select(col("user_id").cast("long").as("user_id"), col("n_events"),
        col("seq_len"), col("seq_hash"))
  }

  /** Exact 10%-trimmed mean of the e2-integerized event value per type —
    * the robust-statistics twin of the plain mean (outliers at either
    * end cannot move it), resolved EXACTLY through the value histogram:
    * per type, drop the lowest and highest `n div 10` ranks and average
    * the rest. Per-value kept-count = overlap of the value's rank span
    * `(cle-c, cle]` with the kept band `[lo+1, n-lo]` — pure integer,
    * no per-row sorting of raw events.
    *
    * Scale shape: ONE map-side-combined (type, value) histogram
    * aggregate; the rank windows run over the histogram (distinct
    * values per type), not the event stream — the [[q17Quantiles]]
    * order-statistics discipline applied to a trimmed sum. */
  def q25TrimmedMean(spark: SparkSession, dir: String): DataFrame =
    trimmedMeanFrom(load(spark, dir, "events")
      .select(col("event_type"), fx(col("value"), 2).cast("long").as("v")))

  /** [[q25TrimmedMean]]'s core over a pre-integerized (event_type, v)
    * frame — factored so the fuzz suite exercises the PRODUCTION
    * algebra, not a copy. Null values are excluded (the
    * [[graft.operators.Quantiles]] discipline — Spark and DuckDB sort
    * nulls to opposite window ends, so an unguarded null shifts every
    * rank on exactly one side). */
  private[graft] def trimmedMeanFrom(ev: DataFrame): DataFrame = {
    val e = ev.filter(col("v").isNotNull)
    val hist = e.groupBy(col("event_type"), col("v")).agg(count(lit(1)).as("c"))
    val byType = Window.partitionBy("event_type")
    val cum = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("n", sum(col("c")).over(byType))
      .withColumn("cle", sum(col("c")).over(cum))
      .withColumn("take",
        expr("greatest(0L, least(cle, n - n div 10) - greatest(cle - c, n div 10))"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        sum(col("take")).as("n_kept"),
        sum(expr("v * take")).as("kept_sum_e2"))
      .withColumn("trimmed_mean_e2", expr("kept_sum_e2 div n_kept"))
      .select("event_type", "n", "n_kept", "kept_sum_e2", "trimmed_mean_e2")
  }

  /** Median absolute deviation of the e2 event value per type — the
    * robust scale estimator (σ ≈ 1.4826·MAD under normality), built by
    * COMPOSING the exact grouped order statistic twice: median pass →
    * types-sized median table broadcast back → deviation pass → median
    * of |v − med|. Two corpus scans, histogram-sized state each, the
    * corpus never sorted. Output `(event_type, n, med_e2, mad_e2)`. */
  def q26Mad(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Quantiles
    val e = load(spark, dir, "events")
      .select(col("event_type"), fx(col("value"), 2).cast("long").as("v"))
      // explicit null exclusion BEFORE both passes so the oracle's n/k
      // cannot drift (groupedOrderStat drops nulls internally, but the
      // deviation join would otherwise carry null rows into n on the
      // oracle side)
      .filter(col("v").isNotNull)
    val med = Quantiles.groupedOrderStat(e, "event_type", "v", 5000L)
      .select(col("event_type"), col("value").as("med_e2"))
    val dev = e.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("v") - col("med_e2")).as("d"))
    Quantiles.groupedOrderStat(dev, "event_type", "d", 5000L)
      .join(broadcast(med), "event_type")
      .select(col("event_type"), col("n"), col("med_e2"),
        col("value").as("mad_e2"))
  }

  /** Pearson correlation between the e2 event value and the integer `k`
    * property, per event type — `(event_type, n, corr_e4)`. The moment
    * sums are EXACT int64 (null-excluded on both sides) and the n·Σ / Σ·Σ
    * cross terms are EXACT Decimal(38,0) — provably in range under the
    * envelope, see [[correlationFrom]]'s guard — so num/d1/d2 carry no
    * rounding at all; the final ratio uses only IEEE-correctly-rounded
    * ops in a pinned evaluation order (integer→double conversion, one
    * multiply, sqrt, one divide — deterministic across engines, unlike
    * libm transcendentals), so the e4 result is bit-identical (the
    * oracle computes the same cross terms in int128). Zero-variance
    * groups yield null. Envelope: the per-row products and the int64
    * moment sums are asserted loudly inside the 2^62 bound derived from
    * max|x| and max|y|, so value magnitudes past what int64 sums hold
    * trip instead of wrapping; everything wider already lives in the
    * decimal cross terms.
    *
    * Scale shape: one map-side-combined six-sum aggregate per type —
    * the corpus never shuffles rows, only partial sums. */
  def q27Correlation(spark: SparkSession, dir: String): DataFrame =
    correlationFrom(load(spark, dir, "events")
      .select(col("event_type"),
        fx(col("value"), 2).cast("long").as("x"),
        regexp_extract(col("props"), "[0-9]+", 0).cast("long").as("y")))

  /** [[q27Correlation]]'s moment core over a pre-projected
    * (event_type, x, y) frame — factored so specs exercise the
    * PRODUCTION algebra (the trimmedMeanFrom discipline). */
  private[graft] def correlationFrom(ev: DataFrame): DataFrame = {
    val e = ev.filter(col("x").isNotNull && col("y").isNotNull)
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"),
        max(abs(col("x"))).as("mx"), max(abs(col("y"))).as("my"))
      // the q21 guard pattern: the assert rides a FILTERED column so
      // projection pruning cannot elide it. The envelope is checked on
      // the MOMENT MAGNITUDES, not just n — the per-row products and the
      // int64 moment SUMS are bounded so nothing can wrap silently in
      // non-ANSI Spark:
      //   (a) mx,my ≤ ⌊√(2^63)⌋         — per-row x², y², x·y fit;
      //   (b) n·max(mx²,my²,mx·my)≤2^62 — no moment SUM can wrap (each
      //       |Σ| ≤ n·mx·my); sound even if (b)'s own products wrap,
      //       because that requires (a) to already fail the AND.
      // The cross terms n·Σ and Σ·Σ need NO further bound: they are
      // computed below in Decimal(38,0), and (a)∧(b) already prove them
      // in range — |Σ| ≤ n·max ≤ 2^62 and n ≤ 2^62 give |n·Σ| and
      // |Σx·Σy| ≤ n·(n·max) ≤ 2^124 ≈ 2.1e37, so each product and the
      // final difference (≤ 4.3e37) sit inside Decimal(38)'s 10^38−1
      // exactly — no overflow, no precision loss, never null. (The old
      // all-int64 envelope also demanded n·Σ ≤ 2^62 and |Σ| ≤ 2^31−1,
      // which aborted legitimate large groups — e.g. 1e6 rows of e2
      // values ~1e4 — that the widened type computes exactly for free.)
      .withColumn("_g", assert_true(
        expr("mx <= 3037000499L AND my <= 3037000499L") &&
          expr(s"n <= ${Long.MaxValue / 2}L div greatest(mx*mx, my*my, mx*my, 1L)"),
        lit("q27_correlation int64 moment envelope exceeded: " +
          "value magnitudes break the 2^62 product bound for this n")))
      .filter(col("_g").isNull)
      .withColumn("num",
        expr("cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy"))
      .withColumn("d1",
        expr("cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx"))
      .withColumn("d2",
        expr("cast(n as decimal(38,0)) * syy - cast(sy as decimal(38,0)) * sy"))
      .withColumn("corr_e4",
        when(col("d1") > 0 && col("d2") > 0,
          floor(col("num").cast("double") * lit(10000.0) /
            sqrt(col("d1").cast("double") * col("d2").cast("double")) + lit(0.5))
            .cast("long"))
          .otherwise(lit(null).cast("long")))
      .select(col("event_type"), col("n"), col("corr_e4"))
  }

  /** Equi-width histogram buckets for [[q28Histogram]]. */
  val HistBuckets = 20L

  /** Per-type equi-width histogram of the e2 event value — the
    * profiling/exploration operator: [[HistBuckets]] buckets spanning
    * the type's own [min, max], `(event_type, bucket, lo_e2, hi_e2,
    * n_rows)`, empty buckets densified to zero (a histogram with holes
    * misleads). All integer: width = (span + B - 1) div B (ceil, so
    * B·width covers the span and max lands in the last bucket), bucket
    * = (v - min) div width. Single-valued types collapse to one
    * full-count bucket (width floors at 1).
    *
    * Scale shape: one map-combined (type, min, max) aggregate broadcast
    * back, one map-combined (type, bucket) count, and a types×B spine
    * densify — the corpus never shuffles rows, only partial sums. */
  def q28Histogram(spark: SparkSession, dir: String): DataFrame =
    histogramFrom(load(spark, dir, "events")
      .select(col("event_type"), fx(col("value"), 2).cast("long").as("v")))

  /** [[q28Histogram]]'s core over a pre-integerized (event_type, v)
    * frame — factored so specs exercise the PRODUCTION bucketing. */
  private[graft] def histogramFrom(ev: DataFrame): DataFrame = {
    val e = ev.filter(col("v").isNotNull)
    val b = HistBuckets
    // r17: bounds PERSISTED — it feeds both the bucket counts (broadcast
    // join) and the spine, and uncached each reference re-planned the
    // corpus-wide min/max aggregate (3 corpus scans; the types-sized
    // table costs nothing to hold)
    val bounds = e.groupBy(col("event_type"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .withColumn("width",
        expr(s"greatest(1L, (mx - mn + $b - 1) div $b)"))
      .persist()
    // session-lifetime retention (until re-tracked) intended — see the
    // q19funnel note; bounds is types-sized, a few rows
    graft.llm.OpCaches.track("analytics.q28bounds", Seq(bounds))
    // clamp: when the span divides B exactly, mx would index bucket B —
    // the boundary value belongs to the LAST bucket, not off the end
    val counts = e.join(broadcast(bounds), "event_type")
      .groupBy(col("event_type"),
        expr(s"least((v - mn) div width, ${b - 1})").as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
    val spine = bounds.select(col("event_type"), col("mn"), col("width"),
      explode(sequence(lit(0L), lit(b - 1))).as("bucket"))
    spine.join(counts, Seq("event_type", "bucket"), "left_outer")
      .select(col("event_type"), col("bucket"),
        expr("mn + bucket * width").as("lo_e2"),
        expr("mn + (bucket + 1) * width - 1").as("hi_e2"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }

  /** Oracle SQL (DuckDB) twins — column names must match exactly. */
  val oracles: Map[String, String] = Map(
    "q28_histogram" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE value IS NOT NULL),
         |bd AS (SELECT event_type, min(v) AS mn, max(v) AS mx FROM e GROUP BY 1),
         |w AS (SELECT event_type, mn,
         |        greatest(1, (mx - mn + $HistBuckets - 1) // $HistBuckets)
         |          AS width
         |      FROM bd),
         |c AS (SELECT e.event_type,
         |        least((v - mn) // width, $HistBuckets - 1) AS bucket,
         |        count(*)::BIGINT AS n_rows
         |      FROM e JOIN w USING (event_type) GROUP BY 1, 2),
         |sp AS (SELECT event_type, mn, width, unnest(range(0, $HistBuckets))
         |         AS bucket
         |       FROM w)
         |SELECT sp.event_type, sp.bucket::BIGINT AS bucket,
         |  (mn + sp.bucket * width)::BIGINT AS lo_e2,
         |  (mn + (sp.bucket + 1) * width - 1)::BIGINT AS hi_e2,
         |  coalesce(n_rows, 0)::BIGINT AS n_rows
         |FROM sp LEFT JOIN c ON c.event_type = sp.event_type
         |  AND c.bucket = sp.bucket""".stripMargin,
    "q27_correlation" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
        |    TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS y
        |  FROM events
        |  WHERE value IS NOT NULL
        |    AND TRY_CAST(regexp_extract(props, '[0-9]+') AS BIGINT) IS NOT NULL),
        |m AS (
        |  SELECT event_type, count(*)::BIGINT AS n,
        |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |    sum(x * y)::BIGINT AS sxy,
        |    sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
        |  FROM e GROUP BY 1),
        |d AS (
        |  SELECT event_type, n,
        |    (n::HUGEINT * sxy - sx::HUGEINT * sy) AS num,
        |    (n::HUGEINT * sxx - sx::HUGEINT * sx) AS d1,
        |    (n::HUGEINT * syy - sy::HUGEINT * sy) AS d2
        |  FROM m)
        |SELECT event_type, n,
        |  CASE WHEN d1 > 0 AND d2 > 0
        |       THEN floor(num::DOUBLE * 10000.0
        |                  / sqrt(d1::DOUBLE * d2::DOUBLE) + 0.5)::BIGINT
        |       ELSE NULL END AS corr_e4
        |FROM d""".stripMargin,
    "q26_mad" -> {
      val k = graft.operators.Quantiles.kSql("5000", "n")
      s"""WITH e AS (
         |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
         |  FROM events WHERE value IS NOT NULL),
         |h1 AS (SELECT event_type, v, count(*) AS c FROM e GROUP BY 1, 2),
         |c1 AS (SELECT event_type, v, c,
         |         sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cle,
         |         sum(c) OVER (PARTITION BY event_type) AS n FROM h1),
         |med AS (SELECT event_type, v AS med_e2 FROM c1
         |        WHERE cle - c < $k AND $k <= cle),
         |d AS (SELECT e.event_type, abs(v - med_e2) AS dv
         |      FROM e JOIN med USING (event_type)),
         |h2 AS (SELECT event_type, dv, count(*) AS c FROM d GROUP BY 1, 2),
         |c2 AS (SELECT event_type, dv, c,
         |         sum(c) OVER (PARTITION BY event_type ORDER BY dv) AS cle,
         |         sum(c) OVER (PARTITION BY event_type) AS n FROM h2)
         |SELECT c2.event_type, n::BIGINT AS n, med_e2, dv AS mad_e2
         |FROM c2 JOIN med ON med.event_type = c2.event_type
         |WHERE cle - c < $k AND $k <= cle""".stripMargin
    },
    "q25_trimmed_mean" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, v, count(*)::BIGINT AS c FROM e GROUP BY 1, 2),
        |t AS (SELECT event_type, v, c,
        |        (sum(c) OVER (PARTITION BY event_type))::BIGINT AS n,
        |        (sum(c) OVER (PARTITION BY event_type ORDER BY v))::BIGINT AS cle
        |      FROM h),
        |k AS (SELECT event_type, n, v, c,
        |        greatest(0, least(cle, n - n // 10)
        |                    - greatest(cle - c, n // 10)) AS take
        |      FROM t)
        |SELECT event_type, n, sum(take)::BIGINT AS n_kept,
        |  sum(v * take)::BIGINT AS kept_sum_e2,
        |  (sum(v * take) // sum(take))::BIGINT AS trimmed_mean_e2
        |FROM k GROUP BY 1, 2""".stripMargin,
    "q24_user_sequences" ->
      s"""WITH r AS (
         |  SELECT user_id, event_type,
         |    row_number() OVER w AS rn, count(*) OVER (PARTITION BY user_id) AS n,
         |    epoch_ns(ts) AS tns, event_id
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id
         |               ORDER BY epoch_ns(ts), event_id, event_type))
         |SELECT user_id::BIGINT AS user_id, n::BIGINT AS n_events,
         |  count(*)::BIGINT AS seq_len,
         |  md5(string_agg(event_type, ',' ORDER BY tns, event_id, event_type))
         |    AS seq_hash
         |FROM r WHERE rn <= $SeqMaxLen
         |GROUP BY user_id, n""".stripMargin,
    "q23_transitions" ->
      """WITH s AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY epoch_ns(ts), event_id) AS to_type
        |  FROM events),
        |m AS (SELECT from_type, to_type, count(*)::BIGINT AS n
        |      FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  (sum(n) OVER (PARTITION BY from_type))::BIGINT AS n_from,
        |  (n * 10000 // sum(n) OVER (PARTITION BY from_type))::BIGINT AS p_e4
        |FROM m""".stripMargin,
    "q21_spikes" ->
      """WITH hourly AS (
        |  SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, hour_bucket, n,
        |    sum(n) OVER w AS s1, sum(n*n) OVER w AS s2, count(n) OVER w AS cnt
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_bucket
        |               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour_bucket, n, s1::BIGINT AS s1, s2::BIGINT AS s2
        |FROM t
        |WHERE cnt = 6 AND cnt*n - s1 > 0
        |  AND (cnt*n - s1)*(cnt*n - s1) > 9*(cnt*s2 - s1*s1)""".stripMargin,
    "q19_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |s1 AS (SELECT user_id, min(tus) AS t FROM e
        |       WHERE event_type = 'click' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.tus) AS t FROM e
        |       JOIN s1 ON s1.user_id = e.user_id AND e.tus > s1.t
        |       WHERE event_type = 'view' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.tus) AS t FROM e
        |       JOIN s2 ON s2.user_id = e.user_id AND e.tus > s2.t
        |       WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT '1_click' AS stage, count(*)::BIGINT AS n_users FROM s1
        |UNION ALL
        |SELECT '2_view', count(*)::BIGINT FROM s2
        |UNION ALL
        |SELECT '3_purchase', count(*)::BIGINT FROM s3""".stripMargin,
    "q20_retention" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |               epoch_ns(ts) // 3600000000000 AS h FROM events),
        |cohort AS (SELECT user_id, min(h) AS h0 FROM act GROUP BY 1)
        |SELECT h0 AS cohort_hour, (h - h0)::BIGINT AS offset_hours,
        |  count(*)::BIGINT AS n_users
        |FROM act JOIN cohort USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "q17_quantiles" ->
      s"""WITH vals AS (SELECT CAST(floor(value*100 + 0.5) AS BIGINT) AS v
        |              FROM events WHERE value IS NOT NULL),
        |tot AS (SELECT count(*) AS n FROM vals),
        |hist AS (SELECT v, count(*) AS c FROM vals GROUP BY v),
        |cum AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cle FROM hist),
        |qs AS (SELECT unnest([2500, 5000, 9000, 9900]) AS q_e4)
        |SELECT q_e4::BIGINT AS q_e4, n::BIGINT AS n,
        |  ${graft.operators.Quantiles.kSql("q_e4", "n")}::BIGINT AS k, v AS value_e2
        |FROM cum, qs, tot
        |WHERE cle - c < ${graft.operators.Quantiles.kSql("q_e4", "n")}
        |  AND ${graft.operators.Quantiles.kSql("q_e4", "n")} <= cle""".stripMargin,
    "q18_grouped_median" ->
      s"""WITH hist AS (SELECT source, n_chars AS v, count(*) AS c
        |              FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |cum AS (SELECT source, v, c,
        |          sum(c) OVER (PARTITION BY source ORDER BY v) AS cle,
        |          sum(c) OVER (PARTITION BY source) AS n FROM hist)
        |SELECT source, n::BIGINT AS n,
        |  ${graft.operators.Quantiles.kSql("5000", "n")}::BIGINT AS k, v AS median_chars
        |FROM cum
        |WHERE cle - c < ${graft.operators.Quantiles.kSql("5000", "n")}
        |  AND ${graft.operators.Quantiles.kSql("5000", "n")} <= cle""".stripMargin,
    "q15_bucketed_join" -> graft.operators.Bucketing.oracle,
    "q14_gapfill" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |             CAST(floor(value*100 + 0.5) AS BIGINT) AS v,
        |             epoch_us(ts) // 3600000000 AS h FROM events),
        |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
        |grid AS (SELECT u.user_id, g.h
        |         FROM (SELECT DISTINCT user_id FROM e) u,
        |              (SELECT unnest(generate_series((SELECT h0 FROM b),
        |                                             (SELECT h1 FROM b))) AS h) g),
        |r AS (SELECT user_id, h, v, row_number() OVER (PARTITION BY user_id, h
        |        ORDER BY tus DESC, event_id DESC) AS rn FROM e),
        |cnt AS (SELECT user_id, h, count(*) AS n FROM e GROUP BY 1, 2),
        |act AS (SELECT cnt.user_id, cnt.h, cnt.n, r.v AS lastv
        |        FROM cnt JOIN r ON r.user_id = cnt.user_id AND r.h = cnt.h
        |          AND r.rn = 1),
        |j AS (SELECT grid.user_id, grid.h, coalesce(act.n, 0) AS n, act.lastv
        |      FROM grid LEFT JOIN act USING (user_id, h))
        |SELECT user_id, h AS hour, n,
        |  last_value(lastv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
        |FROM j""".stripMargin,
    "q14_gapfill_perkey" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |             CAST(floor(value*100 + 0.5) AS BIGINT) AS v,
        |             epoch_us(ts) // 3600000000 AS h FROM events),
        |kb AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM kb),
        |r AS (SELECT user_id, h, v, row_number() OVER (PARTITION BY user_id, h
        |        ORDER BY tus DESC, event_id DESC) AS rn FROM e),
        |cnt AS (SELECT user_id, h, count(*) AS n FROM e GROUP BY 1, 2),
        |act AS (SELECT cnt.user_id, cnt.h, cnt.n, r.v AS lastv
        |        FROM cnt JOIN r ON r.user_id = cnt.user_id AND r.h = cnt.h
        |          AND r.rn = 1),
        |j AS (SELECT grid.user_id, grid.h, coalesce(act.n, 0) AS n, act.lastv
        |      FROM grid LEFT JOIN act USING (user_id, h))
        |SELECT user_id, h AS hour, n,
        |  last_value(lastv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
        |FROM j""".stripMargin,
    "q13_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
        |  count(*) AS n,
        |  SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT))::BIGINT AS qty_e2
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q12_sketch" -> graft.operators.Sketches.oracle,
    "q10_asof" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_id
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.ts_us, c.click_id,
        |       p.ts_us - c.ts_us AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts_us >= c.ts_us""".stripMargin,
    "q11_interval" ->
      """WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS t0
        |           FROM events WHERE event_type = 'click'),
        |v AS (SELECT user_id, epoch_us(ts) AS tv
        |      FROM events WHERE event_type = 'view')
        |SELECT c.event_id, c.user_id, count(v.tv) AS n_views
        |FROM c LEFT JOIN v ON c.user_id = v.user_id
        |  AND v.tv >= c.t0 AND v.tv < c.t0 + 86400000000
        |GROUP BY 1, 2""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(floor(l_quantity*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_qty_e2,
        | CAST(SUM(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_base_e2,
        | CAST(SUM(CAST(floor((l_extendedprice*(1-l_discount))*10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
        | COUNT(*) AS count_order
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_topk" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        | CAST(SUM(CAST(floor((l_extendedprice*(1-l_discount))*10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1,2 ORDER BY revenue_e4 DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q3_join5" ->
      """SELECT n_name,
        | CAST(SUM(CAST(floor((l_extendedprice*(1-l_discount))*10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
        |GROUP BY 1 ORDER BY revenue_e4 DESC, n_name ASC""".stripMargin,
    "q4_semi" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_filter_agg" ->
      """SELECT
        | CAST(SUM(CAST(floor((l_extendedprice*l_discount)*10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
        | COUNT(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        | AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "q6_window" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber FROM (
        | SELECT l_suppkey, l_orderkey, l_linenumber,
        |  row_number() OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        | FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "q7_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        | COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_events_hourly" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
        | COUNT(*) AS n,
        | CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_e2
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q9_anti" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderpriority = '1-URGENT')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_ewma" ->
      """WITH RECURSIVE hourly AS (
        |  SELECT event_type, epoch_ns(ts) // 3600000000000 AS hour_bucket,
        |    COUNT(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |hr AS (
        |  SELECT event_type, hour_bucket, n,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY hour_bucket) AS rn
        |  FROM hourly),
        |e AS (
        |  SELECT event_type, hour_bucket, n, rn, n * 1000000 AS s
        |  FROM hr WHERE rn = 1
        |  UNION ALL
        |  SELECT h.event_type, h.hour_bucket, h.n, h.rn,
        |    e.s + (h.n * 1000000 - e.s) // 8
        |  FROM e JOIN hr h ON h.event_type = e.event_type
        |                  AND h.rn = e.rn + 1)
        |SELECT event_type, hour_bucket::BIGINT AS hour_bucket, n,
        |  s::BIGINT AS ewma_e6
        |FROM e""".stripMargin,
    "q16_rolling" ->
      """WITH hourly AS (
        |  SELECT epoch_ns(ts) // 3600000000000 AS hour_bucket, event_type,
        |    COUNT(*)::BIGINT AS n,
        |    CAST(SUM(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS v_e2
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, hour_bucket, n,
        |    sum(n) OVER w AS roll_n, sum(v_e2) OVER w AS roll_value_e2
        |  FROM hourly
        |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_bucket
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, hour_bucket, n, roll_n::BIGINT AS roll_n,
        |  roll_value_e2::BIGINT AS roll_value_e2,
        |  (roll_value_e2 // roll_n)::BIGINT AS roll_avg_e2
        |FROM r""".stripMargin
  )
}
