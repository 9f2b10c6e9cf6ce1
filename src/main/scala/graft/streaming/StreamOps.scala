package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over a graft-store stream (`spark.readStream
  * .format("graft-store")`): the Structured-Streaming layer of the engine —
  * event-time windows bounded by watermarks, and gap-based sessionization
  * as explicit keyed state. Both run equally on a batch DataFrame (Spark's
  * unified semantics), which is how the specs pin their results.
  *
  * Scale notes: `windowedCounts` is a streaming aggregation whose state is
  * one row per (window, part) — bounded by the watermark horizon, not the
  * stream length; the shuffle is on the same (window, part) key at any
  * cluster size. `sessionize` keys state by (part, field value); the
  * watermark evicts closed sessions, so state is proportional to ACTIVE
  * keys. Skewed keys (one chatty user) are a single state row, not a
  * partition hot-spot.
  */
object StreamOps {

  /** ts int64-ns → event-time timestamp (µs precision, what Spark's
    * window/watermark machinery operates on). Integral `div`, not `/`:
    * epoch-ns values exceed 2^53, so double division can land 1 µs off
    * the true floor — enough to flip an exact window/interval boundary. */
  def eventTime(tsNs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    timestamp_micros(call_function("div", tsNs, lit(1000L)))

  /** The ONE key projection every keyed operator uses: fields[keyField],
    * with a missing key mapping to "" (a real group, not a dropped row —
    * the reference treats absent fields as empty strings). Changing the
    * missing-key semantics here changes every operator AND must be
    * mirrored in each oracle. */
  private def keyOf(keyField: String): org.apache.spark.sql.Column =
    coalesce(element_at(col("fields"), keyField), lit(""))

  /** Tumbling or sliding event-time window counts per partition with a
    * watermark: in append mode a (window_start, part, records) row is
    * emitted exactly once, when the watermark passes the window end —
    * the standard live-rates query a log store feeds a dashboard from.
    * `slide` defaults to the window length (tumbling); a smaller slide
    * assigns each event to `window/slide` overlapping windows (state
    * stays one row per open (window, part), bounded by the watermark
    * horizon either way).
    */
  def windowedCounts(events: DataFrame, windowDur: String,
      watermarkDelay: String, slide: Option[String] = None): DataFrame =
    events
      .withColumn("event_time", eventTime(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .groupBy(
        window(col("event_time"), windowDur, slide.getOrElse(windowDur)).as("w"),
        col("part"))
      .agg(count(lit(1)).as("records"))
      .select(col("w.start").as("window_start"), col("part"), col("records"))

  /** Per-window approximate distinct count of `fields[keyField]` —
    * "how many distinct users per hour" as a STREAMING aggregate. Exact
    * streaming distinct would hold every key seen per open window in
    * state (corpus-keyed state, the thing watermarks exist to avoid);
    * HLL++ keeps per-window state at a fixed few KB regardless of key
    * cardinality and merges map-side like any partial aggregate, so the
    * stream never ships raw keys. In batch mode the same call computes
    * the same sketch over the same windows (unified semantics; the
    * `stream_window_distinct` entry gates the sketch against the exact
    * count per window, the streaming twin of the q12 sketch gate). */
  def windowDistinct(events: DataFrame, keyField: String, windowDur: String,
      watermarkDelay: String, rsd: Double = 0.02): DataFrame = {
    val base = events.withColumn("event_time", eventTime(col("ts")))
    val wm = if (events.isStreaming)
      base.withWatermark("event_time", watermarkDelay) else base
    wm
      .withColumn("k", keyOf(keyField))
      .groupBy(window(col("event_time"), windowDur).as("w"))
      .agg(approx_count_distinct(col("k"), rsd).as("approx"))
      .select(unix_micros(col("w.start")).as("window_start_us"), col("approx"))
  }

  /** Per-part baseline traffic profile for [[windowDrift]]: `(part, cb)`
    * counts over a reference corpus (the static profile a monitor is
    * configured with — in production a saved table, recomputed on a slow
    * cadence). Parts-domain-sized. */
  def driftBaseline(events: DataFrame): DataFrame =
    events.groupBy(col("part")).agg(count(lit(1)).as("cb"))

  /** Per-window traffic-mix drift: the PSI of each event-time window's
    * per-part event distribution against a STATIC baseline profile —
    * "did this hour's click/view/purchase mix drift from normal", the
    * streaming data-quality monitor an ingestion pipeline runs. Output
    * `(window_start_us, n, v, psi_sum, psi_ub20)` with n = window
    * events, v = parts observed in the window, and the PSI in the same
    * pure-integer form as [[graft.llm.Mining.drift]]: add-one-smoothed
    * e6 probabilities, signed Log2Fix log ratios in the SPLIT form
    * (every kernel argument a plain count — int64-safe at any scale),
    * psi_ub20 = psi_sum div 1e6 (micro-prob × log2-e20 scale).
    *
    * UNIFIED batch/stream. Streaming is the chained-stateful-agg shape
    * ([[windowTopKey]]/[[windowQuantile]]): stage 1 keeps watermarked
    * (window, part) counts — state is windows × parts, never events;
    * the static baseline broadcast-joins between the stages (parts
    * absent from the profile smooth as cb = 0, so NOVEL traffic kinds
    * raise the score rather than vanish); stage 2 re-windows on
    * `window_time` and folds the window's parts histogram (≤ |parts|
    * entries) inside one aggregate — each window's score emits exactly
    * once, when the watermark closes it. The fold is integer addition,
    * so collect order cannot matter. */
  def windowDrift(events: DataFrame, baseline: DataFrame, windowDur: String,
      watermarkDelay: String): DataFrame = {
    import graft.functions.VectorExpressions.slog2_fix
    val base = broadcast(
      baseline.select(col("part"), col("cb").cast("long").as("cb")))
    val btot = broadcast(
      base.agg(sum(col("cb")).as("nb"), count(lit(1)).as("vb")))
    val bse = events.withColumn("event_time", eventTime(col("ts")))
    val wm = if (events.isStreaming)
      bse.withWatermark("event_time", watermarkDelay) else bse
    val counts = wm
      .groupBy(window(col("event_time"), windowDur).as("w"), col("part"))
      .agg(count(lit(1)).as("c"))
    val joined = counts
      .join(base, Seq("part"), "left_outer")
      .withColumn("cb", coalesce(col("cb"), lit(0L)))
      .crossJoin(btot)
    val agg2 = joined
      .groupBy(window(window_time(col("w")), windowDur).as("w2"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("v"),
        first(col("nb")).as("nb"), first(col("vb")).as("vb"),
        collect_list(struct(col("c"), col("cb"))).as("h"))
    // per-part term: (pw - pb) · slog2(c+1, cb+1); the window-level
    // ratio slog2(nb+vb, n+v) multiplies the SUM of (pw - pb) — exact
    // distribution of the shared factor (integer ·/+ are exact), same
    // algebra the oracle replays
    def pOf(c: Column, tot: Column): Column =
      call_function("div", (c + lit(1L)) * lit(1000000L), tot)
    val dp: (Column, Column) => Column = (acc, x) =>
      acc + (pOf(x.getField("c"), col("n") + col("v")) -
        pOf(x.getField("cb"), col("nb") + col("vb")))
    val term1: (Column, Column) => Column = (acc, x) =>
      acc + (pOf(x.getField("c"), col("n") + col("v")) -
        pOf(x.getField("cb"), col("nb") + col("vb"))) *
        slog2_fix(x.getField("c") + lit(1L), x.getField("cb") + lit(1L))
    val psi = aggregate(col("h"), lit(0L), term1) +
      slog2_fix(col("nb") + col("vb"), col("n") + col("v")) *
        aggregate(col("h"), lit(0L), dp)
    agg2.select(unix_micros(col("w2.start")).as("window_start_us"),
      col("n"), col("v"), psi.as("psi_sum"),
      call_function("div", psi, lit(1000000L)).as("psi_ub20"))
  }

  /** Per-window top key: which `fields[keyField]` value dominated each
    * event-time window — the windowed heavy-hitter shape — computed as
    * TWO CHAINED AGGREGATIONS: windowed (window, key) counts feeding a
    * per-window argmax. In streaming append mode this exercises Spark
    * 4's multiple-stateful-operator support (the second aggregate
    * re-windows on `window_time` of the first's window column, the
    * documented chaining form); each window's winner emits exactly once,
    * when the watermark closes it. Ties break toward the LARGEST key
    * (max over (cnt, key) structs) — pinned, so the oracle can mirror it.
    *
    * Scale: stage 1 is the standard map-side-combined windowed count;
    * stage 2's input is (windows × keys) rows — aggregate-sized, not
    * corpus-sized. */
  /** Stage 1 shared by [[windowTopKey]] and [[windowTopK]]: watermarked
    * per-(window, key) counts — ONE definition of the
    * event-time/keyOf/window handling, so the two rankers cannot
    * diverge. (They keep separate stage-2 aggregators deliberately:
    * top-1's max-struct state is one struct per window, while top-K
    * must hold the count histogram.) */
  private def windowedKeyCounts(events: DataFrame, keyField: String,
      windowDur: String, watermarkDelay: String): DataFrame = {
    val base = events.withColumn("event_time", eventTime(col("ts")))
    val wm = if (events.isStreaming)
      base.withWatermark("event_time", watermarkDelay) else base
    wm.groupBy(window(col("event_time"), windowDur).as("w"),
        keyOf(keyField).as("key"))
      .agg(count(lit(1)).as("cnt"))
  }

  def windowTopKey(events: DataFrame, keyField: String, windowDur: String,
      watermarkDelay: String): DataFrame =
    windowedKeyCounts(events, keyField, windowDur, watermarkDelay)
      .groupBy(window(window_time(col("w")), windowDur).as("w2"))
      .agg(max(struct(col("cnt"), col("key"))).as("top"))
      .select(unix_micros(col("w2.start")).as("window_start_us"),
        col("top.key").as("key"), col("top.cnt").as("cnt"))

  /** Per-window top-K keys — [[windowTopKey]] generalized to a ranked
    * leaderboard: the K most frequent `fields[keyField]` values per
    * event-time window, `(window_start_us, rank, key, cnt)`, ties
    * toward the LARGER key (the windowTopKey convention, pinned for the
    * oracle). Same chained-stateful-agg shape: stage 1's windowed
    * (window, key) counts re-window on `window_time` into one aggregate
    * holding the window's count histogram (state = windows × keys, the
    * same bound stage 1 already carries), and the post-aggregate
    * slice/explode is stateless — append emits each window's K rows
    * exactly once when the watermark closes it. */
  def windowTopK(events: DataFrame, keyField: String, windowDur: String,
      watermarkDelay: String, k: Int = 3): DataFrame = {
    windowedKeyCounts(events, keyField, windowDur, watermarkDelay)
      .groupBy(window(window_time(col("w")), windowDur).as("w2"))
      .agg(sort_array(collect_list(struct(col("cnt"), col("key"))),
        asc = false).as("h"))
      .select(unix_micros(col("w2.start")).as("window_start_us"),
        posexplode(slice(col("h"), 1, k)))
      .select(col("window_start_us"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("key"), col("col.cnt").as("cnt"))
  }

  /** Per-window exact q-quantile of an integer field — the "windowed p99
    * latency" dashboard query — under the SAME rank contract as
    * [[graft.operators.Quantiles]]: k = max(1, ceil(q·n)) in integer
    * arithmetic (q in e4 fixed point), value = the window's k-th smallest.
    *
    * Two chained stateful aggregations (the [[windowTopKey]] pattern):
    * stage 1 builds the per-(window, value) HISTOGRAM — map-side-combined,
    * so streaming state is windows × distinct values, never event rows;
    * stage 2 re-windows on `window_time` and resolves the rank by folding
    * the window's sorted histogram inside one aggregate. Per-window state
    * and work are bounded by the value DOMAIN — this is the
    * integer-metric shape (latencies, sizes, scores), not an
    * unbounded-cardinality operator. Append mode emits each window's
    * quantile exactly once, when the watermark closes it; events with a
    * missing/non-numeric field group under null and are excluded. */
  def windowQuantile(events: DataFrame, valField: String, windowDur: String,
      watermarkDelay: String, qE4: Long): DataFrame = {
    val base = events.withColumn("event_time", eventTime(col("ts")))
    val wm = if (events.isStreaming)
      base.withWatermark("event_time", watermarkDelay) else base
    val hist = wm
      .withColumn("v", keyOf(valField).cast("long"))
      .filter(col("v").isNotNull)
      .groupBy(window(col("event_time"), windowDur).as("w"), col("v"))
      .agg(count(lit(1)).as("c"))
    hist
      .groupBy(window(window_time(col("w")), windowDur).as("w2"))
      .agg(sum(col("c")).as("n"),
        sort_array(collect_list(struct(col("v"), col("c")))).as("h"))
      .withColumn("k", graft.operators.Quantiles.kCol(qE4, "n"))
      .select(unix_micros(col("w2.start")).as("window_start_us"),
        col("n"), col("k"),
        expr("""aggregate(h,
            named_struct('acc', cast(0 as bigint), 'res', cast(null as bigint)),
            (s, x) -> named_struct(
              'acc', s.acc + x.c,
              'res', if(s.res is null and s.acc + x.c >= k, x.v, s.res)),
            s -> s.res)""").as("value"))
  }

  /** One closed session: a maximal run of events for (part, key) with no
    * gap larger than the configured idle timeout. */
  final case class Session(part: String, key: String, startTs: Long,
      endTs: Long, events: Long)

  /** Keyed state: the key's open sessions as (startTs, endTs, events)
    * triples, sorted by startTs and pairwise separated by more than the
    * gap. A session stays buffered here — even when a later in-batch burst
    * has already "closed" it in event order — until the WATERMARK passes
    * its end + gap, so an out-of-order event above the watermark can still
    * extend it (or bridge two buffered sessions into one). */
  private[streaming] final case class SessionState(sessions: List[(Long, Long, Long)])

  /** Gap-based sessionization keyed by (part, fields[keyField]), with
    * UNIFIED batch/stream semantics: the same call yields the same
    * sessions whether `events` is a stream or a batch DataFrame.
    *
    * Streaming: flatMapGroupsWithState with an event-time timeout — a
    * session is emitted exactly once, when the watermark passes its last
    * event plus the gap, never earlier, so cross-batch out-of-order
    * events (above the watermark) land in the right session, including
    * ones BEFORE a buffered session's start (min-merged). Events at or
    * below the watermark (late beyond the delay) are dropped by the
    * watermark, so state never resurrects a closed session.
    *
    * Batch: the relational form — a window-function break/cumsum per
    * (part, key) ordered by ts, then one aggregation per session. The
    * groupBy reuses the window's (part, key) hash partitioning (a
    * superset-key clustering), so the whole operator is ONE shuffle plus
    * the per-key sort; state never materializes.
    *
    * The reference has no session concept; this is the "custom keyed
    * state" seam a training-data/observability pipeline needs (user
    * activity spans, crawl visits, transcript turns).
    */
  def sessionize(events: DataFrame, keyField: String, gapSeconds: Long,
      watermarkDelay: String): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapNs = gapSeconds * 1000000000L
    val gapMs = gapSeconds * 1000L

    if (!events.isStreaming) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("part"), col("key")).orderBy(col("ts"))
      val brk = when(col("ts") - lag(col("ts"), 1).over(w) > gapNs, 1L)
        .otherwise(0L)
      return events
        .select(col("part"), keyOf(keyField).as("key"), col("ts"))
        // default RANGE frame: ts-tied peers share one cumsum value, so
        // equal-ts events land in the same session no matter the tie order
        .withColumn("sid", sum(brk).over(w))
        .groupBy(col("part"), col("key"), col("sid"))
        .agg(min("ts").as("startTs"), max("ts").as("endTs"),
          count(lit(1)).as("events"))
        .select(col("part"), col("key"), col("startTs"), col("endTs"),
          col("events"))
        .as[Session]
    }

    // sorted singletons+state → disjoint sessions (> gap apart)
    def merge(sorted: List[(Long, Long, Long)]): List[(Long, Long, Long)] =
      sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((s0, e0, n0) :: rest, (s1, e1, n1)) if s1 - e0 <= gapNs =>
          (s0, math.max(e0, e1), n0 + n1) :: rest
        case (acc, s) => s :: acc
      }.reverse

    def onGroup(key: (String, String),
        rows: Iterator[(String, String, Long, java.sql.Timestamp)],
        state: GroupState[SessionState]): Iterator[Session] = {
      val wmMs = state.getCurrentWatermarkMs()
      def closeAtMs(s: (Long, Long, Long)): Long = s._2 / 1000000L + gapMs
      val prior = state.getOption.map(_.sessions).getOrElse(Nil)
      val sessions =
        if (state.hasTimedOut) prior
        else merge((prior ++ rows.map(r => (r._3, r._3, 1L))).sortBy(_._1))
      // disjointness (> gap apart) means no future event above the
      // watermark can reach a session whose end+gap the watermark passed
      val (closed, open) = sessions.partition(closeAtMs(_) <= wmMs)
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionState(open))
        state.setTimeoutTimestamp(math.max(open.map(closeAtMs).min, wmMs + 1L))
      }
      closed.iterator.map { case (st, en, n) => Session(key._1, key._2, st, en, n) }
    }

    events
      .withColumn("event_time", eventTime(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .select(col("part"), keyOf(keyField).as("key"), col("ts"),
        col("event_time"))
      .as[(String, String, Long, java.sql.Timestamp)]
      .groupByKey { case (part, key, _, _) => (part, key) }
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(onGroup _)
  }

  /** The first event per (part, fields[keyField]) in the (ts, seq) total
    * order — exactly-once streaming dedup with a single output row per
    * key, ever. */
  final case class First(part: String, key: String, firstTs: Long,
      firstSeq: Long)

  /** Keyed dedup state: the best-so-far (ts, seq), and whether the key's
    * row has already been emitted (a tombstone suppressing re-emission
    * forever after). */
  private[streaming] final case class DedupState(emitted: Boolean, ts: Long,
      seq: Long)

  /** Exactly-once first-event-per-key dedup with UNIFIED batch/stream
    * semantics: the winner is min-by-(ts, seq), emitted in streaming mode
    * only once the WATERMARK strictly passes its timestamp — after which
    * the watermark contract guarantees no admissible event can precede it
    * (late rows at/below the watermark are dropped before the operator),
    * so the emission is final. An out-of-order earlier event that arrives
    * above the watermark before emission replaces the buffered winner.
    *
    * Scale notes: batch mode is one shuffle (row_number over the keyed
    * window, filter rn=1 — Spark's TopK pushes the sort partial).
    * Streaming state is ONE tiny row per distinct key — the same bound as
    * Spark's own dropDuplicates, and the price of the "ever" guarantee;
    * cap the key domain (or run per time-bucketed keys) if it is
    * unbounded. */
  def dedupFirst(events: DataFrame, keyField: String,
      watermarkDelay: String): Dataset[First] =
    firstOccurrence(projectKeys(events, keyField, watermarkDelay))

  /** The (part, key, ts, seq[, event_time]) projection shared by
    * [[dedupFirst]] and [[incrementalDedup]]: key = fields[keyField],
    * missing ⇒ "". In streaming mode the WATERMARK is attached here —
    * before any downstream join — so every source event advances it:
    * [[incrementalDedup]]'s anti-join drops known-key rows, and a
    * watermark attached after the join would stall whenever the incoming
    * traffic is dominated by known keys, leaving novel winners buffered
    * forever. */
  private def projectKeys(events: DataFrame, keyField: String,
      watermarkDelay: String): DataFrame = {
    val p = events.select(col("part"), keyOf(keyField).as("key"),
      col("ts"), col("seq"))
    if (events.isStreaming)
      p.withColumn("event_time", eventTime(col("ts")))
        .withWatermark("event_time", watermarkDelay)
    else p
  }

  /** [[dedupFirst]] against a STATIC known-key history: only events whose
    * (part, key) has never been seen in `history` are eligible, and each
    * novel key still emits exactly its earliest (ts, seq) row — the
    * incremental-ingest shape (today's crawl against the historical
    * corpus, new-visitor detection against the user store).
    *
    * UNIFIED batch/stream: in streaming mode this is a stream-static
    * LEFT ANTI join (the static side re-plans per micro-batch, so a
    * growing history is picked up batch-to-batch) feeding the same
    * tombstoned keyed state as [[dedupFirst]]; in batch mode the same
    * anti-join feeds the same one-shuffle window. The history side
    * reduces to DISTINCT (part, key) before the join — at scale that
    * aggregate is what bounds the join build, not the raw history row
    * count. */
  def incrementalDedup(events: DataFrame, history: DataFrame,
      keyField: String, watermarkDelay: String): Dataset[First] = {
    val known = projectKeys(history, keyField, watermarkDelay)
      .select(col("part"), col("key")).distinct()
    firstOccurrence(projectKeys(events, keyField, watermarkDelay)
      .join(known, Seq("part", "key"), "left_anti"))
  }

  private def firstOccurrence(projected: DataFrame): Dataset[First] = {
    val spark = projected.sparkSession
    import spark.implicits._

    if (!projected.isStreaming) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("part"), col("key"))
        .orderBy(col("ts"), col("seq"))
      return projected
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("part"), col("key"), col("ts").as("firstTs"),
          col("seq").as("firstSeq"))
        .as[First]
    }

    def onGroup(key: (String, String),
        rows: Iterator[(String, String, Long, Long, java.sql.Timestamp)],
        state: GroupState[DedupState]): Iterator[First] = {
      val prior = state.getOption
      if (prior.exists(_.emitted)) {
        Iterator.empty // tombstone: drop everything, forever
      } else if (state.hasTimedOut) {
        val s = prior.get
        state.update(DedupState(emitted = true, s.ts, s.seq))
        Iterator.single(First(key._1, key._2, s.ts, s.seq))
      } else {
        val cand = rows.map(r => (r._3, r._4)) ++
          prior.iterator.map(s => (s.ts, s.seq))
        val (ts, seq) = cand.min
        state.update(DedupState(emitted = false, ts, seq))
        // fire once the watermark strictly passes the winner's millisecond
        // (ms is the watermark's grain; +1 covers every sub-ms timestamp)
        state.setTimeoutTimestamp(
          math.max(ts / 1000000L + 1L, state.getCurrentWatermarkMs() + 1L))
        Iterator.empty
      }
    }

    projected
      .select(col("part"), col("key"), col("ts"), col("seq"), col("event_time"))
      .as[(String, String, Long, Long, java.sql.Timestamp)]
      .groupByKey { case (part, key, _, _, _) => (part, key) }
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(onGroup _)
  }

  /** One finalized user-journey step: the key moved from `fromPart` (its
    * event at `fromTs`) to `toPart` (`toTs`, `toSeq`) with NO event in
    * between — the streaming twin of the q23 transition extraction,
    * per-key across partitions (a journey crosses event types, which the
    * store keeps in different parts). */
  final case class Step(key: String, fromPart: String, fromTs: Long,
      toPart: String, toTs: Long, toSeq: Long)

  /** Keyed transition state: the key's events not yet safe to pair away,
    * as (ts, seq, part) sorted by (ts, seq) — every event above the
    * watermark PLUS one bridge (the newest finalized event, which still
    * pairs with the next arrival). */
  private[streaming] final case class TransState(events: List[(Long, Long, String)])

  /** Adjacent-event transition extraction keyed by `fields[keyField]`,
    * ordered by (ts, seq) — UNIFIED batch/stream. A step (a → b) is
    * emitted exactly once, and only when the WATERMARK strictly passes
    * b's millisecond: from then on every admissible future event has
    * event-time above the watermark ≥ b, so nothing can ever sort
    * between a and b — the pair is final. An out-of-order event arriving
    * above the watermark lands mid-chain and splits the would-be pair
    * BEFORE it finalizes (spec-pinned); an event at/below the watermark
    * is dropped by the watermark machinery before reaching the operator.
    *
    * Scale notes: batch mode is the one-exchange lead() window per key
    * (the q23 shape). Streaming state per key is the events inside the
    * watermark horizon plus ONE bridge row — bounded by the horizon, not
    * the stream; the bridge (newest finalized event) persists like
    * [[dedupFirst]]'s tombstone so far-apart consecutive events still
    * pair, making steady-state state one row per quiet key. */
  def transitions(events: DataFrame, keyField: String,
      watermarkDelay: String): Dataset[Step] = {
    val spark = events.sparkSession
    import spark.implicits._

    if (!events.isStreaming) {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("key")).orderBy(col("ts"), col("seq"))
      return events
        .select(keyOf(keyField).as("key"), col("part"), col("ts"), col("seq"))
        .withColumn("toPart", lead(col("part"), 1).over(w))
        .withColumn("toTs", lead(col("ts"), 1).over(w))
        .withColumn("toSeq", lead(col("seq"), 1).over(w))
        .where(col("toPart").isNotNull)
        .select(col("key"), col("part").as("fromPart"), col("ts").as("fromTs"),
          col("toPart"), col("toTs"), col("toSeq"))
        .as[Step]
    }

    def onGroup(key: String,
        rows: Iterator[(String, String, Long, Long, java.sql.Timestamp)],
        state: GroupState[TransState]): Iterator[Step] = {
      val wmMs = state.getCurrentWatermarkMs()
      def msOf(tsNs: Long): Long = tsNs / 1000000L
      val prior = state.getOption.map(_.events).getOrElse(Nil)
      val merged =
        (prior ++ rows.map(r => (r._3, r._4, r._2))).sortBy(e => (e._1, e._2))
      // newest event the watermark has STRICTLY passed: pairs whose
      // successor is at or before it can never be split again
      val lastFinal = merged.lastIndexWhere(e => msOf(e._1) < wmMs)
      val emitted = if (lastFinal >= 1)
        merged.sliding(2).take(lastFinal).collect {
          case List((fTs, _, fPart), (tTs, tSeq, tPart)) =>
            Step(key, fPart, fTs, tPart, tTs, tSeq)
        }.toList
      else Nil
      // retain the bridge (index lastFinal) + everything pending
      val keep = merged.drop(math.max(lastFinal, 0))
      if (keep.isEmpty) state.remove()
      else {
        state.update(TransState(keep))
        // pending successors finalize on watermark advance even if the
        // key never receives another event
        val pending = keep.filter(e => msOf(e._1) >= wmMs)
        if (pending.nonEmpty)
          state.setTimeoutTimestamp(
            math.max(msOf(pending.head._1) + 1L, wmMs + 1L))
      }
      emitted.iterator
    }

    events
      .withColumn("event_time", eventTime(col("ts")))
      .withWatermark("event_time", watermarkDelay)
      .select(keyOf(keyField).as("key"), col("part"), col("ts"), col("seq"),
        col("event_time"))
      .as[(String, String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout)(onGroup _)
  }

  /** Event-time interval join of two event sets: every pair with equal
    * `fields[keyField]` where the right event lands in
    * `[l.ts, l.ts + within)` — "views within a day of each click",
    * "errors within a minute of each deploy".
    *
    * UNIFIED batch/stream: the same call joins two `readStream` sides or
    * two batch frames. Streaming is Spark's watermarked stream-stream
    * inner join — both sides buffer in join state only until the
    * watermark clears the time bound, so state is proportional to the
    * within-horizon window, not the stream length. Batch plans an
    * equi-join on the key (shuffle hash / sort-merge via AQE) with the
    * time bound as a residual — never a nested loop, because the key
    * equality anchors the join.
    *
    * The time comparison runs on the µs event-time columns (the grain
    * Spark's watermark machinery tracks); raw int64-ns timestamps are
    * carried through for exact output.
    *
    * `joinType` "inner" (default) or "left_outer": the outer form also
    * emits left events with NO in-window right match (null r_ts/r_seq) —
    * in streaming, such a row is emitted once the watermark proves no
    * matching right event can still arrive (Spark's watermarked outer
    * stream-stream join). NOTE the query watermark is the MIN across
    * both inputs (spark.sql.streaming.multipleWatermarkPolicy): a quiet
    * LEFT side holds back outer-null emission even when the right side
    * is far ahead.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyField: String,
      withinSeconds: Long, watermarkDelay: String,
      joinType: String = "inner"): DataFrame = {
    val l = left
      .withColumn("l_et", eventTime(col("ts")))
      .withWatermark("l_et", watermarkDelay)
      .select(keyOf(keyField).as("key"),
        col("ts").as("l_ts"), col("seq").as("l_seq"), col("l_et"))
    val r = right
      .withColumn("r_et", eventTime(col("ts")))
      .withWatermark("r_et", watermarkDelay)
      .select(keyOf(keyField).as("r_key"),
        col("ts").as("r_ts"), col("seq").as("r_seq"), col("r_et"))
    l.join(r,
        col("key") === col("r_key") &&
          col("r_et") >= col("l_et") &&
          col("r_et") < col("l_et") + expr(s"INTERVAL $withinSeconds SECOND"),
        joinType)
      .select(col("key"), col("l_ts"), col("l_seq"), col("r_ts"), col("r_seq"))
  }
}
