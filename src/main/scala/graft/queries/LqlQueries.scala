package graft.queries

import graft.store.{CdcPipeStore, EventStore, IngestStore, PipeStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LQL end-to-end entries: every query here is an actual LQL string executed
  * by the [[graft.engine.Engine]] over the materialized LogEvent store, with
  * a DuckDB oracle over the same `events` table (see
  * [[EventStore.oracleCte]]). These are the SURVEY §2 conformance gates for
  * the SELECT path, predicates, positioning and projections.
  */
object LqlQueries {

  import EventStore.oracleCte

  private def eng(spark: SparkSession, dir: String) = EventStore.engine(spark, dir)

  /** Canonical deterministic order used by oracles (the engine's total
    * order (ts, part, seq)). */
  private val OrderBy = "ORDER BY ts, tags, seq"

  /** DuckDB's parquet reader truncates ns timestamps to µs, so the oracle
    * can only ever see µs; entries therefore expose `ts_us = ts div 1000`.
    * The ENGINE keeps full int64 nanos — this is presentation-only. */
  private def us(df: DataFrame): DataFrame =
    df.withColumn("ts_us", expr("ts div 1000")).drop("ts")

  // 1. FROM {tags} literal — subset match + partition pruning
  def selectSubset(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select("SELECT FROM {name=error} LIMIT 10000"))

  // 2. msg CONTAINS
  def whereContains(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select("SELECT FROM {name=error} WHERE msg CONTAINS 'k=1' LIMIT 10000"))

  // 3. msg PREFIX / SUFFIX with AND/OR/NOT nesting
  def wherePrefixSuffix(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select(
      "SELECT FROM {name=click} WHERE (msg PREFIX 'user 1' AND NOT msg SUFFIX 'k=0') OR msg SUFFIX 'k=42' LIMIT 10000"))

  // 4. msg LIKE — shell glob, not SQL LIKE
  def whereGlob(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select("SELECT WHERE msg LIKE 'user 1? purchase*' LIMIT 10000"))

  // 5. fields — lexicographic string comparisons, missing ⇒ ""
  def whereFields(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select(
      "SELECT FROM {name=signup} WHERE fields:k > '5' AND fields:user != '7' AND fields:missing = '' LIMIT 10000"))

  // 6. UPPER/LOWER scalar functions
  def whereUpper(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select(
      "SELECT FROM {name=view} WHERE UPPER(msg) CONTAINS 'VIEW K=7' AND LOWER(UPPER(fields:k)) PREFIX '7' LIMIT 10000"))

  // 7. RANGE inclusive + ts WHERE compare
  def whereTsRange(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select(
      "SELECT FROM {name=error} RANGE [\"2024-01-05 00:00:00\":\"2024-01-20 00:00:00\"] WHERE ts >= '2024-01-07 12:00:00' LIMIT 10000"))

  // 8. FROM tags expression (glob + compare over tag values) — pruning path
  def fromExpr(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select("SELECT FROM name LIKE 'p*' OR host = 'host1' LIMIT 10000"))

  // 9. POSITION head + OFFSET/LIMIT paging
  def positionOffset(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select("SELECT POSITION head OFFSET 1000 LIMIT 200"))

  // 10. POSITION tail + negative OFFSET — backward walk, "last N records"
  def offsetNegative(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select("SELECT FROM {name=purchase} POSITION tail OFFSET -300 LIMIT 10000"))

  // 11. format-template projection
  def formatTemplate(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select(
      "SELECT \"{ts.format(2006-01-02 15:04:05)} u={vars:user} {msg} [{vars:name}]\" FROM {name=click} LIMIT 10000"))

  // 12. continuation token: read page 1, mint token, return page 2
  def continuation(spark: SparkSession, dir: String): DataFrame = {
    val e = eng(spark, dir)
    val sel = e.parse("SELECT FROM {host=host2} LIMIT 500") match {
      case s: graft.lql.Ast.Select => s
      case _ => sys.error("unreachable")
    }
    val (_, keys) = e.selectWithToken(sel)
    val tok = e.pageToken(keys).getOrElse(sys.error("empty first page"))
    us(e.select(s"""SELECT FROM {host=host2} POSITION "$tok" LIMIT 500"""))
  }

  // 13. SHOW PARTITIONS (records projection — size is physical)
  def showPartitions(spark: SparkSession, dir: String): DataFrame =
    eng(spark, dir).execute("SHOW PARTITIONS")
      .select(col("partition"), col("records"))

  // 14. DESCRIBE PARTITION, aggregated to the partition level
  def describePartition(spark: SparkSession, dir: String): DataFrame =
    eng(spark, dir).execute("DESCRIBE PARTITION {host=host2,name=error}")
      .groupBy(col("partition"))
      .agg(sum("records").as("records"),
        expr("min(min_ts) div 1000").as("min_ts_us"),
        expr("max(max_ts) div 1000").as("max_ts_us"))

  // 15. PIPE lifecycle: the PipeStore build ran CREATE PIPE p1 over two
  // ingest batches (see PipeStore); this reads the pipe's destination
  // partition back through a normal SELECT — fields carry the source tags
  // appended after the record fields (reference pkg/pipe/siterator.go:49-63).
  def pipe(spark: SparkSession, dir: String): DataFrame =
    us(PipeStore.engine(spark, dir).select("SELECT FROM {logrange.pipe=p1} LIMIT 10000"))

  // 15b. CDC dedup-on-ingest pipe (round-13 directive 7): the CdcPipeStore
  // build ran a cdcDedup=true pipe over two ingest batches with an
  // engineered duplicate density — the destination holds batch 1 in full
  // plus only the batch-2 rows carrying at least one novel content chunk.
  def pipeCdc(spark: SparkSession, dir: String): DataFrame =
    us(CdcPipeStore.engine(spark, dir)
      .select("SELECT FROM {logrange.pipe=pcdc} LIMIT 10000"))

  // 16. SHOW PIPES (reference pkg/backend/admin.go:133-160)
  def showPipes(spark: SparkSession, dir: String): DataFrame =
    PipeStore.engine(spark, dir).execute("SHOW PIPES")

  // 17. DESCRIBE PIPE (reference pkg/backend/admin.go:242-255)
  def describePipe(spark: SparkSession, dir: String): DataFrame =
    PipeStore.engine(spark, dir).execute("DESCRIBE PIPE p1")

  /** Engine over the same store with a pinned clock, for now-relative
    * datetime entries (the reference resolves datetimes at parse time
    * against the wall clock; tests inject a fixed one). Pinned now =
    * 2024-01-25T12:30:45Z, a Thursday inside the events' Jan-2024 range. */
  private def engAt(spark: SparkSession, dir: String): graft.engine.Engine =
    new graft.engine.Engine(eng(spark, dir).store,
      () => java.time.Instant.parse("2024-01-25T12:30:45Z"))

  // 21. relative datetimes: -10.5d .. -5d from the pinned now
  def rangeRelative(spark: SparkSession, dir: String): DataFrame =
    us(engAt(spark, dir).select(
      "SELECT FROM {name=error} RANGE [\"-10.5d\":\"-5d\"] LIMIT 10000"))

  // 22. special datetimes: week (Sunday start, Go Weekday) .. day
  def rangeSpecial(spark: SparkSession, dir: String): DataFrame =
    us(engAt(spark, dir).select(
      "SELECT FROM {name=click} RANGE [\"week\":\"day\"] LIMIT 10000"))

  // 23. raw int64 nanos as ts constants
  def whereTsRawNs(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select(
      "SELECT FROM {name=view} WHERE ts >= '1704931200000000000' AND ts <= '1705276800000000000' LIMIT 10000"))

  // 24. TRUNCATE DRYRUN: phase-1 size cut (MAXSIZE 1 drops every chunk)
  // and the MINSIZE floor preventing any cut; reports only, no deletion
  def truncateDryrun(spark: SparkSession, dir: String): DataFrame = {
    val e = eng(spark, dir)
    def shape(mode: String, df: DataFrame): DataFrame =
      df.select(lit(mode).as("mode"), col("partition"),
        col("before_records").cast("long").as("before_records"),
        col("after_records").cast("long").as("after_records"),
        col("chunks_deleted").cast("long").as("chunks_deleted"),
        col("deleted").cast("long").as("deleted"))
    shape("cut", e.execute("TRUNCATE DRYRUN {name=error} MAXSIZE 1"))
      .unionByName(shape("keep",
        e.execute("TRUNCATE DRYRUN {name=error} MINSIZE 1000000000 MAXSIZE 1")))
  }

  // 25. format template: {ts.format}, {msg.json()} and {vars} (tag line +
  // fields kv-string, reference leformatter.go:159-166) in one projection
  def formatVars(spark: SparkSession, dir: String): DataFrame =
    us(eng(spark, dir).select(
      "SELECT \"{ts.format(2006-01-02)}|{msg.json()}|{vars}\" FROM {name=error} LIMIT 10000"))

  // 18-20. ingest parsers: files written to /tmp are collected through
  // path-schema tag assignment (see IngestStore) and queried back
  def ingestLogfmt(spark: SparkSession, dir: String): DataFrame =
    us(IngestStore.engine(spark, dir).select("SELECT FROM ns PREFIX 'ns' LIMIT 10000"))

  def ingestText(spark: SparkSession, dir: String): DataFrame =
    us(IngestStore.engine(spark, dir).select("SELECT FROM {kind=textlog} LIMIT 10000"))

  def ingestPure(spark: SparkSession, dir: String): DataFrame =
    us(IngestStore.engine(spark, dir).select("SELECT FROM {kind=purelog} LIMIT 10000"))

  def ingestK8json(spark: SparkSession, dir: String): DataFrame =
    us(IngestStore.engine(spark, dir).select("SELECT FROM {kind=k8slog} LIMIT 10000"))

  private val Proj = "SELECT epoch_us(ts_raw) AS ts_us, msg, tags, fields FROM le"

  val oracles: Map[String, String] = Map(
    "lql_select_subset" ->
      s"""$oracleCte $Proj WHERE event_type = 'error'
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_where_contains" ->
      s"""$oracleCte $Proj
         |WHERE event_type = 'error' AND position('k=1' IN msg) > 0
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_where_prefix_suffix" ->
      s"""$oracleCte $Proj
         |WHERE event_type = 'click' AND
         |  ((msg LIKE 'user 1%' AND NOT msg LIKE '%k=0') OR msg LIKE '%k=42')
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_where_glob" ->
      s"""$oracleCte $Proj
         |WHERE regexp_matches(msg, '^user 1[^/] purchase[^/]*$$')
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_where_fields" ->
      s"""$oracleCte $Proj
         |WHERE event_type = 'signup'
         |  AND k > '5' AND CAST(user_id AS VARCHAR) != '7'
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_where_upper" ->
      s"""$oracleCte $Proj
         |WHERE event_type = 'view' AND position('VIEW K=7' IN upper(msg)) > 0
         |  AND lower(upper(k)) LIKE '7%'
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_where_ts_range" ->
      s"""$oracleCte $Proj
         |WHERE event_type = 'error'
         |  AND ts >= epoch_ns(TIMESTAMP '2024-01-05 00:00:00')
         |  AND ts <= epoch_ns(TIMESTAMP '2024-01-20 00:00:00')
         |  AND ts >= epoch_ns(TIMESTAMP '2024-01-07 12:00:00')
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_from_expr" ->
      s"""$oracleCte $Proj
         |WHERE regexp_matches(event_type, '^p[^/]*$$') OR (user_id % 4) = 1
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_position_offset" ->
      s"""$oracleCte $Proj
         |$OrderBy LIMIT 200 OFFSET 1000""".stripMargin,
    "lql_offset_negative" ->
      s"""$oracleCte SELECT epoch_us(ts_raw) AS ts_us, msg, tags, fields FROM
         |(SELECT * FROM le WHERE event_type = 'purchase' ORDER BY ts DESC, tags DESC, seq DESC LIMIT 300) le
         |$OrderBy""".stripMargin,
    "lql_format" ->
      s"""$oracleCte SELECT epoch_us(ts_raw) AS ts_us,
         |  strftime(ts_raw, '%Y-%m-%d %H:%M:%S') || ' u=' || user_id || ' ' || msg
         |    || ' [' || event_type || ']' AS line
         |FROM le WHERE event_type = 'click' $OrderBy LIMIT 10000""".stripMargin,
    "lql_continuation" ->
      s"""$oracleCte $Proj WHERE (user_id % 4) = 2
         |$OrderBy LIMIT 500 OFFSET 500""".stripMargin,
    "lql_show_partitions" ->
      s"""$oracleCte SELECT tags AS partition, COUNT(*) AS records FROM le GROUP BY 1""".stripMargin,
    "lql_describe_partition" ->
      s"""$oracleCte SELECT tags AS partition, COUNT(*) AS records,
         |  MIN(epoch_us(ts_raw)) AS min_ts_us, MAX(epoch_us(ts_raw)) AS max_ts_us
         |FROM le WHERE (user_id % 4) = 2 AND event_type = 'error' GROUP BY 1""".stripMargin,
    "lql_pipe" ->
      s"""$oracleCte SELECT epoch_us(ts_raw) AS ts_us, msg,
         |  'logrange.pipe=p1' AS tags,
         |  'user=' || user_id || ',k=' || k || ',host=host' || (user_id % 4) || ',name=error' AS fields
         |FROM le WHERE event_type = 'error' AND position('k=1' IN msg) > 0
         |$OrderBy LIMIT 10000""".stripMargin,
    // the keep set recomputed from first principles over the SAME CDC
    // chunk-boundary definition the worker's gate uses: half 0 (even seq)
    // passes whole (gated against an empty index), half 1 keeps rows with
    // at least one chunk absent from half 0's chunk set; token-less rows
    // cannot be judged and pass
    "lql_pipe_cdc" ->
      s"""$oracleCte,
         |src AS (
         |  SELECT seq, ts_raw, tags,
         |    CASE WHEN TRY_CAST(k AS BIGINT) % 3 = 0
         |         THEN '${graft.store.CdcPipeStore.Boilerplate}' ELSE msg END AS text,
         |    seq % 2 AS half
         |  FROM le WHERE event_type = 'error'),
         |${graft.llm.Dedup.cdcChunkCtesOver("src", "seq", "text")},
         |h0 AS (
         |  SELECT DISTINCT c.chunk_hash
         |  FROM cdcch c JOIN src s ON c.doc_id = s.seq WHERE s.half = 0),
         |nv AS (
         |  SELECT s.seq, bool_or(h.chunk_hash IS NULL) AS novel
         |  FROM cdcch c JOIN src s ON c.doc_id = s.seq
         |  LEFT JOIN h0 h ON c.chunk_hash = h.chunk_hash
         |  WHERE s.half = 1 GROUP BY 1),
         |keepseq AS (
         |  SELECT seq FROM src WHERE half = 0
         |  UNION ALL SELECT seq FROM nv WHERE novel
         |  UNION ALL SELECT s.seq FROM src s
         |  WHERE s.half = 1
         |    AND NOT EXISTS (SELECT 1 FROM cdcch c WHERE c.doc_id = s.seq))
         |SELECT epoch_us(s.ts_raw) AS ts_us, s.text AS msg,
         |  'logrange.pipe=pcdc' AS tags, s.tags AS fields
         |FROM src s JOIN keepseq USING (seq)
         |ORDER BY s.ts_raw, s.seq LIMIT 10000""".stripMargin,
    "lql_show_pipes" -> "SELECT 'p1' AS pipe",
    "lql_describe_pipe" ->
      """SELECT 'p1' AS pipe, '{name=error}' AS "from",
        |  'msg CONTAINS "k=1"' AS "where", 'logrange.pipe=p1' AS partition""".stripMargin,
    "lql_ingest_logfmt" ->
      """SELECT * FROM (VALUES
        |  (1704164645123456::BIGINT, 'level=info user=u1 msg hello', 'ns=ns1,pod=pod-a', 'stream=stdout,level=info,user=u1'),
        |  (1704164646500000::BIGINT, 'plain text line', 'ns=ns1,pod=pod-a', 'stream=stderr'),
        |  (1704189600250000::BIGINT, 'level=warn time=2024-01-02T10:00:00.25Z user=u2 disk low', 'ns=ns1,pod=pod-a', 'stream=stdout,level=warn,user=u2,time=2024-01-02T10:00:00.25Z'),
        |  (1704164648000000::BIGINT, 'level=error dup=1 dup=2', 'ns=ns1,pod=pod-a', 'stream=stdout,level=error'),
        |  (1706933106999999::BIGINT, 'level=debug user=u3 ok', 'ns=ns2,pod=pod-b', 'stream=stdout,level=debug,user=u3'),
        |  (1706933107000000::BIGINT, 'no fields here', 'ns=ns2,pod=pod-b', 'stream=stderr')
        |) t(ts_us, msg, tags, fields)""".stripMargin,
    "lql_ingest_text" ->
      """SELECT * FROM (VALUES
        |  (1709528767000000::BIGINT, '2024-03-04 05:06:07 start of something', 'kind=textlog,name=boot', ''),
        |  (1709528767000000::BIGINT, '  continuation line', 'kind=textlog,name=boot', ''),
        |  (1709528768000000::BIGINT, '2024-03-04 05:06:08 second', 'kind=textlog,name=boot', '')
        |) t(ts_us, msg, tags, fields)""".stripMargin,
    "lql_ingest_pure" ->
      """SELECT * FROM (VALUES
        |  (1714979289000000::BIGINT, 'alpha', 'kind=purelog,name=notes', 'origin=file-notes'),
        |  (1714979289000000::BIGINT, 'beta', 'kind=purelog,name=notes', 'origin=file-notes')
        |) t(ts_us, msg, tags, fields)""".stripMargin,
    "lql_ingest_k8json" ->
      """SELECT * FROM (VALUES
        |  (1712297228123456::BIGINT, 'first message', 'kind=k8slog,pod=podx', 'stream=stdout'),
        |  (1712297229000000::BIGINT, 'second', 'kind=k8slog,pod=podx', 'stream=stderr'),
        |  (1712297230000000::BIGINT, 'third no stream', 'kind=k8slog,pod=podx', 'stream=')
        |) t(ts_us, msg, tags, fields)""".stripMargin,
    "lql_format_vars" ->
      s"""$oracleCte SELECT epoch_us(ts_raw) AS ts_us,
         |  strftime(ts_raw, '%Y-%m-%d') || '|' || msg || '|' || tags || ',' || fields AS line
         |FROM le WHERE event_type = 'error' $OrderBy LIMIT 10000""".stripMargin,
    "lql_range_relative" ->
      s"""$oracleCte $Proj
         |WHERE event_type = 'error'
         |  AND ts >= epoch_ns(TIMESTAMP '2024-01-15 00:30:45')
         |  AND ts <= epoch_ns(TIMESTAMP '2024-01-20 12:30:45')
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_range_special" ->
      s"""$oracleCte $Proj
         |WHERE event_type = 'click'
         |  AND ts >= epoch_ns(TIMESTAMP '2024-01-21 00:00:00')
         |  AND ts <= epoch_ns(TIMESTAMP '2024-01-25 00:00:00')
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_where_ts_rawns" ->
      s"""$oracleCte $Proj
         |WHERE event_type = 'view'
         |  AND ts >= 1704931200000000000 AND ts <= 1705276800000000000
         |$OrderBy LIMIT 10000""".stripMargin,
    "lql_truncate_dryrun" ->
      """WITH p AS (
        |  SELECT 'host=host' || (user_id % 4) || ',name=error' AS partition,
        |         count(*) AS n
        |  FROM events WHERE event_type = 'error' GROUP BY 1)
        |SELECT 'cut' AS mode, partition, n::BIGINT AS before_records,
        |  0::BIGINT AS after_records, ceil(n / 2000.0)::BIGINT AS chunks_deleted,
        |  1::BIGINT AS deleted FROM p
        |UNION ALL
        |SELECT 'keep', partition, n::BIGINT, n::BIGINT, 0::BIGINT, 0::BIGINT
        |FROM p""".stripMargin
  )

  val entries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lql_select_subset" -> (selectSubset _),
    "lql_where_contains" -> (whereContains _),
    "lql_where_prefix_suffix" -> (wherePrefixSuffix _),
    "lql_where_glob" -> (whereGlob _),
    "lql_where_fields" -> (whereFields _),
    "lql_where_upper" -> (whereUpper _),
    "lql_where_ts_range" -> (whereTsRange _),
    "lql_from_expr" -> (fromExpr _),
    "lql_position_offset" -> (positionOffset _),
    "lql_offset_negative" -> (offsetNegative _),
    "lql_format" -> (formatTemplate _),
    "lql_continuation" -> (continuation _),
    "lql_show_partitions" -> (showPartitions _),
    "lql_describe_partition" -> (describePartition _),
    "lql_pipe" -> (pipe _),
    "lql_pipe_cdc" -> (pipeCdc _),
    "lql_show_pipes" -> (showPipes _),
    "lql_describe_pipe" -> (describePipe _),
    "lql_ingest_logfmt" -> (ingestLogfmt _),
    "lql_ingest_text" -> (ingestText _),
    "lql_ingest_pure" -> (ingestPure _),
    "lql_ingest_k8json" -> (ingestK8json _),
    "lql_format_vars" -> (formatVars _),
    "lql_range_relative" -> (rangeRelative _),
    "lql_range_special" -> (rangeSpecial _),
    "lql_where_ts_rawns" -> (whereTsRawNs _),
    "lql_truncate_dryrun" -> (truncateDryrun _)
  )
}
