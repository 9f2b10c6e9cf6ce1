package graft.store

import graft.engine.Engine
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Materializes the canonical LogEvent store from the driver's synthetic
  * `events.parquet` through the real ingest path ([[Store.append]]), so the
  * LQL entries in SparkEntry exercise partition pruning / catalog / footers
  * end-to-end.
  *
  * Mapping (mirrored EXACTLY by [[EventStore.oracleCte]] on the DuckDB
  * side — both sides must stay in sync):
  *   tags    = {host=host<user_id%4>, name=<event_type>}  (20 partitions)
  *   msg     = "user <user_id> <event_type> k=<k>"  where k is the digit
  *             run in props
  *   fields  = {user=<user_id>, k=<k>}
  *   seq     = event_id  (globally monotonic = arrival order)
  *   ts      = the event's int64-nanosecond timestamp
  */
object EventStore {

  /** Bump when the mapping or store layout changes — the on-disk cache is
    * keyed by it. */
  val Version = "v2"

  private val cache = scala.collection.concurrent.TrieMap.empty[String, Engine]

  def storeRoot(sfDir: String): String = {
    val name = sfDir.replaceAll("[^A-Za-z0-9.]+", "_")
    // fold the input file's (size, mtime) into the cache key: the driver
    // regenerates testdata between rounds, and a store built from the old
    // file must not be served for the new one (the marker-file reuse is
    // cross-JVM, so a version string alone cannot see the swap)
    val f = new java.io.File(s"$sfDir/events.parquet")
    val fp = java.lang.Long.toHexString(f.length * 31 + f.lastModified)
    s"/tmp/graft/store-$Version-$fp-$name"
  }

  /** Get (building if needed) the engine over the LogEvent store for a
    * testdata dir. Thread-safe within the JVM; the on-disk store is reused
    * across JVMs via a marker file. */
  def engine(spark: SparkSession, sfDir: String): Engine =
    cache.getOrElseUpdate(sfDir, {
      val root = storeRoot(sfDir)
      val store = new Store(spark, root)
      val marker = new java.io.File(s"$root/_BUILT")
      if (!marker.exists()) {
        val dir = new java.io.File(root)
        if (dir.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(dir)
        }
        build(spark, sfDir, store)
        marker.getParentFile.mkdirs()
        marker.createNewFile()
      }
      new Engine(store)
    })

  /** The canonical events→LogEvent mapping (ts, msg, fields, seq, part),
    * shared with [[PipeStore]]. */
  def mappedRows(spark: SparkSession, sfDir: String): org.apache.spark.sql.DataFrame = {
    val ev = graft.Tables.load(spark, sfDir, "events")
    val k = regexp_extract(col("props"), "[0-9]+", 0)
    ev.select(
      col("ts"), // LongType ns — normalized by Tables.load
      concat(lit("user "), col("user_id"), lit(" "), col("event_type"), lit(" k="), k).as("msg"),
      map(lit("user"), col("user_id").cast("string"), lit("k"), k).as("fields"),
      col("event_id").as("seq"),
      concat(lit("host=host"), pmod(col("user_id"), lit(4)), lit(",name="), col("event_type")).as("part"))
  }

  private def build(spark: SparkSession, sfDir: String, store: Store): Unit = {
    // a few files ("chunks") per partition at bench scale, one at sf0.01
    store.append(mappedRows(spark, sfDir), maxRecordsPerFile = 2000)
  }

  /** DuckDB CTE defining the identical LogEvent view over `events` — the
    * base of every LQL oracle. `tags` is the canonical tag line (host sorts
    * before name), `fields` the kv-string rendering. */
  val oracleCte: String =
    """WITH le AS (
      |  SELECT epoch_ns(ts) AS ts,
      |    'user ' || user_id || ' ' || event_type || ' k=' || regexp_extract(props, '[0-9]+') AS msg,
      |    'host=host' || (user_id % 4) || ',name=' || event_type AS tags,
      |    'user=' || user_id || ',k=' || regexp_extract(props, '[0-9]+') AS fields,
      |    event_id AS seq,
      |    user_id, event_type, ts AS ts_raw,
      |    regexp_extract(props, '[0-9]+') AS k
      |  FROM events
      |)""".stripMargin
}
