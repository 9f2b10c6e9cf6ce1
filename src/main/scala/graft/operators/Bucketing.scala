package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{fx, load}

/** Co-located fact-fact joins via bucketing.
  *
  * At 100 TB the orders ⋈ lineitem shuffle IS the query cost: both
  * sides repartition on the join key every time. Bucketing pays that
  * shuffle ONCE at write time — `bucketBy(n, key)` + `sortBy` stores
  * each side hash-clustered by the key — and every subsequent join on
  * the key plans a SortMergeJoin with NO exchange on either side (the
  * bucketed scans already satisfy the required hash clustering; spec-
  * asserted). This is the materialization a pipeline running many
  * queries over the same join should maintain; same-count buckets on
  * both sides are required for the co-located plan.
  *
  * The bucketed tables build once per (JVM, sf dir) into a temp-rooted
  * warehouse (saveAsTable is the only way Spark persists bucket
  * metadata; the session catalog records it without Hive).
  */
object Bucketing {

  // keyed by (session, dir): table names are only valid in the catalog of
  // the session that built them — a second session in the same JVM must
  // build its own. The lock serializes builds (one-time cost), which also
  // keeps concurrent first calls from racing the warehouse delete/Overwrite.
  private val built =
    scala.collection.mutable.Map.empty[(SparkSession, String), (String, String)]

  /** Returns the (orders, lineitem) bucketed table names for `dir`,
    * creating them on first use; cached names are re-validated against the
    * active session catalog before reuse. */
  private[graft] def bucketedTables(spark: SparkSession, dir: String): (String, String) =
    built.synchronized {
      // drop entries bound to stopped sessions — their names are dead and
      // the keys would otherwise pin the session object graphs for the
      // JVM lifetime (same eviction the LlmQueries memo does)
      built.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
      val key = (spark, dir)
      built.get(key)
        .filter { case (ot, lt) =>
          spark.catalog.tableExists(ot) && spark.catalog.tableExists(lt)
        }
        .getOrElse {
          val suffix = dir.replaceAll("[^A-Za-z0-9]+", "_")
          val (ot, lt) = (s"graft_orders_b$suffix", s"graft_lineitem_b$suffix")
          // the in-memory catalog forgets tables across JVMs but the
          // warehouse directory survives — drop AND clear the location
          // before (re)build
          val wh = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"))
          val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
          Seq(ot, lt).foreach { t =>
            spark.sql(s"DROP TABLE IF EXISTS $t")
            fs.delete(new org.apache.hadoop.fs.Path(wh, t.toLowerCase), true)
          }
          load(spark, dir, "orders")
            .write.mode(SaveMode.Overwrite)
            .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .saveAsTable(ot)
          load(spark, dir, "lineitem")
            .write.mode(SaveMode.Overwrite)
            .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .saveAsTable(lt)
          built.put(key, (ot, lt))
          (ot, lt)
        }
    }

  /** Revenue per order priority over the bucketed join — the plan joins
    * the two bucketed scans with no exchange below the join. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = bucketedTables(spark, dir)
    spark.table(lt)
      .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(fx(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)).as("revenue_e4"),
        count(lit(1)).as("n_items"))
  }

  val oracle: String =
    """SELECT o_orderpriority,
      | CAST(SUM(CAST(floor((l_extendedprice*(1-l_discount))*10000 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_e4,
      | COUNT(*) AS n_items
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin
}
