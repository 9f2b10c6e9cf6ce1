package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loading + session conventions shared by every query.
  *
  * The synthetic `events` table stores `ts` as parquet INT64
  * TIMESTAMP(NANOS). Spark refuses NANOS timestamps by default; with
  * `spark.sql.legacy.parquet.nanosAsLong=true` it reads them as
  * LongType nanoseconds — which is exactly the reference engine's
  * canonical timestamp representation (int64 ns since epoch, see
  * reference pkg/model/logevent.go:24-35), so we adopt Long-ns as the
  * engine-wide timestamp type and derive µs/TimestampType views only
  * at the presentation edge.
  */
object Tables {
  /** Session settings every entry point applies (idempotent). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    tune(spark)
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Fixed-point integerization: floor(x*10^scale + 0.5) as Long.
    * Applied per-row BEFORE aggregation so sums are exact integer
    * arithmetic — bit-identical across Spark partitionings and across
    * engines (the DuckDB oracle applies the same per-row transform).
    * Summing raw doubles would be order-dependent and hash-unstable.
    */
  def fx(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5))
  }

  /** SQL-side twin of [[fx]] for DuckDB oracle strings. */
  def fxSql(expr: String, scale: Int): String = {
    val p = "1" + ("0" * scale)
    s"CAST(floor(($expr)*$p + 0.5) AS BIGINT)"
  }
}
