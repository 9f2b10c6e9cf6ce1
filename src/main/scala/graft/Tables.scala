package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Table loading + session conventions shared by every query.
  *
  * The engine-wide timestamp type is LongType nanoseconds since epoch —
  * exactly the reference engine's canonical representation (int64 ns,
  * see reference pkg/model/logevent.go:24-35); µs/TimestampType views
  * are derived only at the presentation edge. [[load]] normalizes
  * whatever physical type the driver's synthetic `events.ts` was written
  * with (timestamp[ns] via `nanosAsLong`, or timestamp[us]) into that
  * contract.
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
    normalizeTs(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** The engine's time contract is int64 UTC nanoseconds. The driver's
    * synthetic `events.ts` has been written as parquet timestamp[ns]
    * (which `nanosAsLong` surfaces as raw longs) and, since the 2026-08-13
    * regeneration, as timestamp[us] (surfaced as TIMESTAMP_NTZ). Normalize
    * either at the read chokepoint so every downstream plan keeps exact
    * integer time arithmetic; the session timezone is pinned to UTC by
    * [[tune]], so the NTZ→instant cast is the identity mapping DuckDB's
    * `epoch_ns(ts)` applies on the oracle side — both engines see the same
    * int64 values. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == TimestampNTZType || f.dataType == TimestampType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
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
