package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Analytics

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in [[queries]] is an operator from SURVEY.md §2 (or a
  * beyond-reference training-pipeline operator); every key that is
  * SQL-expressible also appears in [[oracleSql]] with IDENTICAL output
  * column names (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q3Join5(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Analytics.q1Agg _),
    "q2_topk" -> (Analytics.q2Topk _),
    "q3_join5" -> (Analytics.q3Join5 _),
    "q4_semi" -> (Analytics.q4Semi _),
    "q5_filter_agg" -> (Analytics.q5FilterAgg _),
    "q6_window" -> (Analytics.q6Window _),
    "q7_distinct" -> (Analytics.q7Distinct _),
    "q8_events_hourly" -> (Analytics.q8EventsHourly _),
    "q9_anti" -> (Analytics.q9Anti _)
  )

  /** DuckDB twins for the driver's correctness gate. */
  def oracleSql: Map[String, String] = Analytics.oracles
}
