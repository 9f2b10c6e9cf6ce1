package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.{fx, load}

/** Sketch-based approximate aggregates, accuracy-gated against their
  * exact counterparts.
  *
  * At 100 TB, `COUNT(DISTINCT x)` is the single most expensive innocent-
  * looking aggregate in the language: Spark expands it to a two-phase
  * shuffle that moves EVERY distinct value. The production answer is a
  * mergeable sketch — HyperLogLog++ for distinct counts (Heule et al.
  * 2013; Spark's `approx_count_distinct`, a few-KB fixed-size register
  * set combined map-side, so the shuffle carries one sketch per
  * partition instead of the value stream) and the KLL/GK quantile
  * summary behind `approx_percentile`. Both keep whole-stage codegen
  * and partial aggregation; neither ever materializes the distinct set.
  *
  * [[gate]] runs sketch and exact side by side and emits
  * (variant, exact, meets_bound) rows, pinning the sketch error inside
  * its documented envelope (HLL rsd 5% → gate at 2×rsd; quantiles gated
  * at 1% relative). The oracle recomputes the exact values and expects
  * every bound to hold — a Spark upgrade that silently degrades sketch
  * accuracy fails the gate. The exact side is affordable at gate scale
  * (sf0.01) precisely because this is the CORRECTNESS surface; the
  * sketch side is the one a 100 TB query should run.
  */
object Sketches {

  def gate(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    val li = load(spark, dir, "lineitem")

    // one pass per table: exact + sketch in the same aggregate
    val users = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.05).as("approx"))
      .select(lit("hll_users").as("variant"), col("exact").cast("long").as("exact"),
        (abs(col("approx") - col("exact")) <= col("exact") * 0.10).as("meets_bound"))

    val parts = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("approx"))
      .select(lit("hll_parts").as("variant"), col("exact").cast("long").as("exact"),
        (abs(col("approx") - col("exact")) <= col("exact") * 0.10).as("meets_bound"))

    // quantiles on the INTEGERIZED value (fx e2) so the exact side is
    // engine-portable: interpolation lands on .0/.5 exactly in doubles.
    val q = ev.select(fx(col("value"), 2).cast("long").as("v"))
      .agg(
        expr("percentile(v, 0.5)").as("ex50"),
        expr("percentile(v, 0.99)").as("ex99"),
        expr("approx_percentile(v, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(v, 0.99, 10000)").as("ap99"))
    def qrow(name: String, ex: String, ap: String) =
      q.select(lit(name).as("variant"),
        floor(col(ex) + 0.5).cast("long").as("exact"),
        (abs(col(ap) - col(ex)) <= greatest(lit(1.0), col(ex) * 0.01)).as("meets_bound"))

    users.unionByName(parts)
      .unionByName(qrow("p50_value_e2", "ex50", "ap50"))
      .unionByName(qrow("p99_value_e2", "ex99", "ap99"))
  }

  /** Heavy hitters via Count-Min Sketch, accuracy-gated against exact
    * counts.
    *
    * Exact per-token counts at corpus scale shuffle the full token
    * stream; a CMS is a fixed (w×d ints) mergeable summary built with
    * map-side partials — the stream never crosses the wire. CMS
    * guarantees est >= true and (w.p. `confidence`) est <= true + ε·N.
    * The gate takes the exact top-`k` tokens (deterministic ties by
    * token) and pins each sketch estimate inside that envelope, so a
    * hashing/merge regression in Spark's sketch fails CORRECTNESS.
    */
  def heavyHitters(spark: SparkSession, dir: String, k: Int = 10,
      eps: Double = 1e-3): DataFrame = {
    import spark.implicits._
    val toks = load(spark, dir, "documents")
      .select(explode(graft.llm.Dedup.tokens(col("text"))).as("t"))
      .persist()
    val exact = toks.groupBy("t").agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("t").asc).limit(k).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val skBytes = toks
      .select(expr(s"count_min_sketch(t, CAST($eps AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val n = toks.count()
    toks.unpersist()
    val bound = math.ceil(eps * n).toLong
    exact.toSeq.map { case (term, cnt) =>
      val est = cms.estimateCount(term)
      (term, cnt, est >= cnt && est <= cnt + bound)
    }.toDF("term", "exact", "meets_bound")
  }

  val heavyHittersOracle: String =
    """SELECT t AS term, count(*)::BIGINT AS exact, true AS meets_bound
      |FROM (SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'),
      |                                x -> x != '')) AS t FROM documents)
      |GROUP BY 1 ORDER BY exact DESC, term ASC LIMIT 10""".stripMargin

  /** DuckDB twin: exact values recomputed, every bound pinned true. */
  val oracle: String =
    """SELECT 'hll_users' AS variant, count(DISTINCT user_id)::BIGINT AS exact,
      |       true AS meets_bound FROM events
      |UNION ALL
      |SELECT 'hll_parts', count(DISTINCT l_partkey)::BIGINT, true FROM lineitem
      |UNION ALL
      |SELECT 'p50_value_e2',
      |  floor(quantile_cont(floor(value*100 + 0.5), 0.5) + 0.5)::BIGINT, true FROM events
      |UNION ALL
      |SELECT 'p99_value_e2',
      |  floor(quantile_cont(floor(value*100 + 0.5), 0.99) + 0.5)::BIGINT, true FROM events""".stripMargin
}
