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

    // r17: three 1-row aggregates crossJoined and STACKED into the four
    // gate rows — one lazy action, each aggregate's corpus lineage
    // planned exactly once (before, the users row and the two quantile
    // rows each selected from their own events aggregate and the lazy
    // union re-planned the corpus aggregate per branch: three event
    // scans). The distinct-count and percentile aggregates stay SEPARATE
    // on purpose: fusing countDistinct with percentile in one agg forces
    // an Expand that duplicates every event row per aggregate group
    // (measured 3x slower); and the 1-row aggregates stay LAZY on
    // purpose: collecting them as separate eager jobs traded the saved
    // scan for three job dispatches (also measured slower at gate
    // scale). Quantiles stay on the INTEGERIZED value (fx e2) so the
    // exact side is engine-portable: interpolation lands on .0/.5
    // exactly in doubles.
    val u = ev.agg(
      countDistinct(col("user_id")).cast("long").as("uexact"),
      approx_count_distinct(col("user_id"), 0.05).as("uapprox"))
    val q = ev.select(fx(col("value"), 2).cast("long").as("v"))
      .agg(
        expr("percentile(v, 0.5)").as("ex50"),
        expr("percentile(v, 0.99)").as("ex99"),
        expr("approx_percentile(v, 0.5, 10000)").as("ap50"),
        expr("approx_percentile(v, 0.99, 10000)").as("ap99"))
    val p = li.agg(
      countDistinct(col("l_partkey")).cast("long").as("pexact"),
      approx_count_distinct(col("l_partkey"), 0.05).as("papprox"))
    u.crossJoin(q).crossJoin(p).selectExpr(
      """stack(4,
        |  'hll_users', uexact, abs(uapprox - uexact) <= uexact * 0.10,
        |  'hll_parts', pexact, abs(papprox - pexact) <= pexact * 0.10,
        |  'p50_value_e2', cast(floor(ex50 + 0.5) as bigint),
        |    abs(ap50 - ex50) <= greatest(1.0D, ex50 * 0.01),
        |  'p99_value_e2', cast(floor(ex99 + 0.5) as bigint),
        |    abs(ap99 - ex99) <= greatest(1.0D, ex99 * 0.01)
        |) as (variant, exact, meets_bound)""".stripMargin)
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
    // r17: the stream length rides the sketch aggregate (one pass over
    // the persisted token stream instead of a separate count() job)
    val skRow = toks
      .agg(expr(s"count_min_sketch(t, CAST($eps AS DOUBLE), CAST(0.99 AS DOUBLE), 42)")
        .as("sk"), count(lit(1)).as("n"))
      .head()
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skRow.getAs[Array[Byte]](0)))
    val n = skRow.getLong(1)
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
