package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

/** SemDeDup — semantic deduplication by cluster-then-prune (Abbas et al.
  * 2023, arXiv 2303.09540): k-means the embedding space, build the
  * cosine >= threshold duplicate graph WITHIN each cluster only, take its
  * connected components as duplicate groups, and keep one deterministic
  * representative (min vec_id) per group.
  *
  * Scale shape: the pairwise stage is the whole point — candidates pair
  * only inside a cluster, so the quadratic term is bounded by the largest
  * cluster, never all-pairs over the corpus (the paper runs k ~ corpus /
  * target-cluster-size; k is the knob that caps the per-cluster square).
  * One shuffle keys the self-join on cluster id; cosines run through the
  * codegen'd [[graft.functions.DotProduct]]; groups come from the same
  * min-label propagation as n-gram dedup ([[Dedup.dupClusters]] — one
  * join + one min-agg per round over EDGES, not corpus).
  */
object SemDedup {

  /** Target members per cluster when k is auto-derived ([[semDedup]]'s
    * k=0): the paper's regime — k grows WITH the corpus so the per-cluster
    * quadratic term stays a constant ~TargetClusterSize² per cluster
    * instead of (n/k)² blowing up as n does. */
  val TargetClusterSize = 1000L

  /** Per-vector verdict: (vec_id, cluster, group_id, keep) — `group_id`
    * is the duplicate-group label (its minimum member id; singletons label
    * themselves), `keep` marks the group's surviving representative.
    * `k <= 0` auto-scales the cluster count to corpus size / [[TargetClusterSize]]
    * (min 16, capped at n) — the Abbas et al. knob as code, not prose. */
  def semDedup(emb: DataFrame, k: Int = 0, iters: Int = 3,
      thrE6: Long = 450000L): DataFrame =
    verdictsAndEdges(emb, k, iters, thrE6)._1

  private[llm] def verdictsAndEdges(emb: DataFrame, k0: Int, iters: Int,
      thrE6: Long): (DataFrame, DataFrame) = {
    val k = if (k0 > 0) k0 else {
      // one count over the (cached) vector view; the gate counts it anyway
      val n = Clustering.vectors(emb).count()
      math.max(1L, math.min(n, math.max(16L, n / TargetClusterSize))).toInt
    }
    val (asg, _) = Clustering.kmeans(emb, k, iters)
    val withC = Clustering.vectors(emb).join(asg, "vec_id")
      .withColumn("nrm", sqrt(VectorExpressions.dot_product(col("v"), col("v"))))
    val a = withC.select(col("cluster"), col("vec_id").as("ida"),
      col("v").as("va"), col("nrm").as("na"))
    val b = withC.select(col("cluster"), col("vec_id").as("idb"),
      col("v").as("vb"), col("nrm").as("nb"))
    // within-cluster upper-triangle pairs above the cosine threshold =
    // the duplicate graph's edges
    val edges = a.join(b, Seq("cluster")).where(col("ida") < col("idb"))
      // zero-norm guard: 0/0 cosine is NaN (long-cast 0), which would let
      // byte-identical all-zero vectors slip past dedup as "singletons" —
      // two zero vectors are defined as identical (cos 1e6); zero-vs-
      // nonzero has no direction to compare and stays unpaired
      .withColumn("cos_e6",
        when(col("na") > 0 && col("nb") > 0,
          floor(VectorExpressions.dot_product(col("va"), col("vb"))
            / (col("na") * col("nb")) * 1e6 + 0.5).cast("long"))
          .when(col("na") === 0 && col("nb") === 0, lit(1000000L))
          .otherwise(lit(Long.MinValue)))
      .filter(col("cos_e6") >= thrE6)
      .select(col("ida").as("doc_a"), col("idb").as("doc_b"))
      .persist()
    OpCaches.track("semdedup.edges", Seq(edges))
    val comp = Dedup.dupClusters(edges) // (doc_id, cluster_id, keep)
    val verdicts = withC.select(col("vec_id"), col("cluster"))
      .join(comp.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cluster"),
        // a vector with no duplicate edge is its own singleton group
        coalesce(col("cluster_id"), col("vec_id")).as("group_id"),
        coalesce(col("keep"), lit(true)).as("keep"))
    (verdicts, edges)
  }

  /** SemDeDup as gated DATA (the kmeans-gate pattern: the assignment is
    * deterministic in-engine but not bit-portable across engines, so the
    * oracle pins INVARIANTS rather than rows):
    *  - `partition`: every vector gets exactly one verdict;
    *  - `one_survivor_per_group`: each duplicate group keeps exactly one;
    *  - `dropped_are_duplicates`: every dropped vector sits on at least
    *    one over-threshold edge;
    *  - `survivors_separated`: no duplicate edge joins two survivors.
    */
  def gate(emb: DataFrame, k: Int = 0, iters: Int = 3,
      thrE6: Long = 450000L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (verdicts0, edges) = verdictsAndEdges(emb, k, iters, thrE6)
    val verdicts = verdicts0.persist()
    OpCaches.track("semdedup.verdicts", Seq(verdicts))
    // every check reduces to a 1-row aggregate over the persisted
    // verdicts/edges; cross-joining them runs the whole gate as ONE job
    // instead of five sub-second actions (per-action overhead dominated
    // the entry's cost — the aggregates themselves are tiny at any scale)
    val vAgg = verdicts
      .agg(count(lit(1)).as("n_verdicts"), countDistinct(col("vec_id")).as("n_distinct"))
    val tot = emb.select(col("vec_id")).distinct().agg(count(lit(1)).as("total"))
    val badGroups = verdicts.groupBy(col("group_id"))
      .agg(sum(col("keep").cast("long")).as("nk"))
      .filter(col("nk") =!= 1L).agg(count(lit(1)).as("bad_groups"))
    val dropped = verdicts.filter(!col("keep")).select(col("vec_id"))
    val edgeEnds = edges.select(col("doc_a").as("vec_id"))
      .union(edges.select(col("doc_b").as("vec_id"))).distinct()
    val stranded = dropped.join(edgeEnds, Seq("vec_id"), "left_anti")
      .agg(count(lit(1)).as("stranded"))
    val kept = verdicts.filter(col("keep")).select(col("vec_id"))
    val keptPairs = edges
      .join(kept.withColumnRenamed("vec_id", "doc_a"), Seq("doc_a"))
      .join(kept.withColumnRenamed("vec_id", "doc_b"), Seq("doc_b"))
      .agg(count(lit(1)).as("kept_pairs"))
    val r = vAgg.crossJoin(tot).crossJoin(badGroups).crossJoin(stranded)
      .crossJoin(keptPairs).head()
    val (nVerdicts, nDistinct, total) = (r.getLong(0), r.getLong(1), r.getLong(2))
    Seq(
      ("partition", nVerdicts == total && nDistinct == total),
      ("one_survivor_per_group", r.getLong(3) == 0L),
      ("dropped_are_duplicates", r.getLong(4) == 0L),
      ("survivors_separated", r.getLong(5) == 0L)
    ).toDF("check", "pass")
  }
}
