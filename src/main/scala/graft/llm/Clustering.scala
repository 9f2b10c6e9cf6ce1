package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's) over an embedding column — corpus
  * clustering for training-data balancing, dedup bucketing, and IVF-style
  * coarse quantization.
  *
  * Scale shape per iteration: the centroid table is k×dim doubles —
  * always driver/broadcast-sized (that is the point of k-means) — so
  * ASSIGNMENT is a pure broadcast map over the corpus (no shuffle, stays
  * in one stage), and the UPDATE is one explode + (cluster, dim)
  * aggregation whose map-side partial combine reduces every partition to
  * at most k·dim rows before the (tiny, skew-free) shuffle. Nothing ever
  * shuffles the corpus itself.
  *
  * Determinism: seeds are the k smallest vec_ids (re-run-stable, no
  * rand()); double summation order across partitions is not bit-stable,
  * so results are gated by Lloyd-invariant checks (inertia monotonicity,
  * improvement floors) rather than value hashes — the clustering
  * equivalent of the ANN recall floors.
  */
object Clustering {

  /** Squared L2 distance between two double-array columns (codegen'd HOF
    * chain — fine off the hot path; assignment uses the same form). */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Embeddings → (vec_id, v: array<double>). */
  def vectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").cast("long").as("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  /** One Lloyd assignment pass against broadcast centroids: returns
    * (vec_id, v, cluster, d2). `centroids(c)` = centroid vector. */
  def assign(vecs: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cdf = centroids.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("cluster", "cv")
    // min_by over the k distances, evaluated against the broadcast side
    vecs.crossJoin(broadcast(cdf))
      .select(col("vec_id"), col("v"), col("cluster"),
        sqDist(col("v"), col("cv")).as("d2"))
      .groupBy(col("vec_id"))
      .agg(min_by(struct(col("cluster"), col("d2"), col("v")), col("d2"))
        .as("best"))
      .select(col("vec_id"), col("best.v").as("v"),
        col("best.cluster").as("cluster"), col("best.d2").as("d2"))
  }

  /** Centroid update: per-(cluster, dim) mean via explode — map-side
    * combine caps the shuffle at k·dim rows per partition. Collected to
    * the driver (k×dim doubles: model parameters). */
  def updateCentroids(assigned: DataFrame, k: Int, dim: Int,
      prev: Array[Array[Double]]): Array[Array[Double]] = {
    val sums = assigned
      .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim").agg(avg("x").as("m"))
      .collect()
    // a cluster that lost every member keeps its previous position (the
    // standard Lloyd's empty-cluster rule that preserves monotonicity)
    val cs = prev.map(_.clone())
    sums.foreach(r => cs(r.getLong(0).toInt)(r.getInt(1)) = r.getDouble(2))
    cs
  }

  /** Full Lloyd's run: k smallest vec_ids seed, `iters` fixed passes.
    * Returns (assignment DataFrame, per-iteration total inertia). */
  def kmeans(emb: DataFrame, k: Int, iters: Int): (DataFrame, Seq[Double]) = {
    val vecs = vectors(emb).cache()
    OpCaches.track("clustering.vecs", Seq(vecs))
    val dim = vecs.select(size(col("v"))).head().getInt(0)
    var centroids = vecs.orderBy("vec_id").limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    val inertias = scala.collection.mutable.ArrayBuffer.empty[Double]
    var assigned: DataFrame = null
    (0 until iters).foreach { _ =>
      assigned = assign(vecs, centroids)
      val it = assigned.agg(sum("d2")).head().getDouble(0)
      inertias += it
      centroids = updateCentroids(assigned, k, dim, centroids)
    }
    (assigned.select(col("vec_id"), col("cluster")), inertias.toSeq)
  }
}
