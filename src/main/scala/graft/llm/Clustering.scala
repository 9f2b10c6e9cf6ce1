package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions

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

  /** Squared L2 distance between two double-array columns — the native
    * [[graft.functions.SquaredDistance]] expression (primitive loop,
    * codegen'd): the HOF `aggregate(zip_with(...))` form it replaces
    * evaluates interpreted (two lambda frames per element) and sat in the
    * k×corpus×iterations assignment hot path. Null/length semantics are
    * identical (VectorExpressionsSpec bit-locks the swap). */
  private def sqDist(a: Column, b: Column): Column =
    VectorExpressions.squared_distance(a, b)

  /** Embeddings → (vec_id, v: array<double>). */
  def vectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id").cast("long").as("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  /** One Lloyd assignment pass: a PURE PROJECTION — the centroid table
    * rides into the plan as a literal k×dim array, each row computes its
    * k distances and takes the argmin in place. No join, no shuffle, no
    * k-fold row blowup; the stage fuses with whatever reads the corpus.
    * (Ties take the lowest cluster index — array_position finds the
    * first exact occurrence of the minimum.) */
  def assign(vecs: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val cArr = typedLit(centroids.map(_.toSeq).toSeq)
    vecs
      .withColumn("dists", transform(cArr, c => sqDist(col("v"), c)))
      .withColumn("d2", array_min(col("dists")))
      .withColumn("cluster",
        (array_position(col("dists"), col("d2")) - 1).cast("long"))
      .select(col("vec_id"), col("v"), col("cluster"), col("d2"))
  }

  /** Centroid update: per-(cluster, dim) mean via explode — map-side
    * combine caps the shuffle at k·dim rows per partition. Collected to
    * the driver (k×dim doubles: model parameters). */
  def updateCentroids(assigned: DataFrame, k: Int, dim: Int,
      prev: Array[Array[Double]]): (Array[Array[Double]], Double) = {
    // the iteration's total inertia rides the SAME aggregate (each
    // member's d2 is repeated once per dim row, so divide the grand sum
    // by dim) — one Spark action per Lloyd iteration, not two
    val sums = assigned
      .select(col("cluster"), col("d2"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy("cluster", "dim").agg(avg("x").as("m"), sum("d2").as("sd2"))
      .collect()
    // a cluster that lost every member keeps its previous position (the
    // standard Lloyd's empty-cluster rule that preserves monotonicity)
    val cs = prev.map(_.clone())
    var d2Sum = 0.0
    sums.foreach { r =>
      cs(r.getLong(0).toInt)(r.getInt(1)) = r.getDouble(2)
      d2Sum += r.getDouble(3)
    }
    (cs, d2Sum / dim)
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
      val (cs, inertia) = updateCentroids(assigned, k, dim, centroids)
      inertias += inertia
      centroids = cs
    }
    (assigned.select(col("vec_id"), col("cluster")), inertias.toSeq)
  }
}
