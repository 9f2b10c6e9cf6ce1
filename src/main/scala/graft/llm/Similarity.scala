package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast, so
  *    the candidate side streams once with NO shuffle of the big table —
  *    this is the correctness baseline and also the right plan whenever the
  *    query set is small (the common "retrieve for this batch" case).
  *  - [[lshTopK]]: random-hyperplane (sign) LSH with Hamming-1 multi-probe.
  *    Candidates shuffle only on the small bucket id; at 100 TB this turns
  *    the full scan per query into a handful of bucket lookups, trading
  *    recall (verified in SimilaritySpec) for a ~bucket-count speedup.
  *
  * All scores are computed in double and integerized (×1e6, round) so
  * results are engine-portable and order-deterministic.
  */
object Similarity {

  /** Sum of element-wise products, computed in double, left-to-right. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Exact top-k cosine neighbours for the query vectors `vec_id <
    * numQueries` (self excluded). Returns (qid, nid, score_r, rank). */
  def bruteForceTopK(emb: DataFrame, numQueries: Int = 10, k: Int = 5): DataFrame = {
    val withNorm = emb.select(
      col("vec_id").cast("long").as("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    val q = withNorm.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qn"))
    val c = withNorm
      .select(col("vec_id").as("nid"), col("embedding").as("nv"), col("nrm").as("nn"))
    val scoreR = floor(dot(col("qv"), col("nv")) / (col("qn") * col("nn")) * 1e6 + 0.5)
      .cast("long")
    val w = Window.partitionBy("qid").orderBy(col("score_r").desc, col("nid").asc)
    c.crossJoin(broadcast(q)).where(col("qid") =!= col("nid"))
      .withColumn("score_r", scoreR)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("score_r"), col("rank").cast("long").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (vec_a < vec_b) with rounded
    * score ≥ `minScoreR` (1e6-scaled — thresholding on the integerized
    * score keeps engines bit-agreed at the boundary).
    *
    * Exact all-pairs: the normalized corpus is broadcast and each
    * partition scores its rows against it with a primitive double loop —
    * a non-equi pairwise join has no hash/codegen path in Spark
    * (BroadcastNestedLoopJoin evaluates interpreted; measured 10-30x
    * slower than this kernel). The broadcast side must fit in executor
    * memory, which is inherent to EXACT all-pairs; at corpus scale
    * candidates come from the sign-LSH bucketing of [[lshTopK]] before
    * this exact verification. Summation order matches the SQL oracle
    * (left-to-right in array order), so scores are bit-identical. */
  def embeddingNearDup(emb: DataFrame, minScoreR: Long = 450000L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ds = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
    val all = ds.collect().map { case (id, v) =>
      val d = v.map(_.toDouble)
      var n = 0.0
      var i = 0
      while (i < d.length) { n += d(i) * d(i); i += 1 }
      (id, d, math.sqrt(n))
    }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(all)
    ds.mapPartitions { it =>
      it.flatMap { case (ida, va0) =>
        val va = va0.map(_.toDouble)
        var na = 0.0
        var i = 0
        while (i < va.length) { na += va(i) * va(i); i += 1 }
        na = math.sqrt(na)
        bc.value.iterator.filter(_._1 > ida).flatMap { case (idb, vb, nb) =>
          var s = 0.0
          var j = 0
          while (j < va.length) { s += va(j) * vb(j); j += 1 }
          val r = math.floor(s / (na * nb) * 1e6 + 0.5).toLong
          if (r >= minScoreR) Some((ida, idb, r)) else None
        }
      }
    }.toDF("vec_a", "vec_b", "score_r")
  }

  /** Deterministic random hyperplanes (seeded JVM LCG — stable across
    * runs/platforms). */
  def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def bucketOf(v: Column, ps: Array[Array[Double]]): Column =
    ps.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      when(dot(v, planeLit) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: sign-LSH bucketing with multi-probe (all buckets
    * within Hamming distance `maxProbeHamming` of the query's bucket), exact
    * cosine ranking within the probed buckets. May return fewer than k rows
    * per query (standard ANN recall trade-off). Defaults tuned on the
    * synthetic embeddings (near-uniform directions — LSH's hard case):
    * 4 planes / Hamming≤2 ≈ 0.8 recall@5 (see LlmSpec). */
  def lshTopK(emb: DataFrame, numQueries: Int = 10, k: Int = 5,
      numPlanes: Int = 4, maxProbeHamming: Int = 2, seed: Long = 42L): DataFrame = {
    val dim = 64
    val ps = planes(numPlanes, dim, seed)
    val withB = emb.select(
      col("vec_id").cast("long").as("vec_id"), col("embedding"),
      norm(col("embedding")).as("nrm"), bucketOf(col("embedding"), ps).as("bucket"))

    // query side probes every bucket within the Hamming radius
    val masks: Seq[Long] = (0 until (1 << numPlanes)).map(_.toLong)
      .filter(m => java.lang.Long.bitCount(m) <= maxProbeHamming)
    val probes = array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)
    val q = withB.where(col("vec_id") < numQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nrm").as("qn"),
        explode(probes).as("bucket"))
    val cand = withB
      .select(col("vec_id").as("nid"), col("embedding").as("nv"), col("nrm").as("nn"),
        col("bucket"))
    val scoreR = floor(dot(col("qv"), col("nv")) / (col("qn") * col("nn")) * 1e6 + 0.5)
      .cast("long")
    val w = Window.partitionBy("qid").orderBy(col("score_r").desc, col("nid").asc)
    cand.join(broadcast(q), "bucket").where(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), col("qv"), col("nv"), col("qn"), col("nn"))
      .distinct() // a neighbour can land in several probed buckets
      .withColumn("score_r", scoreR)
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid"), col("nid"), col("score_r"), col("rank").cast("long").as("rank"))
  }
}
