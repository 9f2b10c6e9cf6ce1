package graft

import graft.llm.Clustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd-invariant tests for the distributed k-means on sf0.001. */
class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("inertia is monotone non-increasing and improves substantially") {
    val (_, inertias) = Clustering.kmeans(emb, k = 8, iters = 4)
    assert(inertias.length == 4)
    inertias.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a * (1 + 1e-9), s"inertia rose: $inertias")
      case _         => ()
    }
    assert(1.0 - inertias.last / inertias.head > 0.1,
      s"expected >10% improvement: $inertias")
  }

  test("assignment is a partition: every vector gets exactly one cluster in range") {
    val (asg, _) = Clustering.kmeans(emb, k = 8, iters = 2)
    val a = asg.cache()
    assert(a.count() == emb.count())
    assert(a.select("vec_id").distinct().count() == emb.count())
    assert(a.agg(min("cluster"), max("cluster")).head() match {
      case r => r.getLong(0) >= 0L && r.getLong(1) < 8L
    })
  }

  test("each point's assigned centroid is its nearest (local re-check)") {
    val vecs = Clustering.vectors(emb.limit(50)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val seeds = vecs.toSeq.sortBy(_._1).take(4).map(_._2).toArray
    val asg = Clustering.assign(Clustering.vectors(emb.limit(50)), seeds)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    asg.foreach { case (id, c, d) =>
      val dists = seeds.map(s => d2(vecs(id), s))
      assert(math.abs(dists.min - d) < 1e-6 * (1 + d),
        s"vec $id: reported $d, local min ${dists.min}")
      assert(math.abs(dists(c.toInt) - dists.min) < 1e-9 * (1 + dists.min))
    }
  }
}
