package graft

import graft.llm.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crossover probe for the exact-embed dispatcher (round-15 directive
  * 6): every committed gate forces the blocked path with TOY blocks
  * (256 KB / 16 KB) on corpora that fit the broadcast kernel, so the
  * broadcast-vs-blocked decision at the PRODUCTION bound
  * ([[Similarity.ExactEmbedBroadcastMaxBytes]] = 64 MB, 64 MB blocks)
  * was an estimate. This probe builds a deterministic above-the-bound
  * corpus (default 300k unit vectors at d=64 → 76.8 MB raw float32,
  * the first decade past the bound; same isotropic-Gaussian family as
  * ScaleData) and measures, on an otherwise-quiet host:
  *
  *   - the single-broadcast kernel FORCED above its bound
  *     (broadcastMaxBytes = MaxValue);
  *   - the production dispatch (defaults: corpus > 64 MB → blocked
  *     cross join with 64 MB blocks — 2 blocks here);
  *
  * asserting both return the identical pair set (count + order-free
  * checksum, compared DISTRIBUTED — ~4.5×10¹⁰ candidate pairs never
  * reach the driver) and printing one JSON line with the wall times.
  * The ratio calibrates ExactEmbedBroadcastMaxBytes: if blocked ≈
  * broadcast at 1.2× the bound, the bound is safe to keep (the blocked
  * path costs little even right at the switch); a large ratio would
  * argue for raising it.
  *
  * `sbt "Test/runMain graft.EmbedBlockProbe [nVecs | <dir>]"` — a
  * numeric arg sizes the synthetic corpus; a path arg (e.g.
  * `.testdata/sf10`) probes that decade's real embeddings table (51 MB
  * at sf10 — under the bound, so there the roles flip: production
  * dispatch = broadcast, the forced path = blocked). */
object EmbedBlockProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("embed-block-probe").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "32g")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try run(spark, args.headOption.getOrElse("300000")) finally spark.stop()
  }

  private def run(spark: SparkSession, arg: String): Unit = {
    import spark.implicits._
    val emb = (arg.toIntOption match {
      case Some(n) =>
        spark.range(0L, n.toLong, 1L, 32).map { id =>
          val rnd = new scala.util.Random(id * 2654435761L + 13L)
          val v = Array.fill(64)(rnd.nextGaussian())
          val nn = math.sqrt(v.map(x => x * x).sum)
          (id, v.map(x => (x / nn).toFloat))
        }.toDF("vec_id", "embedding")
      case None =>
        spark.read.parquet(s"$arg/embeddings.parquet")
          .select("vec_id", "embedding")
    }).persist()
    val rows = emb.count()
    val corpusMb = rows * 64 * 4 / 1e6

    // order-free distributed fingerprint of a pair set — bit_xor, not
    // sum: xxhash64 values are uniform longs and a sum overflows under
    // ANSI mode past ~1e4 rows (this is why the r15 probe run never
    // produced numbers); xor is order-free and cannot overflow
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.select(xxhash64(col("vec_a"), col("vec_b"), col("score_r")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def timed(df: => DataFrame): (Double, (Long, Long)) = {
      val t0 = System.nanoTime()
      val fp = fingerprint(df)
      ((System.nanoTime() - t0) / 1e9, fp)
    }

    // production dispatch first (cold-file effects hit both equally: the
    // corpus is persisted and counted above), then BOTH paths forced —
    // broadcastMaxBytes=MaxValue forces the single-broadcast kernel,
    // =0 forces the blocked cross join with production 64 MB blocks
    val (dispatchSec, fpDispatch) = timed(
      Similarity.embeddingNearDupExact(emb))
    val (blockedSec, fpBlocked) = timed(
      Similarity.embeddingNearDupExact(emb, broadcastMaxBytes = 0L))
    val (bcastSec, fpBcast) = timed(
      Similarity.embeddingNearDupExact(emb, broadcastMaxBytes = Long.MaxValue))
    require(fpBlocked == fpBcast && fpDispatch == fpBcast,
      s"paths diverged: dispatch=$fpDispatch blocked=$fpBlocked broadcast=$fpBcast")

    println(f"""{"probe":"embed_block_crossover","n_vecs":$rows,""" +
      f""""corpus_mb":$corpusMb%.1f,"pairs_found":${fpBlocked._1},""" +
      f""""dispatch_sec":$dispatchSec%.1f,""" +
      f""""blocked_sec":$blockedSec%.1f,"broadcast_sec":$bcastSec%.1f,""" +
      f""""blocked_over_broadcast":${blockedSec / math.max(0.001, bcastSec)}%.2f}""")
  }
}
