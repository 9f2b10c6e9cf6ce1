package graft

import graft.llm.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regime-dispatcher boundary soak (round-16 directive 5): the ngram
  * dedup dispatcher switches plans at EXACTLY
  * [[Dedup.NgramBitsetMaxVocab]] = 4096 distinct grams, and the exact
  * embed dispatcher at EXACTLY [[Similarity.ExactEmbedBroadcastMaxBytes]]
  * = 64 MB of raw float32. Both dispatches are argued hash-invariant by
  * construction (identical threshold arithmetic on either side); this
  * spec builds corpora straddling each boundary — 4095 / 4096 / 4097
  * grams, one-vector-under / at / one-vector-over 64 MB — and asserts
  * pair-set identity across the switch under the REAL plans, so an
  * off-by-one in the probe, a divergent rounding in one kernel, or a
  * block-cut bug at blocks=2 shows up here instead of in a campaign.
  */
class DispatchBoundarySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- ngram: corpus with EXACTLY `vocab` distinct bigrams -----------
  // 20 planted near-dup pairs ("p q r s" vs "p q r t": J = 2/4 = 0.5,
  // right AT the threshold) over pair-unique tokens = 80 grams, plus
  // (vocab - 80) two-token padding docs contributing one unique gram
  // each. Doc ids interleave so id-range bitset blocks mix both kinds.
  private def ngramCorpus(vocab: Int): DataFrame = {
    val core = (0 until 20).flatMap { i =>
      Seq((2L * i, s"p$i q$i r$i s$i"), (2L * i + 1, s"p$i q$i r$i t$i"))
    }
    val pad = (0 until (vocab - 80)).map { j =>
      (1000L + j, s"u${j}a u${j}b")
    }
    (core ++ pad).toDF("doc_id", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def distinctGrams(docs: DataFrame): Array[String] =
    Dedup.shingleState(docs, 2).select(explode(col("sh")).as("g"))
      .distinct().orderBy(col("g")).collect().map(_.getString(0))

  test("ngram dispatch boundary: bitset and prefix plans agree at 4095/4096/4097 grams") {
    val expected = (0 until 20).map(i => (2L * i, 2L * i + 1, 5000L)).toSet
    for (vocab <- Seq(4095, 4096, 4097)) {
      val docs = ngramCorpus(vocab)
      val grams = distinctGrams(docs)
      assert(grams.length == vocab, s"corpus construction drifted: $vocab")
      // the dispatched plan (bitset at 4095/4096, prefix at 4097) ...
      val dispatched = pairSet(Dedup.ngramJaccard(docs, n = 2, threshold = 0.5))
      // ... vs the OTHER side of the switch, forced
      val prefix = pairSet(Dedup.ngramJaccardViaPrefix(docs, n = 2, threshold = 0.5))
      val bitset = pairSet(Dedup.ngramJaccardBitset(
        Dedup.shingleState(docs, 2), grams, 0.5))
      assert(dispatched == expected, s"vocab=$vocab dispatched plan wrong")
      assert(prefix == expected, s"vocab=$vocab prefix plan diverged")
      assert(bitset == expected, s"vocab=$vocab bitset kernel diverged")
    }
  }

  // --- exact embed: corpus straddling 64 MB by ONE d=4096 vector -----
  // 64 MB / (4096 dims * 4 B) = exactly 4096 vectors, so n = 4095 /
  // 4096 / 4097 is under / at / one-vector-over the broadcast bound
  // (dispatch keeps broadcast at <=, goes blocked above — 2 real 64 MB
  // blocks at 4097). Unit gaussians with every id % 64 == 1 vector a
  // 0.98-cosine noisy copy of id-1; random cross cosines at d=4096
  // concentrate within ~0.1, far under the 0.45 threshold.
  private def embedCorpus(n: Int): DataFrame = {
    spark.range(0L, n.toLong, 1L, 32).map { id =>
      def unit(seed: Long): Array[Double] = {
        val rnd = new scala.util.Random(seed * 2654435761L + 17L)
        val v = Array.fill(4096)(rnd.nextGaussian())
        val nn = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / nn)
      }
      val v =
        if (id % 64 == 1) {
          val base = unit(id - 1)
          val rnd = new scala.util.Random(id * 7919L + 3L)
          val noisy = base.map(x => x + 0.2 * rnd.nextGaussian() / 64.0)
          val nn = math.sqrt(noisy.map(x => x * x).sum)
          noisy.map(_ / nn)
        } else unit(id)
      (id, v.map(_.toFloat))
    }.toDF("vec_id", "embedding")
  }

  private def embedTriples(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("vec_a", "vec_b", "score_r").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("embed dispatch boundary: broadcast and blocked plans agree one vector either side of 64 MB") {
    for (n <- Seq(4095, 4096, 4097)) {
      val emb = embedCorpus(n).persist()
      val expected = (1L until n.toLong by 64L).map(i => (i - 1, i)).toSet
      val dispatched = embedTriples(Similarity.embeddingNearDupExact(emb))
      // force the OTHER side of the switch: blocked under the bound
      // (broadcastMaxBytes = 0 -> 2 real 64 MB blocks), broadcast over it
      val other = embedTriples(
        if (n <= 4096) Similarity.embeddingNearDupExact(emb, broadcastMaxBytes = 0L)
        else Similarity.embeddingNearDupExact(emb, broadcastMaxBytes = Long.MaxValue))
      assert(dispatched == other,
        s"n=$n: the two sides of the 64 MB switch diverged (scores included)")
      assert(dispatched.map(t => (t._1, t._2)) == expected,
        s"n=$n dispatched plan missed/invented pairs")
      emb.unpersist()
    }
  }
}
