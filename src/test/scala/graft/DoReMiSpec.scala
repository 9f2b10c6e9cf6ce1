package graft

import graft.llm.{DoReMi, Mining}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DoReMi domain reweighting: the source with more learnable sequential
  * structure (bigram model beats unigram model by more) must take the
  * larger mixture weight, and the integer softmax must account for
  * (nearly) the whole e6 budget. */
class DoReMiSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsi", "zeta")
    // "ord": one fixed phrase repeated — bigrams are maximally predictable
    val ord = (0 until 40).map { i =>
      (i.toLong, Seq.fill(12)("alpha beta gamma delta").mkString(" "), "ord")
    }
    // "rnd": same unigram material, shuffled — bigrams carry ~no signal
    val shuf = (0 until 40).map { i =>
      (100L + i, Seq.fill(48)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "rnd")
    }
    (ord ++ shuf).toDF("doc_id", "text", "source")
  }

  test("structured source outweighs shuffled source; shares fill the e6 budget") {
    val docs = corpus
    val out = DoReMi.domainWeights(docs, Mining.gramCounts(docs))
      .collect().map(r => (r.getString(0),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out.keySet == Set("ord", "rnd"))
    val (uniO, biO, exO, wO) = out("ord")
    val (_, _, exR, wR) = out("rnd")
    // the structured source has real reducible loss, the shuffled one ~none
    assert(exO > 0L, s"ord excess must be positive, got $exO")
    assert(exO > exR, s"ord ($exO) must exceed rnd ($exR)")
    assert(biO < uniO)
    assert(wO > wR, s"ord weight $wO must exceed rnd $wR")
    // integer softmax: shares sum to 1e6 minus per-source floor rounding
    val total = wO + wR
    assert(total <= 1000000L && total > 1000000L - 2, s"shares sum $total")
    // and the gap is material, not a rounding artifact (ord's phrase
    // structure is worth >0.3 nats of reducible loss on this fixture)
    assert(exO > 300000L, s"fixture lost its signal: excess $exO")
  }

  test("a single-source corpus takes the whole budget") {
    val docs = (0 until 10).map(i => (i.toLong, "alpha beta alpha beta", "only"))
      .toDF("doc_id", "text", "source")
    val out = DoReMi.domainWeights(docs, Mining.gramCounts(docs)).collect()
    assert(out.length == 1 && out.head.getLong(5) == 1000000L)
  }
}
