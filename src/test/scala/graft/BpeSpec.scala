package graft

import graft.llm.Bpe
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bpe: the classic corpus merges in the textbook order") {
    // Sennrich et al.'s running example; first merges hand-computed:
    // (e,s)=9 wins the 9-way tie lexicographically, then (es,t),
    // (est,</w>), then (l,o)=7 beats (o,w) on the left symbol
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "cnt")
    val m = Bpe.learn(words, numMerges = 4)
    assert(m == Seq(
      Bpe.Merge(1, "e", "s", 9), Bpe.Merge(2, "es", "t", 9),
      Bpe.Merge(3, "est", Bpe.EndMark, 9), Bpe.Merge(4, "l", "o", 7)))
  }

  test("bpe: merges apply left-to-right non-overlapping") {
    // "aaa" -> [a a a </w>]; (a,a) counts 2 but merges ONCE into [aa a </w>]
    val words = Seq(("aaa", 1L)).toDF("word", "cnt")
    val m = Bpe.learn(words, numMerges = 3)
    assert(m == Seq(
      Bpe.Merge(1, "a", "a", 2),
      Bpe.Merge(2, "a", Bpe.EndMark, 1), // count-1 tie: "a" < "aa"
      Bpe.Merge(3, "aa", "a" + Bpe.EndMark, 1)))
  }

  test("bpe: learner stops when the pair space exhausts") {
    val words = Seq(("ab", 3L)).toDF("word", "cnt")
    val m = Bpe.learn(words, numMerges = 10)
    // [a b </w>] -> ab -> ab</w> -> single symbol, nothing left to merge
    assert(m.length == 2 && m.map(x => (x.left, x.right)) ==
      Seq(("a", "b"), ("ab", Bpe.EndMark)))
  }

  test("bpe: distributed learner equals the naive reference on random corpora") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val alphabet = "abcd"
      val vocab = (0 until 30).map { _ =>
        val n = 1 + rnd.nextInt(6)
        (Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          (1 + rnd.nextInt(9)).toLong)
      }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toSeq
      val dist = Bpe.learn(vocab.toDF("word", "cnt"), numMerges = 8)
      val naive = Bpe.naiveLearn(vocab.toMap, numMerges = 8)
      assert(dist == naive, s"trial $trial: $dist != $naive")
    }
  }

  test("bpe segment: applies the rule list per word, counts subwords per doc") {
    val docs = Seq((1L, "aaa aaa"), (2L, "ab"), (3L, "")).toDF("doc_id", "text")
    val rules = Seq(Bpe.Merge(1, "a", "a", 0L))
    val out = Bpe.segment(docs, rules).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // "aaa" -> [aa, a, </w>] = 3 subwords; "ab" untouched -> [a, b, </w>]
    assert(out == Map(1L -> ((2L, 6L)), 2L -> ((1L, 3L))))
    // token-less docs produce no row (no tokens to segment)
    assert(!out.contains(3L))
  }

  test("bpe segment gate: every check true on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Bpe.segmentGate(docs).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(rows == Map("matches_naive" -> true, "bounds" -> true))
  }

  test("bpe gate: every row true on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = Bpe.gate(docs).collect().map(r => r.getLong(0) -> r.getBoolean(1))
    assert(rows.length == Bpe.NumMerges + 1)
    assert(rows.forall(_._2), s"gate rows must all match: ${rows.toSeq}")
  }

  test("bpe fertility: hand-computed per-lang ratios; merging lowers fertility") {
    // rules merge (a,a): "aaaa" -> [aa, aa, </w>] = 3 subwords, 4 chars
    val docs = Seq(
      (1L, "aaaa aaaa", "xx"), (2L, "bc", "xx"), // xx: 3 words, 10 chars
      (3L, "aaaa", "yy"), (4L, "", "yy")         // yy: empty doc drops
    ).toDF("doc_id", "text", "lang")
    val rules = Seq(Bpe.Merge(1, "a", "a", 0L))
    val out = Bpe.fertility(docs, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // xx: 2 docs; words aaaa,aaaa,bc; subwords 3+3+3=9; chars 4+4+2=10
    //   fert = 9e4 div 3 = 30000; chars/sub = 10e4 div 9 = 11111
    // yy: 1 doc; 1 word, 3 subwords, 4 chars; fert 30000, cps 13333
    assert(out == Map(
      "xx" -> ((2L, 3L, 9L, 30000L, 11111L)),
      "yy" -> ((1L, 1L, 3L, 30000L, 13333L))))
    // zero-merge fertility is strictly higher (chars+1 subwords per word)
    val noMerge = Bpe.fertility(docs, Seq.empty).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(noMerge("xx") > out("xx")._4 && noMerge("yy") > out("yy")._4)
  }

  test("bpe fertility gate: every lang row true on the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val l = Bpe.learnBoth(docs)
    val rows = Bpe.fertilityGate(docs, l.dist, l.naive).collect()
      .map(r => (r.getString(0), r.getBoolean(3)))
    assert(rows.nonEmpty && rows.forall(_._2),
      s"fertility gate rows must all match: ${rows.toSeq}")
  }
}
