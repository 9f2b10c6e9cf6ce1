package graft

import graft.llm.Repetition
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Repetition metrics and boilerplate mining on hand-built documents
  * with known token statistics.
  */
class RepetitionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("metrics: known fractions on crafted docs") {
    val docs = Seq(
      // "a b a b a b": 6 tokens, 2 distinct; bigrams (5): ab,ba,ab,ba,ab
      //   -> top bigram "a b" x3 / 5 = 0.6; dup = (5-2)/5 = 0.6
      (1L, "a b a b a b"),
      // all-unique tokens: distinct 1.0, every bigram unique
      (2L, "one two three four"),
      // single token: no bigrams -> zeros
      (3L, "solo"),
      // empty text -> all zeros
      (4L, "")
    ).toDF("doc_id", "text")

    val m = Repetition.metrics(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(m(1L) == ((6L, 3333L, 6000L, 6000L)))
    assert(m(2L) == ((4L, 10000L, 3333L, 0L)))
    assert(m(3L) == ((1L, 10000L, 0L, 0L)))
    assert(m(4L) == ((0L, 0L, 0L, 0L)))
  }

  test("boilerplate: shared 5-gram phrase ranks by df with phrase tie-break") {
    val template = "please do not reply to this"
    val docs = Seq(
      (1L, s"alpha beta $template gamma"),
      (2L, s"$template delta"),
      (3L, s"epsilon $template"),
      (4L, "completely different words entirely here now")
    ).toDF("doc_id", "text")

    val top = Repetition.boilerplate(docs, topK = 3).collect()
    // the two 5-grams inside the 6-token template appear in all 3 docs
    val df3 = top.takeWhile(_.getLong(1) == 3L).map(_.getString(0)).toSet
    assert(df3 == Set("please do not reply to", "do not reply to this"))
    assert(top(0).getString(0) < top(1).getString(0),
      "equal df must be phrase-ordered")
    assert(top(2).getLong(1) == 1L, "cut row comes from the df=1 band")
  }

  test("sorted_max_run_length skips interior nulls instead of throwing") {
    import graft.functions.VectorExpressions.sorted_max_run_length
    val out = Seq(Tuple1(Seq[String]("a", null, "a", "a", null, "b")))
      .toDF("xs")
      .select(sorted_max_run_length(col("xs")).as("m")).head.getLong(0)
    // nulls removed -> a,a,a,b -> run of 3
    assert(out == 3L)
  }

  test("gopherFilter: rule precedence and reasons on crafted docs") {
    val docs = Seq(
      (1L, "a b"),                                   // 2 tokens -> too_short
      (2L, "1234 5678 9012 3456 7890 1111"),         // digits -> low_alpha
      (3L, "a b a b a b a b a b"),                   // 2 distinct/10 -> low_diversity
      // diverse enough (6 distinct / 12 = 5000) but one bigram dominates:
      // "a b" appears 4x of 11 bigrams = 3636 -> repetitive
      (4L, "a b a b a b a b x y z w"),
      // 15 distinct tokens: diversity 1e4, top bigram 1/14 = 714 -> ok
      (5L, "the quick brown fox jumps over lazy dog near old red barn at dawn today")
    ).toDF("doc_id", "text")
    val out = Repetition.gopherFilter(docs).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(3), r.getString(4))).toMap
    assert(out(1L) == ((false, "too_short")))
    assert(out(2L) == ((false, "low_alpha")))
    assert(out(3L) == ((false, "low_diversity")))
    assert(out(4L) == ((false, "repetitive")))
    assert(out(5L) == ((true, "ok")))
  }

  test("gopherFilter plan: no exchange (per-row only)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Repetition.gopherFilter(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopherFilter must not shuffle:\n$plan")
  }

  test("metrics plan: no exchange (per-row only)") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Repetition.metrics(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"metrics must not shuffle:\n$plan")
  }
}
