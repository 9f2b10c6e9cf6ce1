package graft

import graft.llm.{Curation, Dsir}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioural tests of the DSIR importance-resampling selector and the
  * curriculum ordering (DuckDB hash parity is pinned by the driver gate;
  * these pin semantics, the scale-shape plan properties, and a naive
  * driver-side reference).
  */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))

  test("dsir: raw docs sharing the target vocabulary outrank the rest") {
    // target talks about apples; half the raw docs do too, half don't
    val target = (0L until 8L).map(i =>
      (i, "apple orchard ripe apple harvest sweet apple cider", Dsir.TargetSource))
    val rawLike = (100L until 108L).map(i =>
      (i, "apple harvest brings ripe apple cider to the orchard", "web"))
    val rawUnlike = (200L until 208L).map(i =>
      (i, "carburetor gasket torque spec flange bolt thread pitch", "web"))
    val out = Dsir.select(mkDocs(target ++ rawLike ++ rawUnlike))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // every apple-doc must rank strictly above every carburetor-doc
    val rankOf = out.map { case (rank, id, _) => id -> rank }.toMap
    for (a <- 100L until 108L; b <- 200L until 208L)
      assert(rankOf(a) < rankOf(b),
        s"target-like doc $a must outrank unlike doc $b")
    // target docs are never candidates
    assert(out.forall { case (_, id, _) => id >= 100L })
    // every like's weight strictly exceeds every unlike's (sign itself is
    // not guaranteed: the likes are part of the raw distribution too)
    val w = out.map { case (_, id, wt) => id -> wt }.toMap
    for (a <- 100L until 108L; b <- 200L until 208L)
      assert(w(a) > w(b))
  }

  test("dsir: weights match a naive driver-side reference") {
    def hash15(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def slog2(num: Long, den: Long): Long =
      if (num >= den) graft.functions.Log2Fix.eval(num, den)
      else -graft.functions.Log2Fix.eval(den, num)
    def feats(text: String): Seq[Long] = {
      val w = text.toLowerCase.split("\\W+").filterNot(_.isEmpty).toSeq
      (w ++ w.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
        .map(g => hash15(g) % Dsir.Buckets)
    }
    val rnd = new scala.util.Random(23)
    val vocab = Vector("sun", "moon", "tide", "rock", "fern", "mist", "owl")
    val rows = (0L until 40L).map { i =>
      val n = 1 + rnd.nextInt(12)
      val text = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i, text, if (i % 5 == 0) Dsir.TargetSource else "web")
    } :+ ((99L, "", "web")) // empty doc: no features, never a candidate
    val cp = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cq = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    rows.foreach { case (_, t, s) =>
      val tgt = s == Dsir.TargetSource
      feats(t).foreach(b => if (tgt) cp(b) += 1 else cq(b) += 1)
    }
    val (tp, tq) = (cp.values.sum, cq.values.sum)
    val cnst = slog2(tq + Dsir.Buckets, tp + Dsir.Buckets)
    val want = rows.filter(r => r._3 != Dsir.TargetSource && feats(r._2).nonEmpty)
      .map { case (id, t, _) =>
        id -> feats(t).map(b => slog2(cp(b) + 1, cq(b) + 1) + cnst).sum
      }.toMap
    val got = Dsir.select(mkDocs(rows))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == want, s"got=$got want=$want")
    assert(!got.contains(99L), "empty docs carry no evidence")
  }

  test("dsir: the lr join broadcasts and the plan has no sort-merge join") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Dsir.select(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the B-sized lr table must broadcast into the feature stream")
    assert(!plan.contains("SortMergeJoin"),
      "nothing in the DSIR plan may shuffle-join the corpus")
    assert(plan.contains("TakeOrderedAndProject"),
      "the top-k must be per-partition heaps, not a global sort")
  }

  test("curriculum: matches the per-bucket window reference, interleaves round-robin") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Curation.curriculum(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference: the plain G-ary window the operator avoids at scale
    val want = Curation.qualityScore(docs)
      .select(col("doc_id"),
        when(col("score_per_tok_e4") >= Curation.CurriculumHighE4, 0L)
          .when(col("score_per_tok_e4") >= Curation.CurriculumLowE4, 1L)
          .otherwise(2L).as("bucket"),
        conv(substring(md5(concat(lit("curr:"), col("doc_id").cast("string"))),
          1, 15), 16, 10).cast("long").as("sk"))
      .withColumn("brank", row_number().over(
        Window.partitionBy("bucket").orderBy(col("sk"), col("doc_id")))
        .cast("long") - 1L)
      .select(col("doc_id"), col("bucket"), col("brank"),
        (col("brank") * Curation.CurriculumBuckets + col("bucket")).as("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == want.toSet)
    // positions are globally unique (a total training order)
    assert(got.map(_._4).distinct.length == got.length)
    // round-robin: sort by pos, then within any leading window where all
    // buckets are still live, consecutive positions cycle bucket ids
    val byPos = got.sortBy(_._4)
    val counts = (0L until Curation.CurriculumBuckets.toLong).map(b =>
      got.count(_._2 == b)).toArray
    assert(counts.forall(_ > 0),
      s"cuts must split the corpus into three live buckets, got ${counts.toSeq}")
    val fullRounds = counts.min
    byPos.take(fullRounds * Curation.CurriculumBuckets).zipWithIndex.foreach {
      case ((_, bucket, _, _), i) =>
        assert(bucket == i % Curation.CurriculumBuckets,
          s"position $i must come from bucket ${i % Curation.CurriculumBuckets}")
    }
    // deterministic across runs
    val again = Curation.curriculum(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet == got.toSet)
  }
}
