package graft

import org.apache.spark.sql.SparkSession

/** Deterministic sf1 (fourth-decade) extrapolation of the driver's
  * synthetic tables, for SCALE gating only — never for the DuckDB
  * oracle gate, which runs exclusively on the driver-generated
  * `/root/testdata/sf*` decades (TESTDATA.md says those are the inputs;
  * this set exists because no sf1 decade ships and the rp-recall
  * precedent showed floors decay exactly one decade above their tuning
  * scale).
  *
  * Faithful to the measured sf0.1 distribution family (profiled
  * 2026-08-14): documents draw 10–100 words uniformly from the SAME
  * 31-word vocabulary with the same lang mixture (en .41 / zh .15 /
  * es .15 / fr .15 / de .14), 20 uniform sources, and a ~0.16% exact-dup
  * rate; embeddings are 64-dim unit-normalized isotropic Gaussians with
  * 10 uniform labels (the sf0.1 set measures cos-to-label-centroid
  * ≈ 0.07 — i.e. labels carry almost no direction signal, so isotropic
  * is the faithful model); events span 30 days with 5 uniform types,
  * e2-representable values in [0, 560.21] and `{"k": n}` props.
  *
  * Every row is a PURE function of its id (a per-id seeded LCG), so the
  * dataset is bit-identical regardless of partitioning, partition count
  * or re-runs — the generator is idempotent and the cached dir under
  * `.testdata/` (gitignored) self-heals by regeneration if deleted. */
object ScaleData {

  val Sf1Dir = ".testdata/sf1"

  val NumDocs = 50000L
  val NumVecs = 20000L
  val NumEvents = 1000000L

  private val Vocab = Vector("a", "agg", "batch", "big", "column",
    "customer", "data", "dup", "fast", "filter", "group", "hash", "join",
    "key", "line", "merge", "order", "part", "query", "row", "scan",
    "slow", "small", "sort", "spark", "stream", "table", "the", "value",
    "vector", "window")

  /** lang by cumulative e4 weight — matches the sf0.1 mixture. */
  private def langOf(u: Int): String =
    if (u < 4118) "en" else if (u < 5624) "zh" else if (u < 7112) "es"
    else if (u < 8596) "fr" else "de"

  private def rndFor(id: Long, salt: Long): scala.util.Random =
    new scala.util.Random(id * 2654435761L + salt)

  /** Pure text for doc `id` — exact-dup docs copy the text of `id − 1`
    * by recomputing it (no cross-row dependency in the generator). */
  private def textFor(id: Long): String = {
    val base = if (id > 0 && id % 617L == 0L) id - 1 else id
    val rnd = rndFor(base, 42L)
    val nw = 10 + rnd.nextInt(91)
    (0 until nw).map(_ => Vocab(rnd.nextInt(Vocab.length))).mkString(" ")
  }

  /** Generate (idempotently) and return the sf1 dir. */
  def ensure(spark: SparkSession): String = {
    val dir = new java.io.File(Sf1Dir).getAbsolutePath
    val done = new java.io.File(dir, "_GENERATED")
    if (done.exists()) return dir
    import spark.implicits._

    spark.range(0L, NumDocs, 1L, 32).map { id =>
      val text = textFor(id)
      val rnd = rndFor(id, 7L)
      (id, text, langOf(rnd.nextInt(10000)), s"src${rnd.nextInt(20)}",
        text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    spark.range(0L, NumVecs, 1L, 32).map { id =>
      val rnd = rndFor(id, 13L)
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x / n).toFloat), rnd.nextInt(10))
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val baseMicros = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime * 1000L
    val spanMicros = 30L * 24 * 3600 * 1000000L
    spark.range(0L, NumEvents, 1L, 32).map { id =>
      val rnd = rndFor(id, 23L)
      val ts = new java.sql.Timestamp(0L)
      val micros = baseMicros + math.abs(rnd.nextLong() % spanMicros)
      ts.setTime(micros / 1000L)
      ts.setNanos(((micros % 1000000L) * 1000L).toInt)
      val et = Vector("click", "error", "purchase", "signup", "view")(
        rnd.nextInt(5))
      (id, ts, rnd.nextInt(15000).toLong, et,
        rnd.nextInt(56022) / 100.0, s"""{"k": ${rnd.nextInt(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    done.createNewFile()
    dir
  }
}
