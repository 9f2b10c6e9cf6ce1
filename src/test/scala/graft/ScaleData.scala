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

  // sf1 base counts; [[ensure]] multiplies by its `scale` (sf10 = 10)
  val NumDocs = 50000L
  val NumVecs = 20000L
  val NumEvents = 1000000L
  // TPC-H-ish decade extrapolation (10× the sf0.1 row counts; region and
  // nation are fixed-size dims at every sf, like the driver's set)
  val NumCust = 150000L
  val NumSupp = 10000L
  val NumPart = 200000L
  val NumOrders = 1500000L
  val NumLineitem = 6000000L
  // entity cardinality that scales with the decade like the row counts
  // (the sf0.1→sf1 extrapolation implied 1.5k→15k users)
  val NumUsers = 15000L

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

  /** Pure text for doc `id` — no cross-row dependency: every override
    * recomputes its source text (bounded recursion, depth ≤ 3).
    *
    *  - exact dups: `id % 617 == 0` copies the DISPLAYED text of `id−1`
    *    (~0.16% rate, as the profiled sf0.1 decade);
    *  - v3 cross-half near-dups: incoming-half docs (`id ≥ NumDocs/2`,
    *    `id % 1231 == 0`, ~20 docs) carry their history twin's text
    *    (`id − NumDocs/2`) plus ONE appended word — word-3-gram Jaccard
    *    ≥ n/(n+1) ≥ 0.89, comfortably above the incr-near 0.8 threshold,
    *    so `llm_dedup_incr_near` is non-vacuous at sf1 (the round-13
    *    self-flagged vacuity: the 617 rule pairs adjacent ids, which
    *    never cross the snapshot midpoint). */
  private def textFor(id: Long, numDocs: Long): String = {
    if (id > 0 && id % 617L == 0L) return textFor(id - 1, numDocs)
    val half = numDocs / 2
    if (id >= half && id % 1231L == 0L)
      return textFor(id - half, numDocs) + " stream"
    val rnd = rndFor(id, 42L)
    val nw = 10 + rnd.nextInt(91)
    (0 until nw).map(_ => Vocab(rnd.nextInt(Vocab.length))).mkString(" ")
  }

  /** Generate (idempotently) and return the sf1 dir. */
  def ensure(spark: SparkSession): String = ensure(spark, 1)

  /** Generate (idempotently) the sf`scale` decade (scale = 1 is the v3
    * sf1 set, bit-identical to what round 14 shipped; scale = 10 is the
    * round-15 third rung — same distribution family, every row count and
    * the scaling entity cardinality ([[NumUsers]]) ×scale, fixed-size
    * dims and value ranges untouched). */
  def ensure(spark: SparkSession, scale: Int): String = {
    val dir = new java.io.File(
      if (scale == 1) Sf1Dir else s".testdata/sf$scale").getAbsolutePath
    val numDocs = NumDocs * scale
    val numVecs = NumVecs * scale
    val numEvents = NumEvents * scale
    val numCust = NumCust * scale
    val numSupp = NumSupp * scale
    val numPart = NumPart * scale
    val numOrders = NumOrders * scale
    val numLineitem = NumLineitem * scale
    val numUsers = NumUsers * scale
    // v3: round 14 planted cross-half near-dups (see textFor) — an sf1
    // dir generated before that must rebuild (old markers are ignored)
    val done = new java.io.File(dir, "_GENERATED_v3")
    if (done.exists()) return dir
    import spark.implicits._

    spark.range(0L, numDocs, 1L, 32).map { id =>
      val text = textFor(id, numDocs)
      val rnd = rndFor(id, 7L)
      (id, text, langOf(rnd.nextInt(10000)), s"src${rnd.nextInt(20)}",
        text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    spark.range(0L, numVecs, 1L, 32).map { id =>
      val rnd = rndFor(id, 13L)
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x / n).toFloat), rnd.nextInt(10))
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val baseMicros = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      .getTime * 1000L
    val spanMicros = 30L * 24 * 3600 * 1000000L
    spark.range(0L, numEvents, 1L, 32).map { id =>
      val rnd = rndFor(id, 23L)
      val ts = new java.sql.Timestamp(0L)
      val micros = baseMicros + math.abs(rnd.nextLong() % spanMicros)
      ts.setTime(micros / 1000L)
      ts.setNanos(((micros % 1000000L) * 1000L).toInt)
      val et = Vector("click", "error", "purchase", "signup", "view")(
        rnd.nextInt(5))
      // nextInt (not nextLong): ONE draw from the per-id stream, so the
      // scale=1 rows stay bit-identical to the committed v3 sf1 set
      (id, ts, rnd.nextInt(numUsers.toInt).toLong, et,
        rnd.nextInt(56022) / 100.0, s"""{"k": ${rnd.nextInt(100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // --- TPC-H-ish tables, faithful to the profiled sf0.1 distributions
    // (uniform categories, the same value ranges, two-decimal prices —
    // the e2 fixed-point contract every oracle-gated q* entry relies on)
    def dayTs(baseDay: Long, spanDays: Int, rnd: scala.util.Random): java.sql.Timestamp =
      new java.sql.Timestamp((baseDay + rnd.nextInt(spanDays)) * 86400000L)
    val epoch1995 = java.sql.Timestamp.valueOf("1995-01-01 00:00:00").getTime / 86400000L

    spark.createDataFrame(
      (0 to 4).map(k => (k,
        Vector("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")(k))))
      .toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    spark.createDataFrame((0 until 25).map(k => (k, s"NATION_$k", k % 5)))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")

    spark.range(0L, numCust, 1L, 32).map { id =>
      val rnd = rndFor(id, 31L)
      (id, f"Customer#$id%09d", rnd.nextInt(25),
        (rnd.nextInt(1099985) - 99985) / 100.0,
        Vector("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
          "MACHINERY")(rnd.nextInt(5)))
    }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")

    spark.range(0L, numSupp, 1L, 32).map { id =>
      val rnd = rndFor(id, 37L)
      (id, f"Supplier#$id%09d", rnd.nextInt(25),
        (rnd.nextInt(1099985) - 99985) / 100.0)
    }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")

    val adjs = Vector("large", "hot", "blue", "old", "cold", "small",
      "new", "red")
    val nouns = Vector("ring", "bolt", "plate", "gear", "screw", "wheel")
    spark.range(0L, numPart, 1L, 32).map { id =>
      val rnd = rndFor(id, 41L)
      (id, s"${adjs(rnd.nextInt(adjs.length))} ${nouns(rnd.nextInt(nouns.length))}",
        s"Brand#${rnd.nextInt(25)}",
        Vector("LARGE", "STANDARD", "ECONOMY", "SMALL", "PROMO",
          "MEDIUM")(rnd.nextInt(6)),
        1 + rnd.nextInt(50), 900.0 + (id % 1000L) / 10.0)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")

    spark.range(0L, numOrders, 1L, 32).map { id =>
      val rnd = rndFor(id, 43L)
      (id, math.abs(rnd.nextLong()) % numCust,
        Vector("F", "O", "P")(rnd.nextInt(3)),
        (100191 + rnd.nextInt(49899128)) / 100.0,
        dayTs(epoch1995, 2405, rnd), // 1995-01-01 .. 2001-08-01
        Vector("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
          "5-LOW")(rnd.nextInt(5)))
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    spark.range(0L, numLineitem, 1L, 32).map { id =>
      val rnd = rndFor(id, 47L)
      (math.abs(rnd.nextLong()) % numOrders,
        math.abs(rnd.nextLong()) % numPart,
        math.abs(rnd.nextLong()) % numSupp,
        1 + rnd.nextInt(7),
        (1 + rnd.nextInt(50)).toDouble,
        (90068 + rnd.nextInt(10409924)) / 100.0,
        rnd.nextInt(11) / 100.0, rnd.nextInt(9) / 100.0,
        Vector("A", "N", "R")(rnd.nextInt(3)),
        Vector("F", "O")(rnd.nextInt(2)),
        dayTs(epoch1995 + 1, 2498, rnd)) // 1995-01-02 .. 2001-11-04
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    done.createNewFile()
    dir
  }
}

/** `sbt "Test/runMain graft.Sf1Gen [scale]"` — generate (idempotently)
  * the on-disk sf`scale` decade (default 1) for the oracle/bench
  * campaigns above the driver's scales (round-13 directive 3; round-15
  * directive 1 adds scale=10, the ladder's third rung). Prints the
  * absolute dir. */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .appName("sf1gen").config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try println(s"[sf1gen] ${ScaleData.ensure(spark, scale)}")
    finally spark.stop()
  }
}
