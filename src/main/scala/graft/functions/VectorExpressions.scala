package graft.functions

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expression for the dense dot product of two numeric
  * arrays, accumulated in double LEFT-TO-RIGHT (the engine-portable order
  * every oracle uses).
  *
  * Why an Expression and not `aggregate(zip_with(...))`: higher-order
  * functions always evaluate interpreted — per element, a lambda
  * invocation and boxed intermediates — and similarity scoring sits inside
  * broadcast joins where whole rows are evaluated interpreted anyway. This
  * node is one virtual call per ROW in interpreted mode (a primitive
  * loop), and inside whole-stage codegen it inlines as a Java for-loop
  * (`doGenCode`), the preference order the Spark-first design calls for:
  * composed built-ins, then a native Expression, then mapPartitions.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def elem(t: DataType): Option[DataType] = t match {
      case ArrayType(e @ (FloatType | DoubleType), _) => Some(e)
      case _ => None
    }
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  // mismatched lengths and null elements yield NULL — exactly what the
  // aggregate(zip_with(...)) formulation this node replaces produced
  // (zip_with pads with null, acc + null => null), so swapping the
  // implementations can never silently change a score
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def containsNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    val guard = containsNulls
    var s = 0.0
    var i = 0
    while (i < n) {
      if (guard && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      val lGet = if (isFloat(left)) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (isFloat(right)) s"(double)$b.getFloat($i)" else s"$b.getDouble($i)"
      val nullGuard =
        if (containsNulls) s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $s = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    $s += $lGet * $rGet;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance of two numeric arrays, accumulated in double
  * LEFT-TO-RIGHT — the k-means assignment kernel.
  *
  * Why (same rationale as [[DotProduct]]): the HOF form
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0, _+_)` evaluates
  * interpreted — two lambda frames and boxed doubles PER ELEMENT — and the
  * Lloyd assignment evaluates it k times per corpus row per iteration,
  * which made it the dominant CPU term of the clustering entry. This node
  * is one primitive loop per row (and a plain Java loop inside whole-stage
  * codegen). Null/length semantics are exactly the HOF form's: mismatched
  * lengths or a null element yield NULL, so the swap cannot change a
  * result — bit-locked by VectorExpressionsSpec.
  */
case class SquaredDistance(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"squared_distance expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def containsNulls: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    val guard = containsNulls
    var s = 0.0
    var i = 0
    while (i < n) {
      if (guard && (x.isNullAt(i) || y.isNullAt(i))) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      val lGet = if (isFloat(left)) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      val rGet = if (isFloat(right)) s"(double)$b.getFloat($i)" else s"$b.getDouble($i)"
      val nullGuard =
        if (containsNulls) s"if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |boolean $bad = ($n != $b.numElements());
         |double $s = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullGuard
         |    double $d = $lGet - $rGet;
         |    $s += $d * $d;
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All `bands` LSH band keys of a shingle array in ONE pass: band b's key
  * is xxhash64(b, [minhash slots b*r .. b*r+r-1]), slot i's minhash is
  * min over shingles of xxhash64(i, shingle) — BIT-IDENTICAL to the
  * nested-HOF formulation (it reuses Spark's own XxHash64Function with the
  * same child order and default seed), so candidate sets are unchanged.
  *
  * Why: the HOF tree evaluates 2 lambda invocations per (slot, shingle)
  * with boxed longs — bands*r*|shingles| interpreted calls per document.
  * This node is one call per document with primitive arrays, and each
  * shingle's bytes are read once per slot instead of once per lambda
  * frame. CodegenFallback is fine: the loop is the work, not the dispatch. */
case class MinhashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_band_keys expects array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val numHashes = bands * rowsPerBand
    val seeds = MinhashBandKeys.seedsFor(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      // a null shingle hashes to the slot seed alone (xxhash64 skips null
      // children), matching the HOF semantics
      val g = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
      var i = 0
      while (i < numHashes) {
        val h = if (g == null) seeds(i)
          else XxHash64Function.hash(g, org.apache.spark.sql.types.StringType, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XxHash64Function.hash(b, IntegerType, 42L)
      if (n > 0) {
        var k = 0
        while (k < rowsPerBand) {
          h = XxHash64Function.hash(mins(b * rowsPerBand + k), LongType, h)
          k += 1
        }
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinhashBandKeys {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  /** xxhash64 state after hashing slot index i from the default seed —
    * shared prefix of every per-shingle slot hash. */
  def seedsFor(n: Int): Array[Long] = cache.computeIfAbsent(n,
    m => Array.tabulate(m)(i => XxHash64Function.hash(i, IntegerType, 42L)))
}

/** The simhash bit-majority fold over an array of non-negative `bits`-bit
  * token hashes, in one pass: bit i of the result is set iff the majority
  * of hashes have bit i set. Bit-identical to the nested-aggregate HOF
  * form (integer div/mod on non-negative hashes == shift/mask; a null
  * hash votes -1 on every bit, matching IF(null, ...) = false-branch),
  * but one call per document instead of bits*|hashes| lambda frames. */
case class SimHashFold(child: Expression, bits: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_fold expects array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](bits)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) {
        var i = 0
        while (i < bits) { counts(i) -= 1; i += 1 }
      } else {
        val h = arr.getLong(j)
        var i = 0
        while (i < bits) {
          counts(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < bits) { if (counts(i) > 0) out |= 1L << i; i += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Intersection size of two SORTED string arrays (ascending, the
  * `sort_array` binary order) by a single merge walk — O(|a|+|b|)
  * UTF8String comparisons per row, no per-row hash table.
  *
  * Why an Expression and not `size(array_intersect(a, b))`: ArrayIntersect
  * builds a hash set of one side per ROW and materializes the intersection
  * array just to take its length. In set-similarity verification (the
  * ngram-Jaccard dedup path) this runs once per candidate pair — millions
  * of rows whose only needed output is the COUNT. The merge walk does the
  * count directly and inlines into whole-stage codegen.
  *
  * Null elements (sorted first by sort_array asc) are skipped — set
  * semantics over non-null members, matching what array_intersect-based
  * Jaccard produced for shingle arrays (which never contain null).
  * Inputs MUST be sorted ascending; unsorted inputs undercount.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects array<string>, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && x.isNullAt(i)) i += 1
    while (j < ny && y.isNullAt(j)) j += 1
    while (i < nx && j < ny) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $a.isNullAt($i)) $i++;
         |while ($j < $ny && $b.isNullAt($j)) $j++;
         |while ($i < $nx && $j < $ny) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Longest run of equal adjacent elements in a SORTED string array —
  * i.e. the highest multiplicity of any value; over a sorted bigram list
  * this is the top-bigram count of the Gopher repetition filters. One
  * linear codegen'd walk per row instead of an interpreted higher-order
  * `aggregate` fold with a struct accumulator (which allocates a lambda
  * frame per element — the difference between a projection that keeps
  * whole-stage codegen and one that breaks it on every corpus row).
  * Null elements (sorted first) are skipped. Empty arrays yield 0.
  */
case class SortedMaxRunLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_max_run_length expects array<string>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    var best = 0L
    var run = 0L
    var prev: org.apache.spark.unsafe.types.UTF8String = null
    while (i < n) {
      if (!arr.isNullAt(i)) { // null elements are skipped wherever they sit
        val cur = arr.getUTF8String(i)
        if (prev != null && cur.compareTo(prev) == 0) run += 1 else run = 1
        if (run > best) best = run
        prev = cur
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val run = ctx.freshName("run")
      val prev = ctx.freshName("prev")
      val cur = ctx.freshName("cur")
      s"""
         |int $n = $a.numElements();
         |long $best = 0L; long $run = 0L;
         |org.apache.spark.unsafe.types.UTF8String $prev = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  org.apache.spark.unsafe.types.UTF8String $cur = $a.getUTF8String($i);
         |  if ($prev != null && $cur.compareTo($prev) == 0) { $run++; } else { $run = 1L; }
         |  if ($run > $best) $best = $run;
         |  $prev = $cur;
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fixed-point base-2 logarithm of an integer ratio `num/den`
  * (`num >= den >= 1`), with 20 fraction bits: returns
  * `L ≈ floor(log2(num/den) * 2^20)` computed by the classic
  * normalize-then-square algorithm in PURE int64 arithmetic — shifts,
  * multiplies, one integer division. No libm call anywhere, so the result
  * is bit-identical on every platform AND exactly reproducible by any
  * engine that has 64-bit integer ops (the DuckDB oracles replay the same
  * 20 iterations in a recursive CTE).
  *
  * Why: the LM-score and tf-idf oracles gate on integerized `ln` of exact
  * integer ratios. `Math.log` (JVM) and libm `log` (DuckDB) may disagree
  * by 1 ulp, and a 1-ulp divergence on the floor(x*1e6+0.5) boundary
  * would flip the gate nondeterministically across platforms. Deriving
  * the log itself from integer ops removes the hazard at the root
  * instead of papering over it with tolerances.
  *
  * Algorithm (both engines run EXACTLY these steps):
  *  1. `k = floor(log2(num/den))` via bit lengths + one shift compare;
  *  2. scale to `a/b ∈ [1,2)` with `a < 2^35` (so `a<<28 < 2^63` fits):
  *     `sh = max(0, bitlen(num)-34)`, `a = num>>sh`,
  *     `b = k>=sh ? den<<(k-sh) : den>>(sh-k)`;
  *  3. 28-bit fixed-point mantissa `m = (a<<28) div b`;
  *  4. 20 rounds of `m = (m*m)>>28; if m >= 2^29 { m >>= 1; bit=1 }`,
  *     accumulating bits MSB-first;
  *  5. result `(k<<20) | bits`.
  * Truncation makes the result a deterministic ~1e-6-relative
  * approximation of log2 — well inside what a corpus quality score needs,
  * and the approximation IS the spec (both engines compute it, so the
  * hash gate compares identical integers).
  *
  * Accepts int/long children; `num < den`, `den <= 0` or null yields NULL.
  */
case class Log2Fix(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t == LongType || t == IntegerType
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"log2_fix expects integral children, got ${left.dataType} / ${right.dataType}")
  }

  override def nullable: Boolean = true

  private def asLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _           => v.asInstanceOf[Long]
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val num = asLong(left, a)
    val den = asLong(right, b)
    if (den <= 0L || num < den) null else Log2Fix.eval(num, den)
  }

  // interpreted mode delegates to the shared static kernel; codegen emits
  // a direct static call — one branch + one invocation per row, and the
  // kernel itself is a tight primitive loop the JIT compiles once
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val num = ctx.freshName("num")
      val den = ctx.freshName("den")
      s"""
         |long $num = (long)($a);
         |long $den = (long)($b);
         |if ($den <= 0L || $num < $den) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  graft.functions.Log2Fix$$.MODULE$$.eval($num, $den); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Log2Fix {
  /** ln(2) in e6 fixed point — the pinned rational constant that converts
    * a [[Log2Fix]] result to micro-nats: `nll_e6 = (L * Ln2E6) div 2^20`. */
  val Ln2E6 = 693147L

  /** The integer kernel; requires `num >= den >= 1`. Codegen calls it via
    * `Log2Fix$.MODULE$` (the case class's inherited `eval` suppresses the
    * static forwarder, so the plain name won't resolve in janino). */
  def eval(num: Long, den: Long): Long = {
    val blNum = 63 - java.lang.Long.numberOfLeadingZeros(num)
    val blDen = 63 - java.lang.Long.numberOfLeadingZeros(den)
    val d = blNum - blDen
    val k = if ((num >> d) >= den) d else d - 1
    val sh = math.max(0, blNum - 34)
    val a = num >> sh
    val b = if (k >= sh) den << (k - sh) else den >> (sh - k)
    var m = (a << 28) / b
    var bits = 0L
    var i = 0
    while (i < 20) {
      m = (m * m) >> 28
      if (m >= (1L << 29)) { m >>= 1; bits = (bits << 1) | 1L }
      else bits = bits << 1
      i += 1
    }
    (k.toLong << 20) | bits
  }

  /** The DuckDB replay of [[eval]] as a SQL snippet: given a CTE `{src}`
    * with BIGINT columns `num`, `den` (and any key columns in `{keys}`),
    * produces a CTE chain ending in `{out}(…keys, l20)`. Requires the
    * query to open with `WITH RECURSIVE`. Kept here so every oracle uses
    * ONE definition of the algorithm. */
  def duckdbCtes(src: String, keys: String, out: String): String =
    s"""${out}_bl AS (
       |  SELECT $keys, num, den,
       |    length(bin(num)) - 1 AS blnum, length(bin(den)) - 1 AS blden
       |  FROM $src),
       |${out}_k AS (
       |  SELECT $keys, num, den, blnum,
       |    CASE WHEN (num >> (blnum - blden)) >= den
       |         THEN blnum - blden ELSE blnum - blden - 1 END AS k,
       |    greatest(blnum - 34, 0) AS sh
       |  FROM ${out}_bl),
       |${out}_m0 AS (
       |  SELECT $keys, k,
       |    ((num >> sh) << 28) //
       |      (CASE WHEN k >= sh THEN den << (k - sh) ELSE den >> (sh - k) END) AS m
       |  FROM ${out}_k),
       |${out}_it AS (
       |  SELECT $keys, k, 0 AS i, m, 0::BIGINT AS bits FROM ${out}_m0
       |  UNION ALL
       |  SELECT $keys, k, i + 1,
       |    CASE WHEN ((m * m) >> 28) >= (1::BIGINT << 29)
       |         THEN (m * m) >> 29 ELSE (m * m) >> 28 END,
       |    CASE WHEN ((m * m) >> 28) >= (1::BIGINT << 29)
       |         THEN (bits << 1) | 1 ELSE bits << 1 END
       |  FROM ${out}_it WHERE i < 20),
       |$out AS (
       |  SELECT $keys, (k::BIGINT << 20) | bits AS l20
       |  FROM ${out}_it WHERE i = 20)""".stripMargin
}

/** Fixed-point base-2 EXPONENTIAL — the inverse kernel of [[Log2Fix]]:
  * for `x20 = x * 2^20` with `x ∈ [0, 41]`, returns `E ≈ 2^x * 2^20`
  * computed in PURE int64 arithmetic. Same portability contract as
  * [[Log2Fix]]: no libm anywhere, every step replayable in DuckDB, so
  * the truncating approximation (~1e-5 relative) IS the cross-engine
  * spec — exact at integer x by construction (the fraction path is a
  * no-op and the result is a pure shift).
  *
  * Algorithm (both engines run EXACTLY these steps):
  *  1. split `k = x20 >> 20` (integer part), `f = x20 & (2^20 - 1)`;
  *  2. binary exponentiation over the 20 PINNED constants
  *     `C_i = round(2^(2^-i) * 2^20)`: `r = 2^20`, then for i = 1..20,
  *     if fraction bit `20-i` is set, `r = (r * C_i) >> 20`
  *     (r stays < 2^21, so every product fits easily);
  *  3. result `r << k` (k <= 41 keeps it under 2^63).
  * Negative x or x20 > 41·2^20 yields NULL (the envelope, enforced not
  * clamped). The softmax-style weights this feeds ([[graft.llm.DoReMi]])
  * normalize afterwards, so the e20 scale divides out. */
case class Exp2Fix(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType || child.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"exp2_fix expects an integral child, got ${child.dataType}")

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = child.dataType match {
      case IntegerType => a.asInstanceOf[Int].toLong
      case _           => a.asInstanceOf[Long]
    }
    if (x < 0L || x > Exp2Fix.MaxX20) null else Exp2Fix.eval(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x")
      s"""
         |long $x = (long)($a);
         |if ($x < 0L || $x > ${Exp2Fix.MaxX20}L) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  graft.functions.Exp2Fix$$.MODULE$$.eval($x); }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Exp2Fix {
  /** Domain ceiling: 2^41 * 2^20 = 2^61 < 2^63. */
  val MaxX20: Long = 41L << 20

  /** The pinned square-root-of-two ladder, `C_i = round(2^(2^-i) * 2^20)`
    * for i = 1..20 (index 0 unused). These LITERALS are the spec — both
    * engines multiply exactly these integers. */
  private[graft] val C: Array[Long] = Array(0L,
    1482910L, 1246974L, 1143480L, 1095000L, 1071537L,
    1059994L, 1054270L, 1051419L, 1049997L, 1049286L,
    1048931L, 1048753L, 1048665L, 1048620L, 1048598L,
    1048587L, 1048582L, 1048579L, 1048577L, 1048577L)

  /** The integer kernel; requires `0 <= x20 <= MaxX20`. Codegen calls it
    * via `Exp2Fix$.MODULE$` (see [[Log2Fix.eval]]'s forwarder note). */
  def eval(x20: Long): Long = {
    val k = (x20 >> 20).toInt
    val f = x20 & 0xFFFFFL
    var r = 1L << 20
    var i = 1
    while (i <= 20) {
      if (((f >> (20 - i)) & 1L) == 1L) r = (r * C(i)) >> 20
      i += 1
    }
    r << k
  }

  /** The DuckDB replay of [[eval]]: given a CTE `{src}` with a BIGINT
    * column `x20` (and key columns in `{keys}`), produces a CTE chain
    * ending in `{out}(…keys, e20)`; rows with x20 outside [0, MaxX20]
    * are dropped (the kernel's NULL). Requires `WITH RECURSIVE`. */
  def duckdbCtes(src: String, keys: String, out: String): String =
    s"""${out}_c(ci, cc) AS (VALUES
       |  ${(1 to 20).map(i => s"($i, ${C(i)})").mkString(", ")}),
       |${out}_it AS (
       |  SELECT $keys, (x20 >> 20) AS k, x20 & 1048575 AS f,
       |    0 AS i, (1::BIGINT << 20) AS r
       |  FROM $src WHERE x20 >= 0 AND x20 <= $MaxX20
       |  UNION ALL
       |  SELECT $keys, k, f, ci,
       |    CASE WHEN ((f >> (20 - ci)) & 1) = 1 THEN (r * cc) >> 20 ELSE r END
       |  FROM ${out}_it JOIN ${out}_c ON ci = i + 1),
       |$out AS (
       |  SELECT $keys, r << k AS e20 FROM ${out}_it WHERE i = 20)""".stripMargin
}

object VectorExpressions {
  /** Column API: `dot_product(a, b)` in double, left-to-right. */
  def dot_product(a: Column, b: Column): Column =
    GraftColumn.of(DotProduct(GraftColumn.exprOf(a), GraftColumn.exprOf(b)))

  /** Column API: squared L2 distance in double, left-to-right. */
  def squared_distance(a: Column, b: Column): Column =
    GraftColumn.of(SquaredDistance(GraftColumn.exprOf(a), GraftColumn.exprOf(b)))

  /** Column API: fixed-point `floor(log2(num/den) * 2^20)` — pure-integer,
    * engine-portable (see [[Log2Fix]]). */
  def log2_fix(num: Column, den: Column): Column =
    GraftColumn.of(Log2Fix(GraftColumn.exprOf(num), GraftColumn.exprOf(den)))

  /** Column API: fixed-point `2^(x20/2^20) * 2^20` for x20 in
    * [0, 41·2^20] — pure-integer, engine-portable (see [[Exp2Fix]]). */
  def exp2_fix(x20: Column): Column =
    GraftColumn.of(Exp2Fix(GraftColumn.exprOf(x20)))

  /** Column API: SIGNED fixed-point log2 ratio for num, den >= 1 in
    * EITHER order ([[Log2Fix]] itself requires num >= den; the
    * reflection gives the negative branch — exact, since
    * log2(a/b) = -log2(b/a)). The ONE definition of the sign convention
    * every signed-log score (PMI, DSIR) and its oracle replays. */
  def slog2_fix(num: Column, den: Column): Column =
    org.apache.spark.sql.functions.when(num >= den, log2_fix(num, den))
      .otherwise(-log2_fix(den, num))

  /** Column API: intersection count of two sorted string arrays. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftColumn.of(SortedIntersectCount(GraftColumn.exprOf(a), GraftColumn.exprOf(b)))

  /** Column API: simhash bit-majority fold of an array<long>. */
  def simhash_fold(hashes: Column, bits: Int): Column =
    GraftColumn.of(SimHashFold(GraftColumn.exprOf(hashes), bits))

  /** Column API: longest equal-adjacent run in a sorted string array. */
  def sorted_max_run_length(a: Column): Column =
    GraftColumn.of(SortedMaxRunLength(GraftColumn.exprOf(a)))

  /** Column API: all LSH band keys for a shingle array (array<long>). */
  def minhash_band_keys(shingles: Column, bands: Int, rowsPerBand: Int): Column =
    GraftColumn.of(MinhashBandKeys(GraftColumn.exprOf(shingles), bands, rowsPerBand))
}
