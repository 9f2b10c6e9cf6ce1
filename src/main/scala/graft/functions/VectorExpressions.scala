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

object VectorExpressions {
  /** Column API: `dot_product(a, b)` in double, left-to-right. */
  def dot_product(a: Column, b: Column): Column =
    GraftColumn.of(DotProduct(GraftColumn.exprOf(a), GraftColumn.exprOf(b)))

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
