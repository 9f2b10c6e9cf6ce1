package graft.functions

import org.apache.spark.sql.{GraftColumn, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Registers graft's native Catalyst expressions as SQL functions, so
  * `spark.sql` users (and external BI tools speaking SQL through a thrift
  * server) reach the same codegen'd kernels the Column API uses:
  *
  * {{{
  *   // at session build time:
  *   //   --conf spark.sql.extensions=graft.functions.GraftExtensions
  *   spark.sql("SELECT graft_dot_product(a.embedding, b.embedding) ...")
  *
  *   // or on a live session:
  *   GraftExtensions.install(spark)
  * }}}
  *
  * `graft_minhash_band_keys` / `graft_simhash_fold` take their shape
  * parameters as integer literals — they are constructor parameters of the
  * expression (the kernels specialize on them), not per-row inputs.
  */
final class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, param: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType)   => v.toInt
    case other =>
      throw new IllegalArgumentException(
        s"$fn: $param must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** The injectFunction descriptions (identifier, info, builder). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot_product"),
      info("graft_dot_product",
        "graft_dot_product(a, b) - dense dot product of two float/double arrays, accumulated left-to-right in double"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot_product takes 2 arguments, got ${args.length}")
        DotProduct(args(0), args(1))
      }),
    (FunctionIdentifier("graft_minhash_band_keys"),
      info("graft_minhash_band_keys",
        "graft_minhash_band_keys(shingles, bands, rowsPerBand) - all LSH band keys of a string-array shingle set in one pass"),
      (args: Seq[Expression]) => {
        require(args.length == 3, s"graft_minhash_band_keys takes 3 arguments, got ${args.length}")
        MinhashBandKeys(args(0),
          intLit(args(1), "graft_minhash_band_keys", "bands"),
          intLit(args(2), "graft_minhash_band_keys", "rowsPerBand"))
      }),
    (FunctionIdentifier("graft_sorted_intersect_count"),
      info("graft_sorted_intersect_count",
        "graft_sorted_intersect_count(a, b) - intersection size of two SORTED string arrays by merge walk"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_sorted_intersect_count takes 2 arguments, got ${args.length}")
        SortedIntersectCount(args(0), args(1))
      }),
    (FunctionIdentifier("graft_simhash_fold"),
      info("graft_simhash_fold",
        "graft_simhash_fold(hashes, bits) - simhash bit-majority fold over an array of token hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_simhash_fold takes 2 arguments, got ${args.length}")
        SimHashFold(args(0), intLit(args(1), "graft_simhash_fold", "bits"))
      }),
    (FunctionIdentifier("graft_sorted_max_run_length"),
      info("graft_sorted_max_run_length",
        "graft_sorted_max_run_length(a) - longest equal-adjacent run in a SORTED string array (max value multiplicity)"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_sorted_max_run_length takes 1 argument, got ${args.length}")
        SortedMaxRunLength(args(0))
      })
  )

  /** Register into an already-built session (the extensions config only
    * applies at session construction). Idempotent: re-registration
    * overwrites with identical builders. */
  def install(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      GraftColumn.registerFunction(spark, id, inf, builder)
    }
}
