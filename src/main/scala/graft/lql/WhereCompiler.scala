package graft.lql

import graft.lql.Ast._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import java.time.Instant

/** Compiles a WHERE Expression into a Spark Column over the canonical
  * schema, mirroring the closure compiler of the reference
  * (reference pkg/lql/whereeval.go:37-326) — but producing a declarative
  * Column tree that Catalyst folds into whole-stage codegen and pushes into
  * the parquet scan where possible.
  *
  * Semantics preserved exactly:
  *  - `ts` accepts only `< > <= >=` against a datetime constant resolved at
  *    plan time (whereeval.go:159-191);
  *  - `msg` accepts CONTAINS/PREFIX/SUFFIX/LIKE, where LIKE is a shell glob
  *    — translated to an anchored regex at plan time, never SQL LIKE
  *    (whereeval.go:248-258);
  *  - `fields:name` comparisons are **lexicographic string** comparisons
  *    with a missing field reading as "" (field.go:143-157) — values are
  *    never cast to numbers;
  *  - UPPER/LOWER wrap the operand, nested arbitrarily (whereeval.go:196-225).
  */
final class WhereCompiler(clock: () => Instant) {

  private val dt = new LqlDateTime(clock)

  def compile(expr: Expression, ts: Column, msg: Column, fields: Column): Column =
    orConds(expr.or, ts, msg, fields)

  def compileOpt(expr: Option[Expression], ts: Column, msg: Column, fields: Column): Column =
    expr.map(compile(_, ts, msg, fields)).getOrElse(lit(true))

  private def orConds(or: List[OrCondition], ts: Column, msg: Column, fields: Column): Column =
    or.map(oc => andConds(oc.and, ts, msg, fields)).reduce(_ || _)

  private def andConds(and: List[XCondition], ts: Column, msg: Column, fields: Column): Column =
    and.map(xc => xCond(xc, ts, msg, fields)).reduce(_ && _)

  private def xCond(xc: XCondition, ts: Column, msg: Column, fields: Column): Column = {
    val inner = xc.expr match {
      case Some(e) => orConds(e.or, ts, msg, fields)
      case None    => cond(xc.cond.get, ts, msg, fields)
    }
    if (xc.not) !inner else inner
  }

  private def cond(cn: Condition, ts: Column, msg: Column, fields: Column): Column = {
    val fldName = cn.ident.firstParamName
    val low = fldName.toLowerCase
    if (low == "ts") tsCond(cn, ts)
    else if (low == "msg") strCond(cn, applyFns(cn.ident, msg), msgOps = true)
    else if (low.startsWith("fields:") && low.length >= 8) {
      val name = fldName.substring(7)
      val operand = coalesce(element_at(fields, name), lit(""))
      strCond(cn, applyFns(cn.ident, operand), msgOps = false)
    } else throw LqlException("operand must be ts, msg, or fields:<fieldname> with non-empty fieldname")
  }

  private def tsCond(cn: Condition, ts: Column): Column = {
    if (cn.ident.params.nonEmpty)
      throw LqlException(s"functions are not supported for ts fields, but ${cn.ident.operand}() is provided")
    val ns = dt.parse(cn.value).fold(m => throw LqlException(m), identity)
    cn.op match {
      case "<"  => ts < ns
      case ">"  => ts > ns
      case "<=" => ts <= ns
      case ">=" => ts >= ns
      case op   => throw LqlException(s"unsupported operation $op for timestamp comparison")
    }
  }

  /** UPPER/LOWER chain applied innermost-out to the operand
    * (whereeval.go:196-225: only 1-arg UPPER/LOWER are legal). */
  private def applyFns(id: Identifier, operand: Column): Column = {
    if (id.params.isEmpty) return operand
    if (id.params.length != 1)
      throw LqlException(s"only functions with 1 param supported so far, but for ${id.operand}() ${id.params.length} params provided")
    val inner = applyFns(id.params.head, operand)
    id.operand.toUpperCase match {
      case "UPPER" => upper(inner)
      case "LOWER" => lower(inner)
      case _ =>
        throw LqlException(s"unknown function ${id.operand}(), only UPPER/LOWER are supported")
    }
  }

  private def strCond(cn: Condition, operand: Column, msgOps: Boolean): Column = {
    val v = cn.value
    cn.op.toUpperCase match {
      case "CONTAINS" => operand.contains(v)
      case "PREFIX"   => operand.startsWith(v)
      case "SUFFIX"   => operand.endsWith(v)
      case "LIKE" =>
        val re = Glob.toRegex(v).fold(
          e => throw LqlException(s"""wrong 'like' expression for $v, err=$e"""),
          identity)
        operand.rlike(re)
      case "=" if !msgOps  => operand === v
      case "!=" if !msgOps => operand =!= v
      case ">" if !msgOps  => operand > v   // lexicographic: both sides string
      case "<" if !msgOps  => operand < v
      case ">=" if !msgOps => operand >= v
      case "<=" if !msgOps => operand <= v
      case op =>
        throw LqlException(s"""unsupported operation "$op" for field ${cn.ident.render.trim}""")
    }
  }
}
