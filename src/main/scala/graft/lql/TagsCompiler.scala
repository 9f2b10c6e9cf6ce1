package graft.lql

import graft.lql.Ast._
import graft.model.Model

/** Compiles a FROM source into a driver-side predicate over a partition's
  * tag map, mirroring the reference's tags compiler
  * (reference pkg/lql/tagseval.go:43-251). The predicate runs against the
  * (small) partitions catalog to select which physical partitions a query
  * reads — the Spark analogue of `tindex.Visit` pruning
  * (reference pkg/tindex/inmem.go:36-66).
  *
  * Semantics:
  *  - `{k=v,...}` literal: **subset** match — query tags ⊆ partition tags
  *    (tagseval.go:58-67, tags.go:100-103), NOT equality;
  *  - expression: `= != < > <= >=` lexicographic string compares, LIKE is a
  *    shell glob, CONTAINS/PREFIX/SUFFIX substring ops, UPPER/LOWER over tag
  *    values; a missing tag reads as "" (tagseval.go:159-251).
  */
object TagsCompiler {

  type TagsPred = Map[String, String] => Boolean

  val matchAll: TagsPred = _ => true

  def compile(src: Option[Source]): TagsPred = src match {
    case None                  => matchAll
    case Some(TagsSource(sub)) => tags => Model.subsetOf(sub, tags)
    case Some(ExprSource(e))   => expression(e)
  }

  def expression(e: Expression): TagsPred = {
    val ors = e.or.map(orCond)
    tags => ors.exists(_(tags))
  }

  private def orCond(oc: OrCondition): TagsPred = {
    val ands = oc.and.map(xCond)
    tags => ands.forall(_(tags))
  }

  private def xCond(xc: XCondition): TagsPred = {
    val inner = xc.expr match {
      case Some(e) => expression(e)
      case None    => cond(xc.cond.get)
    }
    if (xc.not) tags => !inner(tags) else inner
  }

  /** Tag value extractor with UPPER/LOWER chain
    * (tagseval.go:196-251: missing tag ⇒ ""). */
  private def ident(id: Identifier): Either[String, TagsVal] = {
    if (id.params.isEmpty) {
      val name = id.operand
      Right(tags => tags.getOrElse(name, ""))
    } else if (id.params.length != 1) {
      Left(s"only functions with 1 param supported so far, but for ${id.operand}() ${id.params.length} params provided")
    } else {
      ident(id.params.head).flatMap { inner =>
        id.operand.toUpperCase match {
          case "UPPER" => Right(tags => inner(tags).toUpperCase)
          case "LOWER" => Right(tags => inner(tags).toLowerCase)
          case _       => Left(s"unknown function ${id.operand}()")
        }
      }
    }
  }

  private type TagsVal = Map[String, String] => String

  private def cond(cn: Condition): TagsPred = {
    val tvf = ident(cn.ident).fold(m => throw LqlException(m), identity)
    val v = cn.value
    cn.op.toUpperCase match {
      case "<"        => tags => tvf(tags) < v
      case ">"        => tags => tvf(tags) > v
      case "<="       => tags => tvf(tags) <= v
      case ">="       => tags => tvf(tags) >= v
      case "="        => tags => tvf(tags) == v
      case "!="       => tags => tvf(tags) != v
      case "CONTAINS" => tags => tvf(tags).contains(v)
      case "PREFIX"   => tags => tvf(tags).startsWith(v)
      case "SUFFIX"   => tags => tvf(tags).endsWith(v)
      case "LIKE" =>
        val re = Glob.toRegex(v).fold(
          e => throw LqlException(s"wrong 'like' expression for $v, err=$e"), identity)
        val p = java.util.regex.Pattern.compile(re)
        tags => p.matcher(tvf(tags)).matches()
      case op => throw LqlException(s"""unsupported operation "$op" for tags""")
    }
  }
}
