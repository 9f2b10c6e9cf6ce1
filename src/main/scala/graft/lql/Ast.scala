package graft.lql

import graft.model.Model

/** LQL abstract syntax tree, mirroring the reference grammar
  * (reference pkg/lql/parser.go:86-198) with `render` reproducing the
  * reference's `String()` forms (parser.go:270-706) so parse→render→parse
  * is stable (the reference's conformance property,
  * pkg/lql/parser_test.go:194-210).
  */
object Ast {

  final case class LqlException(message: String) extends RuntimeException(message)

  sealed trait Lql { def render: String }

  final case class Select(
      format: Option[String],
      source: Option[Source],
      range: Option[TimeRange],
      where: Option[Expression],
      position: Option[String],
      offset: Option[Long],
      limit: Option[Long]) extends Lql {
    def render: String = {
      val sb = new StringBuilder("SELECT")
      format.filter(_.nonEmpty).foreach(f => sb.append("  ").append(Render.goQuote(f)))
      source.foreach(s => sb.append(" FROM").append(s.render))
      range.foreach(r => sb.append(" RANGE").append(r.render))
      where.foreach(w => sb.append(" WHERE").append(w.render))
      position.foreach(p => sb.append(" POSITION ").append(Render.goQuote(p)))
      offset.foreach(o => sb.append(" OFFSET ").append(o))
      limit.foreach(l => sb.append(" LIMIT ").append(l))
      sb.toString
    }
  }

  final case class DescribePartition(tags: Map[String, String]) extends Lql {
    def render: String = s"DESCRIBE PARTITION {${Model.tagLine(tags)}}"
  }
  final case class DescribePipe(name: String) extends Lql {
    def render: String = s"DESCRIBE PIPE $name"
  }
  final case class ShowPartitions(source: Option[Source], offset: Option[Int], limit: Option[Int]) extends Lql {
    def render: String = {
      val sb = new StringBuilder("SHOW PARTITIONS")
      source.foreach(s => sb.append(s.render))
      offset.foreach(o => sb.append(" OFFSET ").append(o))
      limit.foreach(l => sb.append(" LIMIT ").append(l))
      sb.toString
    }
  }
  final case class ShowPipes(offset: Option[Long], limit: Option[Long]) extends Lql {
    def render: String = {
      val sb = new StringBuilder("SHOW PIPES")
      offset.foreach(o => sb.append(" OFFSET ").append(o))
      limit.foreach(l => sb.append(" LIMIT ").append(l))
      sb.toString
    }
  }
  final case class Truncate(
      dryRun: Boolean,
      source: Option[Source],
      minSize: Option[Long],
      maxSize: Option[Long],
      before: Option[Long],   // resolved ns at parse time
      maxDbSize: Option[Long]) extends Lql {
    def render: String = {
      val sb = new StringBuilder("TRUNCATE")
      if (dryRun) sb.append(" DRYRUN")
      source.foreach(s => sb.append(s.render))
      minSize.foreach(v => sb.append(" MINSIZE ").append(v))
      maxSize.foreach(v => sb.append(" MAXSIZE ").append(v))
      before.foreach(v => sb.append(" BEFORE ").append(Render.goQuote(Render.goTimeString(v))))
      maxDbSize.foreach(v => sb.append(" MAXDBSIZE ").append(v))
      sb.toString
    }
  }
  final case class CreatePipe(name: String, from: Option[Source], where: Option[Expression]) extends Lql {
    def render: String = {
      val sb = new StringBuilder("CREATE PIPE ").append(name)
      from.foreach(s => sb.append(" FROM").append(s.render))
      where.foreach(w => sb.append(" WHERE").append(w.render))
      sb.toString
    }
  }
  final case class DeletePipe(name: String) extends Lql {
    def render: String = s"DELETE PIPE $name"
  }

  // --- FROM sources -----------------------------------------------------

  sealed trait Source { def render: String }
  /** Literal tag set — subset match against partition tags
    * (reference pkg/lql/tagseval.go:58-67). */
  final case class TagsSource(tags: Map[String, String]) extends Source {
    def render: String = s" {${Model.tagLine(tags)}}"
  }
  /** Tags expression (reference pkg/lql/tagseval.go:159-251). */
  final case class ExprSource(expr: Expression) extends Source {
    def render: String = expr.render
  }

  // --- WHERE / tags expressions ------------------------------------------

  final case class Expression(or: List[OrCondition]) {
    def render: String = or.map(_.render).mkString(" OR")
  }
  final case class OrCondition(and: List[XCondition]) {
    def render: String = and.map(_.render).mkString(" AND")
  }
  final case class XCondition(not: Boolean, cond: Option[Condition], expr: Option[Expression]) {
    def render: String = {
      val body = expr match {
        case Some(e) => " (" + e.render + " )"
        case None    => cond.get.render
      }
      (if (not) " NOT" else "") + body
    }
  }
  final case class Condition(ident: Identifier, op: String, value: String) {
    def render: String = s" ${ident.render} $op ${Render.goQuote(value)}"
  }
  final case class Identifier(operand: String, params: List[Identifier]) {
    def render: String =
      if (params.isEmpty) operand
      else operand + params.map(_.render).mkString("(", ",", ")")
    /** The innermost operand name (reference pkg/lql/whereeval.go:133-139). */
    def firstParamName: String =
      if (params.isEmpty) operand else params.head.firstParamName
  }

  /** RANGE — both bounds resolved to ns at parse time; absent bounds default
    * to 0 / Long.MaxValue at plan time (reference pkg/cursor/cursor.go:94-100),
    * membership is inclusive (reference pkg/cursor/fiterator.go:93-95). */
  final case class TimeRange(t1: Option[Long], t2: Option[Long]) {
    def render: String = t2 match {
      case None     => " " + Render.goQuote(Render.goTimeString(t1.getOrElse(0L)))
      case Some(b)  =>
        " [" + t1.map(a => Render.goQuote(Render.goTimeString(a))).getOrElse("") +
          ":" + Render.goQuote(Render.goTimeString(b)) + "]"
    }
  }

  object Render {
    def goQuote(s: String): String = Model.goQuote(s)

    /** Go `time.Time.String()` of a UTC instant:
      * `2006-01-02 15:04:05.999999999 +0000 UTC` (trailing zero nanos
      * trimmed, fraction omitted when zero). */
    def goTimeString(ns: Long): String = {
      val secs = Math.floorDiv(ns, 1000000000L)
      val nanos = Math.floorMod(ns, 1000000000L)
      val ldt = java.time.LocalDateTime.ofEpochSecond(secs, 0, java.time.ZoneOffset.UTC)
      val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d " +
        f"${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
      val frac =
        if (nanos == 0) ""
        else "." + f"$nanos%09d".reverse.dropWhile(_ == '0').reverse
      s"$base$frac +0000 UTC"
    }
  }
}
