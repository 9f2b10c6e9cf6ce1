package graft.lql

import graft.model.Model

/** Hand-rolled tokenizer for LQL, matching the reference lexicon
  * (reference pkg/lql/parser.go:29-36): keywords (case-insensitive),
  * identifiers (which may contain `. / - :`, so `fields:abc` is ONE token),
  * double-quoted strings (Go escapes) and single-quoted strings (raw),
  * operators, signed numbers with optional size suffixes, and `{...}` tag
  * sets.
  */
object Lexer {

  sealed trait Tok { def text: String }
  final case class TKeyword(text: String) extends Tok            // canonical upper
  final case class TIdent(text: String) extends Tok
  final case class TString(value: String, text: String) extends Tok
  final case class TOp(text: String) extends Tok
  final case class TNumber(text: String) extends Tok
  final case class TTags(text: String) extends Tok               // includes braces
  case object TEof extends Tok { val text = "<EOF>" }

  val keywords: Set[String] = Set(
    "SELECT", "DESCRIBE", "TRUNCATE", "DELETE", "DRYRUN", "BEFORE", "MAXSIZE",
    "MINSIZE", "MAXDBSIZE", "FROM", "RANGE", "WHERE", "PARTITIONS", "PARTITION",
    "PIPES", "SHOW", "CREATE", "PIPE", "POSITION", "LIMIT", "OFFSET", "AND",
    "OR", "LIKE", "CONTAINS", "PREFIX", "SUFFIX", "NOT")

  private def isIdentStart(c: Char) = c.isLetter || c == '_'
  private def isIdentChar(c: Char) =
    c.isLetterOrDigit || c == '_' || c == '.' || c == '/' || c == '-' || c == ':'

  def lex(s: String): Either[String, Vector[Tok]] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '{') {
        // scan to the matching unquoted '}'
        var j = i + 1
        var inStr = false
        var done = false
        while (j < s.length && !done) {
          val cj = s.charAt(j)
          if (cj == '"') inStr = !inStr
          else if (cj == '\\' && inStr) j += 1
          else if (cj == '}' && !inStr) done = true
          if (!done) j += 1
        }
        if (!done) return Left(s"unclosed '{' at $i in: $s")
        out += TTags(s.substring(i, j + 1))
        i = j + 1
      } else if (c == '"') {
        var j = i + 1
        while (j < s.length && s.charAt(j) != '"') {
          if (s.charAt(j) == '\\') j += 1
          j += 1
        }
        if (j >= s.length) return Left(s"unterminated string at $i in: $s")
        val raw = s.substring(i, j + 1)
        out += TString(Model.goUnquote(raw), raw)
        i = j + 1
      } else if (c == '\'') {
        val j = s.indexOf('\'', i + 1)
        if (j < 0) return Left(s"unterminated string at $i in: $s")
        val raw = s.substring(i, j + 1)
        out += TString(raw.substring(1, raw.length - 1), raw)
        i = j + 1
      } else if (isIdentStart(c)) {
        var j = i + 1
        while (j < s.length && isIdentChar(s.charAt(j))) j += 1
        val word = s.substring(i, j)
        val up = word.toUpperCase
        if (keywords.contains(up)) out += TKeyword(up) else out += TIdent(word)
        i = j
      } else if (c.isDigit ||
          ((c == '-' || c == '+' || c == '.') && i + 1 < s.length &&
            (s.charAt(i + 1).isDigit || (s.charAt(i + 1) == '.' && i + 2 < s.length && s.charAt(i + 2).isDigit)))) {
        // Number: [-+]?\d*\.?\d+([eE][-+]?\d+ | size-suffix)?
        var j = i
        if (s.charAt(j) == '-' || s.charAt(j) == '+') j += 1
        while (j < s.length && s.charAt(j).isDigit) j += 1
        if (j < s.length && s.charAt(j) == '.' && j + 1 < s.length && s.charAt(j + 1).isDigit) {
          j += 1
          while (j < s.length && s.charAt(j).isDigit) j += 1
        }
        if (j < s.length && (s.charAt(j) == 'e' || s.charAt(j) == 'E') &&
            j + 1 < s.length && (s.charAt(j + 1).isDigit || s.charAt(j + 1) == '-' || s.charAt(j + 1) == '+')) {
          j += 2
          while (j < s.length && s.charAt(j).isDigit) j += 1
        } else {
          // humanized size suffix: [kKmMgGtTpPbB][ib]{0,2}
          if (j < s.length && "kKmMgGtTpPbB".indexOf(s.charAt(j)) >= 0) {
            j += 1
            var k = 0
            while (k < 2 && j < s.length && "iIbB".indexOf(s.charAt(j)) >= 0) { j += 1; k += 1 }
          }
        }
        out += TNumber(s.substring(i, j))
        i = j
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (two == "<>" || two == "!=" || two == "<=" || two == ">=") {
          out += TOp(two); i += 2
        } else if ("-+*/%,.=<>():[]".indexOf(c) >= 0) {
          out += TOp(c.toString); i += 1
        } else return Left(s"unexpected character '$c' at $i in: $s")
      }
    }
    out += TEof
    Right(out.result())
  }

  /** humanize.ParseBytes semantics for LQL sizes
    * (reference pkg/lql/parser.go:196-207): `3G`=3e9, `1Tb`=1e12,
    * `20`=20, `10MiB`=10*2^20; case-insensitive suffixes. */
  def parseSize(text: String): Either[String, Long] = {
    val t = text.trim
    val numEnd = t.indexWhere(ch => !(ch.isDigit || ch == '.' || ch == '-' || ch == '+'))
    val (numS, sufS) = if (numEnd < 0) (t, "") else (t.substring(0, numEnd), t.substring(numEnd).trim)
    numS.toDoubleOption match {
      case None => Left(s"cannot parse size: $text")
      case Some(v) =>
        val mult: Option[Double] = sufS.toLowerCase match {
          case "" | "b" => Some(1d)
          case "k" | "kb" => Some(1e3)
          case "m" | "mb" => Some(1e6)
          case "g" | "gb" => Some(1e9)
          case "t" | "tb" => Some(1e12)
          case "p" | "pb" => Some(1e15)
          case "ki" | "kib" => Some(1024d)
          case "mi" | "mib" => Some(Math.pow(2, 20))
          case "gi" | "gib" => Some(Math.pow(2, 30))
          case "ti" | "tib" => Some(Math.pow(2, 40))
          case "pi" | "pib" => Some(Math.pow(2, 50))
          case _ => None
        }
        mult.map(m => (v * m).toLong).toRight(s"unknown size suffix in: $text")
    }
  }
}
