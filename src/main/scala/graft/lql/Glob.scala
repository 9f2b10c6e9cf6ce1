package graft.lql

/** Shell-glob (`path.Match`) semantics for LQL's LIKE
  * (reference pkg/lql/whereeval.go:248-258 — "expected a shell pattern
  * (not regexp)"):
  *   `*` any sequence of non-`/` characters, `?` one non-`/` character,
  *   `[...]`/`[^...]` character classes with `-` ranges and `\` escapes,
  *   `\x` literal escape; the whole string must match.
  * Malformed patterns (unclosed class, trailing `\`, bad range) are an
  * error at plan time, like Go returning ErrBadPattern from the probe call
  * at compile (whereeval.go:249-252).
  */
object Glob {

  /** Translate a glob into an anchored Java regex, or Left(error). */
  def toRegex(glob: String): Either[String, String] = {
    val sb = new StringBuilder("^")
    var i = 0
    def bad = Left(s"syntax error in pattern: $glob")
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append("[^/]*"); i += 1
        case '?' => sb.append("[^/]"); i += 1
        case '\\' =>
          if (i + 1 >= glob.length) return bad
          sb.append(java.util.regex.Pattern.quote(glob.charAt(i + 1).toString))
          i += 2
        case '[' =>
          i += 1
          sb.append('[')
          if (i < glob.length && glob.charAt(i) == '^') { sb.append('^'); i += 1 }
          var n = 0
          var closed = false
          while (i < glob.length && !closed) {
            glob.charAt(i) match {
              case ']' if n > 0 => closed = true; i += 1
              case _ =>
                // lo of a (possible) range
                val lo = readClassChar(glob, i) match {
                  case Some((c, ni)) => i = ni; c
                  case None          => return bad
                }
                if (i + 1 < glob.length && glob.charAt(i) == '-' && glob.charAt(i + 1) != ']') {
                  i += 1
                  val hi = readClassChar(glob, i) match {
                    case Some((c, ni)) => i = ni; c
                    case None          => return bad
                  }
                  if (hi < lo) return bad
                  sb.append(escClass(lo)).append('-').append(escClass(hi))
                } else sb.append(escClass(lo))
                n += 1
            }
          }
          if (!closed) return bad
          sb.append(']')
        case c =>
          sb.append(java.util.regex.Pattern.quote(c.toString))
          i += 1
      }
    }
    sb.append('$')
    Right(sb.toString)
  }

  /** Read one (possibly escaped) class member; a bare `-`, an unescaped `]`
    * (so `[]a]` is malformed — the closing-`]` case is consumed by the
    * caller before this runs) or EOF here is malformed (Go path.Match
    * getEsc rejects `-`, `]` and empty). */
  private def readClassChar(glob: String, i: Int): Option[(Char, Int)] = {
    if (i >= glob.length) return None
    glob.charAt(i) match {
      case '-' | ']' => None
      case '\\' =>
        if (i + 1 >= glob.length) None else Some((glob.charAt(i + 1), i + 2))
      case c => Some((c, i + 1))
    }
  }

  private def escClass(c: Char): String =
    if ("\\]^[&-".indexOf(c) >= 0) "\\" + c else c.toString

  /** Direct match (driver-side uses; the query path compiles to rlike). */
  def matches(glob: String, s: String): Either[String, Boolean] =
    toRegex(glob).map(r => s.matches(r))
}
