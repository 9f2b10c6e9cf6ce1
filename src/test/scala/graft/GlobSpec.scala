package graft

import graft.lql.Glob
import org.scalatest.funsuite.AnyFunSuite

/** Shell-glob LIKE semantics (reference pkg/lql/whereeval.go:248-258 uses
  * Go's `path.Match`): `*` and `?` never match `/`, `[...]`/`[^...]`
  * classes with ranges and backslash escapes, whole-string match, malformed
  * pattern = error. Table adapted from Go's stdlib path/match_test.go (the
  * oracle for path.Match behaviour).
  */
class GlobSpec extends AnyFunSuite {

  private def m(pattern: String, s: String): Either[String, Boolean] =
    Glob.matches(pattern, s)

  private val table: Seq[(String, String, Boolean)] = Seq(
    ("abc", "abc", true),
    ("*", "abc", true),
    ("*c", "abc", true),
    ("a*", "a", true),
    ("a*", "abc", true),
    ("a*", "ab/c", false),
    ("a*/b", "abc/b", true),
    ("a*/b", "a/c/b", false),
    ("a*b*c*d*e*/f", "axbxcxdxe/f", true),
    ("a*b*c*d*e*/f", "axbxcxdxexxx/f", true),
    ("a*b*c*d*e*/f", "axbxcxdxe/xxx/f", false),
    ("a*b*c*d*e*/f", "axbxcxdxexxx/fff", false),
    ("a*b?c*x", "abxbbxdbxebxczzx", true),
    ("a*b?c*x", "abxbbxdbxebxczzy", false),
    ("ab[c]", "abc", true),
    ("ab[b-d]", "abc", true),
    ("ab[e-g]", "abc", false),
    ("ab[^c]", "abc", false),
    ("ab[^b-d]", "abc", false),
    ("ab[^e-g]", "abc", true),
    ("a\\*b", "a*b", true),
    ("a\\*b", "ab", false),
    ("a?b", "a☺b", true),
    ("a[^a]b", "a☺b", true),
    ("a???b", "a☺b", false),
    ("a[^a][^a][^a]b", "a☺b", false),
    ("[a-ζ]*", "α", true),
    ("*[a-ζ]", "A", false),
    ("a?b", "a/b", false),
    ("a*b", "a/b", false),
    ("[\\]a]", "]", true),
    ("[\\-]", "-", true),
    ("[x\\-]", "x", true),
    ("[x\\-]", "-", true),
    ("[x\\-]", "z", false),
    ("[\\-x]", "x", true),
    ("[\\-x]", "-", true),
    ("[\\-x]", "a", false),
    ("*x", "xxx", true)
  )

  table.foreach { case (p, s, expected) =>
    test(s"match('$p', '$s') == $expected") {
      assert(m(p, s) == Right(expected))
    }
  }

  private val badPatterns = Seq(
    "[]a]", "[-]", "[x-]", "[-x]", "\\", "[a-b-c]", "[", "[^", "[^bc", "a["
  )

  badPatterns.foreach { p =>
    test(s"malformed pattern '$p' errors") {
      assert(m(p, "a").isLeft, s"'$p' should be a bad pattern")
    }
  }

  test("whole-string match, not substring") {
    assert(m("bc", "abc") == Right(false))
    assert(m("ab", "abc") == Right(false))
  }
}
