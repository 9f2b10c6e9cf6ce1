package graft

import org.scalatest.funsuite.AnyFunSuite

/** Inventory-closure gate (VERDICT r10 directive 6): the SURVEY §2
  * operator inventory is the audit contract — every `SparkEntry.queries`
  * key must appear there as a backticked entry name, and every entry
  * named in the inventory must exist in the code. A green build with a
  * hole in either direction is how silent divergence starts, so the
  * closure is a failing test, not a review convention.
  *
  * No SparkSession needed — this is pure file/registry introspection. */
class InventorySpec extends AnyFunSuite {

  private lazy val survey =
    scala.io.Source.fromFile("SURVEY.md", "UTF-8").mkString
  private lazy val readme =
    scala.io.Source.fromFile("README.md", "UTF-8").mkString

  // every `...`-quoted token in SURVEY that looks like an entry name
  private lazy val surveyRefs: Set[String] =
    "`([a-z0-9_]+)`".r.findAllMatchIn(survey).map(_.group(1)).toSet

  private lazy val entries: Set[String] = SparkEntry.queries.keySet

  test("every SparkEntry.queries key has a SURVEY inventory row") {
    val missing = entries.diff(surveyRefs)
    assert(missing.isEmpty,
      s"entries with no SURVEY §2 inventory mention: ${missing.toSeq.sorted.mkString(", ")}")
  }

  /** The named SURVEY section, bounded at the NEXT heading of any level
    * (a `\n## `-only bound would silently absorb a following `###`
    * sibling and exempt its rows from the ghost check). */
  private def section(headingRegex: String): String =
    survey.split(headingRegex)(1).split("\n#{1,6} ")(0)

  /** ALL backticked entry names in the given cell of each table row —
    * rows naming three or more entries in one cell count every one
    * (the old 1-or-2-capture regex left 3+-entry rows unchecked).
    * Parsing a single designated cell keeps prose backticks in the
    * other columns (config keys, §-references) from false-positives. */
  private def entryCellNames(sectionText: String, cellIdx: Int): Set[String] =
    sectionText.linesIterator
      .filter(_.trim.startsWith("|"))
      .flatMap { row =>
        val cells = row.split("\\|")
        if (cells.length > cellIdx)
          "`([a-z0-9_]+)`".r.findAllMatchIn(cells(cellIdx)).map(_.group(1))
        else Iterator.empty
      }.toSet

  test("every entry named in the SURVEY §2.12/§2.13 tables exists in the code") {
    // §2.12 rows carry the entry in the second column, §2.13 rows (the
    // entry↔inventory map) in the first
    val named212 = entryCellNames(section("### 2\\.12 "), 2)
    val named213 = entryCellNames(section("### 2\\.13 "), 1)
    assert(named212.nonEmpty, "the §2.12 table must parse")
    assert(named213.nonEmpty, "the §2.13 table must parse")
    val ghosts = (named212 ++ named213).diff(entries)
    assert(ghosts.isEmpty,
      s"SURVEY §2.12/§2.13 name entries that do not exist: ${ghosts.toSeq.sorted.mkString(", ")}")
  }

  test("every queries key has an oracle (the rows-only escape hatch stays empty)") {
    val missing = entries.diff(SparkEntry.oracleSql.keySet)
    assert(missing.isEmpty,
      s"entries with no DuckDB oracle: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("README's gate entry count matches the registry") {
    val m = "\\((\\d+) entries\\)".r.findFirstMatchIn(readme)
    assert(m.isDefined, "README must state the gate entry count")
    assert(m.get.group(1).toInt == entries.size,
      s"README says ${m.get.group(1)} entries, registry has ${entries.size}")
  }
}
