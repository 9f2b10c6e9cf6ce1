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

  test("every entry named in the SURVEY §2.12 table exists in the code") {
    // rows of the §2.12 table carry the entry in the second column;
    // parse just that table so prose backticks (config keys, file
    // names) don't false-positive
    val section = survey.split("### 2\\.12 ")(1).split("\n## ")(0)
    val named = "\\| *`([a-z0-9_]+)`(?: *, *`([a-z0-9_]+)`)? *\\|".r
      .findAllMatchIn(section)
      .flatMap(m => Seq(Option(m.group(1)), Option(m.group(2))).flatten)
      .toSet
    assert(named.nonEmpty, "the §2.12 table must parse")
    val ghosts = named.diff(entries)
    assert(ghosts.isEmpty,
      s"SURVEY §2.12 names entries that do not exist: ${ghosts.toSeq.sorted.mkString(", ")}")
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
