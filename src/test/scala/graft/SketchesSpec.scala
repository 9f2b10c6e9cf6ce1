package graft

import graft.operators.Sketches
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("sketch gate: every approximate aggregate lands inside its bound at sf0.001") {
    val rows = Sketches.gate(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getBoolean(2)),
      rows.map(r => s"${r.getString(0)} exact=${r.getLong(1)} ok=${r.getBoolean(2)}")
        .mkString("; "))
  }

  test("CMS heavy hitters: estimates bound the exact top-k at sf0.001") {
    val rows = Sketches.heavyHitters(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getBoolean(2)),
      rows.map(r => s"${r.getString(0)}=${r.getLong(1)} ok=${r.getBoolean(2)}")
        .mkString("; "))
    // exact counts strictly ranked (ties broken by term, so descending)
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sortBy(-_))
  }

  test("CMS heavy hitters: a non-default eps keeps sketch and bound consistent") {
    val rows = Sketches.heavyHitters(spark, "/root/testdata/sf0.001",
      k = 5, eps = 1e-2).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getBoolean(2)),
      "wider-eps sketch must still sit inside its matching wider bound")
  }
}
