package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process._

/** Pins the bounded-twin arithmetic at the gate decade (round-16 advice):
  * dumps every entry that carries a bounded oracle twin at sf0.01, then
  * runs `tools/verify_local.py` with `BOUNDED_ORACLES=force`, which (a)
  * compares each entry's FULL twin against the engine and (b) re-compares
  * the BOUNDED twin against the engine output filtered by the identical
  * sample predicate. A sampling-arithmetic bug (the either-endpoint
  * `pred(a) OR pred(b)` emission, the `a<b OR NOT pred(b)` dedup guard,
  * fraction rounding) fails here in `sbt test` instead of surfacing as a
  * silent divergence in a big-sf campaign. At sf0.01 most caps land at
  * fraction 1.0 (bounded degenerates to the full twin) but the
  * embeddings-universe cap of 500 over 2,000 vectors exercises REAL 0.25
  * sampling, as do the forced small caps in the campaign ladder. */
class BoundedOracleSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.01"

  test("bounded twins agree with engine-filtered output under force mode") {
    assume(new java.io.File(sfDir).isDirectory, s"$sfDir missing")
    assume(new java.io.File("tools/verify_local.py").exists(),
      "verify_local.py missing")
    val duck = Process(Seq("python3", "-c", "import duckdb")).! == 0
    assume(duck, "python3/duckdb unavailable")

    val spark = TestSpark.spark
    val out = java.nio.file.Files
      .createTempDirectory("graft-bounded-oracle").toString
    val names = SparkEntry.oracleSqlBounded.keySet
    assert(names.nonEmpty, "no bounded twins registered")
    Verify.dump(spark, sfDir, out, names)

    val jsonOut = s"$out/report.json"
    val cmd = Seq("python3", "tools/verify_local.py", sfDir, out,
      "--json", jsonOut)
    val sb = new StringBuilder
    val code = Process(cmd, new java.io.File("."),
      "BOUNDED_ORACLES" -> "force")
      .!(ProcessLogger(l => sb.append(l).append('\n'),
                       l => sb.append(l).append('\n')))
    val log = sb.toString
    assert(code == 0, s"verify_local force-mode failed:\n$log")
    // every dumped entry must be ok AND carry a green bounded_check:
    // exactly one "bounded_check": "ok" per bounded twin, zero mismatch
    val report = java.nio.file.Files.readString(
      java.nio.file.Paths.get(jsonOut))
    val greenChecks = "\"bounded_check\": \"ok\"".r
      .findAllMatchIn(report).size
    assert(greenChecks == names.size,
      s"expected ${names.size} green bounded_checks, got $greenChecks:\n$log")
    assert(!report.contains("\"status\": \"mismatch\"") &&
      !report.contains("\"status\": \"oracle_error\""),
      s"a bounded twin diverged or errored:\n$log")
  }
}
