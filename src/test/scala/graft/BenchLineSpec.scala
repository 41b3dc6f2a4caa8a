package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The harness keeps only the last ~2000 chars of the bench run's output
  * (plus sbt's trailing "[success] ..." line) and json-parses the bench
  * line out of it. BENCH_r01/r02 were both lost to an over-long line —
  * this spec pins the budget so it cannot regress.
  */
class BenchLineSpec extends AnyFunSuite with Matchers {

  test("bench JSON line stays under the harness tail budget at worst-case widths") {
    // every headline query at a worst-case 4-digit seconds value
    val worst = Bench.headline.map(_ -> 9999.999)
    val line = Bench.line(999999.999, worst, "/root/testdata/sf0.1", "32")
    line.length should be < 1800
    // the driver's scaling heuristic reads the honored core count off
    // the line (r17 verdict #5)
    line should include (""""cpus":32""")
    // a non-numeric cpus value must not corrupt the JSON
    Bench.line(1.0, worst, "/x", "*") should include (""""cpus":-1""")
    // and it must be valid JSON-ish: balanced braces, no raw newlines
    line.count(_ == '{') shouldBe line.count(_ == '}')
    line should not include "\n"
  }

  test("headline names exist in the query registry") {
    val known = SparkEntry.queries.keySet
    Bench.headline.filterNot(known.contains) shouldBe empty
  }
}
