package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants nothing else pins: every declared query
  * has an oracle (a missing entry silently degrades that gate to a
  * rows-only check) and no oracle is orphaned (a misspelled key would
  * silently never run). Map construction needs no SparkSession. */
class SparkEntrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"queries without an oracle (driver degrades to rows-only): ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty,
      s"orphaned oracles (never run): ${(o -- q).toSeq.sorted}")
  }

  test("the gate count only moves deliberately") {
    // COVERAGE.md / README.md carry this number; failing here on an
    // accidental add/drop keeps the docs honest.
    assert(SparkEntry.queries.size == 181,
      s"gate count moved to ${SparkEntry.queries.size} — update COVERAGE.md/README.md and this pin")
  }
}
