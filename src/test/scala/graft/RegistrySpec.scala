package graft

import graft.analytics.Registry

/** Catalog-level invariants of the query registry: the driver's
  * correctness gate is only as strong as the catalog's shape. */
class RegistrySpec extends SparkSuite {

  test("every registered query has a DuckDB oracle (no rows-only checks)") {
    // round 8 closed the last five no_oracle rows — keep it that way:
    // a new query without an oracle silently downgrades the driver's
    // gate for that query to rows-only
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    withClue(s"queries without oracle: $missing — add an exact twin " +
      "(for approx/sampled ops: exact value + within-bound boolean)") {
      missing shouldBe empty
    }
  }

  test("query names are unique and driver-safe") {
    val names = Registry.all.map(_.name)
    names.distinct.length shouldBe names.length
    // names become output directory names and JSON keys
    names.foreach(n => n should fullyMatch regex "[a-z][a-z0-9_]*")
  }

  test("the catalog holds the round-8 floor of 150 queries") {
    Registry.all.length should be >= 150
  }
}
