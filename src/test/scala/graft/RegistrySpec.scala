package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's correctness gate only hash-checks queries that appear in
  * BOTH maps — a registry drift (query without oracle, or oracle without
  * query) silently weakens or skips a gate. Pin exact equality.
  */
class RegistrySpec extends AnyFunSuite {
  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle SQL: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracle SQL without a query: ${(o -- q).toSeq.sorted}")
  }
}
