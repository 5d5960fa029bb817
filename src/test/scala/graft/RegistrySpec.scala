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

  /** Twice (round-8 qsp2, round-9 qe18) a gate landed in the end-of-round
    * snapshot without ever having been RUN, and was broken at HEAD. This
    * test makes that impossible to do silently: `graft.Verify` records
    * every gate that successfully dumped in `tools/verified_gates.txt`
    * (full run rewrites, SPARK_GRAFT_ONLY runs merge), and a declared
    * gate missing from that manifest fails `sbt test` with instructions.
    */
  test("every declared gate has a successful Verify run on record") {
    val manifest = java.nio.file.Paths.get("tools", "verified_gates.txt")
    assert(java.nio.file.Files.exists(manifest),
      "tools/verified_gates.txt missing — run `sbt \"runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out\"`")
    val verified = java.nio.file.Files.readString(manifest)
      .split("\n").map(_.trim).filter(_.nonEmpty).toSet
    val unverified = SparkEntry.queries.keySet -- verified
    assert(unverified.isEmpty,
      s"gates declared but never verified (run Verify with SPARK_GRAFT_ONLY=${unverified.toSeq.sorted.mkString(",")} then oracle_check): ${unverified.toSeq.sorted}")
  }
}
