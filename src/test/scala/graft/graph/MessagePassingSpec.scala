package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSession

/** Message-passing contracts: hand-computed 2-round fold, round-0 seed
  * identity, dst-only nodes kept (zero seed), no-inflow nodes carry
  * their feature.
  */
class MessagePassingSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4, "msgpass-spec")
  import spark.implicits._

  private def edges = Seq(
    (1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 1L)
  ).toDF("s", "d", "w")

  test("two hand-computed rounds over a weighted triangle") {
    // h0 (out-strength): 1 -> 3, 2 -> 3, 3 -> 0 (dst-only node kept)
    val h0 = MessagePassing.run(edges, "s", "d", "w", rounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h0 == Map(1L -> 3L, 2L -> 3L, 3L -> 0L))
    // round 1: inflow 2: 2*3 = 6; 3: 3*3 + 1*3 = 12; 1 carries (no inflow)
    val h1 = MessagePassing.run(edges, "s", "d", "w", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 == Map(1L -> 3L, 2L -> 9L, 3L -> 12L))
    // round 2: inflow 2: 2*3 = 6 -> 15; 3: 3*9 + 1*3 = 30 -> 42
    val h2 = MessagePassing.run(edges, "s", "d", "w", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h2 == Map(1L -> 3L, 2L -> 15L, 3L -> 42L))
    intercept[IllegalArgumentException](
      MessagePassing.run(edges, "s", "d", "w", rounds = 9))
  }

}
