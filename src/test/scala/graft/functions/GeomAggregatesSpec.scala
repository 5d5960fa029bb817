package graft.functions

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeomAggregatesSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(2, "geom-agg-spec")

  private def square(x0: Double, y0: Double, size: Double): Seq[Seq[Seq[Double]]] =
    Seq(Seq(
      Seq(x0, y0), Seq(x0 + size, y0), Seq(x0 + size, y0 + size),
      Seq(x0, y0 + size), Seq(x0, y0)))

  test("A2 dissolve: nested shell is absorbed (Maputo-into-province case)") {
    import spark.implicits._
    val df = Seq(
      ("MZ-L", square(0, 0, 10)), // province
      ("MZ-L", square(2, 2, 1)), // city inside it
      ("MZ-N", square(50, 50, 5))
    ).toDF("iso", "rings")
    val out = df
      .groupBy($"iso")
      .agg(GeomAggregates.geomUnion($"rings").as("dissolved"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[scala.collection.Seq[scala.collection.Seq[Double]]]](1))
      .toMap
    assert(out("MZ-L").size == 1) // city ring pruned
    assert(out("MZ-L").head.head.toSeq == Seq(0.0, 0.0))
    assert(out("MZ-N").size == 1)
  }

  test("A2 dissolve: disjoint shells both survive as multi-polygon") {
    import spark.implicits._
    val df = Seq(("A", square(0, 0, 1)), ("A", square(5, 5, 1))).toDF("iso", "rings")
    val out = df.groupBy($"iso").agg(GeomAggregates.geomUnion($"rings")).collect()
    assert(out.head.getAs[scala.collection.Seq[_]](1).size == 2)
  }
}
