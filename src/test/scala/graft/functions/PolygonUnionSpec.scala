package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class PolygonUnionSpec extends AnyFunSuite {

  private def rect(x1: Double, y1: Double, x2: Double, y2: Double): Seq[Seq[Seq[Double]]] =
    Seq(Seq(Seq(x1, y1), Seq(x2, y1), Seq(x2, y2), Seq(x1, y2), Seq(x1, y1)))

  private def perimeter(rings: Seq[Seq[Seq[Double]]]): Double =
    rings.map(GeoFunctions.ringPerimeter).sum

  test("single rectangle round-trips: 1 ring, 4 corners, exact area/perimeter") {
    val out = PolygonUnion.union(Seq(rect(0, 0, 4, 3)))
    assert(out.size == 1)
    assert(out.head.size == 5) // 4 corners + closure, collinear splits fused
    assert(PolygonUnion.signedArea(out) == 12.0)
    assert(perimeter(out) == 14.0)
  }

  test("two overlapping rectangles dissolve to ONE traced boundary, area = A+B−A∩B") {
    // the reference ST_union case (preparation.sh:149-151): A=(0,0)-(4,3),
    // B=(2,1)-(6,5), A∩B=(2,1)-(4,3)=4 → area 12+16−4=24, perimeter 22
    val out = PolygonUnion.union(Seq(rect(0, 0, 4, 3), rect(2, 1, 6, 5)))
    assert(out.size == 1)
    assert(math.abs(PolygonUnion.signedArea(out) - 24.0) < 1e-9)
    assert(math.abs(perimeter(out) - 22.0) < 1e-9)
  }

  test("disjoint rectangles stay two rings; touching rectangles fuse into one") {
    val disjoint = PolygonUnion.union(Seq(rect(0, 0, 1, 1), rect(5, 5, 7, 6)))
    assert(disjoint.size == 2)
    assert(math.abs(PolygonUnion.signedArea(disjoint) - 3.0) < 1e-9)
    // shared edge at x=2: ST_union melts the internal boundary away
    val touching = PolygonUnion.union(Seq(rect(0, 0, 2, 2), rect(2, 0, 4, 2)))
    assert(touching.size == 1)
    assert(math.abs(PolygonUnion.signedArea(touching) - 8.0) < 1e-9)
    assert(math.abs(perimeter(touching) - 12.0) < 1e-9)
  }

  test("contained rectangle vanishes into its container") {
    val out = PolygonUnion.union(Seq(rect(0, 0, 6, 6), rect(2, 2, 3, 3)))
    assert(out.size == 1)
    assert(math.abs(PolygonUnion.signedArea(out) - 36.0) < 1e-9)
  }

  test("four rectangles forming a frame produce an outer ring AND a traced hole") {
    val frame = Seq(
      rect(0, 0, 5, 1), rect(0, 4, 5, 5), rect(0, 0, 1, 5), rect(4, 0, 5, 5))
    val out = PolygonUnion.union(frame)
    assert(out.size == 2) // outer boundary + hole boundary
    // signed shoelace: outer CCW (+25) + hole CW (−9)
    assert(math.abs(PolygonUnion.signedArea(out) - 16.0) < 1e-9)
    assert(math.abs(perimeter(out) - (20.0 + 12.0)) < 1e-9)
  }

  test("input polygon with a hole is honored (even-odd)") {
    val withHole = Seq(Seq(
      Seq(Seq(0.0, 0.0), Seq(6.0, 0.0), Seq(6.0, 6.0), Seq(0.0, 6.0), Seq(0.0, 0.0)),
      Seq(Seq(2.0, 2.0), Seq(4.0, 2.0), Seq(4.0, 4.0), Seq(2.0, 4.0), Seq(2.0, 2.0))))
    val alone = PolygonUnion.union(withHole)
    assert(alone.size == 2)
    assert(math.abs(PolygonUnion.signedArea(alone) - 32.0) < 1e-9)
    // a second polygon plugging the hole restores the full square
    val plugged = PolygonUnion.union(withHole :+ rect(2, 2, 4, 4))
    assert(plugged.size == 1)
    assert(math.abs(PolygonUnion.signedArea(plugged) - 36.0) < 1e-9)
  }

  test("non-axis-aligned overlap (triangle ∪ rectangle)") {
    val tri = Seq(Seq(Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(0.0, 4.0), Seq(0.0, 0.0)))
    val out = PolygonUnion.union(Seq(tri, rect(-1, -1, 1, 1)))
    // overlap = [0,1]² = 1 (x+y ≤ 4 everywhere there) → 8 + 4 − 1 = 11
    assert(math.abs(PolygonUnion.signedArea(out) - 11.0) < 1e-9)
    assert(out.size == 1)
  }

  test("identical duplicate polygons collapse to one copy") {
    val out = PolygonUnion.union(Seq(rect(1, 1, 3, 2), rect(1, 1, 3, 2)))
    assert(out.size == 1)
    assert(math.abs(PolygonUnion.signedArea(out) - 2.0) < 1e-9)
  }

  test("union is order-independent (deterministic for distributed merges)") {
    val polys = Seq(rect(0, 0, 4, 3), rect(2, 1, 6, 5), rect(10, 0, 11, 1), rect(3, 2, 5, 4))
    val a = PolygonUnion.union(polys)
    val b = PolygonUnion.union(polys.reverse)
    assert(a == b)
  }
}
