package graft.sources

import graft.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** MVT sink: wire-format anchors from the public spec, encode/decode
  * round-trips, and the distributed per-tile writer.
  */
class VectorTileSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(2, "mvt-spec")

  test("geometry command stream matches the spec's worked example") {
    // MVT spec §4.3.5.1 example: point at (25,17) → MoveTo(25,17):
    // command 9 (id 1, count 1), params 50, 34
    val t = VectorTile.encodeTile(Seq(VectorTile.Layer("t", 4096, Seq(
      VectorTile.Feature(1L, 1, Seq(Seq((25, 17))), Map.empty)))))
    val hex = t.map(b => f"${b & 0xff}%02x").mkString
    // the encoded geometry field must contain the bytes 09 32 22
    assert(hex.contains("093222"), s"geometry bytes missing from $hex")
  }

  test("polygon round-trip preserves rings, ids, types and attrs") {
    val ring = Seq((3, 6), (8, 12), (20, 34), (3, 6))
    // MVT polygons don't repeat the closing point — ClosePath implies it
    val poly = VectorTile.Feature(7L, 3, Seq(ring.dropRight(1)), Map("kind" -> "zone", "n" -> "4"))
    val line = VectorTile.Feature(8L, 2, Seq(Seq((1, 1), (5, 1), (5, 9))), Map("kind" -> "road"))
    val pts = VectorTile.Feature(9L, 1, Seq(Seq((5, 7), (3, 2))), Map.empty)
    val enc = VectorTile.encodeTile(Seq(VectorTile.Layer("mix", 4096, Seq(poly, line, pts))))
    val Seq(layer) = VectorTile.decodeTile(enc)
    assert(layer.name == "mix" && layer.extent == 4096)
    val byId = layer.features.map(f => f.id -> f).toMap
    assert(byId(7L).geomType == 3 && byId(7L).geometry == Seq(ring.dropRight(1)))
    assert(byId(7L).attrs == Map("kind" -> "zone", "n" -> "4"))
    assert(byId(8L).geometry == Seq(Seq((1, 1), (5, 1), (5, 9))))
    assert(byId(9L).geomType == 1 && byId(9L).geometry.flatten == Seq((5, 7), (3, 2)))
  }

  test("negative deltas zigzag correctly (cursor moves backwards)") {
    val f = VectorTile.Feature(1L, 2, Seq(Seq((100, 100), (10, 90), (50, 5))), Map.empty)
    val Seq(layer) = VectorTile.decodeTile(VectorTile.encodeTile(Seq(VectorTile.Layer("l", 4096, Seq(f)))))
    assert(layer.features.head.geometry == Seq(Seq((100, 100), (10, 90), (50, 5))))
  }

  test("mercator anchors: equator/prime-meridian center and zoom scaling") {
    // (0,0) at zoom 0 sits at the center of the single world tile
    val (x0, y0) = VectorTile.mercator(0.0, 0.0, 0, 4096)
    assert(x0 == 2048.0 && y0 == 2048.0)
    // zoom z doubles the world each level
    val (x2, _) = VectorTile.mercator(0.0, 0.0, 2, 4096)
    assert(x2 == 2.0 * 4096)
    // longitude edge: -180 maps to world pixel 0
    assert(VectorTile.mercator(-180.0, 0.0, 3, 4096)._1 == 0.0)
  }

  test("distributed writeTiles: per-tile files, features land in the right tile") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mvt").toString
    // four points in distinct z1 tiles (quadrants)
    val df = Seq(
      (1L, -90.0, 40.0, "nw"),
      (2L, 90.0, 40.0, "ne"),
      (3L, -90.0, -40.0, "sw"),
      (4L, 90.0, -40.0, "se")).toDF("id", "lon", "lat", "name")
    VectorTile.writeTiles(df, "id", "lon", "lat", Seq("name"), zoom = 1, dir = dir)
    def readTile(tx: Int, ty: Int) = {
      val p = java.nio.file.Paths.get(dir, "1", tx.toString, s"$ty.mvt")
      assert(java.nio.file.Files.exists(p), s"missing tile $tx/$ty")
      VectorTile.decodeTile(java.nio.file.Files.readAllBytes(p)).head
    }
    assert(readTile(0, 0).features.map(_.id) == Seq(1L))
    assert(readTile(1, 0).features.map(_.id) == Seq(2L))
    assert(readTile(0, 1).features.map(_.id) == Seq(3L))
    assert(readTile(1, 1).features.map(_.id) == Seq(4L))
    assert(readTile(1, 0).features.head.attrs("name") == "ne")
    // pixel coords: lon 90 at z1 → world x = 1.5 tiles → px 2048 in tile 1
    assert(readTile(1, 0).features.head.geometry.head.head._1 == 2048)
  }
}
