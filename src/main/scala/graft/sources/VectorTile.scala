package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S13 — Mapbox Vector Tile (MVT 2.1, public spec) sink: the reference
  * shells out to tippecanoe for this step (`indicators.sh:109`); here the
  * tile encoding is native, closing the last §2 row that stayed external.
  *
  * The container is protobuf; the wire format is hand-rolled below
  * (varint / zigzag / length-delimited — the whole of what MVT needs), so
  * there is no protobuf library dependency.
  *
  * Two tiers:
  *  - [[encodeTile]]/[[decodeTile]]: one tile from features already in
  *    tile coordinates (integer 0..extent) — the deterministic kernel the
  *    oracle gate replays.
  *  - [[writeTiles]]: the DISTRIBUTED sink — features carry lon/lat, the
  *    plan computes each feature's (z, x, y) tile key, groups by tile,
  *    and each task encodes + writes its tiles executor-side. One shuffle
  *    on the tile key, tiles never touch the driver — the tippecanoe
  *    replacement shape at 100 TB.
  */
object VectorTile {

  case class Feature(
      id: Long,
      geomType: Int, // 1 point, 2 linestring, 3 polygon
      // one inner Seq per part (ring / line / multipoint run), tile coords
      geometry: Seq[Seq[(Int, Int)]],
      attrs: Map[String, String])

  case class Layer(name: String, extent: Int, features: Seq[Feature])

  // ---------------------------------------------------------- protobuf
  private final class PbWriter {
    private val out = new java.io.ByteArrayOutputStream()
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write((x & 0x7f).toInt)
    }
    def key(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = { key(field, 2); varint(b.length); out.write(b, 0, b.length) }
    def string(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def uint(field: Int, v: Long): Unit = { key(field, 0); varint(v) }
    def toArray: Array[Byte] = out.toByteArray
  }

  private def zigzag(v: Int): Long = ((v << 1) ^ (v >> 31)).toLong & 0xffffffffL
  private def unzigzag(v: Long): Int = ((v >>> 1) ^ -(v & 1)).toInt

  /** Geometry command stream (MVT §4.3): MoveTo(1)/LineTo(2)/ClosePath(7)
    * with zigzag deltas; cursor persists across parts.
    */
  private def geometryCommands(geomType: Int, parts: Seq[Seq[(Int, Int)]]): Array[Long] = {
    val cmds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cx = 0
    var cy = 0
    def delta(p: (Int, Int)): Unit = {
      cmds += zigzag(p._1 - cx); cmds += zigzag(p._2 - cy)
      cx = p._1; cy = p._2
    }
    geomType match {
      case 1 => // points: ONE MoveTo with count = n
        cmds += ((parts.map(_.size).sum.toLong << 3) | 1)
        parts.flatten.foreach(delta)
      case 2 | 3 =>
        parts.foreach { part =>
          require(part.size >= 2, "line/ring part needs >= 2 points")
          cmds += ((1L << 3) | 1) // MoveTo ×1
          delta(part.head)
          cmds += (((part.size - 1).toLong << 3) | 2) // LineTo ×(n−1)
          part.tail.foreach(delta)
          if (geomType == 3) cmds += ((1L << 3) | 7) // ClosePath
        }
      case t => throw new IllegalArgumentException(s"bad MVT geometry type $t")
    }
    cmds.toArray
  }

  /** Encode one tile (protobuf Tile message: repeated Layer field 3). */
  def encodeTile(layers: Seq[Layer]): Array[Byte] = {
    val tile = new PbWriter
    layers.foreach { layer =>
      // keys/values dedup: MVT interns attribute keys and values per layer
      val keys = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      val values = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      layer.features.foreach(_.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
        require(k != null && v != null, "MVT attributes cannot be null — drop the key instead")
        keys.getOrElseUpdate(k, keys.size)
        values.getOrElseUpdate(v, values.size)
      })
      val lw = new PbWriter
      lw.uint(15, 2) // version
      lw.string(1, layer.name)
      layer.features.foreach { f =>
        val fw = new PbWriter
        fw.uint(1, f.id)
        val tags = f.attrs.toSeq.sortBy(_._1).flatMap { case (k, v) =>
          Seq(keys(k).toLong, values(v).toLong)
        }
        if (tags.nonEmpty) {
          val tw = new PbWriter
          tags.foreach(tw.varint)
          fw.bytes(2, tw.toArray)
        }
        fw.uint(3, f.geomType.toLong)
        val gw = new PbWriter
        geometryCommands(f.geomType, f.geometry).foreach(gw.varint)
        fw.bytes(4, gw.toArray)
        lw.bytes(2, fw.toArray)
      }
      keys.keys.foreach(lw.string(3, _))
      values.keys.foreach { v => // Value message, string_value field 1
        val vw = new PbWriter
        vw.string(1, v)
        lw.bytes(4, vw.toArray)
      }
      lw.uint(5, layer.extent.toLong)
      tile.bytes(3, lw.toArray)
    }
    tile.toArray
  }

  // ---------------------------------------------------------- decoder
  private final class PbReader(b: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def varint(): Long = {
      var x = 0L
      var s = 0
      var more = true
      while (more) {
        val v = b(pos) & 0xff
        pos += 1
        x |= (v & 0x7fL) << s
        s += 7
        more = (v & 0x80) != 0
      }
      x
    }
    def keyField(): (Int, Int) = { val k = varint(); ((k >>> 3).toInt, (k & 7).toInt) }
    def sub(): PbReader = { val len = varint().toInt; val r = new PbReader(b, pos, pos + len); pos += len; r }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 2 => val len = varint().toInt; pos += len
      case 5 => pos += 4
      case 1 => pos += 8
    }
    def utf8(): String = { val len = varint().toInt; val s = new String(b, pos, len, "UTF-8"); pos += len; s }
  }

  /** Decode a tile produced by [[encodeTile]] (and any spec-conformant
    * writer with string attribute values) — the read half of the
    * round-trip gate.
    */
  def decodeTile(bytes: Array[Byte]): Seq[Layer] = {
    val layers = scala.collection.mutable.ArrayBuffer.empty[Layer]
    val r = new PbReader(bytes, 0, bytes.length)
    while (r.hasNext) {
      val (f, w) = r.keyField()
      if (f == 3 && w == 2) {
        val lr = r.sub()
        var name = ""
        var extent = 4096
        val keys = scala.collection.mutable.ArrayBuffer.empty[String]
        val values = scala.collection.mutable.ArrayBuffer.empty[String]
        val rawFeatures = scala.collection.mutable.ArrayBuffer.empty[PbReader]
        while (lr.hasNext) {
          val (lf, lw) = lr.keyField()
          (lf, lw) match {
            case (1, 2) => name = lr.utf8()
            case (2, 2) => rawFeatures += lr.sub()
            case (3, 2) => keys += lr.utf8()
            case (4, 2) =>
              val vr = lr.sub()
              var sv = ""
              while (vr.hasNext) {
                val (vf, vw) = vr.keyField()
                if (vf == 1 && vw == 2) sv = vr.utf8() else vr.skip(vw)
              }
              values += sv
            case (5, 0) => extent = lr.varint().toInt
            case (_, lwv) => lr.skip(lwv)
          }
        }
        val feats = rawFeatures.map { fr =>
          var id = 0L
          var gt = 0
          var tags = Array.empty[Long]
          var cmds = Array.empty[Long]
          while (fr.hasNext) {
            val (ff, fw) = fr.keyField()
            (ff, fw) match {
              case (1, 0) => id = fr.varint()
              case (2, 2) =>
                val tr = fr.sub()
                val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
                while (tr.hasNext) buf += tr.varint()
                tags = buf.toArray
              case (3, 0) => gt = fr.varint().toInt
              case (4, 2) =>
                val gr = fr.sub()
                val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
                while (gr.hasNext) buf += gr.varint()
                cmds = buf.toArray
              case (_, fwv) => fr.skip(fwv)
            }
          }
          val attrs = tags.grouped(2).collect {
            case Array(k, v) => keys(k.toInt) -> values(v.toInt)
          }.toMap
          // replay the command stream back to parts
          val parts = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, Int)]]
          var part = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
          var cx = 0
          var cy = 0
          var i = 0
          while (i < cmds.length) {
            val cmd = (cmds(i) & 7).toInt
            val count = (cmds(i) >>> 3).toInt
            i += 1
            cmd match {
              case 1 => // MoveTo starts a new part (except the point-run form)
                var c = 0
                while (c < count) {
                  if (part.nonEmpty && gt != 1) { parts += part.toSeq; part = scala.collection.mutable.ArrayBuffer.empty }
                  cx += unzigzag(cmds(i)); cy += unzigzag(cmds(i + 1)); i += 2
                  part += ((cx, cy))
                  c += 1
                }
              case 2 =>
                var c = 0
                while (c < count) {
                  cx += unzigzag(cmds(i)); cy += unzigzag(cmds(i + 1)); i += 2
                  part += ((cx, cy))
                  c += 1
                }
              case 7 => // ClosePath: ring ends
                parts += part.toSeq; part = scala.collection.mutable.ArrayBuffer.empty
              case other => throw new IllegalArgumentException(s"bad MVT command $other")
            }
          }
          if (part.nonEmpty) parts += part.toSeq
          Feature(id, gt, parts.toSeq, attrs)
        }
        layers += Layer(name, extent, feats.toSeq)
      } else r.skip(w)
    }
    layers.toSeq
  }

  // ---------------------------------------------------------- Spark sink
  /** WebMercator lon/lat → global pixel position at `zoom` (extent units
    * per tile). Shared by the plan-side column math and the spec anchors.
    */
  def mercator(lon: Double, lat: Double, zoom: Int, extent: Int): (Double, Double) = {
    val n = (1L << zoom).toDouble
    val wx = (lon + 180.0) / 360.0 * n
    val latRad = math.toRadians(lat)
    val wy = (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0 * n
    (wx * extent, wy * extent)
  }

  /** DISTRIBUTED point-tile sink: `df(idCol, lonCol, latCol, attrCols…)`
    * → one `{z}/{x}/{y}.mvt` per occupied tile under `dir`. One shuffle
    * (groupBy tile key); each task encodes and writes its own tiles —
    * no driver collect, no external tool.
    */
  def writeTiles(
      df: DataFrame,
      idCol: String,
      lonCol: String,
      latCol: String,
      attrCols: Seq[String],
      zoom: Int,
      dir: String,
      layerName: String = "layer",
      extent: Int = 4096): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = 1L << zoom
    val rows = df.select(
      col(idCol).cast("long").as("id"),
      col(lonCol).cast("double").as("lon"),
      col(latCol).cast("double").as("lat"),
      map(attrCols.flatMap(c => Seq(lit(c), col(c).cast("string"))): _*).as("attrs"))
    val keyed = rows.as[(Long, Double, Double, Map[String, String])].map { case (id, lon, lat, attrs) =>
      val (gx, gy) = mercator(lon, lat, zoom, extent)
      val tx = math.min(n - 1, math.max(0, math.floor(gx / extent).toLong))
      val ty = math.min(n - 1, math.max(0, math.floor(gy / extent).toLong))
      val px = (gx - tx * extent).round.toInt
      val py = (gy - ty * extent).round.toInt
      // null attr values (null source columns cast to string) have no MVT
      // representation — absent key, not an executor NPE in encodeTile
      (tx * n + ty, id, px, py, attrs.filter(_._2 != null))
    }
    keyed
      .groupByKey(_._1)
      .mapGroups { (tileKey, it) =>
        val feats = it.map { case (_, id, px, py, attrs) =>
          Feature(id, 1, Seq(Seq((px, py))), attrs)
        }.toSeq.sortBy(_.id)
        (tileKey, encodeTile(Seq(Layer(layerName, extent, feats))))
      }
      .foreachPartition { (it: Iterator[(Long, Array[Byte])]) =>
        it.foreach { case (tileKey, bytes) =>
          val tx = tileKey / n
          val ty = tileKey % n
          val p = java.nio.file.Paths.get(dir, zoom.toString, tx.toString, s"$ty.mvt")
          java.nio.file.Files.createDirectories(p.getParent)
          java.nio.file.Files.write(p, bytes)
        }
      }
  }
}
