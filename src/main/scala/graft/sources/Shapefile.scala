package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — ESRI Shapefile scan (reference ingests .shp via ogr2ogr,
  * `scripts/base-network.sh:98-99`; here a native reader so the engine has
  * no GDAL process dependency).
  *
  * Implements the public shapefile spec (ESRI whitepaper): 100-byte header
  * (file code 9994 big-endian, shape type little-endian at offset 32),
  * records of [BE record header][LE content]. Shape types: 1 Point,
  * 3 PolyLine, 5 Polygon (incl. multi-part). Attributes come from the
  * sibling dBase III `.dbf` (field descriptors + fixed-width records).
  *
  * Spark shape: `binaryFile` source lands each file whole in an executor
  * task; parsing is per-file `flatMap` — a directory of shapefiles
  * parallelizes per file, and attribute/geometry zip happens in-task (no
  * shuffle). Reprojection (the `-t_srs EPSG:4326` step) is a downstream
  * scalar expression on coords, not a reader concern.
  */
object Shapefile {

  case class ShpFeature(
      record_no: Int,
      geom_type: String,
      parts: Seq[Seq[Seq[Double]]], // part → point → [x, y]
      attrs: Map[String, String])

  /** Parse .shp geometry records. */
  def parseShp(bytes: Array[Byte]): Seq[(Int, String, Seq[Seq[Seq[Double]]])] = {
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == 9994, "not a shapefile (bad file code)")
    val fileLenBytes = buf.getInt(24) * 2
    var off = 100
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, Seq[Seq[Seq[Double]]])]()
    while (off + 8 <= fileLenBytes) {
      val recNo = buf.getInt(off)
      val contentLen = buf.getInt(off + 4) * 2
      val c = ByteBuffer.wrap(bytes, off + 8, contentLen).order(ByteOrder.LITTLE_ENDIAN)
      val shapeType = c.getInt
      shapeType match {
        case 0 => // null shape
        case 1 =>
          out += ((recNo, "Point", Seq(Seq(Seq(c.getDouble, c.getDouble)))))
        case 3 | 5 =>
          c.position(c.position() + 32) // skip bbox
          val numParts = c.getInt
          val numPoints = c.getInt
          val partIdx = Array.fill(numParts)(c.getInt)
          val pts = Array.fill(numPoints)(Seq(c.getDouble, c.getDouble))
          val bounds = partIdx :+ numPoints
          val parts = (0 until numParts).map(p => pts.slice(bounds(p), bounds(p + 1)).toSeq)
          out += ((recNo, if (shapeType == 3) "PolyLine" else "Polygon", parts))
        case t => throw new IllegalArgumentException(s"unsupported shape type $t")
      }
      off += 8 + contentLen
    }
    out.toSeq
  }

  /** Parse dBase III .dbf attribute records (returns one Map per record,
    * in record order — aligned 1:1 with .shp record order per the spec).
    *
    * `wanted` is COLUMN PRUNING at parse time: real shapefiles carry
    * dozens of attribute columns, and decoding them all just to `.select`
    * two downstream wastes the scan. With a projection, non-requested
    * fields are never materialized — the parser advances `pos` past their
    * fixed-width bytes without constructing a String.
    */
  def parseDbf(bytes: Array[Byte], wanted: Option[Set[String]] = None): Seq[Map[String, String]] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val numRecords = buf.getInt(4)
    val headerSize = buf.getShort(8) & 0xffff
    val recordSize = buf.getShort(10) & 0xffff
    // field descriptors: 32 bytes each, from offset 32 until 0x0D terminator
    val fields = scala.collection.mutable.ArrayBuffer[(String, Char, Int)]()
    var off = 32
    while (off < headerSize - 1 && bytes(off) != 0x0d) {
      val name = new String(bytes, off, 11, "ASCII").takeWhile(_ != 0).trim
      val ftype = bytes(off + 11).toChar
      val flen = bytes(off + 16) & 0xff
      fields += ((name, ftype, flen))
      off += 32
    }
    // per-field decode decision computed ONCE, not once per record
    val keep: Array[Boolean] = fields.map(f => wanted.forall(_.contains(f._1))).toArray
    (0 until numRecords).map { r =>
      val base = headerSize + r * recordSize
      var pos = base + 1 // skip deletion flag
      val rec = Map.newBuilder[String, String]
      var i = 0
      while (i < fields.length) {
        val flen = fields(i)._3
        if (keep(i)) rec += fields(i)._1 -> new String(bytes, pos, flen, "ASCII").trim
        pos += flen
        i += 1
      }
      rec.result()
    }
  }

  /** Read a shapefile (+ optional sibling .dbf/.prj) into a DataFrame.
    * `path` may be a glob/directory understood by the binaryFile source;
    * sidecars are matched to .shp by basename.
    *
    * CRS normalization (the reference's `ogr2ogr -t_srs EPSG:4326` step,
    * `scripts/base-network.sh:98-99`): when a `.prj` sidecar declares a
    * `Transverse_Mercator` (e.g. the UTM 36S/37S zones Mozambique data
    * ships in), `Lambert_Conformal_Conic`, or `Albers` PROJCS, every
    * coordinate is reprojected to lon/lat on ingest via
    * [[graft.functions.Crs.inverseTransform]]. A GEOGCS-only or absent
    * `.prj` passes coordinates through unchanged; an unsupported
    * projection THROWS — a loud ingest failure beats silently treating
    * metres as degrees.
    */
  def read(spark: SparkSession, path: String, attrColumns: Seq[String] = Nil): DataFrame = {
    import spark.implicits._
    import graft.functions.Crs
    // attribute projection pushed INTO the .dbf parse (the reader-level
    // analog of parquet column pruning): empty = all columns
    val wanted = if (attrColumns.isEmpty) None else Some(attrColumns.toSet)
    val files = spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
    files.rdd
      .groupBy { case (p, _) => p.replaceAll("\\.(shp|dbf|prj)$", "") }
      .flatMap { case (_, fs) =>
        val byExt = fs.map { case (p, b) => (p.split('.').last.toLowerCase, b) }.toMap
        val geoms = byExt.get("shp").map(parseShp).getOrElse(Seq.empty)
        val attrs = byExt.get("dbf").map(parseDbf(_, wanted)).getOrElse(Seq.empty)
        val crs = byExt.get("prj")
          .map(b => Crs.parsePrj(new String(b, "ASCII")))
          .getOrElse(Crs.Geographic)
        val reproject: Seq[Seq[Seq[Double]]] => Seq[Seq[Seq[Double]]] =
          Crs.inverseTransform(crs) match {
            case None => identity
            case Some(inv) =>
              parts => parts.map(_.map { pt =>
                val (lon, lat) = inv(pt(0), pt(1))
                Seq(lon, lat)
              })
          }
        geoms.zipWithIndex.map { case ((recNo, gt, parts), i) =>
          ShpFeature(recNo, gt, reproject(parts), if (i < attrs.size) attrs(i) else Map.empty)
        }
      }
      .toDF()
  }

  /** Point-shapefile sink: writes a spec-conformant .shp (+ sibling dBase
    * III .dbf when attributes are given). Small-vector egress/fixture
    * counterpart of [[read]] — the reference's shapefile traffic is
    * driver-small network extracts, so this collects nothing (callers
    * pass driver-side Seqs). Record numbers are 1-based in input order;
    * `fieldLens` fixes .dbf column order and width (values are
    * space-padded ASCII, type 'C').
    */
  def writePoints(
      shpPath: String,
      pts: Seq[(Double, Double)],
      attrs: Seq[Map[String, String]] = Seq.empty,
      fieldLens: Seq[(String, Int)] = Seq.empty): Unit = {
    require(shpPath.endsWith(".shp"),
      s"shapefile path must end in .shp (got $shpPath) — the .dbf sidecar derives from it")
    val recLen = 8 + 4 + 16 // record header + shape type + x,y
    val total = 100 + pts.size * recLen
    val b = ByteBuffer.allocate(total)
    b.order(ByteOrder.BIG_ENDIAN)
    b.putInt(0, 9994)
    b.putInt(24, total / 2)
    b.order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(28, 1000) // version
    b.putInt(32, 1) // Point
    if (pts.nonEmpty) {
      b.putDouble(36, pts.map(_._1).min)
      b.putDouble(44, pts.map(_._2).min)
      b.putDouble(52, pts.map(_._1).max)
      b.putDouble(60, pts.map(_._2).max)
    }
    b.position(100)
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      b.order(ByteOrder.BIG_ENDIAN)
      b.putInt(i + 1).putInt((4 + 16) / 2)
      b.order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(1).putDouble(x).putDouble(y)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(shpPath), b.array())

    if (fieldLens.nonEmpty) {
      require(attrs.size == pts.size, "one attribute map per point")
      val headerSize = 32 + fieldLens.size * 32 + 1
      val recordSize = 1 + fieldLens.map(_._2).sum
      val d = ByteBuffer.allocate(headerSize + attrs.size * recordSize + 1)
        .order(ByteOrder.LITTLE_ENDIAN)
      d.put(0, 0x03.toByte)
      d.putInt(4, attrs.size)
      d.putShort(8, headerSize.toShort)
      d.putShort(10, recordSize.toShort)
      var off = 32
      fieldLens.foreach { case (name, len) =>
        require(name.length <= 10, s"dbf field name too long: $name")
        val nb = name.getBytes("ASCII")
        var i = 0
        while (i < nb.length) { d.put(off + i, nb(i)); i += 1 }
        d.put(off + 11, 'C'.toByte)
        d.put(off + 16, len.toByte)
        off += 32
      }
      d.put(off, 0x0d.toByte)
      var pos = headerSize
      attrs.foreach { rec =>
        d.put(pos, ' '.toByte)
        var p = pos + 1
        fieldLens.foreach { case (name, len) =>
          val v = rec.getOrElse(name, "")
          require(v.length <= len, s"value '$v' exceeds field width $len")
          val padded = v.padTo(len, ' ').getBytes("ASCII")
          var i = 0
          while (i < len) { d.put(p + i, padded(i)); i += 1 }
          p += len
        }
        pos += recordSize
      }
      // dBase III EOF marker (strict readers like shapelib/GDAL check it)
      d.put(headerSize + attrs.size * recordSize, 0x1a.toByte)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(shpPath.replaceAll("\\.shp$", ".dbf")),
        d.array())
    }
  }
}
