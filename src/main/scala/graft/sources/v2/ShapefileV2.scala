package graft.sources.v2

import java.util

import graft.functions.Crs
import graft.sources.Shapefile
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S1 as a DataSourceV2 `TableProvider` — the CATALYST-INTEGRATED form of
  * the shapefile reader: `spark.read.format("graft-shapefile").load(dir)`.
  *
  * Why a V2 source on top of [[graft.sources.Shapefile.read]]:
  *
  *  - **Typed attribute columns.** The .dbf field list is discovered at
  *    PLANNING time (driver reads one header, KBs), so attributes surface
  *    as real top-level columns in the table schema instead of a
  *    `map<string,string>` — `df("NAME")`, not `attrs("NAME")`.
  *  - **Column pruning through Catalyst.** `SupportsPushDownRequiredColumns`
  *    hands the optimizer's projection to the scan: non-requested .dbf
  *    fields are skipped at parse time (the existing `parseDbf(wanted)`
  *    pruning, now driven by the optimizer instead of the caller), and if
  *    the projection needs NO geometry the .shp bytes are never parsed at
  *    all. `.explain` shows the pruned ReadSchema (PlanSpec-pinned).
  *  - **No shuffle.** The RDD reader groups `binaryFile` rows by basename
  *    — a shuffle of file BYTES. Here sidecar grouping happens during
  *    planning: each `InputPartition` carries one basename's .shp/.dbf/
  *    .prj paths and the reader opens them directly executor-side. A
  *    directory of 10⁵ shapefiles fans out as 10⁵ independent tasks with
  *    zero exchanges.
  *
  * Semantics (geometry parse, dBase decode, .prj reprojection to
  * EPSG:4326) are IDENTICAL to [[graft.sources.Shapefile.read]] — both
  * call the same parse kernels; qf9 gates the V2 path against the same
  * oracle family as qf1. All dBase fields surface as STRING (dBase III
  * 'C' semantics; numeric casts are downstream concerns, same contract
  * as the map form).
  */
class ShapefileDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-shapefile"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShapefileV2.tableSchema(ShapefileV2.resolvePath(options))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ShapefileTable(properties.get("path"), schema)
}

private[v2] object ShapefileV2 {

  val GeomFields: Set[String] = Set("record_no", "geom_type", "parts")

  def resolvePath(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-shapefile requires a single load(path)")
    p
  }

  private def hadoopConf: Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  /** Basename groups under `path`: (.shp, .dbf, .prj) siblings. */
  def listGroups(path: String, conf: Configuration): Seq[(String, Map[String, String])] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val statuses =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
      else Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    statuses
      .map(_.getPath)
      .filter { f =>
        val n = f.getName.toLowerCase
        n.endsWith(".shp") || n.endsWith(".dbf") || n.endsWith(".prj")
      }
      .groupBy(f => f.toString.replaceAll("\\.(shp|dbf|prj)$", ""))
      .toSeq
      .sortBy(_._1)
      .map { case (base, files) =>
        base -> files.map(f => f.getName.split('.').last.toLowerCase -> f.toString).toMap
      }
  }

  def readAll(fs: org.apache.hadoop.fs.FileSystem, p: Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen.toInt
    val out = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, out)
    finally in.close()
    out
  }

  /** dBase III field names, in descriptor order (driver-side, one header). */
  def dbfFieldNames(bytes: Array[Byte]): Seq[String] = {
    val headerSize =
      ((bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8))
    val fields = scala.collection.mutable.ArrayBuffer[String]()
    var off = 32
    while (off < headerSize - 1 && bytes(off) != 0x0d) {
      fields += new String(bytes, off, 11, "ASCII").takeWhile(_ != 0).trim
      off += 32
    }
    fields.toSeq
  }

  def tableSchema(path: String): StructType = {
    val conf = hadoopConf
    val groups = listGroups(path, conf)
    require(groups.nonEmpty, s"no shapefile groups under $path")
    val attrFields: Seq[String] = groups
      .flatMap(_._2.get("dbf"))
      .headOption
      .map { dbf =>
        val p = new Path(dbf)
        dbfFieldNames(readAll(p.getFileSystem(conf), p))
      }
      .getOrElse(Seq.empty)
    StructType(
      Seq(
        StructField("record_no", IntegerType, nullable = false),
        StructField("geom_type", StringType, nullable = false),
        StructField(
          "parts",
          ArrayType(ArrayType(ArrayType(DoubleType, containsNull = false))),
          nullable = false)) ++
        attrFields.map(f => StructField(f, StringType, nullable = true)))
  }
}

private[v2] class ShapefileTable(path: String, tableSchema: StructType)
    extends Table
    with SupportsRead {

  override def name(): String = s"graft-shapefile:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ShapefileScanBuilder(path, tableSchema)
}

private[v2] class ShapefileScanBuilder(path: String, full: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ShapefileScan(path, required)
}

private[v2] case class ShapefileInputPartition(files: Map[String, String])
    extends InputPartition

/** Serializable Hadoop-conf carrier (Configuration is Writable but not
  * Serializable; Spark's own wrapper is private[spark]).
  */
private[v2] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[v2] class ShapefileScan(path: String, required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    ShapefileV2
      .listGroups(path, conf)
      .map(g => ShapefileInputPartition(g._2))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableHadoopConf(
      SparkSession.active.sparkContext.hadoopConfiguration)
    new ShapefileReaderFactory(required, conf)
  }
}

private[v2] class ShapefileReaderFactory(
    required: StructType,
    conf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[ShapefileInputPartition].files
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = buildRows()
      private var current: InternalRow = _

      private def read(ext: String): Option[Array[Byte]] = files.get(ext).map { f =>
        val p = new Path(f)
        ShapefileV2.readAll(p.getFileSystem(conf.value), p)
      }

      private def buildRows(): Iterator[InternalRow] = {
        val names = required.fieldNames
        val attrNames = names.filterNot(ShapefileV2.GeomFields.contains)
        val needGeom = names.exists(n => n == "geom_type" || n == "parts")

        // .shp parse only when the projection needs geometry; .dbf parse
        // prunes to the requested attribute fields (never materializes the
        // rest); record alignment is positional per the dBase/shp spec
        val geoms: Seq[(Int, String, Seq[Seq[Seq[Double]]])] =
          if (needGeom) read("shp").map(Shapefile.parseShp).getOrElse(Seq.empty)
          else Seq.empty
        val attrs: Seq[Map[String, String]] =
          if (attrNames.nonEmpty)
            read("dbf").map(Shapefile.parseDbf(_, Some(attrNames.toSet))).getOrElse(Seq.empty)
          else Seq.empty
        val crs = read("prj")
          .map(b => Crs.parsePrj(new String(b, "ASCII")))
          .getOrElse(Crs.Geographic)
        val reproject: Seq[Seq[Seq[Double]]] => Seq[Seq[Seq[Double]]] =
          Crs.inverseTransform(crs) match {
            case None => identity
            case Some(inv) =>
              parts =>
                parts.map(_.map { pt =>
                  val (lon, lat) = inv(pt(0), pt(1))
                  Seq(lon, lat)
                })
          }

        val n =
          if (needGeom) geoms.size
          else if (attrNames.nonEmpty) attrs.size
          else {
            // projection is record_no only (or count(*)): record count
            // still needs ONE of the files; prefer the cheap .dbf header
            read("dbf").map(b =>
              java.nio.ByteBuffer.wrap(b)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt(4))
              .orElse(read("shp").map(Shapefile.parseShp(_).size))
              .getOrElse(0)
          }

        (0 until n).iterator.map { i =>
          val values: Array[Any] = names.map {
            case "record_no" =>
              if (needGeom && i < geoms.size) geoms(i)._1 else i + 1
            case "geom_type" => UTF8String.fromString(geoms(i)._2)
            case "parts" =>
              new GenericArrayData(reproject(geoms(i)._3).map { part =>
                new GenericArrayData(part.map { pt =>
                  new GenericArrayData(pt.map(Double.box).toArray[Any])
                }.toArray[Any])
              }.toArray[Any])
            case attr =>
              if (i < attrs.size)
                attrs(i).get(attr).map(UTF8String.fromString).orNull
              else null
          }.toArray[Any]
          new GenericInternalRow(values)
        }
      }

      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
