package graft.sources

import java.io.ByteArrayInputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S8-family — Apache Avro container-file scan/sink built directly on the
  * `org.apache.avro` core library that ships on Spark's classpath (the
  * `spark-avro` CONNECTOR does not — this is the connector, rebuilt).
  * Avro is the de-facto row-oriented interchange format of streaming
  * ingest (Kafka pipelines land Avro container files); a curation engine
  * that can't read them can't sit at the head of the pipeline.
  *
  * Scan: one task per container file (`binaryFile`, the Shapefile/OsmXml
  * ingest pattern) — the writer's schema travels in each file header, so
  * the driver reads ONE header for the DataFrame schema and executors
  * decode independently; a directory of N files scans with N-way
  * parallelism and zero shuffles. Sink: one container file per partition
  * through the destination's Hadoop `FileSystem` (so `file:`/`s3a:` both
  * work), schema translated structurally — nullable fields become
  * `union(null, T)`, timestamps the `timestamp-micros` logical type,
  * arrays stay arrays.
  *
  * Scope (documented, enforced): primitive + array-of-primitive +
  * timestamp columns — the shapes the harness tables and a tabular
  * curation corpus use. Nested records/maps raise at schema translation,
  * never silently corrupt.
  */
object Avro {

  /** Spark schema → Avro record schema (nullable ⇒ union(null, T)). */
  def avroSchema(st: StructType, name: String = "graft_row"): Schema = {
    val fields = st.fields.map { f =>
      val base = avroType(f.dataType, f.name)
      val typ =
        if (f.nullable) Schema.createUnion(List(Schema.create(Schema.Type.NULL), base).asJava)
        else base
      new Schema.Field(f.name, typ, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def avroType(dt: DataType, field: String): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(elem, containsNull) =>
      val e = avroType(elem, field)
      val et = if (containsNull) Schema.createUnion(List(Schema.create(Schema.Type.NULL), e).asJava) else e
      Schema.createArray(et)
    case other =>
      throw new IllegalArgumentException(
        s"Avro sink: unsupported Spark type $other for column '$field' " +
          "(supported: long/int/double/float/string/boolean/binary/timestamp/array-of-those)")
  }

  /** Avro reader schema → Spark schema (the inverse mapping; unions with
    * null unwrap to nullable).
    */
  def sparkSchema(s: Schema): StructType =
    StructType(s.getFields.asScala.map { f =>
      val (t, nullable) = unwrap(f.schema())
      StructField(f.name(), sparkType(t, f.name()), nullable)
    }.toArray)

  private def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"Avro scan: only union(null, T) supported, got $s")
      (nonNull.head, true)
    } else (s, false)

  private def sparkType(s: Schema, field: String): DataType = s.getType match {
    case Schema.Type.LONG => s.getLogicalType match {
      case null => LongType
      case lt if lt.getName == "timestamp-micros" => TimestampType
      case lt if lt.getName == "local-timestamp-micros" => TimestampNTZType
      case lt => throw new IllegalArgumentException(
        s"Avro scan: unsupported logical type ${lt.getName} for field '$field'")
    }
    case Schema.Type.INT     => IntegerType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.ARRAY =>
      val (e, n) = unwrap(s.getElementType)
      ArrayType(sparkType(e, field), containsNull = n)
    case other =>
      throw new IllegalArgumentException(
        s"Avro scan: unsupported Avro type $other for field '$field'")
  }

  /** Write `df` as `part-<pid>.avro` container files under `dir` — one
    * file per partition, each task streaming through the destination's
    * Hadoop FileSystem (no local staging, no driver collect). Null
    * codec; rows encode via the translated schema. Returns file count.
    */
  def writeAvro(df: DataFrame, dir: String): Int = {
    val schemaJson = avroSchema(df.schema).toString
    val sparkTypes = df.schema.fields.map(_.dataType)
    val n = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val p = new Path(dir, f"part-$pid%05d.avro")
        val fs = p.getFileSystem(new Configuration())
        val out = fs.create(p, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        var c = 0L
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkTypes.length) {
            rec.put(i, toAvro(row.get(i), sparkTypes(i)))
            i += 1
          }
          w.append(rec)
          c += 1
        }
        w.close()
        Iterator.single(c)
      }
    }.count()
    n.toInt
  }

  private def toAvro(v: Any, dt: DataType): AnyRef = v match {
    case null => null
    case ts: java.sql.Timestamp =>
      Long.box(ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000)
    case ts: java.time.Instant =>
      Long.box(ts.getEpochSecond * 1000000L + ts.getNano / 1000)
    case ldt: java.time.LocalDateTime =>
      Long.box(ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000)
    case bytes: Array[Byte] => java.nio.ByteBuffer.wrap(bytes)
    case seq: scala.collection.Seq[_] =>
      val elem = dt.asInstanceOf[ArrayType].elementType
      seq.map(e => toAvro(e, elem)).asJava
    case other => other.asInstanceOf[AnyRef]
  }

  /** Scan a directory of Avro container files as a DataFrame: the driver
    * reads one header for the schema; each file decodes in its own task.
    */
  def readAvro(spark: SparkSession, dir: String): DataFrame = {
    val schema = {
      val d = new Path(dir)
      val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val first = fs.listStatus(d).map(_.getPath)
        .filter(_.getName.endsWith(".avro")).sortBy(_.getName).headOption
        .getOrElse(throw new IllegalArgumentException(s"Avro scan: no .avro files under $dir"))
      val in = fs.open(first)
      try {
        val st = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
        try sparkSchema(st.getSchema)
        finally st.close()
      } finally if (in != null) in.close()
    }
    val types = schema.fields.map(_.dataType)
    val rows = spark.read.format("binaryFile")
      .load(s"$dir/*.avro")
      .select("content")
      .rdd
      .flatMap { r =>
        val bytes = r.getAs[Array[Byte]](0)
        val st = new DataFileStream(
          new ByteArrayInputStream(bytes), new GenericDatumReader[GenericRecord]())
        // STREAM the decode: materializing a whole file's rows into a
        // buffer first holds every Row object of every concurrent task
        // live at once — measured as the 42× sf1 outlier (GC-bound);
        // an iterator keeps per-task state at one in-flight record
        new Iterator[Row] {
          private var open = true
          override def hasNext: Boolean = {
            if (!open) false
            else if (st.hasNext) true
            else { st.close(); open = false; false }
          }
          override def next(): Row = {
            val rec = st.next()
            Row.fromSeq(types.indices.map(i => fromAvro(rec.get(i), types(i))))
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (micros: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros.longValue(), 1000000L),
        Math.floorMod(micros.longValue(), 1000000L) * 1000L))
    case (micros: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros.longValue(), 1000000L),
        (Math.floorMod(micros.longValue(), 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (arr: java.util.Collection[_], ArrayType(elem, _)) =>
      arr.asScala.map(e => fromAvro(e, elem)).toSeq
    case (other, _) => other
  }
}
