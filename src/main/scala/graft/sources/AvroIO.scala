package graft.sources

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.io.NullWritable
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.File
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro container-file source/sink (ref: flink-formats/flink-avro —
  * AvroWriterFactory / AvroInputFormat). The spark-avro connector module
  * is not on this classpath, but the core Avro jars ship with Spark
  * itself (`/opt/spark/jars/avro-1.12.1.jar`, `avro-mapred-1.12.1.jar`),
  * so the format is implemented directly on the public Avro API:
  *
  *  - WRITE: one Avro object-container file per partition
  *    (`foreachPartition` + `DataFileWriter`) — executor-parallel, no
  *    driver funnel, mirroring Spark's own per-task file commit shape.
  *  - READ: `newAPIHadoopFile` with `AvroKeyInputFormat`. Container
  *    files are block-structured with sync markers, so the input format
  *    SPLITS large files — at 100 TB each executor reads its own byte
  *    ranges, the same scan parallelism parquet gets. Records are
  *    converted to `Row`s inside the scan stage (Avro runtime reuses
  *    record objects; nothing Avro-typed survives past the iterator).
  *
  * Type mapping (both directions): long/int/double/float/boolean/string/
  * bytes plus nullable unions, `timestamp-micros` ⇄ TimestampType and
  * `date` ⇄ DateType logical types — the slice of the Avro spec the
  * reference's format exercises in its own round-trip tests.
  *
  * Local-filesystem paths only (matching this repo's other sinks); on a
  * cluster the writer would target the task-local mount or go through
  * the Hadoop FileSystem API — the partitioning story is unchanged.
  */
object AvroIO {

  /** Avro schema for a Spark schema (nullable fields become
    * union(null, T) with a null default, per Avro convention).
    */
  def avroSchema(schema: StructType, name: String): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case TimestampNTZType =>
          LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case other => throw new IllegalArgumentException(s"unsupported Avro field type: $other")
      }
      val s = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      new Schema.Field(f.name, s, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  /** Spark schema for an Avro record schema (inverse of [[avroSchema]]). */
  def sparkSchema(schema: Schema): StructType = {
    def dt(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"only union(null, T) supported: $s")
        (dt(nonNull.head)._1, true)
      case Schema.Type.LONG =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros]) (TimestampType, false)
        else if (s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros])
          (TimestampNTZType, false)
        else (LongType, false)
      case Schema.Type.INT =>
        if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) (DateType, false)
        else (IntegerType, false)
      case Schema.Type.DOUBLE  => (DoubleType, false)
      case Schema.Type.FLOAT   => (FloatType, false)
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.STRING  => (StringType, false)
      case Schema.Type.BYTES   => (BinaryType, false)
      case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
    }
    StructType(schema.getFields.asScala.map { f =>
      val (t, nullable) = dt(f.schema())
      StructField(f.name(), t, nullable)
    }.toSeq)
  }

  /** Write `df` as Avro container files under `path` (one per non-empty
    * partition). Overwrites.
    */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = avroSchema(df.schema, "GraftRecord").toString
    val sparkFields = df.schema.fields
    val dir = new File(path)
    if (dir.exists()) dir.listFiles().foreach(_.delete())
    dir.mkdirs()
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = TaskContext.getPartitionId()
        val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, new File(dir, f"part-$pid%05d.avro"))
        try it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkFields.length) {
            rec.put(i, toAvro(row.get(i), sparkFields(i).dataType))
            i += 1
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  private def toAvro(v: Any, t: DataType): AnyRef = v match {
    case null => null
    case ts: java.sql.Timestamp =>
      java.lang.Long.valueOf(ts.getTime * 1000L + (ts.getNanos / 1000) % 1000)
    case ldt: java.time.LocalDateTime =>
      java.lang.Long.valueOf(
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000)
    case d: java.sql.Date => java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
    case b: Array[Byte]   => ByteBuffer.wrap(b)
    case other            => other.asInstanceOf[AnyRef]
  }

  /** Read the Avro files under `path` as a DataFrame. The record schema
    * comes from the first file's header (all parts share the writer
    * schema); the scan itself is a splittable Hadoop input format.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val first = new File(path).listFiles().filter(_.getName.endsWith(".avro")).sorted.head
    val header = new DataFileReader[GenericRecord](first, new GenericDatumReader[GenericRecord]())
    val schema = try header.getSchema finally header.close()
    val sSchema = sparkSchema(schema)
    val conf = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", schema.toString)
    val types = sSchema.fields.map(_.dataType)
    val rows = spark.sparkContext
      .newAPIHadoopFile(
        new File(path).getAbsolutePath + "/*.avro",
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        conf)
      .map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(types.indices.map(i => fromAvro(rec.get(i), types(i))))
      }
    spark.createDataFrame(rows, sSchema)
  }

  private def fromAvro(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    case (s: CharSequence, StringType) => s.toString
    case (l: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(l.longValue(), 1000L))
      ts.setNanos((Math.floorMod(l.longValue(), 1000000L) * 1000L).toInt)
      ts
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l.longValue(), 1000000L),
        (Math.floorMod(l.longValue(), 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (b: ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    case (other, _) => other
  }
}
