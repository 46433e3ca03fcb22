package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.sql.{Date, Timestamp}

/** Round-trips every type [[AvroIO]] maps, including nulls, through a
  * real multi-partition write + splittable read.
  */
class AvroIOSpec extends SparkSpec {

  test("avro round-trip preserves all mapped types and nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i", IntegerType),
      StructField("d", DoubleType),
      StructField("f", FloatType),
      StructField("b", BooleanType),
      StructField("s", StringType),
      StructField("bin", BinaryType),
      StructField("ts", TimestampType),
      StructField("dt", DateType)))
    val ts = Timestamp.valueOf("2024-03-01 10:20:30.123456")
    val rows = Seq(
      Row(1L, 7, 2.5, 1.5f, true, "alpha", Array[Byte](1, 2, 3), ts, Date.valueOf("2024-03-01")),
      Row(2L, null, null, null, null, null, null, null, null),
      Row(3L, -1, -0.25, 0f, false, "", Array.empty[Byte],
        Timestamp.valueOf("1969-12-31 23:59:59.999999"), Date.valueOf("1969-12-31")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val out = "/tmp/graft-test/avro_types"
    AvroIO.write(df, out)

    val back = AvroIO.read(spark, out)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val got = back.collect().sortBy(_.getLong(0))
    assert(got.length === 3)
    val r1 = got(0)
    assert(r1.getInt(1) === 7 && r1.getString(5) === "alpha")
    assert(r1.getAs[Array[Byte]](6).toSeq === Seq[Byte](1, 2, 3))
    assert(r1.getTimestamp(7) === ts) // µs precision survives
    assert(r1.getDate(8).toString === "2024-03-01")
    assert((1 to 8).forall(got(1).isNullAt)) // null row intact
    assert(got(2).getTimestamp(7) === Timestamp.valueOf("1969-12-31 23:59:59.999999")) // pre-epoch floor-div
    // multi-partition write produced independent container files
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".avro")) === 2)
  }
}
