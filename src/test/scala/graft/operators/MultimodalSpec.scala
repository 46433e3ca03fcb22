package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, Array.fill[Byte](600)(65)), // 600 bytes of 'A'
    (2L, "tiny".getBytes("UTF-8"))
  ).toDF("id", "data")

  test("withMediaFeatures: byte length, header magic, content id") {
    val f = Multimodal.withMediaFeatures(media, "data").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(f(1L).getAs[Long]("byte_len") === 600L)
    assert(f(1L).getAs[String]("header_hex") === "41414141")
    assert(f(2L).getAs[String]("header_hex") === "74696e79")
    assert(f(2L).getAs[String]("content_id").length === 32)
  }

  test("sampleFrames: chunking honors frame size and maxFrames cap") {
    val frames = Multimodal.sampleFrames(media, "data", frameBytes = 256, maxFrames = 2)
      .select("id", "frame_idx", "frame_sig").collect()
    val byId = frames.groupBy(_.getLong(0))
    assert(byId(1L).length === 2) // 600 bytes → 3 frames, capped at 2
    assert(byId(2L).length === 1) // 4 bytes → 1 frame
    assert(byId(1L).map(_.getLong(1)).sorted.toSeq === Seq(0L, 1L))
    // identical content chunks → identical frame signatures
    val sigs = byId(1L).map(_.getString(2)).distinct
    assert(sigs.length === 1) // 'A'*256 twice
  }

  test("sampleFrames: empty payload emits zero frame rows") {
    val withEmpty = Seq((1L, Array.emptyByteArray), (2L, "xy".getBytes("UTF-8")))
      .toDF("id", "data")
    val frames = Multimodal.sampleFrames(withEmpty, "data", frameBytes = 256, maxFrames = 4)
      .select("id", "frame_idx").collect()
    assert(frames.map(_.getLong(0)).toSeq === Seq(2L))
    assert(frames.head.getLong(1) === 0L)
  }

  test("decodeStub: per-partition codec, deterministic metadata") {
    val ds = Seq((1L, "abc".getBytes("UTF-8")), (2L, "abcd".getBytes("UTF-8"))).toDS()
    val out1 = Multimodal.decodeStub(ds).collect().sortBy(_.id)
    val out2 = Multimodal.decodeStub(ds).collect().sortBy(_.id)
    assert(out1.toSeq === out2.toSeq)
    out1.foreach { m =>
      assert(m.width >= 64 && m.height >= 64 && (m.channels == 1 || m.channels == 3))
    }
  }
}
