package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md M6): image/audio/video as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators. The Spark-side plumbing — schema, binary
  * chunking, per-partition codec reuse, batch shape — is real and
  * tested; the actual media decode is STUBBED deterministically
  * (this environment ships no image/audio libraries), clearly marked
  * below. Swap `FakeCodec` for a real decoder without touching the
  * dataflow.
  *
  * Scale notes: all feature extraction is per-row inside the scan stage
  * (no shuffle); frame sampling explodes to size/frameBytes rows —
  * bound it with a LIMIT-per-media (`maxFrames`) exactly like a frame
  * sampler would on 100 TB of video.
  */
object Multimodal {

  /** Typed media container: opaque payload + declared metadata. */
  def mediaStruct(data: Column, mime: Column): Column =
    struct(data.as("data"), mime.as("mime"))

  /** Cheap container-level features — no decode required: byte size,
    * leading-bytes header (magic number), content id.
    */
  def withMediaFeatures(df: DataFrame, dataCol: String): DataFrame =
    df
      .withColumn("byte_len", length(col(dataCol)).cast("long"))
      .withColumn("header_hex", lower(hex(substring(col(dataCol), 1, 4))))
      .withColumn("content_id", md5(col(dataCol)))

  /** Frame sampling: split the payload into fixed-size chunks and emit
    * (frame_idx, frame_sig) rows, at most `maxFrames` per media row.
    * Chunking via substring-on-binary is codegen'd; the "signature" is
    * the md5 of the chunk (stand-in for a per-frame embedding).
    */
  def sampleFrames(df: DataFrame, dataCol: String, frameBytes: Int, maxFrames: Int): DataFrame = {
    val nFrames = least(
      expr(s"(length($dataCol) + ${frameBytes - 1}) div $frameBytes"),
      lit(maxFrames.toLong))
    df
      // sequence(0, n-1) with n = 0 would DESCEND to [0, -1]; pad the
      // upper bound to >= 0 and filter so empty payloads emit zero rows.
      .withColumn("__fi", explode(sequence(lit(0L), greatest(nFrames, lit(1L)) - 1)))
      .filter(col("__fi") < nFrames)
      .withColumn("frame_idx", col("__fi").cast("long"))
      .withColumn("frame_sig",
        md5(expr(s"substring($dataCol, __fi * $frameBytes + 1, $frameBytes)")))
      .drop("__fi")
  }

  /** ======= STUB: media decode =======
    * Deterministic fake decoder standing in for an image library: it
    * derives (width, height, channels) from the payload hash. The
    * mapPartitions shape — codec initialized once per partition,
    * rows processed in a batch loop — is exactly what a real libjpeg/
    * ffmpeg binding needs.
    */
  final case class DecodedMeta(id: Long, width: Int, height: Int, channels: Int)

  def decodeStub(ds: Dataset[(Long, Array[Byte])]): Dataset[DecodedMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // ??? real codec init goes here (one instance per partition/task)
      val codec = new FakeCodec
      it.map { case (id, bytes) => codec.decode(id, bytes) }
    }
  }

  private final class FakeCodec extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): DecodedMeta = {
      val h = java.util.Arrays.hashCode(bytes)
      DecodedMeta(id, 64 + math.abs(h % 1024), 64 + math.abs((h / 1024) % 1024),
        if (h % 2 == 0) 3 else 1)
    }
  }
}
