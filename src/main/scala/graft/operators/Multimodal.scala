package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md M6): image/audio/video as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators. The media decode is a REAL byte-level codec
  * ([[PnmCodec]]: binary PNM P5/P6, oracled by a decoder-inverts-encoder
  * round trip) run through the same `mapPartitions` dataflow a heavier
  * libjpeg/ffmpeg binding would use — swap the codec, keep the plumbing.
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

  /** Decoded raster metadata + pixel statistics for one media row. */
  final case class PnmImage(id: Long, format: String, width: Int, height: Int,
      maxVal: Int, channels: Int, nPixels: Long, minGray: Int, maxGray: Int,
      meanGray: Double)

  /** Real (deliberately small) media codec: binary PNM — P5 graymap /
    * P6 pixmap with 8-bit samples — parsed directly from the payload
    * bytes: magic, whitespace/`#`-comment-tolerant header integers
    * (width, height, maxval), exactly one whitespace byte, then the
    * raster. Returns None for anything that is not a complete valid
    * image (bad magic, malformed header, maxval > 255, truncated
    * raster). `meanGray` averages ALL raster samples — for P6 that is
    * the interleaved-RGB mean.
    */
  object PnmCodec extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): Option[PnmImage] = {
      if (bytes == null || bytes.length < 2 || bytes(0) != 'P') return None
      val fmt = bytes(1) match {
        case '5' => "P5"
        case '6' => "P6"
        case _ => return None
      }
      var pos = 2
      def skipWsAndComments(): Unit = {
        var go = true
        while (go && pos < bytes.length) {
          val b = bytes(pos)
          if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
          else if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else go = false
        }
      }
      def readInt(): Int = { // -1 = no digits at cursor, or overflow
        skipWsAndComments()
        val st = pos
        var v = 0
        while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9' && v < (1 << 24)) {
          v = v * 10 + (bytes(pos) - '0'); pos += 1
        }
        if (pos == st) -1
        // digits remain past the size cap: an oversized value must read
        // as malformed, not silently truncate into a plausible triple
        else if (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') -1
        else v
      }
      val w = readInt(); val h = readInt(); val mv = readInt()
      if (w <= 0 || h <= 0 || mv <= 0 || mv > 255) return None
      val channels = if (fmt == "P6") 3 else 1
      val n = w.toLong * h * channels
      // exactly one whitespace byte separates maxval from the raster —
      // anything else (e.g. "255X<raster>") would shift the raster
      if (pos >= bytes.length || bytes.length - (pos + 1) < n) return None
      val sep = bytes(pos)
      if (sep != ' ' && sep != '\n' && sep != '\r' && sep != '\t') return None
      pos += 1
      var mn = 255; var mx = 0; var sum = 0L
      var i = pos
      val end = pos + n.toInt
      while (i < end) {
        val v = bytes(i) & 0xFF
        if (v < mn) mn = v
        if (v > mx) mx = v
        sum += v
        i += 1
      }
      Some(PnmImage(id, fmt, w, h, mv, channels, n, mn, mx, sum.toDouble / n))
    }
  }

  /** Distributed decode: one codec pass per partition over (id, payload)
    * rows — the same mapPartitions shape a heavier libjpeg/ffmpeg
    * binding would use (per-partition init, sequential batch loop).
    * Undecodable payloads are dropped; pair with a `left_anti` join on
    * the decoded ids to quarantine them instead.
    */
  def decodePnm(ds: Dataset[(Long, Array[Byte])]): Dataset[PnmImage] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(it => it.flatMap { case (id, bytes) => PnmCodec.decode(id, bytes) })
  }
}
