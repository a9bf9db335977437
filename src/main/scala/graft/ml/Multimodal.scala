package graft.ml

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batched decode / feature-extract
  * over `mapPartitions`.
  *
  * The actual media codecs are NOT in this container, so the decoder
  * behind [[MediaDecoder]] is pluggable: [[FakeDecoder]] is a
  * deterministic stand-in (features derived from the bytes themselves)
  * and [[CodecDecoder]] marks where a real libjpeg/ffmpeg binding
  * plugs in. Everything Spark-side — schema, batch shape, partition
  * behavior, column pruning — is real and tested.
  *
  * Scale notes: decode runs partition-local (no shuffle); binary
  * payloads never enter a wide transformation; metadata-only queries
  * prune the binary column at the parquet scan (keep media in its own
  * column so ReadSchema drops it).
  */
object Multimodal {

  /** Typed media metadata carried next to the payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("source_url", StringType),
    StructField("byte_len", LongType)))

  /** Extracted feature schema (decoder output contract). */
  val featureSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("first_byte", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frames", IntegerType)))

  final case class MediaFeatures(
      byteLen: Long, firstByte: Int, width: Int, height: Int, frames: Int)

  /** Pluggable decode step — the only non-Spark piece. */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in: features computed from the payload bytes
    * so tests and oracles are stable. Mirrors the shape of a real
    * decode (dimensions, frame count).
    */
  object FakeDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): MediaFeatures = {
      val len   = bytes.length.toLong
      val first = if (bytes.isEmpty) -1 else bytes(0) & 0xff
      MediaFeatures(len, first,
        width = (len % 640).toInt, height = (len % 480).toInt,
        frames = (len % 30).toInt)
    }
  }

  /** Real codec binding point — image/audio libs are not available in
    * this environment; wire jpeg/png/ffmpeg decode here in production.
    */
  object CodecDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): MediaFeatures =
      throw new UnsupportedOperationException(
        "media codecs not available in this environment; use FakeDecoder " +
        "or bind a real codec")
  }

  /** Real container-header parsing — no codec libraries required:
    * PNG IHDR (big-endian dims at offsets 16/20), GIF logical screen
    * descriptor (little-endian u16 at 6/8), BMP DIB header
    * (little-endian i32 at 18/22). Unknown magic → dims −1 with the
    * payload still profiled. Header dimensions are what a filtering /
    * bucketing pipeline actually needs (drop tiny images, partition by
    * aspect ratio) — full pixel decode stays a [[CodecDecoder]]
    * binding point.
    */
  object HeaderDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): MediaFeatures = {
      val len   = bytes.length.toLong
      val first = if (bytes.isEmpty) -1 else bytes(0) & 0xff
      def be32(i: Int): Int =
        ((bytes(i) & 0xff) << 24) | ((bytes(i + 1) & 0xff) << 16) |
        ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      def le16(i: Int): Int =
        (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
      def le32(i: Int): Int =
        (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      if (len >= 24 && (bytes(0) & 0xff) == 0x89 &&
          bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
        MediaFeatures(len, first, be32(16), be32(20), frames = 1)
      else if (len >= 10 &&
          bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
        MediaFeatures(len, first, le16(6), le16(8), frames = 1)
      else if (len >= 26 && bytes(0) == 'B' && bytes(1) == 'M')
        MediaFeatures(len, first, le32(18), le32(22), frames = 1)
      else MediaFeatures(len, first, -1, -1, -1)
    }
  }

  /** Audio metadata (decoder output contract for sound payloads). */
  val audioMetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_samples", LongType),
    StructField("duration_ms", LongType)))

  final case class AudioMeta(
      byteLen: Long, sampleRate: Int, channels: Int,
      bitsPerSample: Int, nSamples: Long, durationMs: Long)

  /** WAV/RIFF header parsing — no codec libraries required, mirroring
    * [[HeaderDecoder]] for images: walk the RIFF chunk list, read the
    * fmt chunk (little-endian: channels at +2, sample rate at +4,
    * bits per sample at +14) and the data chunk size, derive sample
    * count and duration. Filtering/bucketing pipelines need exactly
    * this (drop sub-second clips, partition by sample rate); PCM
    * decode stays a codec binding point. Non-RIFF payloads profile as
    * (-1, ...) with the byte length kept.
    */
  object WavHeaderDecoder extends Serializable {
    def decode(bytes: Array[Byte]): AudioMeta = {
      val len = if (bytes == null) -1L else bytes.length.toLong
      def le16(i: Int): Int =
        (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
      def le32(i: Int): Long =
        ((bytes(i) & 0xffL)) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      def tag(i: Int, s: String): Boolean =
        bytes(i) == s(0) && bytes(i + 1) == s(1) &&
        bytes(i + 2) == s(2) && bytes(i + 3) == s(3)
      if (len < 44 || !tag(0, "RIFF") || !tag(8, "WAVE"))
        return AudioMeta(len, -1, -1, -1, -1L, -1L)
      var rate = -1; var ch = -1; var bits = -1; var dataLen = -1L
      var off = 12
      while (off + 8 <= len) {
        val size = le32(off + 4)
        if (tag(off, "fmt ") && off + 24 <= len) {
          ch = le16(off + 10); rate = le32(off + 12).toInt
          bits = le16(off + 22)
        } else if (tag(off, "data")) dataLen = size
        // chunks are word-aligned: odd sizes carry a pad byte
        off += 8 + size.toInt + (size.toInt & 1)
      }
      if (rate <= 0 || ch <= 0 || bits <= 0 || dataLen < 0)
        return AudioMeta(len, rate, ch, bits, -1L, -1L)
      val frameBytes = ch * (bits / 8)
      val n = if (frameBytes > 0) dataLen / frameBytes else -1L
      val ms = if (n >= 0) n * 1000L / rate else -1L
      AudioMeta(len, rate, ch, bits, n, ms)
    }
  }

  /** Batched audio-metadata extraction: partition-local, payloads
    * never shuffle, same iterator shape as [[extractFeatures]].
    */
  def extractAudioMeta(df: DataFrame, bytesCol: String): DataFrame = {
    val inSchema  = df.schema
    val bytesIdx  = inSchema.fieldIndex(bytesCol)
    val outSchema = StructType(inSchema.fields.toSeq :+
      StructField("audio", audioMetaSchema))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.map { row =>
        val a = WavHeaderDecoder.decode(row.getAs[Array[Byte]](bytesIdx))
        Row.fromSeq(row.toSeq :+ Row(a.byteLen, a.sampleRate, a.channels,
          a.bitsPerSample, a.nSamples, a.durationMs))
      }
    }
  }

  /** Attach a media struct column (payload + metadata) built from a
    * binary column.
    */
  def packMedia(df: DataFrame, bytesCol: String, mime: String): DataFrame =
    df.withColumn("media", struct(
      col(bytesCol).as("bytes"),
      lit(mime).as("mime"),
      length(col(bytesCol)).cast("long").as("byte_len")))

  /** Batched decode: partition-local mapPartitions, decoder invoked
    * per record but batch-amortizable (a real codec would reuse
    * per-partition native context — that is exactly what the
    * `Iterator` shape provides).
    */
  def extractFeatures(
      df: DataFrame, bytesCol: String,
      decoder: MediaDecoder = FakeDecoder): DataFrame = {
    val inSchema  = df.schema
    val bytesIdx  = inSchema.fieldIndex(bytesCol)
    val outSchema = StructType(inSchema.fields.toSeq :+
      StructField("features", featureSchema))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions { it =>
      // per-partition decoder context (native handles would live here)
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](bytesIdx)
        val f =
          if (bytes == null) MediaFeatures(-1L, -1, -1, -1, -1)
          else decoder.decode(bytes)
        Row.fromSeq(row.toSeq :+
          Row(f.byteLen, f.firstByte, f.width, f.height, f.frames))
      }
    }
  }

  /** Deterministic frame sampling plan for video-ish payloads: pick
    * `n` evenly spaced frame indices out of `frames` — pure Column
    * math, usable to drive a later decode of only those frames.
    */
  def sampleFrameIndices(frames: org.apache.spark.sql.Column, n: Int)
      : org.apache.spark.sql.Column =
    when(frames <= 0, array())
      .otherwise(array_distinct(transform(
        sequence(lit(0), lit(n - 1)),
        i => (i * frames / n).cast("int"))))

  /** Pluggable payload transcoder (resize / re-encode). */
  trait MediaTranscoder extends Serializable {
    def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte]
    def frame(bytes: Array[Byte], frameIdx: Int): Array[Byte]
  }

  /** Deterministic stand-in transcoder: resize truncates/zero-pads to
    * width×height bytes; frame extraction slices a 256-byte window at
    * the frame offset. Same shapes a real codec produces (smaller
    * payload per resize, one payload per sampled frame).
    */
  object FakeTranscoder extends MediaTranscoder {
    def resize(bytes: Array[Byte], width: Int, height: Int): Array[Byte] =
      java.util.Arrays.copyOf(bytes, width * height)
    def frame(bytes: Array[Byte], frameIdx: Int): Array[Byte] = {
      val start = math.min(frameIdx * 256, math.max(bytes.length - 1, 0))
      java.util.Arrays.copyOfRange(bytes, start,
        math.min(start + 256, bytes.length))
    }
  }

  /** Resize plumbing: replace the payload with the transcoded one,
    * partition-local, no shuffle — the binary column stays prunable and
    * a real codec reuses per-partition native context via the iterator.
    */
  def resizeMedia(
      df: DataFrame, bytesCol: String, width: Int, height: Int,
      transcoder: MediaTranscoder = FakeTranscoder): DataFrame = {
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    implicit val enc: Encoder[Row] = Encoders.row(df.schema)
    df.mapPartitions { it =>
      it.map { row =>
        val vals = row.toSeq.toArray
        val bytes = row.getAs[Array[Byte]](bytesIdx)
        vals(bytesIdx) =
          if (bytes == null) null else transcoder.resize(bytes, width, height)
        Row.fromSeq(vals.toIndexedSeq)
      }
    }
  }

  /** Frame sampling: one output row per (row, sampled frame) with
    * `frame_idx` and the extracted `frame_bytes`. Frame count comes
    * from the decoder; indices are the evenly spaced
    * [[sampleFrameIndices]] plan. flatMap keeps it partition-local —
    * the fan-out is rows×n but each output carries only its own frame
    * payload, never the source video.
    */
  def sampleFrames(
      df: DataFrame, bytesCol: String, n: Int,
      decoder: MediaDecoder = FakeDecoder,
      transcoder: MediaTranscoder = FakeTranscoder): DataFrame = {
    val inSchema  = df.schema
    val bytesIdx  = inSchema.fieldIndex(bytesCol)
    val outSchema = StructType(inSchema.fields.toSeq ++ Seq(
      StructField("frame_idx", IntegerType),
      StructField("frame_bytes", BinaryType)))
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](bytesIdx)
        if (bytes == null) Iterator.empty
        else {
          val frames = decoder.decode(bytes).frames
          val picked =
            if (frames <= 0) Seq.empty
            else (0 until n).map(i => i * frames / n).distinct
          picked.iterator.map(idx => Row.fromSeq(
            row.toSeq ++ Seq(idx, transcoder.frame(bytes, idx))))
        }
      }
    }
  }
}
