package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque `binary` payloads + a typed metadata struct, with
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schemas, partition-wise batched
  * decoding via `mapPartitions` with a pluggable [[Decoder]], codegen
  * feature expressions — but the codec itself is a STUB: this
  * container has no image/audio libraries, so the default decoder is
  * a clearly-marked deterministic fake that derives stable
  * pseudo-content from the payload bytes. A real deployment swaps in
  * a JNI/javax.imageio decoder without touching the pipeline shape.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaType: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", DoubleType),
    StructField("source_uri", StringType)))

  /** Decoded-frame schema produced by [[decode]]. */
  val decodedType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_luma", DoubleType),
    StructField("sharpness", DoubleType)))

  /** Wrap a raw binary column into a media struct. */
  def asMedia(bytes: Column, mime: String, sourceUri: Column): Column =
    struct(bytes.as("bytes"), lit(mime).as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(DoubleType).as("duration_ms"),
      sourceUri.as("source_uri"))

  /** Batch decoder interface: one partition's payloads in, decoded
    * stats out. Implementations must be serializable (shipped to
    * executors). */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): Row // rows of [[decodedType]]
  }

  /** STUB codec — deterministic fake. Derives stable pseudo-stats
    * from the payload so pipelines are testable end-to-end without
    * image libraries. Replace with a real codec in production. */
  object FakeDecoder extends Decoder {
    def decode(bytes: Array[Byte]): Row = {
      val h = scala.util.hashing.MurmurHash3.bytesHash(
        if (bytes == null) Array.emptyByteArray else bytes, 42)
      val w = 64 + math.abs(h % 1920)
      val ht = 64 + math.abs((h / 7) % 1080)
      Row(w, ht, 3,
        (math.abs(h % 1000)) / 1000.0,
        (math.abs((h / 13) % 1000)) / 1000.0)
    }
  }

  /** Partition-wise decode: the real plumbing (one decoder instance
    * per partition, rows streamed through it — the Scala analogue of
    * a pandas-batched UDF). Appends a `decoded` struct column. */
  def decode(df: DataFrame, mediaCol: String,
      decoder: Decoder = FakeDecoder): DataFrame = {
    val schema = df.schema.add("decoded", decodedType)
    val enc = RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { it =>
      it.map { row =>
        val media = row.getStruct(idx)
        val bytes = if (media == null) null else media.getAs[Array[Byte]]("bytes")
        Row.fromSeq(row.toSeq :+ decoder.decode(bytes))
      }
    }(enc)
  }

  /** Deterministic pseudo-embedding from the payload bytes — stands
    * in for a vision/audio encoder; pure codegen expression, so the
    * pipeline scan/shuffle shape matches the real thing. */
  def fakeFeatures(media: Column, dims: Int = 64): Column =
    transform(sequence(lit(0), lit(dims - 1)), i =>
      pmod(xxhash64(media.getField("bytes"), i), lit(2000)).cast("double") / 1000.0 - 1.0)

  /** Resize STUB: updates the metadata (real impl re-encodes bytes);
    * payload passes through unchanged. */
  def resize(media: Column, w: Int, h: Int): Column =
    struct(media.getField("bytes").as("bytes"),
      media.getField("mime").as("mime"),
      lit(w).as("width"), lit(h).as("height"),
      media.getField("duration_ms").as("duration_ms"),
      media.getField("source_uri").as("source_uri"))

  /** Frame sampling for video media: one row per sampled timestamp
    * (every `everyMs` over `duration_ms`). Frame payload slicing is
    * stubbed as a byte-window over the source; the explode shape —
    * rows multiply by duration/interval, partition-local — is real. */
  def frameSample(df: DataFrame, mediaCol: String, everyMs: Double): DataFrame = {
    val m = col(mediaCol)
    val n = greatest(lit(1),
      ceil(coalesce(m.getField("duration_ms"), lit(0.0)) / everyMs)).cast("int")
    df.withColumn("frame_ts_ms",
        explode(transform(sequence(lit(0), n - 1), i => i.cast("double") * everyMs)))
      .withColumn("frame_bytes", // STUB: window over payload bytes
        expr(s"substring($mediaCol.bytes, 1 + cast(frame_ts_ms as int) % 1024, 1024)"))
  }
}
