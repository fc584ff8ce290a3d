package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video
  * as opaque `binary` payloads + a typed metadata struct, with
  * decode / feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schemas, partition-wise batched decoding
  * via `mapPartitions` with a pluggable [[Decoder]], codegen feature
  * expressions — is real, and so is the default image codec:
  * [[ImageIoDecoder]] decodes PNG/JPEG/GIF/BMP through the JDK's
  * `javax.imageio` (no external deps). Audio/video payloads (no codec
  * in the JVM) fall back to [[FakeDecoder]], a clearly-marked
  * deterministic stub; a real deployment swaps a JNI decoder in
  * without touching the pipeline shape.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache — one temp file
  // per encode/decode, which serializes a 32-thread partition-wise
  // codec stage on filesystem calls. Heap buffers are strictly better
  // for the small per-row payloads this pipeline moves.
  javax.imageio.ImageIO.setUseCache(false)

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
    * from the payload so pipelines are testable end-to-end for mime
    * types with no real codec in the JVM (audio/video). */
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

  /** Real image codec on `javax.imageio` (JDK — PNG/JPEG/GIF/BMP, no
    * external deps). Sniffs the container from magic bytes; payloads
    * that aren't a known image format (or fail to parse) fall back to
    * [[FakeDecoder]], so mixed-modality columns decode in one pass.
    * mean_luma is the Rec.601 luma average in [0,1]; sharpness the
    * mean absolute horizontal+vertical luma gradient (cheap Laplacian
    * stand-in), both over a stride-sampled grid so cost stays bounded
    * on large frames. */
  object ImageIoDecoder extends Decoder {
    private def looksLikeImage(b: Array[Byte]): Boolean =
      b != null && b.length >= 4 && (
        (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
        (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
        (b(0) == 'B' && b(1) == 'M'))

    def decode(bytes: Array[Byte]): Row = {
      if (!looksLikeImage(bytes)) return FakeDecoder.decode(bytes)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) return FakeDecoder.decode(bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      val channels = img.getColorModel.getNumComponents
      val stride = math.max(1, math.max(w, h) / 256)
      def luma(x: Int, y: Int): Double = {
        val rgb = img.getRGB(x, y)
        (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)) / 255.0
      }
      var sumL = 0.0; var nL = 0L
      var sumG = 0.0; var nG = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val l = luma(x, y)
          sumL += l; nL += 1
          if (x + stride < w) { sumG += math.abs(luma(x + stride, y) - l); nG += 1 }
          if (y + stride < h) { sumG += math.abs(luma(x, y + stride) - l); nG += 1 }
          x += stride
        }
        y += stride
      }
      Row(w, h, channels, sumL / math.max(1L, nL), sumG / math.max(1L, nG))
    }
  }

  /** Partition-wise decode: the real plumbing (one decoder instance
    * per partition, rows streamed through it — the Scala analogue of
    * a pandas-batched UDF). Appends a `decoded` struct column. */
  def decode(df: DataFrame, mediaCol: String,
      decoder: Decoder = ImageIoDecoder): DataFrame = {
    val schema = df.schema.add("decoded", decodedType)
    val enc = RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(mediaCol)
    // resolve the struct's field position BY NAME from the frame's
    // schema, driver-side: nested Rows inside mapPartitions carry no
    // schema for named access, and a hard-coded position would read
    // the wrong field of a reordered-but-valid media struct
    val bytesIdx = df.schema(idx).dataType.asInstanceOf[StructType]
      .fieldIndex("bytes")
    df.mapPartitions { it =>
      it.map { row =>
        val media = row.getStruct(idx)
        val bytes =
          if (media == null || media.isNullAt(bytesIdx)) null
          else media.get(bytesIdx).asInstanceOf[Array[Byte]]
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

  /** Metadata-only resize (no payload re-encode): cheap Column form
    * for pipelines that only need target dimensions recorded. For a
    * real pixel resize of image payloads use [[resizeImages]]. */
  def resize(media: Column, w: Int, h: Int): Column =
    struct(media.getField("bytes").as("bytes"),
      media.getField("mime").as("mime"),
      lit(w).as("width"), lit(h).as("height"),
      media.getField("duration_ms").as("duration_ms"),
      media.getField("source_uri").as("source_uri"))

  /** Real image resize: decodes each payload with `javax.imageio`,
    * scales to (w, h) via Graphics2D bilinear interpolation, and
    * re-encodes as PNG. Non-image payloads (magic-byte sniff fails or
    * decode errors) pass through unchanged with only the metadata
    * updated — same mixed-modality policy as [[ImageIoDecoder]].
    * Partition-wise (`mapPartitions`), so the codec work distributes
    * with the data. */
  def resizeImages(df: DataFrame, mediaCol: String, w: Int, h: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(df.schema)
    val idx = df.schema.fieldIndex(mediaCol)
    // field positions resolved by name from the frame's schema (see
    // [[decode]]); the output row is built in the struct's OWN order
    val mSchema = df.schema(idx).dataType.asInstanceOf[StructType]
    val Seq(bI, mI, wI, hI) =
      Seq("bytes", "mime", "width", "height").map(mSchema.fieldIndex)
    df.mapPartitions { it =>
      it.map { row =>
        val media = row.getStruct(idx)
        val bytes =
          if (media == null || media.isNullAt(bI)) null
          else media.get(bI).asInstanceOf[Array[Byte]]
        val resized =
          try {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
            if (img == null) bytes
            else {
              val out = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
              g.dispose()
              val baos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", baos)
              baos.toByteArray
            }
          } catch { case _: Exception => bytes }
        val newMedia =
          if (media == null) null
          else Row.fromSeq(media.toSeq.indices.map { i =>
            if (i == bI) resized
            // re-encoded payloads ARE png now; passthroughs keep mime
            else if (i == mI) { if (resized eq bytes) media.get(mI) else "image/png" }
            else if (i == wI) Int.box(w)
            else if (i == hI) Int.box(h)
            else media.get(i)
          })
        Row.fromSeq(row.toSeq.updated(idx, newMedia))
      }
    }(enc)
  }

  /** Decoded-audio schema produced by [[audioFeatures]]. */
  val audioType: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_ms", DoubleType),
    StructField("rms", DoubleType)))

  /** Real audio codec on `javax.sound.sampled` (JDK — WAV/AIFF/AU, no
    * external deps). Emits container facts (rate, channels, frame
    * count, duration) for anything the JDK parses; RMS amplitude
    * (normalized to [0,1]) additionally for 16-bit little-endian PCM
    * (the overwhelmingly common WAV layout — other encodings keep a
    * null rms rather than a wrong one). Payloads that aren't parseable
    * audio yield an all-null struct. */
  object WavDecoder extends Serializable {
    // the JDK's own AudioFileReader providers (WaveFileReader etc.),
    // loaded ONCE per JVM: AudioSystem.getAudioInputStream funnels
    // every call through a global synchronized provider registry,
    // which serialized the 32-thread decode stage
    private lazy val readers: Array[javax.sound.sampled.spi.AudioFileReader] = {
      val it = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[javax.sound.sampled.spi.AudioFileReader]
      while (it.hasNext) buf += it.next()
      buf.toArray
    }

    private def openAudio(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
      var i = 0
      while (i < readers.length) {
        try return readers(i).getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: javax.sound.sampled.UnsupportedAudioFileException => }
        i += 1
      }
      throw new javax.sound.sampled.UnsupportedAudioFileException("no reader")
    }

    def decode(bytes: Array[Byte]): Row = {
      if (bytes == null) return Row(null, null, null, null, null)
      try {
        val ais = openAudio(bytes)
        val fmt = ais.getFormat
        // streams may report NOT_SPECIFIED (-1) frame length/rate;
        // per the all-null-for-unparseable-facts contract those become
        // null fields, not a negative count or NaN duration
        val rawN = ais.getFrameLength
        val n: java.lang.Long =
          if (rawN == javax.sound.sampled.AudioSystem.NOT_SPECIFIED) null
          else Long.box(rawN)
        val rate = fmt.getFrameRate
        val dur: java.lang.Double =
          if (n == null || rate == javax.sound.sampled.AudioSystem.NOT_SPECIFIED)
            null
          else Double.box(rawN * 1000.0 / rate)
        val rms: java.lang.Double =
          if (fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
              !fmt.isBigEndian &&
              fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) {
            val data = ais.readAllBytes()
            var sum = 0.0
            var k = 0
            while (k + 1 < data.length) {
              val v = ((data(k) & 0xFF) | (data(k + 1) << 8)).toShort.toDouble
              sum += v * v
              k += 2
            }
            val frames = data.length / 2
            if (frames == 0) null
            else Double.box(math.sqrt(sum / frames) / 32768.0)
          } else null
        Row(Int.box(fmt.getSampleRate.toInt), Int.box(fmt.getChannels),
          n, dur, rms)
      } catch { case _: Exception =>
        // formats the JDK can't read but every audio corpus contains:
        // FLAC STREAMINFO, MPEG-audio and ADTS AAC header walks, pure
        // JVM (the walks are mutually exclusive: MPEG audio requires
        // layer III bits, ADTS requires layer 00)
        FlacProbe.parse(bytes).orElse(Mp3Probe.parse(bytes))
          .orElse(AdtsProbe.parse(bytes))
          .orElse(Mp4Probe.parseAudio(bytes)) // M4A container audio facts
          .getOrElse(Row(null, null, null, null, null))
      }
    }
  }

  /** Pure-JVM FLAC container probe: `fLaC` magic + the mandatory
    * STREAMINFO metadata block (always first, 34 bytes) carry sample
    * rate (20 bits), channels (3 bits), bits-per-sample (5 bits) and
    * total samples (36 bits) in one packed 64-bit field — no codec
    * needed for the corpus facts. Truncated payloads return None;
    * a zero total-samples field (unknown length, streamed FLAC)
    * yields null frames/duration rather than a wrong zero. RMS stays
    * null (facts only, no decode) — same [[audioType]] contract as
    * [[WavDecoder]]. */
  private[graft] object FlacProbe {
    def parse(b: Array[Byte]): Option[Row] = {
      if (b == null || b.length < 8 + 34) return None
      if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'))
        return None
      if ((b(4) & 0x7F) != 0) return None // first block must be STREAMINFO
      val blockLen = ((b(5) & 0xFF) << 16) | ((b(6) & 0xFF) << 8) | (b(7) & 0xFF)
      if (blockLen < 34) return None
      // STREAMINFO at 8: min/max blocksize (4) + min/max framesize (6),
      // then the packed rate/channels/bps/samples long at offset 18
      var packed = 0L
      var i = 0
      while (i < 8) { packed = (packed << 8) | (b(18 + i) & 0xFFL); i += 1 }
      val rate = (packed >>> 44).toInt
      val channels = (((packed >>> 41) & 0x7L) + 1).toInt
      val samples = packed & ((1L << 36) - 1)
      if (rate <= 0) return None // 0 is invalid per spec
      val n: java.lang.Long = if (samples == 0L) null else Long.box(samples)
      val dur: java.lang.Double =
        if (samples == 0L) null else Double.box(samples * 1000.0 / rate)
      Some(Row(Int.box(rate), Int.box(channels), n, dur, null))
    }
  }

  /** Pure-JVM MPEG-audio (Layer III) probe: sequential frame-header
    * walk — 11-bit sync, version/layer/bitrate/samplerate/padding per
    * frame, each header giving the exact frame byte length, so the
    * walk counts frames without decoding. Duration = frames ×
    * samples-per-frame / rate. A `Xing`/`Info` tag in the first
    * frame's side-info gap (VBR files — the walk would still work,
    * but the tag is authoritative and O(1)) overrides the counted
    * total with its stored AUDIO-frame count, the header frame
    * excluded. Leading ID3v2 tags are skipped via their syncsafe
    * length. Truncated tails end the walk with the complete frames
    * counted so far; payloads that aren't MPEG audio (fewer than two
    * valid chained frames) return None. */
  private[graft] object Mp3Probe {
    private val BitrateV1L3 =
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    private val BitrateV2L3 =
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    private val RateV1 = Array(44100, 48000, 32000)
    private val RateV2 = Array(22050, 24000, 16000)
    private val RateV25 = Array(11025, 12000, 8000)

    def parse(b: Array[Byte]): Option[Row] = {
      if (b == null || b.length < 4) return None
      var off = 0
      // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe size(4)
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val size = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
          ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
        off = 10 + size
      }
      var frames = 0L
      var rate = 0
      var channels = 0
      var spf = 0
      var xingFrames = -1L
      var done = false
      while (!done && off + 4 <= b.length) {
        header(b, off) match {
          case Some((fRate, fChannels, fSpf, fLen))
              if off + fLen <= b.length => // complete frame only
            if (frames == 0) {
              rate = fRate; channels = fChannels; spf = fSpf
              xingFrames = readXing(b, off, fChannels, fSpf)
            }
            frames += 1
            off += fLen
          case _ => done = true // bad sync or truncated tail
        }
      }
      if (frames < 2) return None
      // Xing stores the audio-frame count; its carrier frame is not audio
      val audioFrames = if (xingFrames >= 0) xingFrames else frames
      val n = audioFrames * spf
      Some(Row(Int.box(rate), Int.box(channels), Long.box(n),
        Double.box(n * 1000.0 / rate), null))
    }

    /** (sampleRate, channels, samplesPerFrame, frameBytes) for a valid
      * Layer III header at `off`, None otherwise. */
    private def header(b: Array[Byte], off: Int): Option[(Int, Int, Int, Int)] = {
      if ((b(off) & 0xFF) != 0xFF || (b(off + 1) & 0xE0) != 0xE0) return None
      val version = (b(off + 1) >> 3) & 0x3 // 0=2.5 1=res 2=2 3=1
      val layer = (b(off + 1) >> 1) & 0x3   // 1 = Layer III
      if (version == 1 || layer != 1) return None
      val brIdx = (b(off + 2) >> 4) & 0xF
      val srIdx = (b(off + 2) >> 2) & 0x3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val v1 = version == 3
      val rate = (if (v1) RateV1 else if (version == 2) RateV2 else RateV25)(srIdx)
      val bitrate = (if (v1) BitrateV1L3 else BitrateV2L3)(brIdx) * 1000
      val padding = (b(off + 2) >> 1) & 0x1
      val channels = if (((b(off + 3) >> 6) & 0x3) == 3) 1 else 2
      val spf = if (v1) 1152 else 576
      val len = (spf / 8) * bitrate / rate + padding
      if (len < 4) None else Some((rate, channels, spf, len))
    }

    /** Stored frame count from a `Xing`/`Info` tag in the first
      * frame, or -1: the tag sits right after the side info (whose
      * size depends on version and channel mode), flags bit 0 gates
      * the big-endian count field. */
    private def readXing(b: Array[Byte], off: Int, channels: Int,
        spf: Int): Long = {
      val side = (spf, channels) match {
        case (1152, 1) => 17
        case (1152, _) => 32
        case (_, 1) => 9
        case _ => 17
      }
      val p = off + 4 + side
      if (p + 12 > b.length) return -1L
      val tag = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (tag != "Xing" && tag != "Info") return -1L
      val flags = ((b(p + 4) & 0xFF) << 24) | ((b(p + 5) & 0xFF) << 16) |
        ((b(p + 6) & 0xFF) << 8) | (b(p + 7) & 0xFF)
      if ((flags & 1) == 0) return -1L
      (((b(p + 8) & 0xFFL) << 24) | ((b(p + 9) & 0xFFL) << 16) |
        ((b(p + 10) & 0xFFL) << 8) | (b(p + 11) & 0xFFL))
    }
  }

  /** Pure-JVM ADTS AAC probe: sequential 7/9-byte frame-header walk —
    * 12-bit sync with layer bits 00 (which is exactly what
    * distinguishes it from an MPEG-audio sync), sampling-frequency
    * index, channel configuration and the 13-bit frame length that
    * chains the walk; each frame carries (rdbs+1) × 1024 samples, so
    * counting frames gives exact totals without an AAC decoder.
    * Raw AAC-in-MP4 (M4A) is served by the MP4 container walk; this
    * covers the self-framing .aac transport stream form. Channel
    * config 0 (layout deferred to an in-band PCE) yields a null
    * channel count, never a wrong zero. Leading ID3v2 tags skip via
    * their syncsafe length; a truncated tail ends the walk with the
    * complete frames counted so far; payloads without two valid
    * chained frames return None. */
  private[graft] object AdtsProbe {
    private val Rates = Array(96000, 88200, 64000, 48000, 44100, 32000,
      24000, 22050, 16000, 12000, 11025, 8000, 7350)

    def parse(b: Array[Byte]): Option[Row] = {
      if (b == null || b.length < 7) return None
      var off = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        val size = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
          ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
        off = 10 + size
      }
      var frames = 0L
      var samples = 0L
      var rate = 0
      var chanCfg = -1
      var done = false
      while (!done && off + 7 <= b.length) {
        header(b, off) match {
          case Some((fRate, cfg, rdbs, fLen)) if off + fLen <= b.length =>
            if (frames == 0) { rate = fRate; chanCfg = cfg }
            samples += 1024L * (rdbs + 1)
            frames += 1
            off += fLen
          case _ => done = true // bad sync or truncated tail
        }
      }
      if (frames < 2) return None
      val ch: java.lang.Integer =
        if (chanCfg == 0) null // layout lives in a PCE: unknown, not 0
        else Int.box(if (chanCfg == 7) 8 else chanCfg)
      Some(Row(Int.box(rate), ch, Long.box(samples),
        Double.box(samples * 1000.0 / rate), null))
    }

    /** (sampleRate, channelConfig, rawDataBlocks, frameBytes) for a
      * valid ADTS header at `off`, None otherwise. */
    private def header(b: Array[Byte], off: Int)
        : Option[(Int, Int, Int, Int)] = {
      // 0xFFF sync + layer bits 00 (mask 0x06)
      if ((b(off) & 0xFF) != 0xFF || (b(off + 1) & 0xF6) != 0xF0) return None
      val srIdx = (b(off + 2) >> 2) & 0xF
      if (srIdx > 12) return None
      val cfg = ((b(off + 2) & 0x1) << 2) | ((b(off + 3) >> 6) & 0x3)
      val len = ((b(off + 3) & 0x3) << 11) | ((b(off + 4) & 0xFF) << 3) |
        ((b(off + 5) >> 5) & 0x7)
      val rdbs = b(off + 6) & 0x3
      val hdr = if ((b(off + 1) & 0x1) == 1) 7 else 9 // CRC adds 2
      if (len < hdr) None else Some((Rates(srIdx), cfg, rdbs, len))
    }
  }

  /** Deterministic minimal ADTS AAC: `frames` chained 39-byte frames
    * (7-byte header + zero payload bytes), AAC-LC, 16 kHz (sr index
    * 8), mono, one raw data block per frame — so n_frames =
    * frames × 1024 and duration_ms = frames × 64 exactly, pure
    * integer arithmetic the oracle replays. `crc = true` emits the
    * 9-byte protected-header variant (two CRC bytes inside the same
    * frame length) to exercise both header sizes. */
  private[graft] def synthAdts(frames: Int, crc: Boolean = false): Array[Byte] = {
    val frameLen = 39
    val out = new Array[Byte](frames * frameLen)
    var f = 0
    while (f < frames) {
      val p = f * frameLen
      out(p) = 0xFF.toByte
      out(p + 1) = (if (crc) 0xF0 else 0xF1).toByte // MPEG-4, layer 00
      out(p + 2) = 0x60.toByte // AAC-LC, sr idx 8 (16 kHz), cfg hi 0
      out(p + 3) = (0x40 | ((frameLen >> 11) & 0x3)).toByte // mono, len hi
      out(p + 4) = ((frameLen >> 3) & 0xFF).toByte
      out(p + 5) = (((frameLen & 0x7) << 5) | 0x1F).toByte
      out(p + 6) = 0xFC.toByte // fullness low, 1 raw data block
      f += 1
    }
    out
  }

  /** Deterministic 16-bit mono PCM WAV payload (8 kHz, integer
    * sawtooth `((k*37 mod 1001) - 500) * 60`) — the synthetic audio
    * the pipeline queries/tests decode, chosen so every derived stat
    * (frames, duration, RMS) is EXACT integer arithmetic any SQL
    * engine reproduces bit-identically. */
  private[graft] def synthPcmWav(nFrames: Int): Array[Byte] = {
    // canonical 44-byte RIFF/fmt/data header written directly — the
    // AudioSystem.write path funnels every call through the
    // synchronized service-provider registry, which serialized the
    // 32-thread synthesis stage; the decoder side still parses this
    // through javax.sound (it IS a standard WAV)
    val dataLen = nFrames * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // mono
      .putInt(8000)           // sample rate
      .putInt(8000 * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var k = 0
    while (k < nFrames) {
      out.putShort(((((k * 37) % 1001) - 500) * 60).toShort)
      k += 1
    }
    out.array()
  }

  /** Deterministic MPEG1 Layer III payload: mono, 32 kHz (sr index 2),
    * 64 kbps (br index 5), padding 0 — the one (rate, bitrate) pair
    * where the frame length (144 × 64000 / 32000 = 288 bytes) and the
    * per-frame duration (1152/32000 s = 36 ms) are BOTH exact integer
    * arithmetic, so the oracle replays frames/duration with no float
    * drift. With `xing` an extra leading frame carries a Xing tag
    * whose stored count is `frames` (the audio frames that follow). */
  private[graft] def synthMp3(frames: Int, xing: Boolean = false): Array[Byte] = {
    val frameLen = 288
    val total = if (xing) frames + 1 else frames
    val out = new Array[Byte](total * frameLen)
    var f = 0
    while (f < total) {
      val p = f * frameLen
      out(p) = 0xFF.toByte; out(p + 1) = 0xFB.toByte // MPEG1 L3 no-CRC
      out(p + 2) = 0x58.toByte                       // br 5, sr 2, pad 0
      out(p + 3) = 0xC0.toByte                       // mono
      f += 1
    }
    if (xing) {
      val p = 4 + 17 // MPEG1 mono side-info gap
      "Xing".getBytes("US-ASCII").copyToArray(out, p)
      out(p + 7) = 1 // flags: FRAMES present
      out(p + 8) = ((frames >> 24) & 0xFF).toByte
      out(p + 9) = ((frames >> 16) & 0xFF).toByte
      out(p + 10) = ((frames >> 8) & 0xFF).toByte
      out(p + 11) = (frames & 0xFF).toByte
    }
    out
  }

  /** Deterministic minimal FLAC: `fLaC` magic + one last-flagged
    * STREAMINFO block — rate/channels/bps/total-samples packed
    * big-endian exactly as [[FlacProbe]] reads them; zero MD5 (probe
    * never checks it). Default 16 kHz so duration_ms = samples/16 is
    * binary-exact. */
  private[graft] def synthFlac(totalSamples: Long, rate: Int = 16000,
      channels: Int = 1): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(8 + 34)
    out.put("fLaC".getBytes("US-ASCII"))
    out.put(0x80.toByte) // last-metadata-block flag | type 0
    out.put(0.toByte).put(0.toByte).put(34.toByte)
    out.putShort(4096.toShort).putShort(4096.toShort) // min/max blocksize
    out.put(new Array[Byte](6)) // min/max framesize: unknown
    out.putLong((rate.toLong << 44) | ((channels - 1).toLong << 41) |
      (15L << 36) | totalSamples) // bps-1 = 15 (16-bit)
    out.put(new Array[Byte](16)) // md5: zeros
    out.array()
  }

  /** Deterministic uniform-gray PNG (gray 128, dimensions chosen by
    * the caller) — the synthetic image the pipeline queries decode,
    * chosen so width/height/channels/mean-luma/sharpness are pure
    * arithmetic any SQL engine reproduces. */
  private[graft] def synthPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, 0x808080); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic minimal MP4 (ISO BMFF) container: ftyp('isom') +
    * moov(mvhd: timescale 1000 so duration == `durationMs` exactly;
    * one trak(tkhd: 16.16 fixed-point w×h; stsd: single 'avc1'
    * sample entry)). No mdat — container metadata only, which is all
    * [[Mp4Probe]] (or any prober) reads; every derived stat is exact
    * integer arithmetic any SQL engine reproduces. */
  private[graft] def synthMp4(durationMs: Int, w: Int, h: Int): Array[Byte] = {
    def be(ints: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(ints.size * 4)
      ints.foreach(bb.putInt)
      bb.array()
    }
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(tpe.getBytes("US-ASCII"))
      payload.foreach(bb.put)
      bb.array()
    }
    val unity = be(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be(0),
      "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd", be(0, 0, 0, 1000, durationMs, 0x10000),
      Array[Byte](0x01, 0x00, 0, 0), be(0, 0), unity,
      be(0, 0, 0, 0, 0, 0), be(2)) // volume+rsvd, rsvd, matrix, predef, next
    val tkhd = box("tkhd", be(7, 0, 0, 1, 0, durationMs, 0, 0),
      be(0, 0), unity, be(w << 16, h << 16)) // layer/group/volume/rsvd = 0
    val stsd = box("stsd", be(0, 1),
      box("avc1", Array.fill[Byte](6)(0), Array[Byte](0, 1)))
    val moov = box("moov", mvhd,
      box("trak", tkhd, box("mdia", box("minf", box("stbl", stsd)))))
    ftyp ++ moov
  }

  /** Deterministic minimal M4A: ftyp('M4A ') + moov(mvhd; one sound
    * trak whose mdhd carries timescale = `rate` and duration =
    * `samples` (so duration_ms = samples×1000/rate exactly), hdlr
    * 'soun', and an stsd with one `mp4a` AudioSampleEntry holding
    * channelcount + 16.16 sample rate). Container metadata only —
    * everything [[Mp4Probe.parseAudio]] reads, all integer
    * arithmetic. */
  private[graft] def synthM4a(samples: Long, rate: Int = 16000,
      channels: Int = 1): Array[Byte] = {
    def be(ints: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(ints.size * 4)
      ints.foreach(bb.putInt)
      bb.array()
    }
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len)
      bb.putInt(len).put(tpe.getBytes("US-ASCII"))
      payload.foreach(bb.put)
      bb.array()
    }
    val ftyp = box("ftyp", "M4A ".getBytes("US-ASCII"), be(0),
      "M4A ".getBytes("US-ASCII"))
    val durMs = (samples * 1000 / rate).toInt
    val unity = be(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    val mvhd = box("mvhd", be(0, 0, 0, 1000, durMs, 0x10000),
      Array[Byte](0x01, 0x00, 0, 0), be(0, 0), unity,
      be(0, 0, 0, 0, 0, 0), be(2))
    val mdhd = box("mdhd", be(0, 0, 0, rate, samples.toInt),
      be(0)) // v0: ver/flags, ctime, mtime, TIMESCALE, duration; lang+rsvd
    val hdlr = box("hdlr", be(0, 0),
      "soun".getBytes("US-ASCII"), be(0, 0, 0))
    // AudioSampleEntry: rsvd(6)+dri(2), ver/rev/vendor(8),
    // channelcount(2)+samplesize(2), predef+rsvd(4), rate 16.16(4)
    val mp4a = box("mp4a", Array.fill[Byte](6)(0), Array[Byte](0, 1),
      be(0, 0),
      Array[Byte]((channels >> 8).toByte, channels.toByte, 0, 16),
      be(0), be(rate << 16))
    val stsd = box("stsd", be(0, 1), mp4a)
    val moov = box("moov", mvhd, box("trak",
      box("mdia", mdhd, hdlr, box("minf", box("stbl", stsd)))))
    ftyp ++ moov
  }

  /** Partition-wise audio decode: appends an `audio` struct column
    * ([[audioType]]) extracted from the media payload by
    * [[WavDecoder]]. Same batched `mapPartitions` plumbing as
    * [[decode]]. */
  def audioFeatures(df: DataFrame, mediaCol: String): DataFrame = {
    val schema = df.schema.add("audio", audioType)
    val enc = RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(mediaCol)
    val bytesIdx = df.schema(idx).dataType.asInstanceOf[StructType]
      .fieldIndex("bytes")
    df.mapPartitions { it =>
      it.map { row =>
        val media = row.getStruct(idx)
        val bytes =
          if (media == null || media.isNullAt(bytesIdx)) null
          else media.get(bytesIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(row.toSeq :+ WavDecoder.decode(bytes))
      }
    }(enc)
  }

  /** Probed-video schema produced by [[videoFeatures]]. */
  val videoType: StructType = StructType(Seq(
    StructField("container", StringType),
    StructField("codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", DoubleType),
    StructField("n_streams", IntegerType),
    StructField("probed", BooleanType))) // true = real container facts
                                         // (JVM MP4 parse or binary)

  /** Pure-JVM ISO BMFF (MP4/MOV/M4A) container probe: walks the box
    * tree directly — `ftyp` (container brand), `moov/mvhd`
    * (timescale + duration), `trak/tkhd` (16.16 fixed-point display
    * width/height), `trak/.../stsd` (first sample-entry 4CC as the
    * codec), trak count as the stream count. No codec, no external
    * binary — container METADATA only, which is what a corpus QA scan
    * needs (the box layout is the published ISO/IEC 14496-12
    * structure). Unversioned-box edge cases handled: 64-bit
    * `largesize`, size==0 (to end of enclosing box), v1 full boxes
    * with 64-bit times. Returns None for anything that isn't a
    * parseable BMFF file. */
  private[graft] object Mp4Probe {
    def looksLikeMp4(b: Array[Byte]): Boolean =
      b != null && b.length >= 12 &&
        b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    private def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
    private def u64(b: Array[Byte], off: Int): Long =
      (u32(b, off) << 32) | u32(b, off + 4)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** Visit the child boxes of `[start, end)` as (4cc, payloadStart,
      * payloadEnd) tuples. Malformed sizes stop the walk (parse
      * what's valid, never read out of bounds). */
    private def boxes(b: Array[Byte], start: Int, end: Int)(
        f: ((String, Int, Int)) => Unit): Unit = {
      var off = start
      var ok = true
      while (ok && off + 8 <= end) {
        var size = u32(b, off)
        var hdr = 8
        if (size == 1 && off + 16 <= end) { size = u64(b, off + 8); hdr = 16 }
        else if (size == 0) size = (end - off).toLong
        if (size < hdr || size > end - off) ok = false
        else {
          f((fourcc(b, off + 4), off + hdr, off + size.toInt))
          off += size.toInt
        }
      }
    }

    def parse(b: Array[Byte]): Option[Row] = try {
      if (!looksLikeMp4(b)) return None
      var container: String = null
      var timescale = 0L
      var duration = -1L
      var width: Integer = null
      var height: Integer = null
      var codec: String = null
      var nTraks = 0
      boxes(b, 0, b.length) {
        case ("ftyp", s, e) if e - s >= 4 => container = fourcc(b, s).trim
        case ("moov", s, e) => boxes(b, s, e) {
          case ("mvhd", s2, e2) if e2 - s2 >= 20 =>
            if ((b(s2) & 0xFF) == 1 && e2 - s2 >= 32) {
              timescale = u32(b, s2 + 20); duration = u64(b, s2 + 24)
            } else {
              timescale = u32(b, s2 + 12); duration = u32(b, s2 + 16)
            }
          case ("trak", s2, e2) =>
            nTraks += 1
            boxes(b, s2, e2) {
              case ("tkhd", s3, e3) =>
                val (wo, ho) = if ((b(s3) & 0xFF) == 1) (88, 92) else (76, 80)
                if (e3 - s3 >= ho + 4 && width == null) {
                  val wv = (u32(b, s3 + wo) >> 16).toInt
                  val hv = (u32(b, s3 + ho) >> 16).toInt
                  if (wv > 0 && hv > 0) { width = wv; height = hv }
                }
              case ("mdia", s3, e3) => boxes(b, s3, e3) {
                case ("minf", s4, e4) => boxes(b, s4, e4) {
                  case ("stbl", s5, e5) => boxes(b, s5, e5) {
                    case ("stsd", s6, e6) if e6 - s6 >= 16 && codec == null =>
                      // ver/flags(4) + entry_count(4), then the first
                      // sample entry's own box header: its 4CC = codec
                      codec = fourcc(b, s6 + 12)
                    case _ => ()
                  }
                  case _ => ()
                }
                case _ => ()
              }
              case _ => ()
            }
          case _ => ()
        }
        case _ => ()
      }
      if (container == null) None
      else Some(Row(container, codec, width, height,
        if (timescale > 0 && duration >= 0)
          Double.box(duration * 1000.0 / timescale) else null,
        if (nTraks > 0) Int.box(nTraks) else null,
        Boolean.box(true)))
    } catch { case _: Exception => None }

    /** AUDIO facts for an M4A/MP4 audio payload ([[audioType]] row):
      * the first sound track's `mdhd` carries timescale (= the sample
      * rate for audio tracks) and duration IN SAMPLES; the `mp4a`
      * (or alac/ac-3/samr) sample entry carries channelcount and a
      * 16.16 sample rate. Container metadata only — the published
      * ISO/IEC 14496-12 AudioSampleEntry layout, no codec. A track is
      * audio when its handler says `soun` or its sample entry is an
      * audio 4CC; video-only MP4s return None (the video prober owns
      * them). RMS stays null — facts only, same contract as the other
      * walks. */
    def parseAudio(b: Array[Byte]): Option[Row] = try {
      if (!looksLikeMp4(b)) return None
      var out: Option[Row] = None
      boxes(b, 0, b.length) {
        case ("moov", s, e) => boxes(b, s, e) {
          case ("trak", s2, e2) if out.isEmpty =>
            var tTs = 0L; var tDur = -1L
            var tCh = -1; var tRate = 0L; var soun = false
            boxes(b, s2, e2) {
              case ("mdia", s3, e3) => boxes(b, s3, e3) {
                case ("mdhd", s4, e4) if e4 - s4 >= 20 =>
                  if ((b(s4) & 0xFF) == 1 && e4 - s4 >= 32) {
                    tTs = u32(b, s4 + 20); tDur = u64(b, s4 + 24)
                  } else { tTs = u32(b, s4 + 12); tDur = u32(b, s4 + 16) }
                case ("hdlr", s4, e4) if e4 - s4 >= 12 =>
                  soun = soun || fourcc(b, s4 + 8) == "soun"
                case ("minf", s4, e4) => boxes(b, s4, e4) {
                  case ("stbl", s5, e5) => boxes(b, s5, e5) {
                    case ("stsd", s6, e6) if e6 - s6 >= 16 =>
                      val ec = fourcc(b, s6 + 12)
                      if (Set("mp4a", "alac", "ac-3", "samr")(ec)) {
                        val p = s6 + 16 // first entry's payload
                        if (e6 - p >= 28) {
                          tCh = ((b(p + 16) & 0xFF) << 8) | (b(p + 17) & 0xFF)
                          tRate = u32(b, p + 24) >> 16
                        }
                      }
                    case _ => ()
                  }
                  case _ => ()
                }
                case _ => ()
              }
              case _ => ()
            }
            if ((soun || tCh > 0) && tTs > 0 && tDur >= 0) {
              val rate = if (tRate > 0) tRate else tTs
              out = Some(Row(Int.box(rate.toInt),
                if (tCh > 0) Int.box(tCh) else null,
                Long.box(tDur), Double.box(tDur * 1000.0 / tTs), null))
            }
          case _ => ()
        }
        case _ => ()
      }
      out
    } catch { case _: Exception => None }
  }

  /** Pure-JVM EBML (Matroska/WebM) container probe: walks the element
    * tree of the published EBML/Matroska structure (RFC 8794 + the
    * matroska.org element registry) — `EBML/DocType` (container
    * brand), `Segment/Info` (TimecodeScale + Duration),
    * `Segment/Tracks/TrackEntry` (TrackType, CodecID,
    * Video/PixelWidth+PixelHeight), TrackEntry count as the stream
    * count. Element IDs and sizes are variable-length integers; an
    * all-ones size VINT means "unknown size — extends to the end of
    * the enclosing element" (streamed files write Segment and Cluster
    * that way). No codec work, no external binary — container
    * METADATA only, same contract as [[Mp4Probe]]. Returns None for
    * anything that doesn't start with the EBML magic. */
  private[graft] object EbmlProbe {
    def looksLikeEbml(b: Array[Byte]): Boolean =
      b != null && b.length >= 4 && (b(0) & 0xFF) == 0x1A &&
        (b(1) & 0xFF) == 0x45 && (b(2) & 0xFF) == 0xDF && (b(3) & 0xFF) == 0xA3

    // element IDs (marker bits kept, per RFC 8794 §5)
    private final val EBML = 0x1A45DFA3L
    private final val DocType = 0x4282L
    private final val Segment = 0x18538067L
    private final val Info = 0x1549A966L
    private final val TimecodeScale = 0x2AD7B1L
    private final val DurationId = 0x4489L
    private final val Tracks = 0x1654AE6BL
    private final val TrackEntry = 0xAEL
    private final val TrackType = 0x83L
    private final val CodecID = 0x86L
    private final val VideoEl = 0xE0L
    private final val PixelWidth = 0xB0L
    private final val PixelHeight = 0xBAL

    /** Read an element ID at `off` (marker bits KEPT — IDs are
      * compared with their length prefix, max 4 bytes). */
    private def readId(b: Array[Byte], off: Int, end: Int): Option[(Long, Int)] = {
      if (off >= end) return None
      val first = b(off) & 0xFF
      if (first == 0) return None
      val n = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
      if (n > 4 || off + n > end) return None
      var v = first.toLong
      var i = 1
      while (i < n) { v = (v << 8) | (b(off + i) & 0xFFL); i += 1 }
      Some((v, n))
    }

    /** Read a size VINT at `off` (marker bit STRIPPED, max 8 bytes).
      * Returns (value, width, unknown) — `unknown` = all data bits
      * set, the "extends to end of parent" encoding. */
    private def readSize(b: Array[Byte], off: Int, end: Int): Option[(Long, Int, Boolean)] = {
      if (off >= end) return None
      val first = b(off) & 0xFF
      if (first == 0) return None
      val n = java.lang.Integer.numberOfLeadingZeros(first) - 23 // 1..8
      if (off + n > end) return None
      var v = (first & (0xFF >>> n)).toLong
      var allOnes = (first | (~(0xFF >>> n) & 0xFF)) == 0xFF
      var i = 1
      while (i < n) {
        val byte = b(off + i) & 0xFF
        v = (v << 8) | byte.toLong
        allOnes &&= byte == 0xFF
        i += 1
      }
      Some((v, n, allOnes))
    }

    /** Master (container) elements — the only ones whose torn payload
      * prefix is still parseable (their children are elements); a
      * torn LEAF (string/number) is dropped, never surfaced as
      * garbage prefix bytes. */
    private val Masters = Set(EBML, Segment, Info, Tracks, TrackEntry, VideoEl)

    /** Visit child elements of `[start, end)` as (id, payloadStart,
      * payloadEnd). Malformed VINTs stop the walk (parse what's
      * valid, never read out of bounds); unknown-size elements claim
      * the rest of the parent. */
    private def elements(b: Array[Byte], start: Int, end: Int)(
        f: ((Long, Int, Int)) => Unit): Unit = {
      var off = start
      var ok = true
      while (ok && off < end) {
        (for {
          (id, idW) <- readId(b, off, end)
          (sz, szW, unknown) <- readSize(b, off + idW, end)
        } yield (id, idW, sz, szW, unknown)) match {
          case Some((id, idW, sz, szW, unknown)) =>
            val ps = off + idW + szW
            val pe = if (unknown) end.toLong else ps + sz
            if (pe > end || pe < ps) { // truncated payload: surface the
              if (Masters(id)) f((id, ps, end)) // readable prefix of a
              ok = false                        // master, then stop
            } else { f((id, ps, pe.toInt)); off = pe.toInt }
          case None => ok = false
        }
      }
    }

    private def uint(b: Array[Byte], s: Int, e: Int): Long = {
      var v = 0L; var i = s
      while (i < e && i - s < 8) { v = (v << 8) | (b(i) & 0xFFL); i += 1 }
      v
    }
    private def float(b: Array[Byte], s: Int, e: Int): Option[Double] =
      (e - s) match {
        case 4 => Some(java.lang.Float.intBitsToFloat(uint(b, s, e).toInt).toDouble)
        case 8 => Some(java.lang.Double.longBitsToDouble(uint(b, s, e)))
        case _ => None
      }

    def parse(b: Array[Byte]): Option[Row] = try {
      if (!looksLikeEbml(b)) return None
      var container: String = null
      var scaleNs = 1000000L // Matroska default: 1 ms ticks
      var durationTicks: Option[Double] = None
      var codec: String = null
      var videoCodec: String = null
      var width: Integer = null
      var height: Integer = null
      var nTracks = 0
      elements(b, 0, b.length) {
        case (EBML, s, e) => elements(b, s, e) {
          case (DocType, s2, e2) =>
            container = new String(b, s2, e2 - s2, "US-ASCII").trim
          case _ => ()
        }
        case (Segment, s, e) => elements(b, s, e) {
          case (Info, s2, e2) => elements(b, s2, e2) {
            case (TimecodeScale, s3, e3) => scaleNs = uint(b, s3, e3)
            case (DurationId, s3, e3) => durationTicks = float(b, s3, e3)
            case _ => ()
          }
          case (Tracks, s2, e2) => elements(b, s2, e2) {
            case (TrackEntry, s3, e3) =>
              nTracks += 1
              var isVideo = false
              var entryCodec: String = null
              elements(b, s3, e3) {
                case (TrackType, s4, e4) => isVideo = uint(b, s4, e4) == 1L
                case (CodecID, s4, e4) =>
                  entryCodec = new String(b, s4, e4 - s4, "US-ASCII").trim
                case (VideoEl, s4, e4) => elements(b, s4, e4) {
                  case (PixelWidth, s5, e5) if width == null =>
                    width = uint(b, s5, e5).toInt
                  case (PixelHeight, s5, e5) if height == null =>
                    height = uint(b, s5, e5).toInt
                  case _ => ()
                }
                case _ => ()
              }
              if (entryCodec != null) {
                if (codec == null) codec = entryCodec
                if (isVideo && videoCodec == null) videoCodec = entryCodec
              }
            case _ => ()
          }
          case _ => ()
        }
        case _ => ()
      }
      if (container == null) None
      else Some(Row(container,
        if (videoCodec != null) videoCodec else codec,
        width, height,
        durationTicks.filter(_ >= 0).filter(_ => scaleNs > 0)
          .map(d => Double.box(d * scaleNs / 1e6)).orNull,
        if (nTracks > 0) Int.box(nTracks) else null,
        Boolean.box(true)))
    } catch { case _: Exception => None }
  }

  /** Pure-JVM RIFF/AVI container probe — the third pure-JVM video
    * family after ISO BMFF ([[Mp4Probe]]) and EBML ([[EbmlProbe]]):
    * walks the published RIFF chunk layout (`RIFF…AVI ` → `LIST hdrl`
    * → `avih` main header for frame period / total frames / stream
    * count / dimensions, `LIST strl` → `strh` for the first `vids`
    * stream's fourcc codec handler). Chunk sizes are little-endian
    * and word-aligned; the walk is bounds-checked so truncated
    * payloads yield whatever facts were present, like the other two
    * probes. Container METADATA only — no codec work, no external
    * binary. Returns None for anything not starting with the
    * `RIFF…AVI ` magic. */
  private[graft] object RiffProbe {
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

    def looksLikeAvi(b: Array[Byte]): Boolean =
      b != null && b.length >= 12 && fourcc(b, 0) == "RIFF" &&
        fourcc(b, 8) == "AVI "

    def parse(b: Array[Byte]): Option[Row] = try {
      if (!looksLikeAvi(b)) return None
      var usPerFrame = 0L
      var totalFrames = 0L
      var nStreams: Integer = null
      var width: Integer = null
      var height: Integer = null
      var codec: String = null
      // depth-bounded: real AVIs nest 2-3 LIST levels; a corrupt or
      // adversarial payload of nothing but LIST headers must not
      // recurse to a StackOverflowError (an Error, which the Exception
      // guard below would NOT absorb — it would kill the scan task)
      def chunks(off0: Int, end: Int, depth: Int): Unit = {
        if (depth > 16) return
        var off = off0
        while (off + 8 <= end) {
          val id = fourcc(b, off)
          val size = u32(b, off + 4)
          val body = off + 8
          val bodyEnd = math.min(end.toLong, body + size).toInt
          id match {
            case "LIST" if bodyEnd - body >= 4 =>
              chunks(body + 4, bodyEnd, depth + 1) // skip the list-type fourcc
            case "avih" if bodyEnd - body >= 40 =>
              usPerFrame = u32(b, body)
              totalFrames = u32(b, body + 16)
              nStreams = Int.box(u32(b, body + 24).toInt)
              width = Int.box(u32(b, body + 32).toInt)
              height = Int.box(u32(b, body + 36).toInt)
            case "strh" if bodyEnd - body >= 8 =>
              if (fourcc(b, body) == "vids" && codec == null)
                codec = fourcc(b, body + 4).trim
            case _ => ()
          }
          off = body + size.toInt + (size.toInt & 1) // word alignment
          if (size > Int.MaxValue - 16) return
        }
      }
      chunks(12, math.min(b.length.toLong, 8 + u32(b, 4)).toInt, 0)
      Some(Row("avi", codec, width, height,
        if (usPerFrame > 0 && totalFrames > 0)
          Double.box(totalFrames * usPerFrame / 1000.0) else null,
        nStreams, Boolean.box(true)))
    } catch { case _: Exception => None }
  }

  /** Pure-JVM Ogg container probe (RFC 3533): sequential page walk —
    * `OggS` capture pattern, 27-byte header, lacing table — reading
    * each BOS page's first packet for the stream ident (Theora video:
    * picture dims, frame rate, keyframe-granule shift; Vorbis: sample
    * rate; Opus: pre-skip) and tracking the LAST granule position per
    * stream. Duration comes from the granule semantics each codec
    * defines: Theora granule = (keyframe << kfgshift) + offset →
    * frame count / fps; Vorbis granule = PCM samples / rate; Opus
    * granule = 48 kHz samples minus pre-skip. CRCs are not verified —
    * a probe reports, it doesn't validate. Truncated or malformed
    * pages end the walk with the facts gathered so far; payloads
    * that aren't Ogg return None (same contract as [[Mp4Probe]]). */
  private[graft] object OggProbe {
    private def u32le(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    private def u64le(b: Array[Byte], o: Int): Long =
      (0 until 8).map(i => (b(o + i) & 0xFFL) << (8 * i)).reduce(_ | _)
    private def u16be(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    private def u24be(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) | (b(o + 2) & 0xFF)
    private def u32be(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    private def has(b: Array[Byte], o: Int, s: String): Boolean =
      o + s.length <= b.length &&
        s.getBytes("US-ASCII").zipWithIndex.forall { case (c, i) => b(o + i) == c }

    def looksLikeOgg(b: Array[Byte]): Boolean =
      b != null && b.length >= 27 && has(b, 0, "OggS") && b(4) == 0

    private final class Stream {
      var kind: String = "other"
      var width: Integer = null
      var height: Integer = null
      var frn = 0L; var frd = 0L; var kfgShift = 0
      var rate = 0L; var preSkip = 0L
      var lastGranule = -1L
    }

    def parse(b: Array[Byte]): Option[Row] = try {
      if (!looksLikeOgg(b)) return None
      val streams = scala.collection.mutable.LinkedHashMap[Long, Stream]()
      var off = 0
      while (off + 27 <= b.length && has(b, off, "OggS") && b(off + 4) == 0) {
        val headerType = b(off + 5) & 0xFF
        val granule = u64le(b, off + 6)
        val serial = u32le(b, off + 14)
        val nSegs = b(off + 26) & 0xFF
        val lacingEnd = off + 27 + nSegs
        if (lacingEnd > b.length) { off = b.length } else {
          var payloadLen = 0
          var i = 0
          while (i < nSegs) { payloadLen += b(off + 27 + i) & 0xFF; i += 1 }
          val p = lacingEnd // first packet starts at the payload head
          val st = streams.getOrElseUpdate(serial, new Stream)
          if ((headerType & 0x02) != 0 && payloadLen > 0) { // BOS page
            if (p < b.length && b(p) == 0x80.toByte &&
                has(b, p + 1, "theora") && p + 42 <= b.length) {
              st.kind = "theora"
              st.width = Int.box(u24be(b, p + 14))
              st.height = Int.box(u24be(b, p + 17))
              st.frn = u32be(b, p + 22); st.frd = u32be(b, p + 26)
              st.kfgShift = (u16be(b, p + 40) >> 5) & 0x1F
            } else if (p < b.length && b(p) == 0x01.toByte &&
                has(b, p + 1, "vorbis") && p + 16 <= b.length) {
              st.kind = "vorbis"
              st.rate = u32le(b, p + 12)
            } else if (has(b, p, "OpusHead") && p + 14 <= b.length) {
              st.kind = "opus"
              st.preSkip = (b(p + 10) & 0xFFL) | ((b(p + 11) & 0xFFL) << 8)
            }
          }
          // granule -1 marks a continuation page with no packet end
          if (granule != -1L && granule > st.lastGranule)
            st.lastGranule = granule
          off = lacingEnd + payloadLen
        }
      }
      if (streams.isEmpty) return None
      def durMs(s: Stream): Option[Double] = s.kind match {
        case "theora" if s.lastGranule > 0 && s.frn > 0 && s.frd > 0 =>
          val frames = (s.lastGranule >>> s.kfgShift) +
            (s.lastGranule & ((1L << s.kfgShift) - 1))
          Some(frames * 1000.0 * s.frd / s.frn)
        case "vorbis" if s.lastGranule > 0 && s.rate > 0 =>
          Some(s.lastGranule * 1000.0 / s.rate)
        case "opus" if s.lastGranule > s.preSkip =>
          Some((s.lastGranule - s.preSkip) * 1000.0 / 48000.0)
        case _ => None
      }
      val video = streams.values.find(_.kind == "theora")
      val first = video.orElse(streams.values.find(_.kind != "other"))
      val duration = video.flatMap(durMs)
        .orElse(streams.values.flatMap(durMs(_)).reduceOption(_ max _))
      Some(Row("ogg", first.map(_.kind).orNull,
        video.map(_.width).orNull, video.map(_.height).orNull,
        duration.map(Double.box).orNull,
        Int.box(streams.size), Boolean.box(true)))
    } catch { case _: Exception => None }
  }

  /** Pure-JVM MPEG transport-stream probe (ISO 13818-1): fixed
    * 188-byte packets (sync 0x47), PAT (PID 0) → PMT walk for the
    * stream table — first video stream type names the codec, the
    * entry count is `n_streams` — and duration from the PCR span
    * (first vs last 33-bit 90 kHz program-clock base, any PCR PID;
    * wrap-around and single-PCR streams yield null). TS framing
    * carries no dimensions, but the codec BITSTREAM does: the walk
    * accumulates the first video stream's PES payloads (PID learned
    * from the PMT, so pre-PMT video packets are skipped — in
    * broadcast TS the tables repeat every ~100 ms and the SPS /
    * sequence header repeats at every IDR/GOP, so the probed prefix
    * still yields one) and a post-pass parses an MPEG-2 sequence
    * header (ISO 13818-2 §6.2.2.1: 12-bit width/height after start
    * code 0xB3) or an H.264 SPS ([[H264Sps]]) for width/height;
    * HEVC/MPEG-4 dims stay null — the external prober (when
    * present) still fills them via the usual fall-through.
    * Truncated tails (non-multiple of 188) parse up to the last whole
    * packet. */
  private[graft] object TsProbe {
    private val Pkt = 188
    private val EsCap = 1 << 16 // dims live in the first GOP's headers
    def looksLikeTs(b: Array[Byte]): Boolean =
      b != null && b.length >= 2 * Pkt &&
        b(0) == 0x47.toByte && b(Pkt) == 0x47.toByte

    private def streamName(t: Int): String = t match {
      case 0x01 | 0x02 => "mpeg2video"
      case 0x1B => "h264"
      case 0x24 => "hevc"
      case 0x10 => "mpeg4video"
      case _ => null
    }
    private def isVideo(t: Int): Boolean = streamName(t) != null

    def parse(b: Array[Byte]): Option[Row] = try {
      if (!looksLikeTs(b)) return None
      var pmtPid = -1
      var videoPid = -1
      var codec: String = null
      var nStreams: Integer = null
      var firstPcr = -1L; var lastPcr = -1L
      val es = new java.io.ByteArrayOutputStream()
      var off = 0
      while (off + Pkt <= b.length && b(off) == 0x47.toByte) {
        val pid = ((b(off + 1) & 0x1F) << 8) | (b(off + 2) & 0xFF)
        val pusi = (b(off + 1) & 0x40) != 0
        val afc = (b(off + 3) >> 4) & 0x3
        var body = off + 4
        if ((afc & 2) != 0) { // adaptation field
          val afLen = b(body) & 0xFF
          if (afLen >= 7 && (b(body + 1) & 0x10) != 0) { // PCR flag
            var base = 0L
            var i = 0
            while (i < 4) { base = (base << 8) | (b(body + 2 + i) & 0xFFL); i += 1 }
            base = (base << 1) | ((b(body + 6) & 0x80L) >> 7) // 33 bits
            if (firstPcr < 0) firstPcr = base
            lastPcr = base
          }
          body += 1 + afLen
        }
        if ((afc & 1) != 0 && pid == videoPid && body < off + Pkt &&
            es.size < EsCap) {
          // video PES: a unit-start packet opens with the 6-byte PES
          // prefix + flags + header_data_length; continuations are
          // raw elementary-stream bytes
          var p = body
          if (pusi && p + 9 <= off + Pkt && b(p) == 0 && b(p + 1) == 0 &&
              b(p + 2) == 1)
            p += 9 + (b(p + 8) & 0xFF)
          if (p < off + Pkt) es.write(b, p, off + Pkt - p)
        }
        if ((afc & 1) != 0 && pusi && body < off + Pkt) {
          val section = body + 1 + (b(body) & 0xFF) // pointer_field skip
          if (section + 12 <= off + Pkt) {
            val tableId = b(section) & 0xFF
            val secLen = ((b(section + 1) & 0x0F) << 8) | (b(section + 2) & 0xFF)
            val secEnd = math.min(off + Pkt, section + 3 + secLen - 4) // -CRC
            if (pid == 0 && tableId == 0 && pmtPid < 0) {
              // PAT: (program_number, PMT PID) entries from offset 8
              var e = section + 8
              while (e + 4 <= secEnd && pmtPid < 0) {
                val prog = ((b(e) & 0xFF) << 8) | (b(e + 1) & 0xFF)
                if (prog != 0)
                  pmtPid = ((b(e + 2) & 0x1F) << 8) | (b(e + 3) & 0xFF)
                e += 4
              }
            } else if (pid == pmtPid && tableId == 2 && nStreams == null) {
              // PMT: skip PCR PID + program descriptors, walk streams
              val progInfoLen =
                ((b(section + 10) & 0x0F) << 8) | (b(section + 11) & 0xFF)
              var e = section + 12 + progInfoLen
              var n = 0
              while (e + 5 <= secEnd) {
                val st = b(e) & 0xFF
                if (codec == null && isVideo(st)) {
                  codec = streamName(st)
                  videoPid = ((b(e + 1) & 0x1F) << 8) | (b(e + 2) & 0xFF)
                }
                val esLen = ((b(e + 3) & 0x0F) << 8) | (b(e + 4) & 0xFF)
                n += 1
                e += 5 + esLen
              }
              nStreams = Int.box(n)
            }
          }
        }
        off += Pkt
      }
      val duration =
        if (firstPcr >= 0 && lastPcr > firstPcr)
          Double.box((lastPcr - firstPcr) * 1000.0 / 90000.0)
        else null
      var width: Integer = null
      var height: Integer = null
      val esB = es.toByteArray
      if (codec == "mpeg2video") {
        // sequence_header: 00 00 01 B3, then width(12) height(12)
        var i = 0
        while (i + 7 <= esB.length && width == null) {
          if (esB(i) == 0 && esB(i + 1) == 0 && esB(i + 2) == 1 &&
              (esB(i + 3) & 0xFF) == 0xB3) {
            val w0 = ((esB(i + 4) & 0xFF) << 4) | ((esB(i + 5) & 0xF0) >> 4)
            val h0 = ((esB(i + 5) & 0x0F) << 8) | (esB(i + 6) & 0xFF)
            if (w0 > 0 && h0 > 0) { width = w0; height = h0 }
          }
          i += 1
        }
      } else if (codec == "h264") {
        H264Sps.findAndParse(esB).foreach { case (w0, h0) =>
          width = w0; height = h0
        }
      } else if (codec == "hevc") {
        H265Sps.findAndParse(esB).foreach { case (w0, h0) =>
          width = w0; height = h0
        }
      } else if (codec == "mpeg4video") {
        Mpeg4Vol.findAndParse(esB).foreach { case (w0, h0) =>
          width = w0; height = h0
        }
      }
      Some(Row("mpegts", codec, width, height, duration, nStreams,
        Boolean.box(true)))
    } catch { case _: Exception => None }
  }

  /** H.264 sequence-parameter-set decoder for picture dimensions
    * (ITU-T H.264 §7.3.2.1.1): scans an elementary-stream byte run
    * for an SPS NAL (start code 00 00 01, forbidden bit clear,
    * nal_unit_type 7), strips emulation-prevention bytes
    * (00 00 03 → 00 00), and Exp-Golomb-decodes through the
    * profile-conditional prefix (chroma format, bit depths, scaling
    * lists), the pic-order-cnt block, and the cropping window:
    * width = mbs×16 − cropUnitX×(left+right), height analogous with
    * the frame/field doubling. Malformed bits → None (dims stay
    * null, the external-prober fall-through is preserved). */
  /** Shared NAL-bitstream plumbing for the SPS decoders: an MSB-first
    * bit reader with Exp-Golomb, and the emulation-prevention strip
    * (00 00 03 → 00 00) over a bounded NAL slice. */
  private[graft] object Nal {
    final class Bits(b: Array[Byte]) {
      private var pos = 0
      def u1(): Int = {
        val v = (b(pos >> 3) >> (7 - (pos & 7))) & 1; pos += 1; v
      }
      def u(n: Int): Int = {
        var v = 0; var i = 0
        while (i < n) { v = (v << 1) | u1(); i += 1 }
        v
      }
      def skip(n: Int): Unit = { var i = 0; while (i < n) { u1(); i += 1 } }
      def ue(): Int = {
        var z = 0
        while (u1() == 0) {
          z += 1
          if (z > 31) throw new IllegalArgumentException("ue overflow")
        }
        if (z == 0) 0 else ((1 << z) - 1) + u(z)
      }
      def se(): Int = {
        val k = ue(); if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
      }
    }

    /** RBSP bytes of `b(from until bound)` up to the next start code,
      * emulation-prevention bytes removed. */
    def rbspSlice(b: Array[Byte], from: Int, maxLen: Int): Array[Byte] = {
      var end = from
      while (end + 3 <= b.length && end < from + maxLen &&
          !(b(end) == 0 && b(end + 1) == 0 && b(end + 2) == 1)) end += 1
      if (end + 3 > b.length) end = b.length
      val out = new java.io.ByteArrayOutputStream()
      var zeros = 0
      var j = from
      while (j < end) {
        val x = b(j)
        if (zeros >= 2 && x == 3) zeros = 0 // emulation-prevention byte
        else { out.write(x); zeros = if (x == 0) zeros + 1 else 0 }
        j += 1
      }
      out.toByteArray
    }
  }

  private[graft] object H264Sps {
    import Nal.Bits
    private val HighProfiles = Set(100, 110, 122, 244, 44, 83, 86,
      118, 128, 138, 139, 134, 135)

    private def skipScalingList(r: Bits, size: Int): Unit = {
      var lastScale = 8; var nextScale = 8; var j = 0
      while (j < size) {
        if (nextScale != 0) nextScale = (lastScale + r.se() + 256) % 256
        if (nextScale != 0) lastScale = nextScale
        j += 1
      }
    }

    private def dims(rbsp: Array[Byte]): (Int, Int) = {
      val r = new Bits(rbsp)
      val profile = r.u(8)
      r.u(8); r.u(8); r.ue() // constraints, level, sps_id
      var chroma = 1; var sep = false
      if (HighProfiles(profile)) {
        chroma = r.ue()
        if (chroma == 3) sep = r.u1() == 1
        r.ue(); r.ue(); r.u1() // bit depths, transform bypass
        if (r.u1() == 1) { // seq_scaling_matrix_present
          val n = if (chroma != 3) 8 else 12
          var i = 0
          while (i < n) {
            if (r.u1() == 1) skipScalingList(r, if (i < 6) 16 else 64)
            i += 1
          }
        }
      }
      r.ue() // log2_max_frame_num_minus4
      r.ue() match {
        case 0 => r.ue() // log2_max_pic_order_cnt_lsb_minus4
        case 1 =>
          r.u1(); r.se(); r.se()
          val n = r.ue(); var i = 0
          while (i < n) { r.se(); i += 1 }
        case _ =>
      }
      r.ue(); r.u1() // max_num_ref_frames, gaps_allowed
      val mbW = r.ue() + 1
      val mapH = r.ue() + 1
      val frameMbsOnly = r.u1()
      if (frameMbsOnly == 0) r.u1() // mb_adaptive_frame_field
      r.u1() // direct_8x8_inference
      var cl = 0; var cr = 0; var ct = 0; var cb = 0
      if (r.u1() == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
      val (subW, subH) = chroma match {
        case 1 => (2, 2); case 2 => (2, 1); case _ => (1, 1)
      }
      val cux = if (chroma == 0 || sep) 1 else subW
      val cuy = (if (chroma == 0 || sep) 1 else subH) * (2 - frameMbsOnly)
      (mbW * 16 - cux * (cl + cr),
        (2 - frameMbsOnly) * mapH * 16 - cuy * (ct + cb))
    }

    def findAndParse(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 0
      while (i + 5 <= b.length) {
        if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1 &&
            (b(i + 3) & 0x80) == 0 && (b(i + 3) & 0x1F) == 7) {
          try {
            val (w, h) = dims(Nal.rbspSlice(b, i + 4, 512))
            if (w > 0 && h > 0) return Some((w, h))
          } catch { case _: Exception => } // malformed SPS: keep scanning
        }
        i += 1
      }
      None
    }
  }

  /** H.265/HEVC SPS decoder for picture dimensions (ITU-T H.265
    * §7.3.2.2.1): scans for an SPS NAL (two-byte NAL header,
    * nal_unit_type 33), skips the fixed-size profile_tier_level
    * (96 bits + per-sub-layer blocks), then reads
    * `pic_width/height_in_luma_samples` and subtracts the
    * conformance window in chroma-subsampling units. Malformed
    * bits → None (the external-prober fall-through is preserved). */
  private[graft] object H265Sps {
    import Nal.Bits

    private def dims(rbsp: Array[Byte]): (Int, Int) = {
      val r = new Bits(rbsp)
      r.u(4) // sps_video_parameter_set_id
      val maxSubM1 = r.u(3)
      r.u(1) // sps_temporal_id_nesting_flag
      r.skip(96) // general profile_tier_level incl. level_idc
      if (maxSubM1 > 0) {
        val profPresent = new Array[Boolean](maxSubM1)
        val levelPresent = new Array[Boolean](maxSubM1)
        var i = 0
        while (i < maxSubM1) {
          profPresent(i) = r.u1() == 1; levelPresent(i) = r.u1() == 1
          i += 1
        }
        r.skip(2 * (8 - maxSubM1)) // reserved_zero_2bits alignment
        i = 0
        while (i < maxSubM1) {
          if (profPresent(i)) r.skip(88)
          if (levelPresent(i)) r.skip(8)
          i += 1
        }
      }
      r.ue() // sps_seq_parameter_set_id
      val chroma = r.ue()
      val sep = chroma == 3 && r.u1() == 1
      val w = r.ue() // pic_width_in_luma_samples
      val h = r.ue()
      var cl = 0; var cr = 0; var ct = 0; var cb = 0
      if (r.u1() == 1) { cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue() }
      // conformance offsets are in SubWidthC/SubHeightC luma units
      val subW = if (sep || chroma == 0 || chroma == 3) 1 else 2
      val subH = if (sep || chroma == 0 || chroma >= 2) 1 else 2
      (w - subW * (cl + cr), h - subH * (ct + cb))
    }

    def findAndParse(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 0
      while (i + 6 <= b.length) {
        if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1 &&
            (b(i + 3) & 0x80) == 0 && ((b(i + 3) >> 1) & 0x3F) == 33) {
          try {
            val (w, h) = dims(Nal.rbspSlice(b, i + 5, 512))
            if (w > 0 && h > 0) return Some((w, h))
          } catch { case _: Exception => } // malformed SPS: keep scanning
        }
        i += 1
      }
      None
    }
  }

  /** Deterministic minimal transport stream: PAT (program 1 → PMT PID
    * 0x100), PMT (one H.264 video + one AAC audio stream), and two
    * PCR packets spanning exactly `durationMs` of 90 kHz clock — the
    * TS sibling of [[synthOgg]], exact arithmetic. Framing only:
    * no video PES, so probed dims stay null. */
  private[graft] def synthTs(durationMs: Int): Array[Byte] =
    synthTs(durationMs, "h264", 0, 0)

  /** TS with a real video elementary stream: one PES packet on the
    * PMT-declared video PID carrying an H.264 SPS NAL (bit-written
    * per §7.3.2.1.1, emulation-prevention escaped, cropping encodes
    * non-multiple-of-16 dims) or an MPEG-2 sequence header (12-bit
    * packed dims) — so [[TsProbe]]'s bitstream dims parse is
    * exercised with exact w×h arithmetic. w == 0 omits the PES. */
  private[graft] def synthTs(durationMs: Int, codec: String, w: Int,
      h: Int): Array[Byte] = {
    def packet(pid: Int, pusi: Boolean, payload: Array[Byte]): Array[Byte] = {
      val p = new Array[Byte](188)
      p(0) = 0x47
      p(1) = (((if (pusi) 0x40 else 0) | (pid >> 8)) & 0xFF).toByte
      p(2) = (pid & 0xFF).toByte
      p(3) = 0x10 // payload only, CC 0
      System.arraycopy(payload, 0, p, 4, payload.length)
      java.util.Arrays.fill(p, 4 + payload.length, 188, 0xFF.toByte)
      p
    }
    def pcrPacket(pid: Int, base90k: Long): Array[Byte] = {
      val p = new Array[Byte](188)
      p(0) = 0x47
      p(1) = (pid >> 8).toByte
      p(2) = (pid & 0xFF).toByte
      p(3) = 0x20 // adaptation only
      p(4) = 183.toByte // AF length fills the packet
      p(5) = 0x10 // PCR flag
      p(6) = ((base90k >> 25) & 0xFF).toByte
      p(7) = ((base90k >> 17) & 0xFF).toByte
      p(8) = ((base90k >> 9) & 0xFF).toByte
      p(9) = ((base90k >> 1) & 0xFF).toByte
      p(10) = (((base90k & 1) << 7) | 0x7E).toByte // low bit + reserved
      java.util.Arrays.fill(p, 12, 188, 0xFF.toByte)
      p
    }
    def sec(tableId: Int, body: Array[Byte]): Array[Byte] = {
      // pointer_field 0, header with section_length = body + 4-byte CRC
      val len = body.length + 5 + 4
      Array(0x00.toByte, tableId.toByte,
        (0xB0 | ((len >> 8) & 0x0F)).toByte, (len & 0xFF).toByte,
        0x00.toByte, 0x01.toByte, 0xC1.toByte, 0x00.toByte, 0x00.toByte) ++
        body ++ Array.fill(4)(0x00.toByte) // CRC not verified
    }
    val pat = sec(0, Array(0x00.toByte, 0x01.toByte, // program 1
      (0xE0 | 0x01).toByte, 0x00.toByte))            // PMT PID 0x100
    val vType = codec match {
      case "mpeg2video" => 0x02
      case "hevc" => 0x24
      case "mpeg4video" => 0x10
      case _ => 0x1B
    }
    val pmt = sec(2, Array(
      0xE1.toByte, 0x00.toByte,       // PCR PID 0x100
      0xF0.toByte, 0x00.toByte,       // program_info_length 0
      vType.toByte, 0xE1.toByte, 0x01.toByte, 0xF0.toByte, 0x00.toByte, // video
      0x0F.toByte, 0xE1.toByte, 0x02.toByte, 0xF0.toByte, 0x00.toByte)) // aac
    val span = durationMs.toLong * 90L
    val pes: Array[Byte] =
      if (w <= 0) Array.emptyByteArray
      else {
        val esB =
          if (codec == "mpeg2video") mpeg2SeqHeader(w, h)
          else if (codec == "hevc") hevcSpsNal(w, h)
          else if (codec == "mpeg4video") mpeg4VolHeader(w, h)
          else spsNal(w, h)
        packet(0x101, pusi = true,
          Array[Byte](0, 0, 1, 0xE0.toByte, 0, 0,        // unbounded length
            0x80.toByte, 0, 0) ++ esB)                   // no PTS/DTS
      }
    packet(0, pusi = true, pat) ++ packet(0x100, pusi = true, pmt) ++
      pcrPacket(0x100, 0L) ++ pes ++ pcrPacket(0x100, span)
  }

  /** ISO 13818-2 sequence_header: start code 0xB3, horizontal(12) +
    * vertical(12) size, square aspect, frame_rate_code 2 (24 fps);
    * the trailing bit-rate/vbv bytes are well-formed filler. */
  private def mpeg2SeqHeader(w: Int, h: Int): Array[Byte] =
    Array[Byte](0, 0, 1, 0xB3.toByte,
      (w >> 4).toByte, (((w & 0xF) << 4) | (h >> 8)).toByte, (h & 0xFF).toByte,
      0x12.toByte, 0xFF.toByte, 0xFF.toByte, 0xE0.toByte, 0x20.toByte, 0x00)

  /** MPEG-4 Part 2 Video-Object-Layer decoder for picture dimensions
    * (ISO 14496-2 §6.2.3): scans for a VOL start code (00 00 01
    * 0x20-0x2F — this bitstream has NO emulation-prevention bytes),
    * walks the conditional prefix (object-layer identifier, extended
    * pixel aspect, vol_control incl. the 79-bit VBV block,
    * fixed-VOP-rate increment whose width derives from the time
    * resolution) and reads the rectangular-shape 13-bit width/height
    * between marker bits. Non-rectangular shapes and malformed bits
    * → None (the external-prober fall-through is preserved). */
  private[graft] object Mpeg4Vol {
    import Nal.Bits

    private def dims(b: Array[Byte]): (Int, Int) = {
      val r = new Bits(b)
      r.u(1)       // random_accessible_vol
      r.u(8)       // video_object_type_indication
      if (r.u1() == 1) { r.u(4); r.u(3) } // verid + priority
      if (r.u(4) == 0xF) r.u(16)          // extended PAR w/h
      if (r.u1() == 1) {                  // vol_control_parameters
        r.u(2); r.u(1)                    // chroma_format, low_delay
        if (r.u1() == 1) r.skip(79)       // vbv_parameters block
      }
      val shape = r.u(2)
      if (shape != 0) throw new IllegalArgumentException(
        s"non-rectangular VOL shape $shape")
      r.u(1) // marker
      val timeRes = r.u(16)
      r.u(1) // marker
      if (r.u1() == 1) { // fixed_vop_rate: increment width from timeRes
        val bits = math.max(1,
          32 - Integer.numberOfLeadingZeros(math.max(1, timeRes - 1)))
        r.skip(bits)
      }
      r.u(1) // marker
      val w = r.u(13)
      r.u(1) // marker
      val h = r.u(13)
      (w, h)
    }

    def findAndParse(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 0
      while (i + 5 <= b.length) {
        if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1 &&
            (b(i + 3) & 0xF0) == 0x20) {
          try {
            val end = math.min(b.length, i + 4 + 64)
            val (w, h) = dims(java.util.Arrays.copyOfRange(b, i + 4, end))
            if (w > 0 && h > 0) return Some((w, h))
          } catch { case _: Exception => } // malformed VOL: keep scanning
        }
        i += 1
      }
      None
    }
  }

  /** Bit-written MPEG-4 Part 2 VOL header for exact w×h: simple
    * profile, square pixels, rectangular shape, 25 Hz time base,
    * free VOP rate. Inverse of [[Mpeg4Vol]]. */
  private[graft] def mpeg4VolHeader(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w < 8192 && h < 8192,
      s"13-bit dims required, got ${w}x$h")
    val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bits += ((v >> i) & 1); i -= 1 }
    }
    u(0, 1); u(1, 8)      // random_accessible, simple-object type
    u(0, 1)               // no object-layer identifier
    u(1, 4)               // aspect 1:1
    u(0, 1)               // no vol_control_parameters
    u(0, 2)               // rectangular shape
    u(1, 1); u(25, 16); u(1, 1) // marker, time resolution, marker
    u(0, 1)               // free VOP rate
    u(1, 1); u(w, 13); u(1, 1); u(h, 13); u(1, 1)
    u(0, 1); u(0, 1)      // not interlaced, OBMC disabled
    while (bits.size % 8 != 0) u(1, 1) // stuffing
    Array[Byte](0, 0, 1, 0x20) ++ bits.grouped(8)
      .map(_.foldLeft(0)((a, bit) => (a << 1) | bit).toByte).toArray
  }

  /** Bit-written H.265 SPS NAL for exact w×h (any dims): fixed 96-bit
    * profile_tier_level (Main profile shape), 4:2:0, coded luma size
    * w+4 × h+4 with a 2-unit right/bottom conformance window — so the
    * crop path is exercised on every synthetic stream. Inverse of
    * [[H265Sps]]; emulation-prevention escaped. */
  private[graft] def hevcSpsNal(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"positive dims required, got ${w}x$h")
    val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bits += ((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      val k = v + 1
      val n = 32 - Integer.numberOfLeadingZeros(k)
      u(0, n - 1); u(k, n)
    }
    u(0, 4); u(0, 3); u(1, 1)   // vps id, max_sub_layers_minus1=0, nesting
    u(0x21, 8)                  // profile_space 0, tier 0, idc 1 (Main)
    u(0, 80)                    // compat flags + constraint bits
    u(93, 8)                    // general_level_idc (3.1)
    ue(0)                       // sps id
    ue(1)                       // chroma_format_idc 4:2:0
    ue(w + 4); ue(h + 4)        // coded luma sizes
    u(1, 1)                     // conformance_window_flag
    ue(0); ue(2); ue(0); ue(2)  // left/right/top/bottom (×SubWidthC = 4)
    u(1, 1)                     // rbsp stop bit
    while (bits.size % 8 != 0) u(0, 1)
    val raw = bits.grouped(8)
      .map(_.foldLeft(0)((a, bit) => (a << 1) | bit).toByte).toArray
    val out = new java.io.ByteArrayOutputStream()
    // start code + 2-byte NAL header: type 33, layer 0, tid+1 = 1
    out.write(Array[Byte](0, 0, 1, (33 << 1).toByte, 1), 0, 5)
    var zeros = 0
    for (x <- raw) {
      if (zeros >= 2 && (x & 0xFF) <= 3) { out.write(3); zeros = 0 }
      out.write(x); zeros = if (x == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** Bit-written H.264 baseline SPS NAL for exact w×h (even dims):
    * macroblock-rounded picture size with a right/bottom cropping
    * window in 4:2:0 crop units (÷2), emulation-prevention escaped.
    * This is the inverse of [[H264Sps]]'s decode path, so the
    * round-trip pins both bit layouts. */
  private[graft] def spsNal(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
      s"even dims required, got ${w}x$h")
    val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bits += ((v >> i) & 1); i -= 1 }
    }
    def ue(v: Int): Unit = {
      val k = v + 1
      val n = 32 - Integer.numberOfLeadingZeros(k)
      u(0, n - 1); u(k, n)
    }
    u(66, 8); u(0, 8); u(30, 8) // baseline profile, level 3.0
    ue(0); ue(0)                // sps_id, log2_max_frame_num_minus4
    ue(0); ue(0)                // poc type 0, log2_max_poc_lsb_minus4
    ue(1); u(0, 1)              // max_num_ref_frames, gaps flag
    val mbW = (w + 15) / 16; val mapH = (h + 15) / 16
    ue(mbW - 1); ue(mapH - 1)
    u(1, 1); u(1, 1)            // frame_mbs_only, direct_8x8
    val cr = (mbW * 16 - w) / 2; val cb = (mapH * 16 - h) / 2
    if (cr == 0 && cb == 0) u(0, 1)
    else { u(1, 1); ue(0); ue(cr); ue(0); ue(cb) }
    u(0, 1)                     // vui_parameters_present
    u(1, 1)                     // rbsp stop bit
    while (bits.size % 8 != 0) u(0, 1)
    val raw = bits.grouped(8)
      .map(_.foldLeft(0)((a, bit) => (a << 1) | bit).toByte).toArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0, 0, 1, 0x67), 0, 4)
    var zeros = 0
    for (x <- raw) {
      if (zeros >= 2 && (x & 0xFF) <= 3) { out.write(3); zeros = 0 }
      out.write(x); zeros = if (x == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** Deterministic minimal Ogg container: a Theora BOS page (w×h
    * picture dims, `fpsN`/1 fps, kfgshift 6), a Vorbis BOS page
    * (44100 Hz), and a final Theora data page whose granule encodes
    * exactly `frames` total frames — so durationMs = frames × 1000 /
    * fpsN, exact arithmetic (the Ogg sibling of [[synthAvi]]). */
  private[graft] def synthOgg(frames: Int, fpsN: Int, w: Int, h: Int): Array[Byte] = {
    def le32(v: Long) = Array(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
      (v >> 24) & 0xFF).map(_.toByte)
    def le64(v: Long) = (0 until 8).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    def be16(v: Int) = Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be24(v: Int) = Array(((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be32(v: Long) = Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def page(headerType: Int, granule: Long, serial: Long, seq: Long,
        packet: Array[Byte]): Array[Byte] = {
      require(packet.length < 255, "single-lace synth page")
      "OggS".getBytes("US-ASCII") ++ Array(0.toByte, headerType.toByte) ++
        le64(granule) ++ le32(serial) ++ le32(seq) ++ le32(0L) ++
        Array(1.toByte, packet.length.toByte) ++ packet
    }
    val kfgShift = 6
    val theoraIdent = Array(0x80.toByte) ++ "theora".getBytes("US-ASCII") ++
      Array(3.toByte, 2.toByte, 1.toByte) ++                 // VMAJ VMIN VREV
      be16((w + 15) / 16) ++ be16((h + 15) / 16) ++          // FMBW FMBH
      be24(w) ++ be24(h) ++ Array(0.toByte, 0.toByte) ++     // PICW PICH PICX PICY
      be32(fpsN.toLong) ++ be32(1L) ++                       // FRN FRD
      be24(0) ++ be24(0) ++ Array(0.toByte) ++ be24(0) ++    // PAR CS NOMBR
      be16(kfgShift << 5)                                    // QUAL/KFGSHIFT/PF
    val vorbisIdent = Array(0x01.toByte) ++ "vorbis".getBytes("US-ASCII") ++
      le32(0L) ++ Array(2.toByte) ++ le32(44100L) ++ le32(0L) ++
      le32(0L) ++ le32(0L) ++ Array(0x01.toByte)
    // granule encoding `frames` total: Theora 3.2.1+ granule frame
    // numbers count from 1, so an all-keyframe stream's last granule
    // is (frames << shift) — (g >>> shift) + (g & mask) = frames
    val g = frames.toLong << kfgShift
    page(0x02, 0L, 1L, 0L, theoraIdent) ++
      page(0x02, 0L, 2L, 0L, vorbisIdent) ++
      page(0x04, g, 1L, 1L, Array(0x00.toByte))
  }

  /** Deterministic minimal AVI (RIFF) container: `RIFF(AVI LIST(hdrl
    * avih(1 ms/frame, durationMs frames, 1 stream, w×h) LIST(strl
    * strh('vids','MJPG'))))` — exact arithmetic, for the probe specs
    * (the RIFF sibling of [[synthWebm]]). */
  private[graft] def synthAvi(durationMs: Int, w: Int, h: Int): Array[Byte] = {
    def le(v: Long): Array[Byte] =
      Array(v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
        (v >> 24) & 0xFF).map(_.toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      cc(id) ++ le(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", cc(kind) ++ body)
    val avih = chunk("avih", le(1000L) ++ le(0) ++ le(0) ++ le(0) ++
      le(durationMs.toLong) ++ le(0) ++ le(1) ++ le(0) ++
      le(w.toLong) ++ le(h.toLong) ++ le(0) ++ le(0) ++ le(0) ++ le(0))
    val strh = chunk("strh", cc("vids") ++ cc("MJPG") ++
      Array.fill(48)(0.toByte))
    val body = cc("AVI ") ++ list("hdrl", avih ++ list("strl", strh))
    cc("RIFF") ++ le(body.length) ++ body
  }

  /** Deterministic minimal WebM (EBML/Matroska) container:
    * EBML(DocType 'webm') + Segment(Info(TimecodeScale 1e6 ns = 1 ms
    * ticks, Duration float == `durationMs` exactly), Tracks(one video
    * TrackEntry: 'V_VP9', w×h)). Sizes are written as 2-byte VINTs;
    * every derived stat is exact arithmetic any SQL engine
    * reproduces. */
  private[graft] def synthWebm(durationMs: Int, w: Int, h: Int): Array[Byte] = {
    def idBytes(id: Long): Array[Byte] = {
      val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
      (1 to n).map(i => ((id >>> ((n - i) * 8)) & 0xFF).toByte).toArray
    }
    def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      require(body.length < (1 << 14) - 1, "2-byte VINT size overflow")
      idBytes(id) ++ Array((0x40 | (body.length >> 8)).toByte,
        (body.length & 0xFF).toByte) ++ body
    }
    def u(v: Long, n: Int): Array[Byte] =
      (1 to n).map(i => ((v >>> ((n - i) * 8)) & 0xFF).toByte).toArray
    val header = el(0x1A45DFA3L, el(0x4282L, "webm".getBytes("US-ASCII")))
    val info = el(0x1549A966L,
      el(0x2AD7B1L, u(1000000L, 3)), // 1 ms ticks
      el(0x4489L, u(java.lang.Double.doubleToLongBits(durationMs.toDouble), 8)))
    val video = el(0xE0L, el(0xB0L, u(w, 2)), el(0xBAL, u(h, 2)))
    val track = el(0xAEL, el(0x83L, u(1, 1)),
      el(0x86L, "V_VP9".getBytes("US-ASCII")), video)
    header ++ el(0x18538067L, info, el(0x1654AE6BL, track))
  }

  /** Video metadata prober: MP4-family payloads parse IN-JVM
    * ([[Mp4Probe]]), Matroska/WebM/MKV payloads parse IN-JVM
    * ([[EbmlProbe]] — DocType is read from the file, so `matroska`
    * and `webm` both resolve), RIFF/AVI payloads parse IN-JVM
    * ([[RiffProbe]]), and Ogg payloads parse IN-JVM ([[OggProbe]] —
    * Theora dims/fps, Vorbis/Opus rates, duration from the last
    * granule) — no external process, the scale path for the
    * dominant containers; other formats fall to an OPTIONAL external
    * binary (ffprobe by default — the one tool every production video
    * pipeline already ships), the payload piped to its stdin and the
    * flat key=value report parsed on the executor. When neither
    * applies (bare JVMs, this container), [[probe]] degrades to a
    * deterministic [[FakeDecoder]]-derived struct with
    * `probed = false`, keeping every downstream operator testable
    * end-to-end.
    *
    * The parse steps ([[Mp4Probe.parse]], [[parseProbeOutput]]) are
    * pure functions tested without any binary; the process plumbing
    * is exercised by an OpsSpec case gated on availability. */
  class ExternalVideoProber(val binary: String = "ffprobe")
      extends Serializable {
    /** Checked once per executor JVM (PATH scan, no process spawn). */
    @transient lazy val available: Boolean =
      sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
        .exists(d => new java.io.File(d, binary).canExecute)

    private def fake(bytes: Array[Byte]): Row = {
      val f = FakeDecoder.decode(bytes)
      Row(null, null, f.get(0), f.get(1),
        f.getDouble(3) * 60000.0, Int.box(1), Boolean.box(false))
    }

    def probe(bytes: Array[Byte]): Row = {
      if (bytes == null) return Row(null, null, null, null, null, null,
        Boolean.box(false))
      val jvm = Mp4Probe.parse(bytes).orElse(EbmlProbe.parse(bytes))
        .orElse(RiffProbe.parse(bytes)).orElse(OggProbe.parse(bytes))
        .orElse(TsProbe.parse(bytes))
      // the JVM fast path answers only when the walk found real facts
      // (duration or dimensions). A magic-bearing payload with NO
      // facts — truncated after ftyp/the EBML header, or metadata
      // past the sampled bytes — falls through to the external
      // binary, which reads the stream properly; the fact-less JVM
      // row is still better than the fake when no binary exists or
      // the binary fails.
      val complete = jvm.exists(r => r.get(4) != null || r.get(2) != null)
      if (complete) return jvm.get
      if (!available) return jvm.getOrElse(fake(bytes))
      external(bytes).orElse(jvm).getOrElse(fake(bytes))
    }

    private def external(bytes: Array[Byte]): Option[Row] = {
      try {
        val pb = new ProcessBuilder(binary, "-v", "error",
          "-show_entries",
          "format=format_name,duration,nb_streams:stream=codec_name,width,height",
          "-of", "flat", "-i", "pipe:0")
        pb.redirectErrorStream(false)
        val p = pb.start()
        val writer = new Thread(() => {
          try { p.getOutputStream.write(bytes); p.getOutputStream.close() }
          catch { case _: java.io.IOException => } // probe read enough
        })
        writer.setDaemon(true)
        writer.start()
        val out = new String(p.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)
        val ok = p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS) &&
          p.exitValue() == 0
        if (!ok) { p.destroyForcibly(); None }
        else parseProbeOutput(out)
      } catch { case _: Exception => None }
    }
  }

  /** Parse ffprobe `-of flat` output into a [[videoType]] Row — pure,
    * so the format contract is testable with no binary installed.
    * Returns None when no format section is present (not a media
    * file). */
  private[graft] def parseProbeOutput(out: String): Option[Row] = {
    val kv = out.linesIterator.flatMap { line =>
      line.split("=", 2) match {
        case Array(k, v) => Some(k.trim -> v.trim.stripPrefix("\"").stripSuffix("\""))
        case _ => None
      }
    }.toMap
    kv.get("format.format_name").map { container =>
      def num[T](key: String, f: String => T): Option[T] =
        kv.get(key).flatMap(v => scala.util.Try(f(v)).toOption)
      Row(container,
        kv.get("streams.stream.0.codec_name").orNull,
        num("streams.stream.0.width", _.toInt).map(Int.box).orNull,
        num("streams.stream.0.height", _.toInt).map(Int.box).orNull,
        num("format.duration", _.toDouble * 1000.0).map(Double.box).orNull,
        num("format.nb_streams", _.toInt).map(Int.box).orNull,
        Boolean.box(true))
    }
  }

  /** Partition-wise video probe: appends a `video` struct column
    * ([[videoType]]) — real ffprobe facts when the binary exists on
    * the executor, the deterministic fallback otherwise (`probed`
    * records which). Same batched `mapPartitions` plumbing as
    * [[decode]]/[[audioFeatures]]. */
  def videoFeatures(df: DataFrame, mediaCol: String,
      prober: ExternalVideoProber = new ExternalVideoProber()): DataFrame = {
    val schema = df.schema.add("video", videoType)
    val enc = RowEncoder.encoderFor(schema)
    val idx = df.schema.fieldIndex(mediaCol)
    val bytesIdx = df.schema(idx).dataType.asInstanceOf[StructType]
      .fieldIndex("bytes")
    df.mapPartitions { it =>
      it.map { row =>
        val media = row.getStruct(idx)
        val bytes =
          if (media == null || media.isNullAt(bytesIdx)) null
          else media.get(bytesIdx).asInstanceOf[Array[Byte]]
        Row.fromSeq(row.toSeq :+ prober.probe(bytes))
      }
    }(enc)
  }

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
