package graft.ops

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.functions.{BatchUdf, Udf}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/**
 * Multimodal-column operators: image/audio payloads ride as opaque `binary`
 * columns with typed metadata structs next to them.
 *
 * The codecs are REAL and pure-JDK — no new dependencies:
 *  - images: `javax.imageio` (PNG/JPEG/BMP/GIF readers ship with the JDK).
 *    `image_meta` reads dimensions from the container header WITHOUT decoding
 *    pixel data (`ImageReader.getWidth/getHeight` on the stream); `pixel_stats`
 *    and `image_resize` fully decode (resize = `Graphics2D` bilinear).
 *  - audio: `javax.sound.sampled` (WAV/AIFF/AU). `media_duration_ms` derives
 *    the duration from the frame count + frame rate in the header.
 *  - video: OUT OF SCOPE — the JDK has no video codec, and none is in the
 *    container. The frame-sampling table function is codec-agnostic (it
 *    samples timestamps from any duration), so video plumbing still works
 *    end-to-end once a duration is supplied by an external probe.
 *
 * `png_synth` / `wav_synth` generate real, spec-conformant payloads with
 * planted dimensions/pixel values/durations — the fixture half of the oracle
 * gates (`q_image_meta`, `q_pixel_stats`, `q_resize`, `q_frame_sample`):
 * Spark encodes + decodes genuinely; DuckDB recomputes the planted values
 * arithmetically. A broken encode, decode, or resize path hash-fails.
 *
 * == Scale design ==
 * Media blobs dominate bytes at 100 TB: every operator here projects only the
 * columns it needs (the binary column prunes away once metadata is
 * extracted), decode is row-local (no shuffle), and the batched kernel tier
 * ([[pixelStatsBatch]]) amortizes per-call overhead the way a vectorized
 * codec binding would.
 */
object Multimodal {

  /** Pure-JDK codecs. Every method is deterministic given its input bytes. */
  object JdkCodec {
    // ImageIO's default stream cache writes temp FILES per decode — a
    // per-row disk write in the hot path. Keep everything in memory.
    ImageIO.setUseCache(false)

    /** (width, height, format) from the container header — no pixel decode:
      * the reader parses IHDR/SOF/etc. lazily off the stream. */
    def imageMeta(payload: Array[Byte]): (Int, Int, String) = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, "image_meta: no registered reader recognizes the payload")
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          (r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase)
        } finally r.dispose()
      } finally iis.close()
    }

    def decode(payload: Array[Byte]): BufferedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "decode: no registered reader recognizes the payload")
      img
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      require(ImageIO.write(img, "png", bos), "encodePng: png writer missing")
      bos.toByteArray
    }

    /** Real PNG with planted content: left `w/2` columns `rgbLeft`, the rest
      * `rgbRight` (equal colors ⇒ solid). Colors are 0xRRGGBB ints. */
    def synthPng(w: Int, h: Int, rgbLeft: Int, rgbRight: Int): Array[Byte] = {
      require(w >= 1 && h >= 1 && w <= 4096 && h <= 4096, s"synthPng: bad dims ${w}x$h")
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val wl = w / 2
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, if (x < wl) rgbLeft else rgbRight)
          x += 1
        }
        y += 1
      }
      encodePng(img)
    }

    /** Per-channel integer sums and red-channel extrema over the decoded
      * raster. Integer-exact — the oracle replays sums arithmetically. */
    def pixelStats(payload: Array[Byte]): (Long, Long, Long, Int, Int) = {
      val img = decode(payload)
      val raster = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var minR = 255; var maxR = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = raster.getSample(x, y, 0)
          sr += r; sg += raster.getSample(x, y, 1); sb += raster.getSample(x, y, 2)
          if (r < minR) minR = r
          if (r > maxR) maxR = r
          x += 1
        }
        y += 1
      }
      (sr, sg, sb, minR, maxR)
    }

    /** Aspect-preserving target dims under a max edge (pure arithmetic —
      * shared by `resize_dims` and [[resizeMaxEdge]]). */
    def resizeDims(w: Int, h: Int, maxEdge: Int): (Int, Int) =
      if (w <= maxEdge && h <= maxEdge) (w, h)
      else if (w >= h) (maxEdge, math.max(1, (h.toLong * maxEdge / w).toInt))
      else (math.max(1, (w.toLong * maxEdge / h).toInt), maxEdge)

    /** Real bilinear resize (`Graphics2D`) to the aspect-preserving dims,
      * re-encoded as PNG. */
    def resizeMaxEdge(payload: Array[Byte], maxEdge: Int): Array[Byte] = {
      require(maxEdge >= 1, "resizeMaxEdge: maxEdge must be >= 1")
      val src = decode(payload)
      val (rw, rh) = resizeDims(src.getWidth, src.getHeight, maxEdge)
      val dst = new BufferedImage(rw, rh, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
          RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, rw, rh, null)
      } finally g.dispose()
      encodePng(dst)
    }

    /** Real RIFF/WAVE payload: mono PCM at `sampleRate` Hz, `nSamples`
      * frames of a deterministic ramp, at any of the crawl-real depths —
      * 8-bit (UNSIGNED, the WAV convention: byte `i % 256`, which decodes
      * centered to `(i % 256) − 128`), 16-bit signed LE
      * (`((i % 2048) − 1024)·16`), 24-bit signed LE
      * (`((i % 2048) − 1024)·4096`). Each ramp has a closed form the
      * oracle replays sample-by-sample. */
    def synthWav(nSamples: Int, sampleRate: Int, bits: Int = 16): Array[Byte] = {
      require(nSamples >= 0 && sampleRate >= 1, "synthWav: bad params")
      require(bits == 8 || bits == 16 || bits == 24,
        s"synthWav: bits in {8, 16, 24}, got $bits")
      val fmt = new AudioFormat(sampleRate.toFloat, bits, 1, bits != 8, false)
      val bps = bits / 8
      val data = new Array[Byte](nSamples * bps)
      var i = 0
      while (i < nSamples) {
        bits match {
          case 8 =>
            data(i) = (i % 256).toByte // unsigned byte; centers to −128..127
          case 16 =>
            val v = ((i % 2048) - 1024) * 16
            data(2 * i) = (v & 0xff).toByte
            data(2 * i + 1) = ((v >> 8) & 0xff).toByte
          case 24 =>
            val v = ((i % 2048) - 1024) * 4096
            data(3 * i) = (v & 0xff).toByte
            data(3 * i + 1) = ((v >> 8) & 0xff).toByte
            data(3 * i + 2) = ((v >> 16) & 0xff).toByte
        }
        i += 1
      }
      val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nSamples.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Duration from the audio container header: frames / frameRate. Exact
      * (to the ms-round) without decoding samples. */
    def audioDurationMs(payload: Array[Byte]): Long = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try math.round(ais.getFrameLength * 1000.0 / ais.getFormat.getFrameRate)
      finally ais.close()
    }

    /** Sample-level stats over the DECODED audio payload (the crawl-real
      * PCM depths: unsigned 8-bit — decoded CENTERED, v = byte − 128, the
      * WAV convention — signed 16-bit and signed 24-bit, either endianness,
      * channel 0 of any channel count): frame count, peak |v|, and Σv² —
      * integer-exact, so the oracle replays the synth ramps' arithmetic in
      * SQL. Any other shape (float, u16, 32-bit…) fails LOUDLY: decoding
      * with the wrong sign/width convention would silently corrupt stats.
      * Streaming read: constant memory at any length. */
    def audioStats(payload: Array[Byte]): (Long, Int, Long) = {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = ais.getFormat
        val bits = fmt.getSampleSizeInBits
        val supported =
          (bits == 8 && fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED) ||
          ((bits == 16 || bits == 24) &&
            fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED)
        require(supported, s"audio_stats: supported PCM shapes are u8/s16/s24, " +
          s"got $bits-bit ${fmt.getEncoding}")
        val frameBytes = fmt.getFrameSize
        val big = fmt.isBigEndian
        val buf = new Array[Byte](frameBytes * 4096)
        var n = 0L; var peak = 0; var sumSq = 0L
        // depth-specialized inner loops: the format is constant per payload,
        // so the sample decoder must not re-dispatch per sample
        var read = ais.read(buf) // AudioInputStream reads whole frames only
        while (read > 0) {
          var off = 0
          if (bits == 8) {
            while (off + 1 <= read) {
              val v = (buf(off) & 0xff) - 128
              val a = math.abs(v)
              if (a > peak) peak = a
              sumSq += v.toLong * v; n += 1; off += frameBytes
            }
          } else if (bits == 16) {
            while (off + 2 <= read) {
              val v = if (big) (buf(off) << 8) | (buf(off + 1) & 0xff)
                      else (buf(off + 1) << 8) | (buf(off) & 0xff)
              val a = math.abs(v)
              if (a > peak) peak = a
              sumSq += v.toLong * v; n += 1; off += frameBytes
            }
          } else { // 24: assemble, then sign-extend from bit 23
            while (off + 3 <= read) {
              val raw =
                if (big) ((buf(off) & 0xff) << 16) |
                  ((buf(off + 1) & 0xff) << 8) | (buf(off + 2) & 0xff)
                else ((buf(off + 2) & 0xff) << 16) |
                  ((buf(off + 1) & 0xff) << 8) | (buf(off) & 0xff)
              val v = (raw << 8) >> 8
              val a = math.abs(v)
              if (a > peak) peak = a
              sumSq += v.toLong * v; n += 1; off += frameBytes
            }
          }
          read = ais.read(buf)
        }
        (n, peak, sumSq)
      } finally ais.close()
    }
  }

  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType)))

  val pixelStatsType: StructType = StructType(Seq(
    StructField("sum_r", LongType), StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("min_r", IntegerType), StructField("max_r", IntegerType)))

  private def statsRow(payload: Array[Byte]): Row = {
    val (sr, sg, sb, mn, mx) = JdkCodec.pixelStats(payload)
    Row(sr, sg, sb, mn, mx)
  }

  def registerAll(): Unit = {
    // ---- synth fixtures (real encoders, planted content) -------------------
    Udf.scalar3[Int, Int, Int, Array[Byte]]("png_synth(int, int, int) -> binary") {
      (w, h, rgb) => JdkCodec.synthPng(w, h, rgb, rgb)
    }
    Udf.scalar4[Int, Int, Int, Int, Array[Byte]](
      "png_synth_2tone(int, int, int, int) -> binary") {
      (w, h, rgbL, rgbR) => JdkCodec.synthPng(w, h, rgbL, rgbR)
    }
    Udf.scalar2[Int, Int, Array[Byte]]("wav_synth(int, int) -> binary") {
      (nSamples, rate) => JdkCodec.synthWav(nSamples, rate)
    }
    Udf.scalar3[Int, Int, Int, Array[Byte]](
      "wav_synth_bits(int, int, int) -> binary") {
      (nSamples, rate, bits) => JdkCodec.synthWav(nSamples, rate, bits)
    }

    // ---- real decode surface ----------------------------------------------
    // image_meta(binary) -> struct<width,height,format> — header-only decode
    Udf.scalar1[Array[Byte], Row]("image_meta(binary) -> struct<width: int, height: int, format: string>") {
      payload =>
        val (w, h, f) = JdkCodec.imageMeta(payload)
        Row(w, h, f)
    }

    // pixel_stats(binary) — full decode, per-channel sums + red extrema
    Udf.scalar1[Array[Byte], Row]("pixel_stats(binary) -> struct<sum_r: bigint, sum_g: bigint, sum_b: bigint, min_r: int, max_r: int>")(statsRow)

    // image_resize(binary, maxEdge) -> binary — bilinear, aspect-preserving
    Udf.scalar2[Array[Byte], Int, Array[Byte]]("image_resize(binary, int) -> binary") {
      (payload, maxEdge) => JdkCodec.resizeMaxEdge(payload, maxEdge)
    }

    // media_duration_ms(binary) -> bigint — real audio header parse (WAV/AIFF/AU)
    Udf.scalar1[Array[Byte], Long]("media_duration_ms(binary) -> bigint")(JdkCodec.audioDurationMs)

    // audio_stats(binary) — full sample decode: frames, peak |v|, Σv²
    Udf.scalar1[Array[Byte], Row](
      "audio_stats(binary) -> struct<n: bigint, peak: int, sum_sq: bigint>") {
      payload =>
        val (n, peak, sumSq) = JdkCodec.audioStats(payload)
        Row(n, peak, sumSq)
    }

    // resize plan arithmetic alone (no payload) — dims under a max edge
    Udf.scalar3[Int, Int, Int, Row]("resize_dims(int, int, int) -> struct<width: int, height: int>") {
      (w, h, maxEdge) =>
        val (rw, rh) = JdkCodec.resizeDims(w, h, maxEdge)
        Row(rw, rh)
    }

    // frame_sample(duration_ms, step_ms) ->> bigint : sampled frame
    // timestamps — a table function, rows stream lazily.
    Udf.table2[Long, Long, Long]("frame_sample(bigint, bigint) ->> bigint") {
      (durationMs, stepMs) =>
        if (stepMs <= 0) Iterator.empty
        else Iterator.iterate(0L)(_ + stepMs).takeWhile(_ < durationMs)
    }
  }

  /** Batch feature-extraction over binary payloads via mapPartitions — the
    * Spark-side plumbing a vectorized (Arrow/Pandas) media UDF needs: one
    * iterator in, one iterator out, constant memory, schema declared up
    * front. The per-row body is the REAL header-only decode. */
  def extractImageFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ imageMetaType.fields)
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val (w, h, f) = JdkCodec.imageMeta(payload)
        Row.fromSeq(r.toSeq ++ Seq(w, h, f))
      }
    }(enc)
  }

  /** [[JdkCodec.pixelStats]] through the batched (column-at-a-time) kernel
    * tier — the integration shape a vectorized codec binding plugs into: the
    * kernel sees a whole chunk of payloads per call. Appends a
    * [[pixelStatsType]] struct column `outName`. */
  def pixelStatsBatch(df: DataFrame, payloadCol: String,
      outName: String = "stats", batchSize: Int = 1024): DataFrame =
    BatchUdf.withBatchColumn(df, outName, Seq(payloadCol), pixelStatsType, batchSize) {
      cols =>
        val payloads = cols.head
        Array.tabulate[Any](payloads.length) { i =>
          payloads(i) match {
            case null => null
            case b: Array[Byte] => statsRow(b)
          }
        }
    }
}
