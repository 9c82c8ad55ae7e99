package graft.ops

import graft.functions.Udf
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video payloads ride as opaque
 * `binary` columns with typed metadata structs next to them.
 *
 * The actual media decode (JPEG/PNG/audio codecs) is STUBBED — the container
 * has no media libraries — behind [[FakeCodec]], a deterministic fake that
 * derives plausible metadata from the payload hash. Everything Spark-side is
 * real and tested: schemas, batch-iterator plumbing (`mapPartitions` — the
 * same shape `mapInPandas`/`mapInArrow` hands a Python worker), partitioning,
 * and the frame-sampling expansion (one row per sampled frame via an
 * iterator, never materializing all frames).
 *
 * == Scale design ==
 * Media blobs dominate bytes at 100 TB: every operator here projects only the
 * columns it needs (binary column pruned away once metadata is extracted),
 * and frame sampling emits rows lazily from `mapPartitions` so peak memory is
 * one batch, not one video.
 */
object Multimodal {

  /** Deterministic fake decode — replace with a real codec binding in
    * production. All fields derive from md5 of the payload, so results are
    * stable across runs/engines (and oracle-checkable in SQL). */
  object FakeCodec {
    def imageMeta(payload: Array[Byte]): (Int, Int, String) = {
      val h = Hashing.md5_60b(payload)
      val w = 64 + (h % 1024L).toInt
      val ht = 64 + ((h >> 10) % 1024L).toInt
      val fmt = if ((h & 1L) == 0L) "jpeg" else "png"
      (w, ht, fmt)
    }
    def durationMs(payload: Array[Byte]): Long =
      1000L + Hashing.md5_60b(payload) % 60000L
  }

  val imageMetaType: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType)))

  def registerAll(): Unit = {
    // image_meta(binary) -> struct<width,height,format>  (decode stub)
    Udf.scalar1[Array[Byte], Row]("image_meta(binary) -> struct<width: int, height: int, format: string>") {
      payload =>
        val (w, h, f) = FakeCodec.imageMeta(payload)
        Row(w, h, f)
    }

    // media_duration_ms(binary) -> bigint  (audio/video stub)
    Udf.scalar1[Array[Byte], Long]("media_duration_ms(binary) -> bigint")(FakeCodec.durationMs)

    // resize plan: output dims preserving aspect ratio under a max edge —
    // pure arithmetic (this part is real, not stubbed).
    Udf.scalar3[Int, Int, Int, Row]("resize_dims(int, int, int) -> struct<width: int, height: int>") {
      (w, h, maxEdge) =>
        if (w <= maxEdge && h <= maxEdge) Row(w, h)
        else if (w >= h) Row(maxEdge, math.max(1, (h.toLong * maxEdge / w).toInt))
        else Row(math.max(1, (w.toLong * maxEdge / h).toInt), maxEdge)
    }

    // frame_sample(duration_ms, fps_millis) ->> bigint : sampled frame
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
    * front. The per-batch body is where a real codec would run. */
  def extractImageFeatures(df: DataFrame, payloadCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ imageMetaType.fields)
    val idx = df.schema.fieldIndex(payloadCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val (w, h, f) = FakeCodec.imageMeta(payload)
        Row.fromSeq(r.toSeq ++ Seq(w, h, f))
      }
    }(enc)
  }
}
