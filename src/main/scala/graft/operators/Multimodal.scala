package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata extracted alongside.
  *
  * The decode step is a STUB — this container has no image/audio codecs
  * — implemented as deterministic arithmetic over the payload bytes so
  * the Spark-side plumbing (schema, batch shape, partitioning) is real
  * and testable. A production build swaps [[decodeImageStub]]'s body for
  * a real codec call; everything around it (the per-partition batching,
  * the struct schema, the column API) is unchanged.
  */
object Multimodal {

  /** Metadata struct a real image decoder would produce. */
  case class ImageMeta(width: Long, height: Long, channels: Long, nFrames: Long)

  /** STUB decode: deterministic fake metadata derived from payload size.
    * Real implementation: decode the header bytes with a codec library.
    */
  def decodeImageStub(payload: Array[Byte]): ImageMeta = {
    val len = payload.length.toLong
    ImageMeta(
      width = 64L + (len * 31L) % 512L,
      height = 64L + (len * 17L) % 512L,
      channels = 3L,
      nFrames = 1L + len % 30L)
  }

  /** Expression form of the stub decode — stays inside whole-stage
    * codegen (the hot path for a metadata-only query; the
    * `mapPartitions` form below is for decoders that need native calls).
    */
  def imageMetaCols(payload: Column): Seq[Column] = {
    val len = length(payload).cast("long")
    Seq(
      (lit(64L) + pmod(len * 31L, lit(512L))).as("width"),
      (lit(64L) + pmod(len * 17L, lit(512L))).as("height"),
      lit(3L).as("channels"),
      (lit(1L) + pmod(len, lit(30L))).as("n_frames"))
  }

  /** Per-partition decode pipeline — the shape a real decoder uses: one
    * codec context per partition (not per row), rows streamed through it.
    * Output schema: (id, width, height, channels, n_frames).
    */
  def decodePartitioned(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real build: acquire codec context here, release after
        rows.map { case (id, payload) =>
          val m = decodeImageStub(payload)
          (id, m.width, m.height, m.channels, m.nFrames)
        }
      }
      .toDF(idCol, "width", "height", "channels", "n_frames")
  }

  /** Deterministic frame sampling for video-like payloads: pick every
    * `stride`-th byte offset as a fake frame key — exercises the
    * explode/generator shape a frame extractor produces.
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, stride: Int): DataFrame = {
    val len = length(col(payloadCol)).cast("long")
    // empty payloads must yield no frames, not sequence(0, -1) — which
    // Spark rejects at runtime ("Illegal sequence boundaries"); null
    // payloads are already dropped by explode
    df.select(col(idCol),
        explode(when(len > 0, sequence(lit(0L), len - 1, lit(stride.toLong)))
          .otherwise(array().cast("array<bigint>")))
          .as("frame_offset"))
  }

  /** STUB feature extraction: a normalized 16-bin byte histogram as the
    * payload's "embedding" — the per-partition batch shape (one model
    * context per partition, rows streamed through) and the
    * `array<float>` output schema are exactly what a real vision
    * encoder produces; only the math inside is fake.
    */
  def featureExtractPartitioned(df: DataFrame, idCol: String, payloadCol: String,
                                bins: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // real build: load the encoder weights once per partition here
        rows.map { case (id, payload) =>
          val counts = new Array[Float](bins)
          payload.foreach(b => counts((b & 0xff) * bins / 256) += 1f)
          val n = math.max(1, payload.length).toFloat
          (id, counts.map(_ / n))
        }
      }
      .toDF(idCol, "embedding")
  }

  /** STUB resize: recompute the fake metadata for a target box,
    * preserving aspect ratio (longest side fits `maxSide`). The
    * expression stays inside codegen; a real build would emit the
    * resized payload from a codec in [[decodePartitioned]]'s
    * per-partition loop instead.
    */
  def resizedMetaCols(payload: Column, maxSide: Int): Seq[Column] = {
    val len = length(payload).cast("long")
    val w = lit(64L) + pmod(len * 31L, lit(512L))
    val h = lit(64L) + pmod(len * 17L, lit(512L))
    val scale = lit(maxSide.toDouble) / greatest(w, h).cast("double")
    val clamped = least(scale, lit(1.0)) // never upscale
    Seq(
      floor(w.cast("double") * clamped).cast("long").as("resized_width"),
      floor(h.cast("double") * clamped).cast("long").as("resized_height"))
  }
}
