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
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String, stride: Int): DataFrame =
    df.select(col(idCol),
        explode(sequence(lit(0L), length(col(payloadCol)).cast("long") - 1, lit(stride.toLong)))
          .as("frame_offset"))
}
