package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import graft.operators.Multimodal

/** REAL image decode through the JDK's ImageIO — synthesized PNG and
  * BMP payloads round-trip with exact dimensions, resize preserves
  * aspect ratio and never upscales, the luminance histogram reflects
  * actual pixel content, and undecodable bytes are quarantined rows.
  */
class MultimodalRealSpec extends SparkSpec {

  import spark.implicits._

  /** Encode a solid-color image to bytes in the given container. */
  private def img(w: Int, h: Int, rgb: Int, format: String): Array[Byte] = {
    val b = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = b.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(b, format, bos), s"no JDK writer for $format")
    bos.toByteArray
  }

  private def payloads = Seq(
    (1L, img(320, 200, 0xffffff, "png")),    // white PNG, landscape
    (2L, img(64, 256, 0x000000, "bmp")),     // black BMP, portrait
    (3L, img(10, 10, 0x808080, "gif")),      // tiny gray GIF
    (4L, "not an image at all".getBytes("UTF-8"))) // corrupt
    .toDF("id", "payload")

  test("decodeImagesReal extracts true dimensions; corrupt rows quarantine") {
    val r = Multimodal.decodeImagesReal(payloads, "id", "payload")
      .as[(Long, Option[Long], Option[Long], Option[Long], Boolean)]
      .collect().map(x => x._1 -> x).toMap
    assert(r(1L) == ((1L, Some(320L), Some(200L), Some(3L), true)))
    assert(r(2L) == ((2L, Some(64L), Some(256L), Some(3L), true)))
    assert(r(3L)._2.contains(10L) && r(3L)._5)
    // the corrupt payload is a ROW with ok=false, not an exception/drop
    assert(r(4L) == ((4L, None, None, None, false)))
  }

  test("resizeImagesReal: longest side fits, aspect preserved, output decodable") {
    val r = Multimodal.resizeImagesReal(payloads, "id", "payload", maxSide = 100)
      .as[(Long, Option[Array[Byte]], Option[Long], Option[Long])]
      .collect().map(x => x._1 -> x).toMap
    // 320×200 → 100×62 (floor of 200·100/320)
    assert(r(1L)._3.contains(100L) && r(1L)._4.contains(62L))
    // 64×256 → 25×100
    assert(r(2L)._3.contains(25L) && r(2L)._4.contains(100L))
    // 10×10 is already inside the box — never upscaled
    assert(r(3L)._3.contains(10L) && r(3L)._4.contains(10L))
    assert(r(4L)._2.isEmpty)
    // the resized payload is itself a decodable image of the new size
    val back = Multimodal.decodeImage(r(1L)._2.get)
    assert(back.contains((100L, 62L, 3L)))
  }

  /** Synthesize a 16-bit mono PCM WAV of a constant amplitude. */
  private def wav(hz: Float, nFrames: Int, amplitude: Short): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(hz, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      data(2 * i) = (amplitude & 0xff).toByte
      data(2 * i + 1) = ((amplitude >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos): Unit
    bos.toByteArray
  }

  test("decodeAudioReal extracts true WAV properties; corrupt rows quarantine") {
    val df = Seq(
      (1L, wav(16000f, 16000, 1000)),      // 1 s @ 16 kHz, amp 1000
      (2L, wav(8000f, 4000, 0)),           // 0.5 s of silence @ 8 kHz
      (3L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val r = Multimodal.decodeAudioReal(df, "id", "payload")
      .as[(Long, Option[Double], Option[Long], Option[Long], Option[Double],
        Option[Double], Boolean)]
      .collect().map(x => x._1 -> x).toMap
    assert(r(1L)._2.contains(16000.0) && r(1L)._3.contains(1L) &&
      r(1L)._4.contains(16000L) && r(1L)._5.contains(1.0))
    // constant-amplitude signal: RMS equals the amplitude exactly
    assert(r(1L)._6.contains(1000.0))
    assert(r(2L)._5.contains(0.5) && r(2L)._6.contains(0.0))
    assert(!r(3L)._7 && r(3L)._2.isEmpty)
  }

  test("luminanceHistogram reflects actual pixel content") {
    val r = Multimodal.luminanceHistogram(payloads, "id", "payload", bins = 16)
      .as[(Long, Option[Array[Float]])].collect().toMap
    // solid white → all mass in the top bin; solid black → bottom bin
    assert(r(1L).get.last == 1.0f && r(1L).get.sum == 1.0f)
    assert(r(2L).get.head == 1.0f)
    // solid mid-gray (0x80 = 128) → bin 8 of 16
    assert(r(3L).get(8) == 1.0f)
    assert(r(4L).isEmpty)
  }
}
