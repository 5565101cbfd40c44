package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import java.io.ByteArrayOutputStream

class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xffffff) // one white pixel for histogram variety
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(frames: Int, rate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 8, 1, false, false)
    val data = new Array[Byte](frames)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real codec decodes JDK-supported formats") {
    assert(Multimodal.RealCodec.imageDims(pngBytes(37, 21)) == Some((37, 21)))
    assert(Multimodal.RealCodec.audioDurationMs(wavBytes(8000, 8000f)) == Some(1000L))
    assert(Multimodal.RealCodec.imageDims("not an image".getBytes) == None)
    val feats = Multimodal.RealCodec.imageFeatures(pngBytes(32, 32)).get
    assert(feats.length == 8 && math.abs(feats.sum - 1.0f) < 1e-3)
  }

  test("extractFeatures routes real decodes and falls back deterministically") {
    val rows = Seq(
      Row(1L, "image", pngBytes(37, 21), "image/png", 0L),
      Row(2L, "image", "garbage".getBytes, "application/octet-stream", 7L),
      Row(3L, "audio", wavBytes(4000, 8000f), "audio/wav", 0L)
    )
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val out = Multimodal.extractFeatures(media)
      .select("media_id", "width", "height", "duration_ms")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 37, 21, 0L)))              // real PNG decode
    val fake = Multimodal.FakeCodec.imageDims("garbage".getBytes)
    assert(out(2L) == ((2L, fake._1, fake._2, 0L)))    // deterministic fallback
    assert(out(3L) == ((3L, 0, 0, 500L)))              // real WAV duration
  }
}
