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

  test("dHashBands: hand-checked gradients, monotone-map invariance, " +
      "near-dup recall with no false pairs") {
    import org.apache.spark.sql.functions._
    // constant grid → no rising comparison → all bands 0;
    // strictly increasing row-major grid → every comparison rises →
    // all four 16-bit bands saturate at 65535
    val flat = (1L, Seq.fill(72)(100L))
    val ramp = (2L, (0L until 72L).toSeq)
    // ramp under a monotone luminance map (×3 + 7): identical hash
    val rampBright = (3L, (0L until 72L).map(_ * 3 + 7).toSeq)
    // ramp with ONE cell dimmed: at most 2 comparisons flip
    val rampDent = (4L, (0L until 72L).map(v => if (v == 40L) 0L else v).toSeq)
    val df = Seq(flat, ramp, rampBright, rampDent).toDF("id", "px")
    val bands = Multimodal.dHashBands(df, col("id"), col("px"))
    val byId = bands.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(byId(1L) == ((0L, 0L, 0L, 0L)))
    assert(byId(2L) == ((65535L, 65535L, 65535L, 65535L)))
    assert(byId(3L) == byId(2L)) // monotone map preserves every bit
    val pairs = Multimodal.phashNearDup(bands, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ramp/rampBright at distance 0; ramp/rampDent and
    // rampBright/rampDent within the dent's ≤2-bit flip; flat (~64
    // bits away from the ramps) must never pair
    assert(pairs.map(p => (p._1, p._2)).sorted.toSeq ===
      Seq((2L, 3L), (2L, 4L), (3L, 4L)))
    assert(pairs.find(p => p._1 == 2L && p._2 == 3L).get._3 === 0L)
    assert(pairs.filter(p => p._2 == 4L).forall(_._3 <= 2L))
  }

  test("phashNearDupAuto dispatches by corpus size and both routes " +
      "return the identical pair set") {
    import org.apache.spark.sql.functions._
    val grids = (0L until 8L).map { i =>
      // planted pairs: ids 2i/2i+1 share a pseudo-random base grid
      // (groups must differ STRUCTURALLY — a constant offset is a
      // monotone map dHash is invariant to), the odd one dented in
      // one cell (≤ 2 gradient bits flip)
      val g = i / 2
      val base = (0L until 72L).map(j => (g * 1000003L + j * 2654435761L) % 256L)
      val px = if (i % 2 == 1) base.updated(40, 0L) else base
      (i, px)
    }
    val df = grids.toDF("id", "px")
    val bands = Multimodal.dHashBands(df, col("id"), col("px"))
    val narrow = Multimodal.phashNearDupAuto(bands, 3, narrowMaxN = 100L)
    val mih = Multimodal.phashNearDupAuto(bands, 3, narrowMaxN = 2L)
    assert(narrow.select("route").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("narrow"))
    assert(mih.select("route").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("mih"))
    assert(narrow.select("n_corpus").head().getLong(0) === 8L)
    def pairSet(dfp: org.apache.spark.sql.DataFrame) =
      dfp.select("id_a", "id_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val np = pairSet(narrow)
    assert(np === pairSet(mih), "routes must agree on the pair set")
    // every planted (2i, 2i+1) pair surfaces on both routes
    (0L until 4L).foreach(i =>
      assert(np.exists(p => p._1 == 2 * i && p._2 == 2 * i + 1)))
  }
}
