package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video carried as opaque
  * `binary` columns with typed metadata, processed partition-wise in
  * batches (the Scala analog of `mapInPandas`).
  *
  * Codecs: [[RealCodec]] decodes what the JDK can — PNG/JPEG/BMP/GIF
  * images via ImageIO, WAV audio via javax.sound — with real pixel
  * features; bytes no JDK codec accepts (and video, which has no JDK
  * decoder) fall back to [[FakeCodec]], a deterministic stand-in, so
  * the pipeline shape is exercised end-to-end either way. Everything
  * Spark-side is real: the schema, the partition-wise batched
  * iteration, the explode of sampled frames, and the metadata columns
  * downstream queries filter and join on.
  */
object Multimodal {

  /** Typed metadata carried alongside every blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = false)
  ))

  /** Deterministic fake decoder — stands in for the real codec libraries.
    * Derives stable pseudo-features from the bytes so tests are exact. */
  object FakeCodec {
    def imageDims(bytes: Array[Byte]): (Int, Int) = {
      val n = if (bytes == null) 0 else bytes.length
      (16 + n % 128, 16 + (n * 7) % 128)
    }
    def audioDurationMs(bytes: Array[Byte]): Long =
      if (bytes == null) 0L else bytes.length * 8L
    def videoFrameCount(bytes: Array[Byte]): Int =
      if (bytes == null) 0 else 1 + bytes.length % 32
    /** ??? in spirit: a real implementation would decode pixels; the fake
      * "feature vector" is a stable byte histogram sketch. */
    def features(bytes: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) { out(java.lang.Byte.toUnsignedInt(bytes(i)) % dim) += 1f; i += 1 }
        val n = math.max(1, bytes.length).toFloat
        var j = 0
        while (j < dim) { out(j) /= n; j += 1 }
      }
      out
    }
  }

  /** Real JDK-backed decoding: ImageIO for images (PNG/JPEG/BMP/GIF),
    * javax.sound for WAV audio. Returns None when the bytes aren't a
    * decodable format so the caller can fall back deterministically. */
  object RealCodec {
    def imageDims(bytes: Array[Byte]): Option[(Int, Int)] =
      try {
        if (bytes == null || bytes.isEmpty) None
        else Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes)))
          .map(img => (img.getWidth, img.getHeight))
      } catch { case _: Exception => None }

    def audioDurationMs(bytes: Array[Byte]): Option[Long] =
      try {
        if (bytes == null || bytes.isEmpty) None
        else {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val frames = ais.getFrameLength
          val rate = ais.getFormat.getFrameRate
          ais.close()
          if (frames < 0 || rate <= 0) None
          else Some((frames * 1000.0 / rate).toLong)
        }
      } catch { case _: Exception => None }

    /** Real pixel features: a luminance histogram over a sampled grid —
      * the decode→feature step the fake only sketches. */
    def imageFeatures(bytes: Array[Byte], dim: Int = 8): Option[Array[Float]] =
      try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))).map { img =>
          val out = new Array[Float](dim)
          val stepX = math.max(1, img.getWidth / 16)
          val stepY = math.max(1, img.getHeight / 16)
          var n = 0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 +
                ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              out(lum * dim / 256) += 1f
              n += 1
              x += stepX
            }
            y += stepY
          }
          var j = 0
          while (j < dim) { out(j) /= math.max(1, n); j += 1 }
          out
        }
      } catch { case _: Exception => None }
  }

  /** Extract typed metadata for each blob, partition-wise in bounded
    * batches (batch shape mirrors mapInPandas: the decoder sees a block
    * of rows, not one at a time, to amortize codec init). Output adds
    * (width, height, duration_ms, n_frames, features). */
  def extractFeatures(media: DataFrame, batchSize: Int = 256): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("duration_ms", LongType), StructField("n_frames", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val modalityIdx = media.schema.fieldIndex("modality")
    val contentIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one "codec context" per batch — where a real decoder would init
        batch.iterator.map { r =>
          val bytes = r.get(contentIdx).asInstanceOf[Array[Byte]]
          val modality = r.getString(modalityIdx)
          // real decode first; undecodable bytes (and video — no JDK
          // codec) take the deterministic fake path
          val (w, h) = if (modality == "image")
            RealCodec.imageDims(bytes).getOrElse(FakeCodec.imageDims(bytes))
          else (0, 0)
          val dur = if (modality == "audio")
            RealCodec.audioDurationMs(bytes)
              .getOrElse(FakeCodec.audioDurationMs(bytes))
          else 0L
          val nf = if (modality == "video") FakeCodec.videoFrameCount(bytes) else 0
          val feats =
            if (modality == "image")
              RealCodec.imageFeatures(bytes).getOrElse(FakeCodec.features(bytes))
            else FakeCodec.features(bytes)
          Row.fromSeq(r.toSeq ++ Seq(w, h, dur, nf, feats.toSeq))
        }
      }
    }(enc)
  }

  /** Frame sampling for video blobs: emit every `stride`-th fake frame as
    * its own row (media_id, frame_no, frame_bytes) — the flatMap shape a
    * real pipeline uses to turn one video row into many frame rows. */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "video")
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val n = FakeCodec.videoFrameCount(bytes)
        (0 until n by stride).map { f =>
          // a real decoder would extract pixels; the fake slices bytes
          val sliceStart = if (bytes == null || bytes.isEmpty) 0 else f % bytes.length
          val frame = if (bytes == null) Array.empty[Byte]
            else bytes.slice(sliceStart, math.min(bytes.length, sliceStart + 16))
          (id, f, frame)
        }
      }
      .toDF("media_id", "frame_no", "frame_bytes")
  }
}
