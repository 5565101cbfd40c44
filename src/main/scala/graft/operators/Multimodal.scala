package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video carried as opaque
  * `binary` columns with typed metadata, processed partition-wise in
  * batches (the Scala analog of `mapInPandas`).
  *
  * The actual codec work (JPEG decode, audio resample, frame extraction)
  * is STUBBED — the container has no media libraries — behind
  * [[FakeCodec]], a deterministic fake. Everything Spark-side is real:
  * the schema, the partition-wise batched iteration, the explode of
  * sampled frames, and the metadata columns that downstream queries
  * filter and join on.
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
          val (w, h) = if (modality == "image") FakeCodec.imageDims(bytes) else (0, 0)
          val dur = if (modality == "audio") FakeCodec.audioDurationMs(bytes) else 0L
          val nf = if (modality == "video") FakeCodec.videoFrameCount(bytes) else 0
          Row.fromSeq(r.toSeq ++ Seq(w, h, dur, nf, FakeCodec.features(bytes).toSeq))
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
