package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
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

  /** Perceptual dHash BAND VALUES over a row-major luminance grid —
    * the image-level near-dup arm of the multimodal family: dHash
    * (difference hash) sets bit b when the pixel right of position b
    * is brighter than position b, the classic gradient fingerprint
    * that survives re-encode/resize/brightness shifts (any monotone
    * luminance map preserves every comparison). The 64 bits are
    * emitted directly as FOUR 16-bit band values (b0..b3) — the
    * Hamming-ball search representation: candidates with distance
    * ≤ 3 agree on ≥ 1 band by pigeonhole, so the candidate join is an
    * exact equi-join per band (the LSH banding discipline of
    * [[Dedup.minhashLshPairs]] / the multi-index machinery in
    * [[Similarity]]), never a pairwise scan — and staying in 16-bit
    * positive integers keeps every value engine-portable (no 64-bit
    * sign-bit arithmetic to replay). All comparisons unroll statically
    * into one whole-stage-codegen projection.
    *
    * `pixels`: array of width·height integral luminance values,
    * row-major — the output of the decode seam ([[FakeCodec]] /
    * [[RealCodec]]); a raw grayscale payload IS this array.
    * Returns (id, b0, b1, b2, b3). */
  def dHashBands(df: DataFrame, id: Column, pixels: Column,
      width: Int = 9, height: Int = 8): DataFrame = {
    val bits = (width - 1) * height
    require(bits == 64, s"dHashBands needs a 64-bit grid: " +
      s"(width-1)*height = $bits")
    def band(j: Int): Column =
      (0 until 16).map { t =>
        val b = 16 * j + t
        val r = b / (width - 1); val c = b % (width - 1)
        val cur = element_at(pixels, r * width + c + 1)
        val nxt = element_at(pixels, r * width + c + 2)
        when(nxt > cur, lit(1L << t)).otherwise(lit(0L))
      }.reduce(_ + _)
    df.select(id.as("id"), band(0).as("b0"), band(1).as("b1"),
      band(2).as("b2"), band(3).as("b3"))
  }

  /** Hamming-ball near-dup join over [[dHashBands]] output: exact
    * equi-join per 16-bit band buckets the candidates (pigeonhole: a
    * pair within Hamming ≤ 3 of 64 bits shares at least one of the 4
    * bands exactly — guaranteed recall, no probabilistic miss), then
    * the exact distance Σ bit_count(aᵢ xor bᵢ) verifies. Integer
    * arithmetic end to end, oracle-replayable. Scale shape: the
    * candidate generator is a bucket-key equi-join like every
    * generator in the dedup family — a degenerate band value (e.g.
    * all-flat images hashing to 0) concentrates a bucket, the same
    * df-cap/salting story as the LSH joins; the verify step touches
    * candidates only. Returns (id_a, id_b, hamming), id_a < id_b. */
  def phashNearDup(bands: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded recall is only guaranteed for maxHamming <= 3: $maxHamming")
    val long = (0 until 4).map(j => bands.select(col("id"),
        lit(j).as("band_idx"), col(s"b$j").as("band_val")))
      .reduce(_ unionByName _)
    val cand = long.as("a").join(long.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyHamming(cand, bands, maxHamming)
  }

  /** The SCALE path of [[phashNearDup]] — multi-index Hamming search
    * (Norouzi et al., "Fast Search in Hamming Space with Multi-Index
    * Hashing"): the 16-bit bands' candidate volume grows as n²/2¹⁶ per
    * band from BIRTHDAY COLLISIONS alone (measured superlinear on the
    * decade — the narrow variant is right only while n ≪ 2¹⁶), so the
    * hash is re-banded as TWO 32-bit words and the pigeonhole moves to
    * the probe side: a pair within Hamming ≤ 3 of 64 bits has ≤
    * floor(3/2) = 1 error in SOME 32-bit band, so probing each item's
    * exact band key plus all 32 one-bit flips (33 keys × 2 bands, a
    * fixed per-row constant) against the other items' EXACT keys finds
    * every such pair — same guaranteed recall, but bucket occupancy is
    * n/2³² (random collisions effectively zero at any realistic n), so
    * candidate volume tracks TRUE near-dups, not n². The exact
    * Σ bit_count verify is shared with the narrow variant and both
    * return identical pairs (cross-gated in q324).
    * Returns (id_a, id_b, hamming), id_a < id_b. */
  def phashNearDupWide(bands: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"2-band multi-probe covers exactly maxHamming <= 3: $maxHamming")
    val wide = bands.select(col("id"),
      col("b0").bitwiseOR(shiftleft(col("b1"), 16)).as("w0"),
      col("b2").bitwiseOR(shiftleft(col("b3"), 16)).as("w1"))
    val exact = wide.select(col("id"),
        explode(array(struct(lit(0).as("band"), col("w0").as("w")),
          struct(lit(1).as("band"), col("w1").as("w")))).as("bw"))
      .select(col("id"), col("bw.band").as("band"), col("bw.w").as("key"))
    val probes = exact.select(col("id"), col("band"),
        explode(expr("concat(array(key), transform(sequence(0, 31), " +
          "t -> key ^ shiftleft(CAST(1 AS BIGINT), t)))")).as("key"))
    val cand = probes.as("a").join(exact.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyHamming(cand, bands, maxHamming)
  }

  /** SIZE-GATED dispatch over the two phash arms — the production
    * entry point (the [[Similarity.cosineTopKAnnAuto]] routing pattern
    * applied to the image near-dup family): the 16-bit banding
    * ([[phashNearDup]]) is the right plan only while n ≪ 2¹⁶ — its
    * candidate volume grows as n²/2¹⁶ per band from birthday
    * collisions alone — so the router counts the corpus (one cheap
    * driver-side count over the band frame, the same 1-row read every
    * auto router in the engine makes) and dispatches: n ≤ `narrowMaxN`
    * → the narrow banding, else the Norouzi multi-index probe
    * ([[phashNearDupWide]], bucket occupancy n/2³², candidates track
    * TRUE near-dups). Both arms return the identical pair set
    * (cross-gated in q321/q324), so the route changes COST only —
    * which is what makes the dispatch itself oracle-gatable: the
    * output carries (route, n_corpus) beside the pairs.
    * Returns (route, n_corpus, id_a, id_b, hamming), id_a < id_b. */
  def phashNearDupAuto(bands: DataFrame, maxHamming: Int,
      narrowMaxN: Long = 100000L): DataFrame = {
    require(narrowMaxN >= 0, s"narrowMaxN: $narrowMaxN")
    val n = bands.select(bands.columns.head).count()
    val (route, pairs) =
      if (n <= narrowMaxN) ("narrow", phashNearDup(bands, maxHamming))
      else ("mih", phashNearDupWide(bands, maxHamming))
    pairs.select(lit(route).as("route"), lit(n).as("n_corpus"),
      col("id_a"), col("id_b"), col("hamming"))
  }

  /** Shared exact-distance verify: Σ bit_count(xor) over the four
    * 16-bit bands, filtered to `maxHamming`. */
  private def verifyHamming(cand: DataFrame, bands: DataFrame,
      maxHamming: Int): DataFrame =
    cand
      .join(bands.select(col("id").as("id_a"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), "id_a")
      .join(bands.select(col("id").as("id_b"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), "id_b")
      .withColumn("hamming",
        expr("CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1) " +
          "+ bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
}
