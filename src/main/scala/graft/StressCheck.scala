package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-sizing probe for the two bench queries whose FIXTURES are
  * deliberately pinned for oracle stability and therefore go
  * superlinear when the same literal parameters meet 5× data:
  *
  *  - q116 semantic dedup pins `planes = 4` → 16 LSH buckets per
  *    table, so bucket occupancy grows ∝ n and in-bucket pair
  *    generation ∝ n². The operator's sizing rule at scale is
  *    planes ≈ log2(n / targetBucketSize): bits grow with the corpus,
  *    occupancy — and with it per-bucket pair cost — stays constant.
  *  - q93 IVF pins the k-means seed at vec_id % 50 → k ∝ n centroids,
  *    so train/assign cost n·k ∝ n². The production rule is k ≈ √n
  *    (cell size √n, probe cost nprobe·√n).
  *
  * This main times the pinned parameters against the scale-correct
  * ones on a stress directory (default target/sfbig, 5× sf0.1) so the
  * flagged exponents are attributable: fixture sizing, not plan shape.
  *
  * Usage: runMain graft.StressCheck [dir]
  */
object StressCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/sfbig")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val weights = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))

    def time(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      System.err.println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // planes sized for ~128-vector buckets at this n
    val sizedPlanes = math.max(4,
      (math.log(n / 128.0) / math.log(2)).ceil.toInt)
    for (p <- Seq(4, sizedPlanes).distinct)
      time(s"semanticDedup n=$n planes=$p (buckets/table=${1 << p})") {
        Similarity.semanticDedup(emb, weights, dim = 64, threshold = 0.8,
            planes = p, tables = 8)
          .write.format("noop").mode("overwrite").save()
      }

    // k ∝ n (the q93 fixture rule) vs k ≈ √n (the production rule)
    val modLinear = 50
    val modSqrt = math.max(1, (n / math.sqrt(n.toDouble)).round.toInt)
    for ((label, m) <- Seq(("k∝n", modLinear), ("k≈√n", modSqrt))) {
      val seed = emb.filter(col("vec_id") % m === 7)
      val kk = seed.count()
      time(s"ivf $label k=$kk") {
        val trained = Similarity.kmeansCentroids(emb, seed, dim = 64,
          maxIterations = 2, earlyStop = false)
        Similarity.ivfTopK(
          emb.filter(col("vec_id") % 100 === 0), emb, trained,
          k = 10, nprobe = 2)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
