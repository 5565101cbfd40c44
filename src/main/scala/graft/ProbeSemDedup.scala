package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B probe: semanticDedup candidate-pair volume and wall at
  * several occupancy targets on a stress directory — the evidence
  * behind the targetBucketSize guidance on semanticDedupAuto (the 25×
  * point measured exp 1.2 with target=128 on the replica-clustered
  * fixture; this probe attributes it to collision volume, the sizing
  * lever, not plan shape).
  *
  * Usage: runMain graft.ProbeSemDedup [dir] [target1,target2,...]
  */
object ProbeSemDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("target/sf25x")
    val targets = args.lift(1).getOrElse("128,32")
      .split(",").map(_.trim.toLong).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    for (t <- targets) {
      val planes = Similarity.planesFor(n, t)
      val t0 = System.nanoTime()
      val pairs = Similarity.cosineNearDupPairsTables(
        emb, dim = 64, threshold = 0.8, planes = planes, tables = 8).count()
      System.err.println(f"[probe] n=$n target=$t planes=$planes " +
        f"pairs>=0.8=$pairs wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
