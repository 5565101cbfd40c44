package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: semanticDedup cost on a stress directory, before vs
  * after the round-10 mega-cluster defenses.
  *
  * Round-9 finding: the 25× stress corpus holds near-identical replica
  * clusters (cos ≈ 1), which sign-LSH cannot split at ANY plane count,
  * so the raw pair stage was nearly invariant to the occupancy target
  * (319→234 s across planes 9→12). Round 10 added exact-vector +
  * signature-group collapse and a residual bucket cap inside
  * semanticDedup; this probe times, per occupancy target:
  *
  *  - RAW: the uncollapsed pair enumeration
  *    (cosineNearDupPairsTables — the q92/q107 pair surface, kept
  *    exact for those oracles), and
  *  - SAFE: the full semanticDedupAuto pipeline (collapse + cap + CC +
  *    representatives), i.e. strictly MORE work than the raw pair
  *    count, on the defended path.
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
    val weights = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    val n = emb.count()
    for (t <- targets) {
      val planes = Similarity.planesFor(n, t)
      val t0 = System.nanoTime()
      val pairs = Similarity.cosineNearDupPairsTables(
        emb, dim = 64, threshold = 0.8, planes = planes, tables = 8).count()
      val rawWall = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val clusters = Similarity.semanticDedup(
        emb, weights, dim = 64, threshold = 0.8,
        planes = planes, tables = 8).count()
      val safeWall = (System.nanoTime() - t1) / 1e9
      System.err.println(f"[probe] n=$n target=$t planes=$planes " +
        f"raw: pairs>=0.8=$pairs wall=$rawWall%.1f s | " +
        f"safe: clusters=$clusters wall=$safeWall%.1f s")
    }
    spark.stop()
  }
}
