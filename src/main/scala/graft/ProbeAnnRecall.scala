package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: recall@10 of the AUTO-SIZED multi-table LSH ANN
  * (q179's semantic arm) against the exact brute-force top-10, at any
  * scale directory — the approximation-quality number that pairs with
  * the 25×-decade cost measurements in STRESS.md (cost exponent 0.93
  * means little if recall collapses with n; this shows it doesn't).
  *
  * Usage: runMain graft.ProbeAnnRecall [dir] [tables]
  */
object ProbeAnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val tables = args.lift(1).flatMap(_.toIntOption).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // the q179 query sample, capped so the exact baseline stays O(1000·n)
    val qs = e.where(col("vec_id") % 37 === 3 && col("vec_id") < 37L * 1000)
    val n = e.count()
    val exact = Similarity.cosineTopK(qs, e, k = 10)
    val approx = Similarity.cosineTopKLshTablesAuto(qs, e, k = 10,
      dim = 64, targetBucketSize = 128, tables = tables)
    val r = Similarity.recallAgainst(exact, approx, s"auto_lsh_n=$n")
      .collect()(0)
    System.err.println(s"[ann-recall] ${r.getString(0)} tables=$tables: " +
      s"exact_pairs=${r.getLong(1)} found=${r.getLong(2)} " +
      f"recall=${r.getDouble(3)}%.3f (planes=${Similarity.planesFor(n, 128)})")
    spark.stop()
  }
}
