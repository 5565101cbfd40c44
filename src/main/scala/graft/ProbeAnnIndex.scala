package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Depth probe for the persisted ANN index (operators/AnnIndex): the
  * build-once / query-many economics measured at any scale directory.
  * Reports the three lifecycle walls separately — BUILD (train √n
  * cells + publish v1), APPEND (a ~2% batch assigned to the FROZEN
  * quantizer + publish v2) and QUERY (the q179-style capped probe set
  * through the published store) — because the claim the operator makes
  * is exactly that the last two do NOT pay the first one's training
  * cost: append is one broadcast assignment pass over the batch, query
  * reads only probed cells. Run at 1×/5×/25× (ScaleData dirs) for the
  * STRESS.md table.
  *
  * Usage: runMain graft.ProbeAnnIndex [dir] [nprobe]
  */
object ProbeAnnIndex {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{AnnIndex, Similarity, Snapshot}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // 98% of the corpus builds the index; the held-out 2% is the append
    val base = e.where(col("vec_id") % 50 =!= 17)
    val added = e.where(col("vec_id") % 50 === 17)
      .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
    val n = base.count()
    val cells = Similarity.kFor(n)
    val nprobe = args.lift(1).flatMap(_.toIntOption)
      .getOrElse(Similarity.nprobeFor(cells))
    val root = java.nio.file.Files.createTempDirectory("annidx-probe").toString
    val t0 = System.nanoTime()
    AnnIndex.build(spark, root, base, dim = 64)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    AnnIndex.append(spark, root, added)
    val tAppend = (System.nanoTime() - t1) / 1e9
    // the q179 query-sample shape: capped, deterministic
    val qs = e.where(col("vec_id") % 37 === 3 && col("vec_id") < 37L * 1000)
    val t2 = System.nanoTime()
    val hits = AnnIndex.query(spark, root, qs, k = 10, nprobe = nprobe).count()
    val tQuery = (System.nanoTime() - t2) / 1e9
    val mRows = Snapshot.readCurrent(spark, root)
      .filter(col("kind") === "m").count()
    System.err.println(
      f"[probe] annindex dir=$dir n=$n cells=$cells nprobe=$nprobe " +
        f"members_v2=$mRows hits=$hits build=$tBuild%.1f s " +
        f"append=$tAppend%.1f s query=$tQuery%.1f s " +
        f"(append/build=${tAppend / tBuild}%.2f query/build=${tQuery / tBuild}%.2f)")
    spark.stop()
  }
}
