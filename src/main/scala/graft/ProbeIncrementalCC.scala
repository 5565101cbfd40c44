package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental connected-components scale probe: the q209 claim is that
  * merging a daily decision batch into an existing fixpoint costs
  * O(batch) iterative work plus two broadcast scans of the labeling —
  * NOT a full O(corpus) large-star/small-star rerun. This measures
  * both paths on the same graph across a size decade.
  *
  * Graph: `n` nodes in chains of 10 (base fixpoint = n/10 components),
  * batch = n/100 bridge edges merging adjacent chains plus n/100 new
  * nodes attaching to existing components — proportional growth, the
  * daily-batch regime.
  *
  * Usage: runMain graft.ProbeIncrementalCC [n ...]
  */
object ProbeIncrementalCC {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(200000L, 1000000L, 5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.ConnectedComponents

    println(f"${"n"}%10s ${"full_base_s"}%12s ${"incr_s"}%8s ${"full_again_s"}%13s ${"speedup"}%8s")
    sizes.foreach { n =>
      val nodes = spark.range(n).toDF("id")
      val base = spark.range(n - 1).toDF("src")
        .where(col("src") % 10 =!= 9)
        .select(col("src"), (col("src") + 1).as("dst"))
      val t0 = System.nanoTime()
      val prev = ConnectedComponents.run(nodes, base)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      prev.count()
      val fullBase = (System.nanoTime() - t0) / 1e9

      // batch: bridge chain k*100 to k*100+10 (merges two chains), plus
      // a new node n+k attached to node k*100
      val bridges = spark.range(n / 1000).toDF("k")
        .select((col("k") * 1000).as("src"), (col("k") * 1000 + 10).as("dst"))
      val attach = spark.range(n / 100).toDF("k")
        .select((col("k") + n).as("src"), (col("k") * 100).as("dst"))
      val newNodes = spark.range(n / 100).toDF("k").select((col("k") + n).as("id"))
      val batch = bridges.unionByName(attach)

      val t1 = System.nanoTime()
      val inc = ConnectedComponents.incremental(prev, batch, newNodes)
      val incCnt = inc.count()
      val incWall = (System.nanoTime() - t1) / 1e9

      val t2 = System.nanoTime()
      val full = ConnectedComponents.run(
        nodes.unionByName(newNodes), base.unionByName(batch))
      val fullCnt = full.count()
      val fullWall = (System.nanoTime() - t2) / 1e9

      require(incCnt == fullCnt, s"row counts differ: $incCnt vs $fullCnt")
      // spot-check label agreement on a deterministic sample
      val mism = inc.toDF("id", "c1").join(full.toDF("id", "c2"), "id")
        .where(col("c1") =!= col("c2")).limit(1).count()
      require(mism == 0L, "incremental != full recompute")
      prev.unpersist(blocking = false)
      println(f"$n%10d $fullBase%12.2f $incWall%8.2f $fullWall%13.2f ${fullWall / incWall}%8.1fx")
    }
    spark.stop()
  }
}
