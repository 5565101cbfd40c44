package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKPerGroup scale probe: the custom partial-heap operator vs the
  * row_number window encoding, on data with a hot group (the regime
  * the operator exists for — a window must shuffle AND SORT the whole
  * hot group on one reducer; the heap forwards k rows per partition).
  *
  * Usage: runMain graft.ProbeTopK [n ...]
  */
object ProbeTopK {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(2000000L, 10000000L, 50000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(f"${"n"}%11s ${"window_s"}%9s ${"heap_s"}%8s ${"speedup"}%8s")
    sizes.foreach { n =>
      // 100 groups, with half of all rows landing in group 0 (hot)
      val df = spark.range(n).select(
        when(col("id") % 2 === 0, 0L).otherwise(col("id") % 100).as("g"),
        col("id"), (col("id") * 2654435761L % 999983L).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      df.count()

      val t0 = System.nanoTime()
      val wRows = df.withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
        .where(col("rn") <= 10).count()
      val windowWall = (System.nanoTime() - t0) / 1e9

      val t1 = System.nanoTime()
      val hRows = graft.plans.TopK.topKPerGroup(df, Seq(col("g")),
        Seq(col("v").desc, col("id")), k = 10).count()
      val heapWall = (System.nanoTime() - t1) / 1e9

      require(wRows == hRows, s"row counts differ: $wRows vs $hRows")
      df.unpersist(blocking = false)
      println(f"$n%11d $windowWall%9.2f $heapWall%8.2f ${windowWall / heapWall}%7.1fx")
    }
    spark.stop()
  }
}
