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

    // does Spark 4's WindowGroupLimit pushdown fire on the production
    // ranker shape (row_number ≤ k filter)? It inserts Partial/Final
    // WindowGroupLimit nodes around the exchange, bounding what the
    // shuffle carries the same way the heap operator does — the
    // adjudication fact for whether production rankers need rewiring
    {
      val probe = spark.range(1000)
        .select((col("id") % 10).as("g"), col("id"),
          (col("id") * 37 % 97).as("v"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
        .where(col("rn") <= 10)
      val plan = probe.queryExecution.executedPlan.toString
      val hits = "WindowGroupLimit".r.findAllIn(plan).size
      println(s"window plan WindowGroupLimit nodes: $hits " +
        (if (hits >= 2) "(Partial+Final: shuffle already k-bounded)"
         else if (hits == 1) "(Final only: shuffle carries whole groups)"
         else "(absent: full sort per group)"))
    }

    println(f"${"n"}%11s ${"regime"}%10s ${"window_s"}%9s ${"heap_s"}%8s ${"speedup"}%8s")
    sizes.foreach { n =>
      // two regimes: "hot" (half of all rows in group 0 — the skewed
      // blocking key) and "flat" (n/1000 groups of ~1000 rows — the
      // production blocking/ranking shape where candidate caps bound
      // group size)
      val regimes = Seq(
        "hot" -> when(col("id") % 2 === 0, 0L).otherwise(col("id") % 100),
        "flat" -> (col("id") % greatest(lit(1L), lit(n / 1000L))))
      regimes.foreach { case (label, gexpr) =>
        val df = spark.range(n).select(gexpr.as("g"),
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
        println(f"$n%11d $label%10s $windowWall%9.2f $heapWall%8.2f ${windowWall / heapWall}%7.1fx")
      }
    }
    spark.stop()
  }
}
