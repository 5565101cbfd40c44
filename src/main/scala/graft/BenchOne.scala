package graft

import org.apache.spark.sql.SparkSession

/** Scratch: time a subset of declared queries (debug helper). Queries
  * run in ARGUMENT order, and a repeated name runs again — put a cheap
  * query first (or repeat the target) to separate JVM warm-up from the
  * steady-state wall. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val byName = SparkEntry.allDecls.map(d => d.name -> d).toMap
    args.foreach { name =>
      byName.get(name) match {
        case None => System.err.println(s"[benchone] WARNING unknown query $name")
        case Some(d) =>
          val t0 = System.nanoTime()
          d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"[benchone] ${d.name} ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
