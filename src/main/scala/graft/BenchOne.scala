package graft

import org.apache.spark.sql.SparkSession

/** Scratch: time a subset of declared queries (debug helper). Queries
  * run in ARGUMENT order, and a repeated name runs again — put a cheap
  * query first (or repeat the target) to separate JVM warm-up from the
  * steady-state wall. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // session config mirrors graft.Bench exactly — an isolated retime on
    // a different config (e.g. the missing broadcast threshold) would
    // measure a different plan than the suite bench did
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // debug-only A/B knob: probe a shuffle-partition hypothesis without
    // changing the bench contract (Bench.scala stays cpus-keyed)
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val builder0 = SparkSession.builder()
    // debug-only A/B knob: shuffle/spill scratch device
    sys.env.get("SPARK_GRAFT_LOCAL_DIR")
      .foreach(d => builder0.config("spark.local.dir", d))
    val spark = builder0
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.driver.maxResultSize", "2g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // debug-only A/B knob for the size-gated iteration-state broadcasts
    sys.env.get("SPARK_GRAFT_ITER_BCAST")
      .foreach(v => spark.conf.set(graft.operators.IterState.ConfKey, v))
    // debug-only A/B knob for the CC local-finish gate
    sys.env.get("SPARK_GRAFT_CC_LOCAL")
      .foreach(v => spark.conf.set(
        graft.operators.ConnectedComponents.LocalSolveConfKey, v))
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val byName = SparkEntry.allDecls.map(d => d.name -> d).toMap
    args.foreach { name =>
      byName.get(name) match {
        case None => System.err.println(s"[benchone] WARNING unknown query $name")
        case Some(d) =>
          val t0 = System.nanoTime()
          d.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"[benchone] ${d.name} ${(System.nanoTime() - t0) / 1e9}%.2f s")
          // mirror Bench.sweepQueryState so isolated retimes see the
          // same between-query state the suite does
          graft.operators.QueryScoped.releaseAll()
          spark.sparkContext.getPersistentRDDs.values
            .filter(_.toString.contains("localCheckpoint"))
            .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
