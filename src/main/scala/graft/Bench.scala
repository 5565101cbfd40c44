package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall times. Queries run twice are
  * not averaged — each query gets a single timed run after a tiny warm-up
  * action so JVM/codegen startup is not billed to the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries ns timestamps; read as long, convert in Q.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.driver.maxResultSize", "2g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm up: JVM + parquet footer reads
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    val results = SparkEntry.allDecls.map { d =>
      val t0 = System.nanoTime()
      // Materialize via the noop sink: every output column is computed
      // and serialized, so projection-only queries (hashes, regexes,
      // date parses) are billed honestly — a bare .count() would let
      // Catalyst prune the entire projection.
      val n = try { d.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); 0L } catch {
        case e: Throwable => System.err.println(s"[bench] ${d.name}: ${e.getMessage}"); -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      (d.name, sec, n)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
