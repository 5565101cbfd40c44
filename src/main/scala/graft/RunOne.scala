package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev harness: run ONE named query from [[SparkEntry.queries]] and dump
  * its result + oracle SQL the same way [[Verify]] does, so a single
  * query can be iterated without the full 96-query sweep:
  *
  *   sbt "runMain graft.RunOne q113_etl_enrich /root/testdata/sf0.001 /tmp/one"
  *   python3 scripts/local_correctness.py /root/testdata/sf0.001 /tmp/one q113_etl_enrich
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    println(f"[runone] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.get(name)
      .map(sql => s"{${q(name)}: ${q(sql)}}").getOrElse("{}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
