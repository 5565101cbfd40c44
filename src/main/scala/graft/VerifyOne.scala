package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Scratch: Verify for a subset of queries (debug helper).
  * Usage: runMain graft.VerifyOne <sfDir> <outDir> <query> [query...] */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
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
    SparkEntry.allDecls.filter(d => names.contains(d.name)).foreach { d =>
      try d.fn(spark, sfDir).write.mode("overwrite").parquet(s"$outDir/${d.name}")
      catch { case e: Throwable =>
        System.err.println(s"[verifyone] ${d.name} failed: ${e}")
        e.printStackTrace()
      }
      // the SparkEntry.queries boundary-sweep contract
      SparkEntry.sweepQueryState(spark)
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => names.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
