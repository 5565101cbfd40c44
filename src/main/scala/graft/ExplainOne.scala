package graft

import org.apache.spark.sql.SparkSession

/** Scratch: print the formatted physical plan of declared queries. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.allDecls.filter(d => args.contains(d.name)).foreach { d =>
      println(s"==== ${d.name}")
      d.fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
