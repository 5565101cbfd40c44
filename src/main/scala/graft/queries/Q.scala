package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-surface plumbing shared by the correctness/bench query sets. */
object Q {
  /** (spark, sfDir) => result frame — the driver's query contract. */
  type QFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table carries nanosecond parquet timestamps, which Spark's
    * reader rejects. The session sets
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see Verify/Bench), so
    * `ts` arrives as epoch-nanos long; convert to a microsecond timestamp
    * here (floor division — matches DuckDB's epoch_us on TIMESTAMP_NS). */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else raw
  }

  /** One declared query: Spark plan + optional DuckDB oracle SQL. */
  final case class Decl(name: String, fn: QFn, oracle: Option[String])

  def decl(name: String, fn: QFn, oracle: String): Decl = Decl(name, fn, Some(oracle))
  def declNoOracle(name: String, fn: QFn): Decl = Decl(name, fn, None)
}
