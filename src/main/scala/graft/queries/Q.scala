package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-surface plumbing shared by the correctness/bench query sets. */
object Q {
  /** (spark, sfDir) => result frame — the driver's query contract. */
  type QFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Events with `ts` normalized to a plain TIMESTAMP regardless of how
    * the parquet encodes it. Known generator variants: nanosecond
    * timestamps (session sets `spark.sql.legacy.parquet.nanosAsLong=true`
    * so `ts` arrives as epoch-nanos long → floor-divide to micros, matching
    * DuckDB's epoch_us on TIMESTAMP_NS) and microsecond wall-clock
    * timestamps (Spark infers TIMESTAMP_NTZ → cast to TIMESTAMP; the
    * session timezone is UTC everywhere, so the cast is value-preserving
    * and matches DuckDB's naive read). */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }

  /** Scratch-path tag for FS-writing queries (round-15 advisory):
    * roots derived from the dataset dir ALONE are shared across
    * processes, so two concurrent JVMs over the same fixture (parallel
    * verify/bench) pre-delete and rewrite each other's files mid-query
    * — spurious gate failures or mixed row counts. Suffixing the
    * sanitized dir with the process id keeps the path deterministic
    * WITHIN a JVM (each evaluation's pre-delete still reclaims this
    * process's own leftovers) while making it private per process. */
  def scratchTag(d: String): String =
    d.replaceAll("[^a-zA-Z0-9]", "_") + "_p" +
      java.lang.ProcessHandle.current().pid()

  /** One declared query: Spark plan + optional DuckDB oracle SQL. */
  final case class Decl(name: String, fn: QFn, oracle: Option[String])

  def decl(name: String, fn: QFn, oracle: String): Decl = Decl(name, fn, Some(oracle))
  def declNoOracle(name: String, fn: QFn): Decl = Decl(name, fn, None)
}
