package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sanction-program registry (K9 adjunct): keyed program metadata with
  * a duplicate-key assertion, plus the dangling-reference validator
  * over Sanction programId values.
  *
  * Reference: zavod/zavod/stateful/programs.py:240-248 keeps Program
  * rows keyed and asserts on double registration;
  * zavod/zavod/exporters/statistics.py:114,141 joins the registry into
  * the statistics program facet. The registry is dimension-sized (a
  * few hundred programs against billions of statements), so every join
  * against it is a broadcast.
  */
object Programs {

  /** Validate and return the registry frame — (program_key, title,
    * ...). Duplicate keys fail loudly: registering two programs under
    * one key is a pipeline bug, exactly the reference's assertion. The
    * probe is one tiny aggregate over a dimension-sized frame. */
  def registry(df: DataFrame): DataFrame = {
    val dups = df.groupBy(col("program_key")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).select(col("program_key")).limit(5)
      .collect().map(_.get(0).toString)
    require(dups.isEmpty,
      s"duplicate program key(s) in registry: ${dups.mkString(", ")}")
    df
  }

  /** Rows whose program reference resolves to no registry key — the
    * q08 dangling-ref anti-join shape, broadcast because the registry
    * is dimension-sized at any corpus scale. Returns (id, program_key)
    * rows needing curation attention. */
  def danglingPrograms(sanctions: DataFrame, id: Column, programKey: Column,
      registry: DataFrame): DataFrame =
    sanctions.select(id.as("id"), programKey.as("program_key"))
      .join(broadcast(registry.select(col("program_key"))),
        Seq("program_key"), "left_anti")
      .select(col("id"), col("program_key"))
}
