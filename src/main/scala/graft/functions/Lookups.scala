package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Datapatch lookups (F2) — the reference's per-dataset YAML value
  * rewrites (zavod/zavod/runtime/lookups.py:16-83, datapatch semantics
  * configured e.g. in tests/fixtures/testdataset1/testdataset1.yml:46-78):
  * match an incoming value, replace it with zero..many values, and
  * optionally re-target the property.
  *
  * The lookup table is tiny metadata, so application is a BROADCAST left
  * join against the value stream followed by an explode of the
  * replacement array — one shuffle-free pass, the Spark shape of a
  * generated CASE WHEN. Unmatched values pass through unchanged.
  */
object Lookups {

  /** One lookup option: match (lowercased) → replacement values, with an
    * optional property re-target. `values == Seq()` with `keepValue`
    * replicates datapatch's "empty values = keep original" form. */
  final case class Option_(
      matchValue: String,
      values: Seq[String],
      prop: String = null)

  /** Build the lookup frame (match_key, values, new_prop). */
  def lookupFrame(spark: SparkSession, options: Seq[Option_]): DataFrame = {
    import spark.implicits._
    options.map(o => (o.matchValue.toLowerCase.trim, o.values, Option(o.prop)))
      .toDF("match_key", "repl_values", "new_prop")
  }

  /** Apply a lookup to `df`: rewrites `valueCol` (exploding multi-value
    * replacements into rows) and re-targets `propCol` when the option
    * says so. Rows whose value has no lookup entry pass through. Output
    * columns: the input columns with `valueCol` and `propCol` rewritten.
    *
    * Match semantics follow datapatch: case-insensitive on the trimmed
    * value (lookups.py:40-49). */
  def applyLookup(
      df: DataFrame,
      lookup: DataFrame,
      valueCol: String,
      propCol: String): DataFrame = {
    val joined = df.join(broadcast(lookup),
      lower(trim(col(valueCol))) === col("match_key"), "left")
    val exploded = joined.withColumn("_repl",
      explode(when(col("match_key").isNotNull && size(col("repl_values")) > 0,
          col("repl_values"))
        .otherwise(array(col(valueCol)))))
    exploded
      .withColumn(valueCol, col("_repl"))
      .withColumn(propCol, coalesce(col("new_prop"), col(propCol)))
      .drop("match_key", "repl_values", "new_prop", "_repl")
  }

  /** Pure-column variant for single-valued rewrites: a broadcast-free
    * generated CASE WHEN chain (for lookups small enough to inline). */
  def lookupCase(value: Column, mapping: Seq[(String, String)]): Column =
    mapping.foldLeft(value) { case (acc, (from, to)) =>
      when(lower(trim(value)) === from.toLowerCase.trim, lit(to)).otherwise(acc)
    }
}
