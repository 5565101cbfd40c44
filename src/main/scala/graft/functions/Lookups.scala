package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Datapatch lookups (F2) — the reference's per-dataset YAML value
  * rewrites (zavod/zavod/runtime/lookups.py:16-83, datapatch semantics
  * configured e.g. in tests/fixtures/testdataset1/testdataset1.yml:46-78):
  * match an incoming value, replace it with zero..many values, and
  * optionally re-target the property. Options support exact match lists
  * and substring ('contains') matching; when several options match, the
  * FIRST declared one wins — datapatch evaluates options in order.
  *
  * The lookup table is tiny metadata, so application is a BROADCAST left
  * join against the value stream, a first-match window keyed on a
  * generated row id, and an explode of the replacement array — no
  * data-sized shuffle, the Spark shape of a generated CASE WHEN.
  */
object Lookups {

  /** One lookup option: match key (lowercased/squashed) → replacement
    * values, with an optional property re-target. `values == Seq()`
    * replicates datapatch's "empty values = keep original" form.
    * `matchType` is 'match' (exact) or 'contains' (substring). */
  final case class Option_(
      matchValue: String,
      values: Seq[String],
      prop: String = null,
      matchType: String = "match")

  private def norm(c: Column): Column = regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Build the lookup frame (opt_idx, match_key, match_type,
    * repl_values, new_prop) — declaration order preserved in opt_idx. */
  def lookupFrame(spark: SparkSession, options: Seq[Option_]): DataFrame = {
    import spark.implicits._
    options.zipWithIndex.map { case (o, i) =>
      (i, o.matchValue.toLowerCase.trim.replaceAll("\\s+", " "),
        o.matchType, o.values, Option(o.prop))
    }.toDF("opt_idx", "match_key", "match_type", "repl_values", "new_prop")
  }

  /** Apply a lookup to `df`: rewrites `valueCol` (exploding multi-value
    * replacements into rows) and re-targets `propCol` when the option
    * says so. Rows whose value matches no option pass through; when
    * several options match, the lowest opt_idx wins. Match semantics
    * follow datapatch: case-insensitive, whitespace-squashed
    * (lookups.py:40-49). */
  def applyLookup(
      df: DataFrame,
      lookup: DataFrame,
      valueCol: String,
      propCol: String): DataFrame = {
    val withId = df.withColumn("_row", monotonically_increasing_id())
    val v = norm(col(valueCol))
    val joined = withId.join(broadcast(lookup),
      (col("match_type") === "match" && v === col("match_key")) ||
        (col("match_type") === "contains" && v.contains(col("match_key"))),
      "left")
    val w = Window.partitionBy("_row")
      .orderBy(coalesce(col("opt_idx"), lit(Int.MaxValue)).asc)
    val firstMatch = joined
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") === 1)
    val exploded = firstMatch.withColumn("_repl",
      explode(when(col("match_key").isNotNull && size(col("repl_values")) > 0,
          col("repl_values"))
        .otherwise(array(col(valueCol)))))
    exploded
      .withColumn(valueCol, col("_repl"))
      .withColumn(propCol, coalesce(col("new_prop"), col(propCol)))
      .drop("opt_idx", "match_key", "match_type", "repl_values", "new_prop",
        "_repl", "_row", "_rank")
  }

  /** Pure-column variant for single-valued rewrites: a broadcast-free
    * generated CASE WHEN chain (for lookups small enough to inline). */
  def lookupCase(value: Column, mapping: Seq[(String, String)]): Column =
    mapping.foldLeft(value) { case (acc, (from, to)) =>
      when(lower(trim(value)) === from.toLowerCase.trim, lit(to)).otherwise(acc)
    }
}
