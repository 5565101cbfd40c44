package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Dataset statistics facets (A2/K9): counts by schema, by country, by
  * other facet dimensions, plus per-(schema, prop) fill rates
  * (zavod/zavod/exporters/statistics.py:73-170).
  *
  * Each facet is an independent groupBy over the same cached input —
  * Catalyst prunes per-facet columns; the union output has the fixed
  * shape (facet, key, cnt) ordered by count desc within facet (O1).
  */
object Statistics {

  /** Multi-facet counts: for each (facetName, keyColumn), a groupBy
    * count, unioned into (facet, key, cnt) ordered by count desc within
    * the facet (O1 — statistics.py:13,29; key asc tie-break for
    * determinism). Facet tables are post-aggregation tiny, so the sort
    * is a few rows per facet, not a data-scale shuffle. */
  def facets(df: DataFrame, facetCols: Seq[(String, String)]): DataFrame =
    facetCols.map { case (facet, c) =>
      df.groupBy(col(c).cast("string").as("key"))
        .agg(count(lit(1)).as("cnt"))
        .select(lit(facet).as("facet"), col("key"), col("cnt"))
        .orderBy(col("cnt").desc, col("key").asc)
    }.reduce(_.unionByName(_))

  /** Fill rate per (schema, prop): fraction of entities of a schema that
    * carry the property (statistics.py:120-152). `stmts` is a statement
    * frame; output (schema, prop, entities, fill_rate). */
  def fillRates(stmts: DataFrame): DataFrame = {
    val totals = stmts.groupBy(col("schema"))
      .agg(countDistinct(col("canonicalId")).as("total"))
    stmts.groupBy(col("schema"), col("prop"))
      .agg(countDistinct(col("canonicalId")).as("entities"))
      .join(totals, "schema")
      .withColumn("fill_rate", col("entities").cast("double") / col("total").cast("double"))
      .select(col("schema"), col("prop"), col("entities"), col("fill_rate"))
  }
}
