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

  /** A2's country facet family over an entity frame: counts per country
    * for ALL things and for TARGETS separately, plus sanction-program
    * counts from adjacent Sanction entities
    * (zavod/zavod/exporters/statistics.py:73-152 — the reference keeps
    * `countries` and `target_countries` as distinct facet blocks).
    * Output: (facet, key, cnt) with facet ∈ country_all |
    * country_targets | sanction_program. */
  def entityFacets(entities: DataFrame): DataFrame = {
    val risks = lit(graft.model.FtmModel.riskTopics.toSeq.sorted.toArray)
    val withFlags = entities.select(col("id"),
      coalesce(element_at(col("properties"), "country"),
        array().cast("array<string>")).as("countries"),
      arrays_overlap(coalesce(element_at(col("properties"), "topics"),
        array().cast("array<string>")), risks).as("is_target"))
    val exploded = withFlags.select(col("id"), col("is_target"),
      explode(col("countries")).as("key"))
    val all = exploded.groupBy("key").agg(countDistinct(col("id")).as("cnt"))
      .select(lit("country_all").as("facet"), col("key"), col("cnt"))
    val targets = exploded.filter(col("is_target"))
      .groupBy("key").agg(countDistinct(col("id")).as("cnt"))
      .select(lit("country_targets").as("facet"), col("key"), col("cnt"))
    val programs = entities.filter(col("schema") === "Sanction")
      .select(explode(coalesce(element_at(col("properties"), "program"),
        array().cast("array<string>"))).as("key"))
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .select(lit("sanction_program").as("facet"), col("key"), col("cnt"))
    all.unionByName(targets).unionByName(programs)
      .orderBy(col("facet"), col("cnt").desc, col("key"))
  }

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
