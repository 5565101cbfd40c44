package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** [[entityFacets]]' country facet carrying a SKETCHED distinct arm
    * beside the exact one — the 100 TB form of A2's per-country entity
    * counts (zavod/zavod/exporters/statistics.py:73-152): the exact
    * `countDistinct(id)` pays a full (country, id) shuffle that grows
    * with the corpus, while the [[Hll]] registers are O(m) per country
    * regardless of row count, mergeable across shards/days, and — on
    * the house portable-arithmetic contract — bit-identical on any
    * engine, so the facet row is oracle-gated END TO END (registers,
    * harmonic numerator, estimate) with the exact count alongside as
    * the truth the estimate is judged against. Returns
    * (facet, key, exact_distinct, n_registers_set, register_sum,
    * harmonic_num, est_distinct). */
  def countryFacetSketched(entities: DataFrame, p: Int = 8): DataFrame = {
    val exploded = entities.select(col("id"),
      explode(coalesce(element_at(col("properties"), "country"),
        array().cast("array<string>"))).as("key"))
    val exact = exploded.groupBy("key")
      .agg(countDistinct(col("id")).as("exact_distinct"))
    Hll.groupDistinct(exploded, col("key"), col("id"), p)
      .withColumnRenamed("grp", "key")
      .join(exact, "key")
      .select(lit("country_all").as("facet"), col("key"),
        col("exact_distinct"), col("n_registers_set"),
        col("register_sum"), col("harmonic_num"), col("est_distinct"))
  }

  /** K9: the complete statistics.json document with the reference's
    * structure (statistics.py:73-170): last_change, schemata,
    * properties (schema:prop qnames), entity/target counts, targets
    * {total, countries, schemata}, sanctions{programs} (programId
    * counts over Sanction entities), things{total, countries, schemata,
    * entities_with_prop fill rates}. One JSON row, deterministic bytes.
    *
    * Deliberate deviations, documented: facet ties sort by key asc
    * (the reference inherits dict insertion order — nondeterministic
    * under parallel aggregation); schema label/plural derive from the
    * schema name (the reference reads FtM YAML labels); country labels
    * are the codes; fill_rate is fixed-point DECIMAL(8,6) so the bytes
    * are engine-independent. `entities` may carry an optional
    * `last_change` string column.
    *
    * `programRegistry` (round-10): when supplied — a
    * [[Programs.registry]]-validated (program_key, title) frame — the
    * sanctions program facet ADDITIONALLY carries each program's
    * registry title (`"title":"..."`, or `null` for an unregistered
    * programId). This is an INTENTIONAL EXTENSION beyond the reference
    * format: the reference's facet is exactly {id, count}
    * (exporters/statistics.py:39-46; its counting loop at :114 never
    * joins Program titles), and that is what the default `None` —
    * every exporter/ETL path — emits byte-for-byte. Wire the registry
    * only for consumers that want the enriched facet; the join is a
    * broadcast (the registry is dimension-sized at any corpus
    * scale). */
  def statisticsJson(entities: DataFrame,
      programRegistry: Option[DataFrame] = None): DataFrame = {
    import graft.model.FtmModel
    val jesc = (c: org.apache.spark.sql.Column) => Exporters.jesc(c)
    val risks = lit(FtmModel.riskTopics.toSeq.sorted.toArray)
    val countryProps = FtmModel.schemata.values.flatMap(_.props)
      .filter(_.ptype == FtmModel.PropType.Country).map(_.name).toSet.toSeq.sorted
    val things = FtmModel.descendants("Thing").toSeq.sorted
    val lastChange =
      if (entities.columns.contains("last_change")) col("last_change")
      else lit(null).cast("string")
    val props = col("properties")
    val e = entities.select(
      col("id"), col("schema"), props,
      lastChange.as("lc"),
      arrays_overlap(coalesce(element_at(props, "topics"),
        array().cast("array<string>")), risks).as("is_target"),
      flatten(transform(
        filter(map_entries(props), en => en.getField("key").isin(countryProps: _*)),
        en => en.getField("value"))).as("countries"),
      col("schema").isin(things: _*).as("is_thing"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ---- tiny aggregate frames, each reduced to one JSON fragment ----
    def fragment(df: DataFrame, name: String, entry: Column, sortKey: Column): DataFrame =
      df.agg(array_join(transform(
        array_sort(collect_list(struct(sortKey.as("k"), entry.as("e")))),
        x => x.getField("e")), ",").as(name))
    // count-desc sort via inverted count in the key struct
    def byCountDesc(cnt: Column, key: Column): Column =
      struct((-cnt).as("nk"), key.as("tk"))

    val totals = e.agg(
      count(lit(1)).as("entity_count"),
      count(when(col("is_target"), 1)).as("target_count"),
      count(when(col("is_thing"), 1)).as("thing_count"),
      max(col("lc")).as("last_change"))

    val schemaCounts = e.groupBy(col("schema")).agg(count(lit(1)).as("cnt"))
    val schemataList = fragment(schemaCounts, "schemata_json",
      concat(lit("\""), jesc(col("schema")), lit("\"")), struct(col("schema")))
    def schemaFacet(df: DataFrame, name: String) = fragment(
      df, name,
      concat(lit("{\"name\":\""), jesc(col("schema")),
        lit("\",\"count\":"), col("cnt"),
        lit(",\"label\":\""), jesc(col("schema")),
        lit("\",\"plural\":\""), jesc(concat(col("schema"), lit("s"))), lit("\"}")),
      byCountDesc(col("cnt"), col("schema")))
    val thingSchemata = schemaFacet(
      e.filter(col("is_thing")).groupBy(col("schema")).agg(count(lit(1)).as("cnt")),
      "things_schemata_json")
    val targetSchemata = schemaFacet(
      e.filter(col("is_target")).groupBy(col("schema")).agg(count(lit(1)).as("cnt")),
      "targets_schemata_json")

    val qnames = fragment(
      e.select(col("schema"), explode(map_keys(props)).as("p")).distinct(),
      "properties_json",
      concat(lit("\""), jesc(concat(col("schema"), lit(":"), col("p"))), lit("\"")),
      struct(col("schema"), col("p")))

    // Country facet entries carry the exact occurrence count AND the
    // portable-HLL sketched DISTINCT-entity estimate (round-15 brief:
    // the 100 TB statistics.json — the exact count's (country, id)
    // shuffle grows with the corpus while the p=8 registers are O(256)
    // per country and mergeable across shards/days; q320 gates the
    // sketch against its exact truth standalone, this document ships
    // it). est_distinct renders as fixed-point DECIMAL(18,6) — the
    // fill_rate rule — so the document bytes stay engine-independent.
    def countryFacet(df: DataFrame, name: String) = {
      val pairs = df.select(col("id"), explode(col("countries")).as("code"))
      val cnt = pairs.groupBy(col("code")).agg(count(lit(1)).as("cnt"))
      val est = Hll.groupDistinct(pairs, col("code"), col("id"), p = 8)
        .select(col("grp").as("code"), col("est_distinct"))
      fragment(cnt.join(est, "code"),
        name,
        concat(lit("{\"code\":\""), jesc(col("code")),
          lit("\",\"count\":"), col("cnt"),
          lit(",\"label\":\""), jesc(col("code")),
          lit("\",\"est_distinct\":"),
          col("est_distinct").cast("decimal(18,6)").cast("string"),
          lit("}")),
        byCountDesc(col("cnt"), col("code")))
    }
    val thingCountries = countryFacet(e.filter(col("is_thing")), "things_countries_json")
    val targetCountries = countryFacet(e.filter(col("is_target")), "targets_countries_json")

    val programCounts = e.filter(col("schema") === "Sanction")
      .select(explode(coalesce(element_at(props, "programId"),
        array().cast("array<string>"))).as("pid"))
      .groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
    val programs = programRegistry match {
      case None =>
        fragment(programCounts, "programs_json",
          concat(lit("{\"id\":\""), jesc(col("pid")),
            lit("\",\"count\":"), col("cnt"), lit("}")),
          struct(col("pid")))
      case Some(reg) =>
        fragment(
          programCounts.join(
            broadcast(reg.select(col("program_key").as("pid"),
              col("title").as("_title"))),
            Seq("pid"), "left"),
          "programs_json",
          concat(lit("{\"id\":\""), jesc(col("pid")),
            lit("\",\"count\":"), col("cnt"), lit(",\"title\":"),
            when(col("_title").isNotNull,
              concat(lit("\""), jesc(col("_title")), lit("\"")))
              .otherwise(lit("null")),
            lit("}")),
          struct(col("pid")))
    }

    val withProp = e.select(col("schema"), explode(map_keys(props)).as("p"))
      .groupBy(col("schema"), col("p")).agg(count(lit(1)).as("cnt"))
      .join(schemaCounts.withColumnRenamed("cnt", "total"), "schema")
    val entitiesWithProp = fragment(withProp, "entities_with_prop_json",
      concat(lit("{\"schema\":\""), jesc(col("schema")),
        lit("\",\"property\":\""), jesc(col("p")),
        lit("\",\"count\":"), col("cnt"),
        lit(",\"total\":"), col("total"),
        lit(",\"fill_rate\":"),
        (col("cnt").cast("double") / col("total").cast("double"))
          .cast("decimal(8,6)").cast("string"), lit("}")),
      struct(col("schema"), col("p")))

    val doc = totals
      .crossJoin(schemataList).crossJoin(qnames)
      .crossJoin(targetCountries).crossJoin(targetSchemata)
      .crossJoin(programs)
      .crossJoin(thingCountries).crossJoin(thingSchemata)
      .crossJoin(entitiesWithProp)
      .select(concat(
        lit("{\"last_change\":"),
        when(col("last_change").isNotNull,
          concat(lit("\""), jesc(col("last_change")), lit("\""))).otherwise(lit("null")),
        lit(",\"schemata\":["), col("schemata_json"),
        lit("],\"properties\":["), col("properties_json"),
        lit("],\"entity_count\":"), col("entity_count"),
        lit(",\"target_count\":"), col("target_count"),
        lit(",\"targets\":{\"total\":"), col("target_count"),
        lit(",\"countries\":["), col("targets_countries_json"),
        lit("],\"schemata\":["), col("targets_schemata_json"),
        lit("]},\"sanctions\":{\"programs\":["), col("programs_json"),
        lit("]},\"things\":{\"total\":"), col("thing_count"),
        lit(",\"countries\":["), col("things_countries_json"),
        lit("],\"schemata\":["), col("things_schemata_json"),
        lit("],\"entities_with_prop\":["), col("entities_with_prop_json"),
        lit("]}}")).as("json"))
    // the product is ONE document line: evaluate it eagerly so the
    // shared scan cache can be released here instead of leaking into
    // the caller's session (every fragment above is a distributed agg;
    // only the final one-row assembly lands on the driver)
    val line = doc.first().getString(0)
    e.unpersist(blocking = false)
    val spark = entities.sparkSession
    import spark.implicits._
    Seq(line).toDF("json")
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
