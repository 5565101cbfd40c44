package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Consolidated export products (K1 ftm.json, K3 targets.simple.csv,
  * K4 targets.nested.json, K6 senzing.json, K7 securities.csv,
  * K8 maritime.csv) as plans over ONE cached entity frame — the Spark
  * shape of the reference's single-pass multi-sink export
  * (zavod/zavod/exporters/__init__.py:49-84): Catalyst prunes each
  * sink's columns; adjacency is the shared edge frame, not per-entity
  * point lookups.
  *
  * JSON products are emitted via explicit string construction (sorted
  * keys, minimal escaping) rather than `to_json` so output bytes are
  * deterministic across engines and runs — the reference pins orjson
  * formatting for the same reason (zavod/zavod/util.py:59-72).
  */
object Exporters {

  /** JSON string escape for values: backslash, quote, and all control
    * characters (RFC 8259 §7 — the reference pins orjson, which escapes
    * them too). \n/\r/\t/\b/\f get their short escapes; the remaining
    * U+0000–U+001F are stripped (they never occur in whitespace-squashed
    * property values; stripping keeps the JSONL framing safe even if one
    * slips through upstream). */
  private def jesc(c: Column): Column = {
    val base = regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")
    val named = Seq(
      "\\n" -> "\\\\n", "\\r" -> "\\\\r", "\\t" -> "\\\\t",
      "\\x08" -> "\\\\b", "\\x0c" -> "\\\\f")
      .foldLeft(base) { case (acc, (pat, rep)) => regexp_replace(acc, pat, rep) }
    regexp_replace(named, "[\\x00-\\x1f]", "")
  }

  private def jarr(values: Column): Column =
    concat(lit("["), array_join(transform(values, v =>
      concat(lit("\""), jesc(v), lit("\""))), ","), lit("]"))

  /** K1: one FtM JSON line per entity — {"id","schema","properties"}
    * with keys sorted and property values sorted (exporters/ftm.py:7-21;
    * value-set determinism per consolidate.py). `properties` is
    * map<string, array<string>>. */
  def ftmJsonLine(id: Column, schema: Column, properties: Column): Column = {
    val entries = transform(
      array_sort(map_entries(properties)),
      e => concat(lit("\""), jesc(e.getField("key")), lit("\":"),
        jarr(array_sort(e.getField("value")))))
    concat(lit("{\"id\":\""), jesc(id),
      lit("\",\"schema\":\""), jesc(schema),
      lit("\",\"properties\":{"), array_join(entries, ","), lit("}}"))
  }

  /** K3 cell: sorted ';'-joined distinct values
    * (exporters/simplecsv.py:36-45). */
  def concatCell(values: Column): Column =
    array_join(array_sort(array_distinct(values)), ";")

  /** K3 sanction text: ' - '-joined program/reason/status/start/end
    * (simplecsv.py:48-57); null parts skipped. */
  def sanctionText(props: Column): Column =
    array_join(flatten(filter(array(
      element_at(props, "program"),
      element_at(props, "reason"),
      element_at(props, "status"),
      element_at(props, "startDate"),
      element_at(props, "endDate")), a => a.isNotNull)), " - ")

  private def propVals(props: Column, name: String): Column =
    coalesce(element_at(props, name), array().cast("array<string>"))

  /** K3: targets.simple.csv — risk-topic targets with rollups of their
    * adjacent Sanction / Address / Identification entities
    * (simplecsv.py:66-115). `entities` is the assembled entity frame;
    * adjacency is recomputed from it. Output one row per target with
    * sorted ';'-concatenated cells. */
  def simpleCsv(entities: DataFrame): DataFrame = {
    val targets = entities.filter(
      arrays_overlap(propVals(col("properties"), "topics"),
        lit(graft.model.FtmModel.riskTopics.toSeq.sorted.toArray)))
    // ONE pass over the adjacency frame: per-schema rollups as
    // conditional aggregates (collect_* skip the null non-matches), so
    // the edge frame is scanned and shuffled once, not once per rollup.
    val adj = Adjacency.adjacent(entities)
    val rollups = adj.groupBy(col("id")).agg(
      collect_set(when(col("other_schema") === "Sanction",
        sanctionText(col("other_properties")))).as("sanction_texts"),
      collect_set(when(col("other_schema") === "Address",
        try_element_at(element_at(col("other_properties"), "full"), lit(1))))
        .as("adj_addresses"),
      flatten(collect_list(when(col("other_schema") === "Identification",
        propVals(col("other_properties"), "number")))).as("adj_numbers"),
      flatten(collect_list(when(col("other_schema") === "Identification",
        propVals(col("other_properties"), "country")))).as("adj_countries"))

    targets
      .join(rollups, Seq("id"), "left")
      .select(
        col("id"), col("schema"),
        try_element_at(propVals(col("properties"), "name"), lit(1)).as("name"),
        concatCell(propVals(col("properties"), "birthDate")).as("birth_date"),
        concatCell(concat(propVals(col("properties"), "country"),
          coalesce(col("adj_countries"), array()))).as("countries"),
        concatCell(concat(propVals(col("properties"), "address"),
          coalesce(col("adj_addresses"), array()))).as("addresses"),
        // identifiers exclude program ids (simplecsv.py:70-72 — T3)
        concatCell(array_except(
          concat(propVals(col("properties"), "registrationNumber"),
            coalesce(col("adj_numbers"), array())),
          propVals(col("properties"), "programId"))).as("identifiers"),
        concatCell(coalesce(col("sanction_texts"), array())).as("sanctions"),
        concatCell(propVals(col("properties"), "programId")).as("program_ids"))
  }

  /** K4: targets.nested.json support — depth-1 adjacency per target
    * (nested.py:6-22, entity.py:174-198): both directions, and edge-
    * schema adjacents pull in their far endpoint (edges don't consume
    * depth). Returns (id, adjacent_ids sorted array). */
  def nestedAdjacency(entities: DataFrame): DataFrame = {
    val adj = Adjacency.adjacent(entities)
      .select(col("id"), col("other_id"), col("other_schema"))
    val edgeSchemas = graft.model.FtmModel.schemata.values
      .filter(_.isEdge).map(_.name).toSeq
    // far endpoints of adjacent edge entities: the edge's other refs
    val edgeAdj = adj.filter(col("other_schema").isin(edgeSchemas: _*))
    val edges = Adjacency.refEdges(entities)
      .select(col("src_id"), col("dst_id"))
    val far = edgeAdj.join(edges, col("other_id") === col("src_id"))
      .filter(col("dst_id") =!= col("id"))
      .select(col("id"), col("dst_id").as("other_id"))
    adj.select(col("id"), col("other_id"))
      .unionByName(far)
      .groupBy(col("id"))
      .agg(array_sort(array_distinct(collect_list(col("other_id")))).as("adjacent_ids"))
  }

  /** K4: the nested JSON line itself — the target entity with its
    * depth-1 adjacents inlined under "adjacent" (sorted by id), each as
    * a compact {"id","schema"} ref plus its own properties
    * (nested.py:6-22 + entity.py:174-198). Deterministic bytes like
    * [[ftmJsonLine]]. */
  def nestedJsonLines(entities: DataFrame): DataFrame = {
    val adj = Adjacency.adjacent(entities)
      .select(col("id"),
        concat(lit("{\"id\":\""), jesc(col("other_id")),
          lit("\",\"schema\":\""), jesc(col("other_schema")), lit("\"}"))
          .as("adj_json"))
      .groupBy(col("id"))
      .agg(array_sort(collect_set(col("adj_json"))).as("adj_jsons"))
    entities.join(adj, Seq("id"), "left")
      .select(col("id"),
        concat(
          lit("{\"entity\":"),
          ftmJsonLine(col("id"), col("schema"), col("properties")),
          lit(",\"adjacent\":["),
          array_join(coalesce(col("adj_jsons"), array().cast("array<string>")), ","),
          lit("]}")).as("json"))
  }

  /** K6 (full record): the senzing JSON line with NAMES / IDENTIFIERS
    * arrays assembled from the shaped columns (senzing.py:106-160). */
  def senzingJsonLines(entities: DataFrame, dataSource: String): DataFrame =
    senzing(entities).select(col("record_id"),
      concat(
        lit(s"""{"DATA_SOURCE":"$dataSource","RECORD_ID":""""),
        jesc(col("record_id")),
        lit("\",\"RECORD_TYPE\":\""), col("record_type"), lit("\""),
        when(col("gender").isNotNull,
          concat(lit(",\"GENDER\":\""), col("gender"), lit("\"")))
          .otherwise(lit("")),
        when(length(col("identifiers")) > 0,
          concat(lit(",\"IDENTIFIERS\":"),
            jarr(split(col("identifiers"), ";"))))
          .otherwise(lit("")),
        lit("}")).as("json"))

  /** K6: senzing.json core — record typing by schema lattice, name
    * dedup by normalized hash, gender mapping
    * (exporters/senzing.py:78-160). Output one row per matchable
    * entity: (record_id, record_type, gender, n_names, identifiers). */
  def senzing(entities: DataFrame): DataFrame = {
    import graft.model.FtmModel
    val persons = FtmModel.descendants("Person").toSeq.sorted
    val orgs = FtmModel.descendants("Organization").toSeq.sorted
    val vessels = FtmModel.descendants("Vessel").toSeq.sorted
    val planes = FtmModel.descendants("Airplane").toSeq.sorted
    val recordType = when(col("schema").isin(persons: _*), "PERSON")
      .when(col("schema").isin(orgs: _*), "ORGANIZATION")
      .when(col("schema").isin(planes: _*), "AIRCRAFT")
      .when(col("schema").isin(vessels: _*), "VESSEL")
    val norm = (c: Column) => regexp_replace(lower(c), "[^a-z0-9]", "")
    val caption = try_element_at(propVals(col("properties"), "name"), lit(1))
    val aliases = propVals(col("properties"), "alias")
    // names deduped case/punctuation-insensitively against the caption
    // and each other (senzing.py:115-124)
    val distinctNames = array_distinct(transform(
      concat(array(caption), aliases), n => norm(n)))
    val genders = propVals(col("properties"), "gender")
    val gender = when(size(genders) === 1,
      when(try_element_at(genders, lit(1)) === "male", "M")
        .when(try_element_at(genders, lit(1)) === "female", "F"))
    entities
      .withColumn("record_type", recordType)
      .filter(col("record_type").isNotNull)
      .select(
        col("id").as("record_id"), col("record_type"),
        gender.as("gender"),
        size(distinctNames).cast("long").as("n_names"),
        concatCell(concat(
          propVals(col("properties"), "registrationNumber"),
          propVals(col("properties"), "innCode"))).as("identifiers"))
  }

  /** K7: securities.csv — sanctioned organizations with LEI/ISIN
    * rollups; ISINs come from the entity itself plus inverted-adjacent
    * Security entities (securities.py:82-154). */
  def securities(entities: DataFrame): DataFrame = {
    import graft.model.FtmModel
    val orgs = FtmModel.descendants("Organization").toSeq.sorted
    val secIsins = Adjacency.inverted(entities)
      .filter(col("ref_schema") === "Security")
      .groupBy(col("id"))
      .agg(flatten(collect_list(propVals(col("ref_properties"), "isin"))).as("sec_isins"))
    entities
      .filter(col("schema").isin(orgs: _*))
      .filter(array_contains(propVals(col("properties"), "topics"), "sanction"))
      .join(secIsins, Seq("id"), "left")
      .select(
        col("id"),
        try_element_at(propVals(col("properties"), "name"), lit(1)).as("caption"),
        concatCell(propVals(col("properties"), "leiCode")).as("leis"),
        concatCell(concat(propVals(col("properties"), "isinCode"),
          coalesce(col("sec_isins"), array()))).as("isins"),
        concatCell(propVals(col("properties"), "country")).as("countries"))
  }

  /** K10 (full product): entities.delta.json lines — the versioned diff
    * joined back to the current entities, emitted as
    * {"op":"ADD|MOD|DEL","entity":{...}} (exporters/delta.py:11-55).
    * DEL ops carry the previous version's entity. `diff` is
    * Delta.diff's (id, op); both entity frames are (id, schema,
    * properties). */
  def deltaJsonLines(
      diff: DataFrame, current: DataFrame, previous: DataFrame): DataFrame = {
    val currJson = current.select(col("id"),
      ftmJsonLine(col("id"), col("schema"), col("properties")).as("curr_json"))
    val prevJson = previous.select(col("id"),
      ftmJsonLine(col("id"), col("schema"), col("properties")).as("prev_json"))
    diff.join(currJson, Seq("id"), "left")
      .join(prevJson, Seq("id"), "left")
      .select(col("id"), col("op"),
        concat(lit("{\"op\":\""), col("op"), lit("\",\"entity\":"),
          when(col("op") === Delta.OpDel, col("prev_json"))
            .otherwise(col("curr_json")),
          lit("}")).as("json"))
  }

  /** K11: index/catalog.json — per-dataset metadata over the statement
    * frame (zavod/zavod/exporters/metadata/__init__.py:30-264): entity
    * and statement counts, the distinct schema list, and the newest
    * last_seen, emitted both as columns and as one deterministic JSON
    * line per dataset. */
  def catalog(statements: DataFrame): DataFrame =
    statements.groupBy(col("dataset"))
      .agg(
        countDistinct(coalesce(col("canonicalId"), col("entityId"))).as("n_entities"),
        count(lit(1)).as("n_statements"),
        array_sort(collect_set(col("schema"))).as("schemata"),
        max(date_format(col("lastSeen"), "yyyy-MM-dd")).as("last_change"))
      .select(col("dataset"), col("n_entities"), col("n_statements"),
        array_join(col("schemata"), ";").as("schemata"),
        col("last_change"),
        concat(lit("{\"name\":\""), jesc(col("dataset")),
          lit("\",\"entity_count\":"), col("n_entities").cast("string"),
          lit(",\"statement_count\":"), col("n_statements").cast("string"),
          lit(",\"schemata\":"), jarr(col("schemata")),
          lit(",\"last_change\":\""), col("last_change"), lit("\"}")).as("json"))

  /** K8: maritime.csv — one row per IMO number of vessels and IMO-
    * registered organizations; vessels without an IMO keep one empty-IMO
    * row (maritime.py:41-103). */
  def maritime(entities: DataFrame): DataFrame = {
    import graft.model.FtmModel
    val vessels = FtmModel.descendants("Vessel").toSeq.sorted
    val hasImoProp = FtmModel.schemata.keys
      .filter(s => FtmModel.allProps(s).contains("imoNumber")).toSeq.sorted
    val risks = lit(FtmModel.riskTopics.toSeq.sorted.toArray)
    entities
      .filter(col("schema").isin(hasImoProp: _*))
      .withColumn("row_type",
        when(col("schema").isin(vessels: _*), "VESSEL").otherwise("ORGANIZATION"))
      .withColumn("imos", propVals(col("properties"), "imoNumber"))
      // vessels with no IMO still get a row; orgs without IMO are dropped
      .filter(col("row_type") === "VESSEL" || size(col("imos")) > 0)
      .withColumn("imo", explode(when(size(col("imos")) > 0, col("imos"))
        .otherwise(array(lit("")))))
      .select(
        col("row_type"),
        try_element_at(propVals(col("properties"), "name"), lit(1)).as("caption"),
        col("imo"),
        concatCell(array_intersect(propVals(col("properties"), "topics"), risks))
          .as("risk_topics"),
        concatCell(propVals(col("properties"), "flag")).as("flags"),
        concatCell(propVals(col("properties"), "mmsi")).as("mmsis"),
        col("id"))
  }
}
