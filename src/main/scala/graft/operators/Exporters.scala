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
  private[operators] def jesc(c: Column): Column = {
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

  /** All values of the model-wide props with the given names. */
  private def typedVals(props: Column, names: Seq[String]): Column =
    flatten(transform(
      filter(map_entries(props), e => e.getField("key").isin(names: _*)),
      e => e.getField("value")))

  /** K3: targets.simple.csv — risk-topic targets with the reference's
    * full 16-column header (simplecsv.py:17-35,66-115): id, schema,
    * name, aliases (name-type values minus the caption), birth_date,
    * countries (country-type values + adjacent Identification
    * countries), addresses (own + adjacent Address captions),
    * identifiers (identifier-type values + adjacent Identification
    * numbers, minus program ids), sanctions (adjacent Sanction texts),
    * phones, emails, program_ids, dataset, first_seen, last_seen,
    * last_change. The provenance columns read optional `datasets`
    * (array) / `first_seen` / `last_seen` / `last_change` columns on
    * the entity frame and default to empty when absent. */
  def simpleCsv(entities: DataFrame): DataFrame = {
    import graft.model.FtmModel
    import FtmModel.PropType
    def propsOf(t: PropType): Seq[String] =
      FtmModel.schemata.values.flatMap(_.props).filter(_.ptype == t)
        .map(_.name).toSet.toSeq.sorted
    val nameProps = propsOf(PropType.Name)
    val countryProps = propsOf(PropType.Country)
    val identProps = propsOf(PropType.Identifier)
    val idents = FtmModel.descendants("Identification").toSeq.sorted
    val addrs = FtmModel.descendants("Address").toSeq.sorted

    val targets = entities.filter(
      arrays_overlap(propVals(col("properties"), "topics"),
        lit(FtmModel.riskTopics.toSeq.sorted.toArray)))
    // ONE pass over the adjacency frame: per-schema rollups as
    // conditional aggregates (collect_* skip the null non-matches), so
    // the edge frame is scanned and shuffled once, not once per rollup.
    // The rollup is salted two-phase (Skew.saltedArrayRollup): a hub
    // entity with millions of adjacents spreads over the salt buckets
    // instead of one straggler reducer.
    val adj = Adjacency.adjacent(entities)
    val op = col("other_properties")
    val rollups = Skew.saltedArrayRollup(adj, "id", col("other_id"), Seq(
      "sanction_texts" -> collect_set(when(col("other_schema") === "Sanction",
        sanctionText(op))),
      "adj_addresses" -> collect_set(when(col("other_schema").isin(addrs: _*),
        coalesce(try_element_at(element_at(op, "full"), lit(1)),
          try_element_at(element_at(op, "name"), lit(1))))),
      "adj_numbers" -> flatten(collect_list(when(col("other_schema").isin(idents: _*),
        propVals(op, "number")))),
      "adj_countries" -> flatten(collect_list(when(col("other_schema").isin(idents: _*),
        propVals(op, "country"))))))

    def opt(name: String): Column =
      if (entities.columns.contains(name)) coalesce(col(name), lit("")) else lit("")
    val datasetCell =
      if (entities.columns.contains("datasets")) concatCell(coalesce(col("datasets"), array()))
      else lit("")
    val props = col("properties")
    val caption = coalesce(try_element_at(propVals(props, "name"), lit(1)), col("schema"))
    targets
      .join(rollups, Seq("id"), "left")
      .select(
        col("id"), col("schema"),
        caption.as("name"),
        concatCell(array_remove(typedVals(props, nameProps), caption)).as("aliases"),
        concatCell(propVals(props, "birthDate")).as("birth_date"),
        concatCell(concat(typedVals(props, countryProps),
          coalesce(col("adj_countries"), array()))).as("countries"),
        concatCell(concat(propVals(props, "address"),
          coalesce(col("adj_addresses"), array()))).as("addresses"),
        // identifiers exclude program ids (simplecsv.py:70-72 — T3)
        concatCell(array_except(
          concat(typedVals(props, identProps),
            coalesce(col("adj_numbers"), array())),
          propVals(props, "programId"))).as("identifiers"),
        concatCell(coalesce(col("sanction_texts"), array())).as("sanctions"),
        concatCell(typedVals(props, Seq("phone"))).as("phones"),
        concatCell(typedVals(props, Seq("email"))).as("emails"),
        concatCell(propVals(props, "programId")).as("program_ids"),
        datasetCell.as("dataset"),
        opt("first_seen").as("first_seen"),
        opt("last_seen").as("last_seen"),
        opt("last_change").as("last_change"))
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
    val all = adj.select(col("id"), col("other_id")).unionByName(far)
    // salted rollup (hub-entity armor); merge order normalized by sort
    Skew.saltedArrayRollup(all, "id", col("other_id"),
        Seq("adjacent_ids" -> collect_set(col("other_id"))))
      .select(col("id"), array_sort(col("adjacent_ids")).as("adjacent_ids"))
  }

  /** K4: the nested JSON line itself — the target entity with its
    * depth-1 adjacents inlined under "adjacent" (sorted by id), each as
    * a compact {"id","schema"} ref plus its own properties
    * (nested.py:6-22 + entity.py:174-198). Deterministic bytes like
    * [[ftmJsonLine]]. */
  def nestedJsonLines(entities: DataFrame): DataFrame = {
    val adjRows = Adjacency.adjacent(entities)
      .select(col("id"), col("other_id"),
        concat(lit("{\"id\":\""), jesc(col("other_id")),
          lit("\",\"schema\":\""), jesc(col("other_schema")), lit("\"}"))
          .as("adj_json"))
    val adj = Skew.saltedArrayRollup(adjRows, "id", col("other_id"),
        Seq("adj_jsons" -> collect_set(col("adj_json"))))
      .select(col("id"), array_sort(col("adj_jsons")).as("adj_jsons"))
    entities.join(adj, Seq("id"), "left")
      .select(col("id"),
        concat(
          lit("{\"entity\":"),
          ftmJsonLine(col("id"), col("schema"), col("properties")),
          lit(",\"adjacent\":["),
          array_join(coalesce(col("adj_jsons"), array().cast("array<string>")), ","),
          lit("]}")).as("json"))
  }

  /** K4 (full fidelity): targets.nested.json exactly as the reference's
    * `to_nested_dict(view, depth=1)` (entity.py:174-198, nested.py):
    * each TARGET entity's FtM dict with its `properties` updated so
    * every adjacency-reached prop (forward entity-ref props AND the
    * inverted referring props, e.g. a Sanction's `entity`) maps to the
    * FULL dicts of the adjacent entities instead of id strings; edge
    * adjacents don't consume depth — the edge's dict nests its far
    * endpoints' full dicts (the path rule excludes the origin entity).
    * Keys and value arrays are sorted for deterministic bytes (the
    * reference inherits dict insertion order). */
  def nestedTargetJsonLines(entities: DataFrame): DataFrame = {
    import graft.model.FtmModel
    val edgeDefs = FtmModel.schemata.values.filter(_.isEdge).toSeq.sortBy(_.name)
    val edgeSchemas = edgeDefs.map(_.name)
    val targets = entities.filter(
      arrays_overlap(propVals(col("properties"), "topics"),
        lit(FtmModel.riskTopics.toSeq.sorted.toArray)))

    val entJson = entities.select(col("id").as("j_id"),
      ftmJsonLine(col("id"), col("schema"), col("properties")).as("full_json"))
    val adj = Adjacency.adjacent(entities)

    // non-edge adjacents: value = the adjacent's full dict
    val plain = adj.filter(!col("other_schema").isin(edgeSchemas: _*))
      .join(entJson, col("other_id") === col("j_id"))
      .select(col("id"), col("prop"), col("full_json").as("value_json"))

    // edge adjacents: the edge dict nests its far endpoints (path rule:
    // the origin entity is excluded), other props stay string arrays
    val edgeAdj = adj.filter(col("other_schema").isin(edgeSchemas: _*))
      .select(col("id"), col("prop"), col("other_id"), col("other_schema"),
        col("other_properties"))
    val farRefs = Adjacency.refEdges(entities)
      .select(col("src_id").as("e_id"), col("prop").as("e_prop"),
        col("dst_id").as("far_id"))
    val farJson = edgeAdj
      .join(farRefs, col("other_id") === col("e_id") && col("far_id") =!= col("id"))
      .join(entJson, col("far_id") === col("j_id"))
      .groupBy(col("id"), col("prop"), col("other_id"), col("e_prop"))
      .agg(sort_array(collect_set(col("full_json"))).as("far_jsons"))
      .groupBy(col("id"), col("prop"), col("other_id"))
      .agg(map_from_entries(collect_list(
        struct(col("e_prop"), concat(lit("["),
          array_join(col("far_jsons"), ","), lit("]"))))).as("far_map"))
    val edgeValues = edgeAdj
      .join(farJson, Seq("id", "prop", "other_id"), "left")
      .select(col("id"), col("prop"),
        nestedPropsJson(col("other_id"), col("other_schema"),
          col("other_properties"), col("far_map")).as("value_json"))

    // per (target, prop): sorted array of nested dicts. Two-level
    // aggregation — (id, prop) partials first — spreads a hub entity's
    // rows across its props before the per-id merge.
    val nested = plain.unionByName(edgeValues)
      .groupBy(col("id"), col("prop"))
      .agg(sort_array(collect_set(col("value_json"))).as("vjsons"))
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(struct(col("prop"),
        concat(lit("["), array_join(col("vjsons"), ","), lit("]")))))
        .as("nested"))

    targets.join(nested, Seq("id"), "left")
      .select(col("id"),
        nestedPropsJson(col("id"), col("schema"), col("properties"),
          col("nested")).as("json"))
  }

  /** The FtM dict with `properties` merged against an override map
    * (prop → pre-rendered JSON array string): override keys win,
    * remaining props render as sorted string arrays; key order sorted. */
  private def nestedPropsJson(
      id: Column, schema: Column, properties: Column, overrides: Column): Column = {
    val ov = coalesce(overrides, map().cast("map<string,string>"))
    val keys = array_sort(array_distinct(concat(map_keys(properties), map_keys(ov))))
    val entries = transform(keys, k => concat(
      lit("\""), jesc(k), lit("\":"),
      coalesce(element_at(ov, k),
        jarr(array_sort(coalesce(element_at(properties, k),
          array().cast("array<string>")))))))
    concat(lit("{\"id\":\""), jesc(id),
      lit("\",\"schema\":\""), jesc(schema),
      lit("\",\"properties\":{"), array_join(entries, ","), lit("}}"))
  }

  /** Senzing attribute-cell helpers: each family is an array of
    * "ATTR=value" (or "ATTR=value|second") entries; [[senzing]] joins
    * them into sorted ';' cells for the relational/oracle surface and
    * [[senzingJsonLines]] renders them as the typed JSON record. */
  private def snorm(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9_]", "")

  private def tag(attr: String, vals: Column): Column =
    transform(filter(vals, v => v.isNotNull), v => concat(lit(attr + "="), v))

  private def tagc(attr: Column, vals: Column): Column =
    transform(filter(vals, v => v.isNotNull), v => concat(attr, lit("="), v))

  /** K6: senzing.json shaped record — one row per matchable non-Address
    * entity with every attribute family of the reference record
    * (exporters/senzing.py:78-273): typed PRIMARY/ALIAS NAMES with
    * normalized-hash dedup, GENDER, RISKS (topics), ADDRESSES (own +
    * birthPlace + adjacent Address entities, hash-deduped), DATES,
    * typed COUNTRIES, CONTACTS, IDENTIFIERS (typed props, adjacent
    * Identification/Passport, remaining identifier statements with
    * OTHER_ID fallback + OFAC url extraction + WIKIDATA trusted id +
    * the domain record id), SOURCE_LINKS and RELATIONSHIPS (edge-schema
    * adjacents as REL_POINTER/REL_ANCHOR). Families are deterministic
    * sorted cells; [[senzingJsonLines]] renders the JSON product.
    *
    * `entities` may carry an optional `last_change` string column
    * (exported as LAST_CHANGE). */
  def senzing(entities: DataFrame, domain: String = "OPEN_SANCTIONS"): DataFrame = {
    import graft.model.FtmModel
    val persons = FtmModel.descendants("Person").toSeq.sorted
    val orgs = FtmModel.descendants("Organization").toSeq.sorted
    val vessels = FtmModel.descendants("Vessel").toSeq.sorted
    val planes = FtmModel.descendants("Airplane").toSeq.sorted
    val addrSchemas = FtmModel.descendants("Address")
    val matchable = (FtmModel.matchableSchemata -- addrSchemas).toSeq.sorted
    val orgLike = (orgs ++ vessels ++ planes).distinct.sorted

    val props = col("properties")
    val recordType = when(col("schema").isin(persons: _*), "PERSON")
      .when(col("schema").isin(orgs: _*), "ORGANIZATION")
      .when(col("schema").isin(planes: _*), "AIRCRAFT")
      .when(col("schema").isin(vessels: _*), "VESSEL")
    val isOrg = col("schema").isin(orgLike: _*)

    // ---- adjacency rollups: one pass over the shared edge frame ----
    def fp(p: Column, name: String): Column =
      try_element_at(element_at(p, name), lit(1))
    val adj = Adjacency.adjacent(entities)
    val op = col("other_properties")
    // edge-schema relationship entries (senzing.py:184-201)
    val edgeDefs = FtmModel.schemata.values.filter(_.isEdge).toSeq.sortBy(_.name)
    val noArr = lit(null).cast("array<string>")
    val srcVals = edgeDefs.foldLeft(noArr)((acc, sd) =>
      when(col("other_schema") === sd.name, element_at(op, sd.edgeSource.get)).otherwise(acc))
    val dstVals = edgeDefs.foldLeft(noArr)((acc, sd) =>
      when(col("other_schema") === sd.name, element_at(op, sd.edgeTarget.get)).otherwise(acc))
    val relRole = coalesce(fp(op, "role"), fp(op, "relationship"),
      fp(op, "name"), col("other_schema"))
    val empty = array().cast("array<string>")
    val relEntries = concat(
      when(srcVals.isNotNull && array_contains(srcVals, col("id")),
        transform(coalesce(dstVals, empty),
          t => concat_ws("|", lit("POINTER"), relRole, t))).otherwise(empty),
      when(dstVals.isNotNull && array_contains(dstVals, col("id")),
        array(concat_ws("|", lit("ANCHOR"), col("id")))).otherwise(empty))
    // salted two-phase rollup — hub entities spread over salt buckets
    val adjRoll = Skew.saltedArrayRollup(adj, "id", col("other_id"), Seq(
      "adj_addr" -> collect_set(when(
        col("other_schema").isin(addrSchemas.toSeq.sorted: _*), fp(op, "full"))),
      "adj_natid" -> collect_set(when(col("other_schema") === "Identification",
        struct(fp(op, "number").as("num"), fp(op, "country").as("cc")))),
      "adj_pass" -> collect_set(when(col("other_schema") === "Passport",
        struct(coalesce(fp(op, "passportNumber"), fp(op, "number")).as("num"),
          fp(op, "country").as("cc")))),
      "rels" -> flatten(collect_list(relEntries))))

    // ---- names: PRIMARY caption + ALIAS values, normalized-hash dedup
    // (senzing.py:113-124); caption falls back to the schema label ----
    val caption = coalesce(fp(props, "name"), col("schema"))
    val rawNames = concat(array(caption), propVals(props, "alias"))
    val keptNames = filter(rawNames, (n, i) =>
      i === 0 || (n.isNotNull &&
        !exists(slice(rawNames, lit(1), i), m => snorm(m) === snorm(n))))

    val genders = propVals(props, "gender")
    val gender = when(size(genders) === 1,
      when(try_element_at(genders, lit(1)) === "male", "M")
        .when(try_element_at(genders, lit(1)) === "female", "F"))

    // ---- addresses: own + birthPlace + adjacent, hash-deduped
    // (senzing.py:131,135,165-167,246-268) ----
    val addrRaw = array_sort(array_distinct(concat(
      tag("ADDR_FULL", propVals(props, "address")),
      tag("PLACE_OF_BIRTH", propVals(props, "birthPlace")),
      tag("ADDR_FULL", filter(coalesce(col("adj_addr"), empty), v => v.isNotNull)))))
    val addrCell = filter(addrRaw, (e, i) =>
      !exists(slice(addrRaw, lit(1), i), prior => snorm(prior) === snorm(e)))

    val dates = array_sort(array_distinct(concat(
      tag("DATE_OF_BIRTH", propVals(props, "birthDate")),
      tag("DATE_OF_DEATH", propVals(props, "deathDate")),
      tag("REGISTRATION_DATE", propVals(props, "incorporationDate")))))

    val countries = array_sort(array_distinct(concat(
      tagc(when(isOrg, "COUNTRY_OF_ASSOCIATION").otherwise("NATIONALITY"),
        propVals(props, "country")),
      tag("NATIONALITY", propVals(props, "nationality")),
      tag("CITIZENSHIP", propVals(props, "citizenship")),
      tag("REGISTRATION_COUNTRY", propVals(props, "jurisdiction")))))

    val contacts = array_sort(array_distinct(concat(
      tag("WEBSITE_ADDRESS", propVals(props, "website")),
      tag("EMAIL_ADDRESS", propVals(props, "email")),
      tag("PHONE_NUMBER", propVals(props, "phone")))))

    // ---- identifiers (senzing.py:152-161,169-182,203-236) ----
    val typedIdent = concat(
      tag("PASSPORT_NUMBER", propVals(props, "passportNumber")),
      tag("NATIONAL_ID_NUMBER", concat(
        propVals(props, "idNumber"), propVals(props, "registrationNumber"),
        propVals(props, "ogrnCode"))),
      tag("TAX_ID_NUMBER", concat(
        propVals(props, "taxNumber"), propVals(props, "innCode"),
        propVals(props, "vatCode"))),
      tag("SSN_NUMBER", propVals(props, "socialSecurityNumber")),
      tag("LEI_NUMBER", propVals(props, "leiCode")),
      tag("DUNS_NUMBER", propVals(props, "dunsCode")))
    def pairEntries(attr: String, structs: Column): Column =
      transform(filter(coalesce(structs, lit(null)), s => s.getField("num").isNotNull),
        s => concat(lit(attr + "="), s.getField("num"),
          when(s.getField("cc").isNotNull, concat(lit("|"), s.getField("cc")))
            .otherwise(lit(""))))
    val adjIdent = concat(
      coalesce(pairEntries("NATIONAL_ID_NUMBER", col("adj_natid")), empty),
      coalesce(pairEntries("PASSPORT_NUMBER", col("adj_pass")), empty))
    // values already carried by typed/adjacent entries suppress the
    // statement-level fallback (seen_identifiers — senzing.py:203-217)
    val seenVals = concat(
      transform(typedIdent, e => regexp_replace(e, "^[A-Z_]+=", "")),
      flatten(transform(coalesce(col("adj_natid"), lit(null)),
        s => filter(array(s.getField("num"), s.getField("cc")), v => v.isNotNull))),
      flatten(transform(coalesce(col("adj_pass"), lit(null)),
        s => filter(array(s.getField("num"), s.getField("cc")), v => v.isNotNull))))
    val mappedProps = Set("passportNumber", "idNumber", "registrationNumber",
      "ogrnCode", "taxNumber", "innCode", "vatCode", "socialSecurityNumber",
      "leiCode", "dunsCode")
    val stmtProps = (FtmModel.schemata.values.flatMap(_.props)
      .filter(_.ptype == FtmModel.PropType.Identifier).map(_.name).toSet -- mappedProps)
      .toSeq.sorted
    val specialAttr = Map(
      "imoNumber" -> "IMO_NUMBER", "mmsi" -> "MMSI_NUMBER",
      "callSign" -> "CALL_SIGN", "isin" -> "ISIN_NUMBER",
      "isinCode" -> "ISIN_NUMBER", "npiCode" -> "NPI_NUMBER")
    val stmtStructs = flatten(transform(
      filter(map_entries(props), e => e.getField("key").isin(stmtProps: _*)),
      e => transform(e.getField("value"),
        v => struct(e.getField("key").as("prop"), v.as("v")))))
    val stmtKept = filter(stmtStructs, (s2, i) =>
      !array_contains(coalesce(seenVals, empty), s2.getField("v")) &&
        !exists(slice(stmtStructs, lit(1), i),
          prior => prior.getField("v") === s2.getField("v")))
    val stmtEntries = transform(stmtKept, s2 => concat(
      specialAttr.foldLeft(concat(lit("OTHER_ID:"), s2.getField("prop"), lit("="))) {
        case (acc, (prop, attr)) =>
          when(s2.getField("prop") === prop, lit(attr + "=")).otherwise(acc)
      }, s2.getField("v")))
    val ofacEntries = transform(
      filter(propVals(props, "sourceUrl"),
        v => v.contains(".ofac.treas.gov/Details.aspx?id=")),
      v => concat(lit("OFAC_ID="), regexp_extract(v, "\\?id=(.+)$", 1)))
    val idEntry = when(col("id").rlike("^Q\\d+$"),
        array(concat(lit("TRUSTED:WIKIDATA="), col("id"))))
      .otherwise(array(concat(lit(s"OTHER_ID:$domain="), col("id"))))
    val identifiers = array_sort(array_distinct(concat(
      typedIdent, adjIdent, stmtEntries, ofacEntries, idEntry)))

    val lastChange =
      if (entities.columns.contains("last_change")) col("last_change")
      else lit(null).cast("string")

    entities
      .filter(col("schema").isin(matchable: _*) && col("id").isNotNull)
      .join(adjRoll, Seq("id"), "left")
      .select(
        col("id").as("record_id"),
        recordType.as("record_type"),
        gender.as("gender"),
        lastChange.as("last_change"),
        isOrg.as("is_org"),
        size(keptNames).cast("long").as("n_names"),
        concat(lit("["), array_join(transform(keptNames, (n, i) => concat(
          lit("{\"NAME_TYPE\":\""),
          when(i === 0, lit("PRIMARY")).otherwise(lit("ALIAS")),
          lit("\",\""),
          when(isOrg, lit("NAME_ORG")).otherwise(lit("NAME_FULL")),
          lit("\":\""), jesc(n), lit("\"}"))), ","), lit("]")).as("names_json"),
        array_join(array_sort(array_distinct(propVals(props, "topics"))), ";").as("risks"),
        array_join(addrCell, ";").as("addresses"),
        array_join(dates, ";").as("dates"),
        array_join(countries, ";").as("countries"),
        array_join(contacts, ";").as("contacts"),
        array_join(identifiers, ";").as("identifiers"),
        concatCell(propVals(props, "sourceUrl")).as("source_links"),
        array_join(array_sort(array_distinct(coalesce(col("rels"), empty))), ";")
          .as("relationships"))
  }

  /** K6 (full record): render the shaped senzing columns as the JSON
    * line product (senzing.py feed() output via write_json). Families
    * render from the "ATTR=value[|second]" cell entries; ADDR_TYPE
    * BUSINESS is stamped on organization addresses (senzing.py:243-245). */
  def senzingJsonLines(entities: DataFrame, dataSource: String): DataFrame = {
    // one- or two-attribute object per cell entry
    def entryObj(e: Column): Column = {
      val key = regexp_extract(e, "^([^=]+)=", 1)
      val value = regexp_replace(e, "^[^=]+=", "")
      val first = regexp_extract(value, "^([^|]*)", 1)
      val second = regexp_extract(value, "\\|(.*)$", 1)
      val pairAttr = when(key === "NATIONAL_ID_NUMBER", "NATIONAL_ID_COUNTRY")
        .when(key === "PASSPORT_NUMBER", "PASSPORT_COUNTRY")
      when(key.startsWith("OTHER_ID:"),
        concat(lit("{\"OTHER_ID_TYPE\":\""), jesc(regexp_replace(key, "^OTHER_ID:", "")),
          lit("\",\"OTHER_ID_NUMBER\":\""), jesc(value), lit("\"}")))
        .when(key === "TRUSTED:WIKIDATA",
          concat(lit("{\"TRUSTED_ID_TYPE\":\"WIKIDATA\",\"TRUSTED_ID_NUMBER\":\""),
            jesc(value), lit("\"}")))
        .when(pairAttr.isNotNull && second =!= "",
          concat(lit("{\""), key, lit("\":\""), jesc(first),
            lit("\",\""), pairAttr, lit("\":\""), jesc(second), lit("\"}")))
        .otherwise(concat(lit("{\""), key, lit("\":\""), jesc(value), lit("\"}")))
    }
    def family(name: String, cell: Column, extra: Column = lit("")): Column =
      when(length(cell) > 0, concat(lit(",\"" + name + "\":["),
        array_join(transform(split(cell, ";"),
          e => concat(regexp_replace(entryObj(e), "\\}$", ""), extra, lit("}"))), ","),
        lit("]"))).otherwise(lit(""))
    def relObj(e: Column): Column =
      when(e.startsWith("POINTER|"),
        concat(lit("{\"REL_POINTER_ROLE\":\""),
          jesc(regexp_extract(e, "^POINTER\\|([^|]*)\\|", 1)),
          lit("\",\"REL_POINTER_DOMAIN\":\"" + "OPEN_SANCTIONS" + "\",\"REL_POINTER_KEY\":\""),
          jesc(regexp_extract(e, "^POINTER\\|[^|]*\\|(.*)$", 1)), lit("\"}")))
        .otherwise(concat(lit("{\"REL_ANCHOR_DOMAIN\":\"OPEN_SANCTIONS\",\"REL_ANCHOR_KEY\":\""),
          jesc(regexp_replace(e, "^ANCHOR\\|", "")), lit("\"}")))
    senzing(entities).select(col("record_id"),
      concat(
        lit(s"""{"DATA_SOURCE":"$dataSource","RECORD_ID":""""),
        jesc(col("record_id")), lit("\""),
        when(col("record_type").isNotNull,
          concat(lit(",\"RECORD_TYPE\":\""), col("record_type"), lit("\"")))
          .otherwise(lit("")),
        when(col("last_change").isNotNull,
          concat(lit(",\"LAST_CHANGE\":\""), jesc(col("last_change")), lit("\"")))
          .otherwise(lit("")),
        lit(",\"NAMES\":"), col("names_json"),
        when(col("gender").isNotNull,
          concat(lit(",\"GENDER\":\""), col("gender"), lit("\"")))
          .otherwise(lit("")),
        family("RISKS", when(length(col("risks")) > 0,
          array_join(transform(split(col("risks"), ";"),
            t => concat(lit("TOPIC="), t)), ";")).otherwise(lit(""))),
        family("ADDRESSES", col("addresses"),
          when(col("is_org"), lit(",\"ADDR_TYPE\":\"BUSINESS\"")).otherwise(lit(""))),
        family("DATES", col("dates")),
        family("COUNTRIES", col("countries")),
        family("CONTACTS", col("contacts")),
        family("IDENTIFIERS", col("identifiers")),
        family("SOURCE_LINKS", when(length(col("source_links")) > 0,
          array_join(transform(split(col("source_links"), ";"),
            u => concat(lit("SOURCE_URL="), u)), ";")).otherwise(lit(""))),
        when(length(col("relationships")) > 0,
          concat(lit(",\"RELATIONSHIPS\":["),
            array_join(transform(split(col("relationships"), ";"), relObj(_)), ","),
            lit("]"))).otherwise(lit("")),
        lit("}")).as("json"))
  }

  /** K7: securities.csv — the reference's full 15-column issuer-centric
    * table (securities.py:45-60,112-147): caption, lei, perm_id, isins
    * (own isinCode + inverted-adjacent Security entities), ric,
    * countries, sanctioned/eo_14071/public booleans, id, url, datasets,
    * risk_datasets (datasets minus context datasets), aliases
    * (space-squashed name-type values), referents.
    *
    * Scope: Organization-subtree entities that are sanctioned, or whose
    * `datasets` (optional array column) include the EO-14071 / NBIM
    * source lists (securities.py:115-120). `referents` is an optional
    * array column; `urlBase` prepends the public entity URL when set. */
  def securities(
      entities: DataFrame,
      contextDatasets: Set[String] =
        Set("ru_nsd_isin", "permid", "openfigi", "research", "ext_gleif"),
      urlBase: Option[String] = None): DataFrame = {
    import graft.model.FtmModel
    val orgs = FtmModel.descendants("Organization").toSeq.sorted
    // join_cell (securities.py:70-80): trim, embedded ';' → ',', drop
    // empties, sorted distinct
    def joinCell(vals: Column): Column =
      array_join(array_sort(array_distinct(filter(
        transform(vals, v => regexp_replace(trim(v), ";", ",")),
        v => length(v) > 0))), ";")
    def boolText(c: Column): Column = when(c, "true").otherwise("false")
    val secIsins = Adjacency.inverted(entities)
      .filter(col("ref_schema") === "Security")
      .groupBy(col("id"))
      .agg(flatten(collect_list(propVals(col("ref_properties"), "isin"))).as("sec_isins"))
    val props = col("properties")
    val datasets =
      if (entities.columns.contains("datasets")) coalesce(col("datasets"), array())
      else array().cast("array<string>")
    val referents =
      if (entities.columns.contains("referents")) coalesce(col("referents"), array())
      else array().cast("array<string>")
    val topics = propVals(props, "topics")
    val sanctioned = array_contains(topics, "sanction")
    val eo14071 = array_contains(datasets, "ru_nsd_isin")
    val nbim = array_contains(datasets, "no_nbim_exclusions")
    val caption = coalesce(try_element_at(propVals(props, "name"), lit(1)), col("schema"))
    // matchable name-type values, space-squashed (securities.py:103-109)
    val aliases = transform(
      concat(propVals(props, "name"), propVals(props, "alias")),
      n => regexp_replace(trim(n), "\\s+", " "))
    entities
      .filter(col("schema").isin(orgs: _*))
      .filter(sanctioned || eo14071 || nbim)
      .join(secIsins, Seq("id"), "left")
      .select(
        caption.as("caption"),
        joinCell(propVals(props, "leiCode")).as("lei"),
        joinCell(propVals(props, "permId")).as("perm_id"),
        joinCell(concat(propVals(props, "isinCode"),
          coalesce(col("sec_isins"), array()))).as("isins"),
        joinCell(propVals(props, "ricCode")).as("ric"),
        joinCell(concat(propVals(props, "country"),
          propVals(props, "jurisdiction"))).as("countries"),
        boolText(sanctioned).as("sanctioned"),
        boolText(eo14071).as("eo_14071"),
        boolText(array_contains(topics, "corp.public")).as("public"),
        col("id"),
        urlBase.map(b => concat(lit(b), col("id"), lit("/")).as("url"))
          .getOrElse(lit("").as("url")),
        joinCell(datasets).as("datasets"),
        joinCell(array_except(datasets,
          lit(contextDatasets.toSeq.sorted.toArray))).as("risk_datasets"),
        joinCell(aliases).as("aliases"),
        joinCell(referents).as("referents"))
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

  /** K11 (full document): per-dataset index.json lines — the dataset
    * metadata block the reference assembles in
    * exporters/metadata/__init__.py:30-130: entity/target/thing/
    * statement counts and last_change (the statistics passthrough),
    * issue_levels + issue_count from the issue log, the resource list,
    * version/updated_at/last_export/result run metadata. URL fields are
    * deployment concerns and omitted; key order is fixed (the reference
    * mutates a dict in steps). `issues` is a (dataset, level) frame. */
  def datasetIndexJson(
      statements: DataFrame,
      issues: DataFrame,
      version: String,
      runTime: String,
      resources: Seq[String] = Seq("entities.ftm.json", "names.txt",
        "senzing.json", "statistics.json", "targets.nested.json",
        "targets.simple.csv"),
      result: String = "successful"): DataFrame = {
    import graft.model.FtmModel
    val risks = FtmModel.riskTopics.toSeq.sorted
    val things = FtmModel.descendants("Thing").toSeq.sorted
    val cid = coalesce(col("canonicalId"), col("entityId"))
    val base = statements.groupBy(col("dataset")).agg(
      countDistinct(cid).as("entity_count"),
      countDistinct(when(col("prop") === "topics" &&
        col("value").isin(risks: _*), cid)).as("target_count"),
      countDistinct(when(col("schema").isin(things: _*), cid)).as("thing_count"),
      count(lit(1)).as("statement_count"),
      array_sort(collect_set(col("schema"))).as("schemata"),
      max(date_format(col("lastSeen"), "yyyy-MM-dd")).as("last_change"))
    val issJson = issues.groupBy(col("dataset"), col("level"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("dataset"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("level"), col("n")))),
        x => concat(lit("\""), jesc(x.getField("level")), lit("\":"),
          x.getField("n"))), ",").as("issue_levels_json"),
        sum(col("n")).as("issue_count"))
    val resJson = resources.sorted
      .map(r => s"""{"name":"$r","path":"$r"}""").mkString(",")
    base.join(issJson, Seq("dataset"), "left")
      .select(col("dataset"),
        concat(
          lit("{\"name\":\""), jesc(col("dataset")),
          lit("\",\"entity_count\":"), col("entity_count"),
          lit(",\"target_count\":"), col("target_count"),
          lit(",\"thing_count\":"), col("thing_count"),
          lit(",\"statement_count\":"), col("statement_count"),
          lit(",\"schemata\":"), jarr(col("schemata")),
          lit(",\"last_change\":\""), col("last_change"),
          lit("\",\"issue_levels\":{"),
          coalesce(col("issue_levels_json"), lit("")),
          lit("},\"issue_count\":"), coalesce(col("issue_count"), lit(0L)),
          lit(s""",\"version\":\"$version\",\"updated_at\":\"$runTime\""""),
          lit(s""",\"last_export\":\"$runTime\",\"result\":\"$result\""""),
          lit(s""",\"resources\":[$resJson]}""")).as("json"))
  }

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
