package graft.queries

import graft.operators.{EntityAssembler, Exporters}
import graft.sources.Ingestion
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import Q._

/** The ingestion façade end-to-end (SURVEY §7 step 4's "minimum real
  * query") and the catalog product, oracle-checked: source rows →
  * cleaned statements with deterministic IDs → assembled entities →
  * per-schema counts / per-dataset catalog.
  */
object IngestQueries {

  val decls: Seq[Decl] = Seq(

    // Context.emit analog: customer rows crawled into statements, then
    // assembled; counts by schema verify the whole path (emit → clean →
    // statement ids → columnar assemble).
    decl("q88_ingest_pipeline",
      (s, d) => {
        val c = t(s, d, "customer")
        val k = col("c_custkey")
        val emitted = Ingestion.emit(
          c,
          dataset = "testsrc",
          schema = when(k % 4 === 0, "Company").otherwise("Person"),
          keyParts = Seq(col("c_name")),
          props = Seq(
            Ingestion.PropMapping("name", "name", col("c_name")),
            Ingestion.PropMapping("country", "country",
              concat(lit("Nation_"), col("c_nationkey").cast("string"))),
            Ingestion.PropMapping("birthDate", "date",
              concat(lit("19"), (lit(50) + k % 50).cast("string"),
                lit("-06-15T10:00:00"))),
            // IMO ids: valid only when the checksum happens to hold
            Ingestion.PropMapping("registrationNumber", "identifier",
              concat(lit("IMO "), lpad((k * 37 % 10000000L).cast("string"), 7, "0")),
              idFormat = "imo")),
          runTime = lit("2026-01-01 00:00:00"))
        val stmts = Ingestion.toStatements(emitted)
        val entities = EntityAssembler.assembleColumnar(stmts)
        val bySchema = entities.groupBy(col("schema"))
          .agg(count(lit(1)).as("n_entities"))
        val stmtCounts = stmts.groupBy(col("schema"))
          .agg(count(lit(1)).as("n_statements"))
        bySchema.join(stmtCounts, "schema")
          .select(col("schema"), col("n_entities"), col("n_statements"))
      },
      // The oracle recomputes per-schema entity and statement counts,
      // including the IMO checksum drop (invalid ids emit no statement).
      """WITH c AS (
        |  SELECT c_custkey AS k,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END AS sch,
        |    lpad(((c_custkey * 37) % 10000000)::VARCHAR, 7, '0') AS imo
        |  FROM customer),
        |imo_ok AS (
        |  SELECT k, sch,
        |    ((ascii(substr(imo,1,1))-48)*7 + (ascii(substr(imo,2,1))-48)*6
        |     + (ascii(substr(imo,3,1))-48)*5 + (ascii(substr(imo,4,1))-48)*4
        |     + (ascii(substr(imo,5,1))-48)*3 + (ascii(substr(imo,6,1))-48)*2) % 10
        |      = ascii(substr(imo,7,1))-48 AS ok
        |  FROM c)
        |SELECT sch AS schema, COUNT(*) AS n_entities,
        |  COUNT(*) * 3 + COUNT(*) FILTER (WHERE ok) AS n_statements
        |FROM imo_ok GROUP BY sch""".stripMargin),

    // K11: the per-dataset catalog over a two-dataset statement frame.
    decl("q89_catalog",
      (s, d) => {
        val o = t(s, d, "orders")
        val ok = col("o_orderkey")
        val stmts = o.select(
          md5(ok.cast("string")).as("id"),
          concat(lit("o"), ok.cast("string")).as("entityId"),
          concat(lit("o"), ok.cast("string")).as("canonicalId"),
          lit("status").as("prop"),
          when(ok % 3 === 0, "Person").otherwise("Company").as("schema"),
          col("o_orderstatus").as("value"),
          when(ok % 2 === 0, "ds_even").otherwise("ds_odd").as("dataset"),
          lit("en").as("lang"), lit("crawl").as("origin"),
          col("o_orderstatus").as("originalValue"),
          col("o_orderdate").as("firstSeen"), col("o_orderdate").as("lastSeen"),
          lit(false).as("external"))
        Exporters.catalog(stmts)
      },
      """SELECT dataset, n_entities, n_statements, schemata, last_change,
        |  '{"name":"' || dataset || '","entity_count":' || n_entities::VARCHAR
        |  || ',"statement_count":' || n_statements::VARCHAR
        |  || ',"schemata":["' || replace(schemata, ';', '","') || '"]'
        |  || ',"last_change":"' || last_change || '"}' AS json
        |FROM (
        |  SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'ds_even' ELSE 'ds_odd' END AS dataset,
        |    COUNT(DISTINCT o_orderkey) AS n_entities,
        |    COUNT(*) AS n_statements,
        |    array_to_string(list_sort(list_distinct(
        |      list(CASE WHEN o_orderkey % 3 = 0 THEN 'Person' ELSE 'Company' END))), ';') AS schemata,
        |    max(strftime(o_orderdate, '%Y-%m-%d')) AS last_change
        |  FROM orders GROUP BY 1)""".stripMargin),

    // K2: statements CSV export ROUND-TRIPPED — the query writes the
    // statement frame through StatementIO.exportCsv (BASE rows dropped,
    // header on) into a temp dir, reads the CSV back with the statement
    // schema, and aggregates; the oracle recomputes the aggregate from
    // the source table, so a lossy export (column shift, quoting,
    // BASE leak) breaks the hash match.
    decl("q96_statements_csv_roundtrip",
      (s, d) => {
        import graft.model.Statement
        import s.implicits._
        val sup = t(s, d, "supplier")
        val k = col("s_suppkey")
        val eid = concat(lit("sup"), k.cast("string"))
        val ts = lit("2026-01-01 00:00:00").cast("timestamp")
        def stmt(prop: Column, value: Column) = sup.select(
          md5(concat(prop, lit("|"), eid)).as("id"),
          eid.as("entityId"), eid.as("canonicalId"),
          prop.as("prop"), lit("Company").as("schema"), value.as("value"),
          lit("ds_csv").as("dataset"), lit("en").as("lang"),
          lit("crawl").as("origin"), value.as("originalValue"),
          ts.as("firstSeen"), ts.as("lastSeen"), lit(false).as("external"))
        val stmts = stmt(lit(Statement.Base), eid)
          .unionByName(stmt(lit("name"), col("s_name")))
          .unionByName(stmt(lit("country"),
            concat(lit("Nation_"), col("s_nationkey").cast("string"))))
          .as[Statement]
        // deterministic per-dataset path, pre-deleted (the q282 pattern)
        val dir = "/tmp/graft_k2_" + Q.scratchTag(d)
        val fsH = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fsH.delete(new org.apache.hadoop.fs.Path(dir), true)
        graft.sources.StatementIO.exportCsv(stmts, dir)
        s.read.option("header", "true").csv(dir)
          .groupBy(col("prop"), col("prop_type"))
          .agg(count(lit(1)).as("n_statements"),
            countDistinct(col("entity_id")).as("n_entities"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
      },
      // BASE ('id') rows are dropped by the export; only name/country
      // survive the round-trip, with their model-derived prop types.
      """WITH props AS (
        |  SELECT 'name' AS prop, 'name' AS prop_type, s_name AS value,
        |    'sup' || s_suppkey::VARCHAR AS eid FROM supplier
        |  UNION ALL
        |  SELECT 'country', 'country', 'Nation_' || s_nationkey::VARCHAR,
        |    'sup' || s_suppkey::VARCHAR FROM supplier)
        |SELECT prop, prop_type, COUNT(*) AS n_statements,
        |  COUNT(DISTINCT eid) AS n_entities,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM props GROUP BY prop, prop_type""".stripMargin),

    // A7: name reduction — weak aliases duplicating a strong name
    // case-insensitively are dropped, then case variants are reduced to
    // the best-cased form (consolidate.py:123-170). The oracle
    // re-implements both reductions as DuckDB nested list lambdas.
    decl("q97_name_reduction",
      (s, d) => {
        import graft.operators.Consolidate
        val p = t(s, d, "part")
        val strong = array(col("p_name"))
        val weak = array(upper(col("p_name")), concat(col("p_name"), lit(" alias")))
        val keptWeak = Consolidate.reduceWeakNames(strong, weak)
        val all = concat(array(col("p_name"), upper(col("p_name"))), keptWeak)
        p.select(col("p_partkey").as("id"),
          array_join(array_sort(Consolidate.reduceCaseVariants(all)), ";").as("kept"),
          array_join(array_sort(keptWeak), ";").as("kept_weak"))
      },
      """WITH n AS (
        |  SELECT p_partkey AS id, p_name,
        |    list_filter([upper(p_name), p_name || ' alias'],
        |      w -> lower(w) <> lower(p_name)) AS kept_weak
        |  FROM part),
        |m AS (
        |  SELECT id, kept_weak,
        |    list_concat([p_name, upper(p_name)], kept_weak) AS names
        |  FROM n)
        |SELECT id,
        |  array_to_string(list_sort(list_filter(names, a ->
        |    len(list_filter(names, b ->
        |      lower(b) = lower(a) AND b <> a AND
        |      ((b <> upper(b) AND a = upper(a))
        |       OR ((b <> upper(b)) = (a <> upper(a)) AND b < a)))) = 0)), ';') AS kept,
        |  array_to_string(list_sort(kept_weak), ';') AS kept_weak
        |FROM m""".stripMargin),

    // A9: crawl stats over the emitted (pre-filter) statement stream —
    // entities, statements (non-null values), warnings per dataset
    // (zavod/zavod/runtime/stats.py). Same emit as q88, so the invalid
    // IMO identifiers become the warning count.
    decl("q98_crawl_stats",
      (s, d) => {
        val c = t(s, d, "customer")
        val k = col("c_custkey")
        val emitted = Ingestion.emit(
          c,
          dataset = "testsrc",
          schema = when(k % 4 === 0, "Company").otherwise("Person"),
          keyParts = Seq(col("c_name")),
          props = Seq(
            Ingestion.PropMapping("name", "name", col("c_name")),
            Ingestion.PropMapping("country", "country",
              concat(lit("Nation_"), col("c_nationkey").cast("string"))),
            Ingestion.PropMapping("birthDate", "date",
              concat(lit("19"), (lit(50) + k % 50).cast("string"),
                lit("-06-15T10:00:00"))),
            Ingestion.PropMapping("registrationNumber", "identifier",
              concat(lit("IMO "), lpad((k * 37 % 10000000L).cast("string"), 7, "0")),
              idFormat = "imo")),
          runTime = lit("2026-01-01 00:00:00"))
        Ingestion.crawlStats(emitted)
      },
      """WITH c AS (
        |  SELECT c_custkey AS k,
        |    lpad(((c_custkey * 37) % 10000000)::VARCHAR, 7, '0') AS imo
        |  FROM customer),
        |imo_ok AS (
        |  SELECT k,
        |    ((ascii(substr(imo,1,1))-48)*7 + (ascii(substr(imo,2,1))-48)*6
        |     + (ascii(substr(imo,3,1))-48)*5 + (ascii(substr(imo,4,1))-48)*4
        |     + (ascii(substr(imo,5,1))-48)*3 + (ascii(substr(imo,6,1))-48)*2) % 10
        |      = ascii(substr(imo,7,1))-48 AS ok
        |  FROM c)
        |SELECT 'testsrc' AS dataset, COUNT(*) AS entities,
        |  COUNT(*) * 3 + COUNT(*) FILTER (WHERE ok) AS statements,
        |  COUNT(*) FILTER (WHERE NOT ok) AS warnings
        |FROM imo_ok""".stripMargin),

    // F12: change detection — DOM-structure hash (text stripped, tag
    // skeleton hashed) and full-body hash, plus the unchanged assertion
    // against a pinned skeleton digest (helpers/change.py:14-129).
    // Odd part keys keep the pinned layout; even keys add a <div>.
    decl("q99_change_detection",
      (s, d) => {
        import graft.sources.Sources
        val p = t(s, d, "part")
        val html = concat(lit("<html><body><p>"), col("p_name"), lit("</p>"),
          when(col("p_partkey") % 2 === 0, lit("<div></div>")).otherwise(lit("")),
          lit("</body></html>"))
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val pinned = md.digest("<html><body><p></p></body></html>".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        p.select(col("p_partkey").as("id"),
          Sources.domHash(html).as("dom_hash"),
          Sources.domHashUnchanged(html, pinned).as("layout_unchanged"),
          sha2(html, 256).as("body_hash"))
      },
      """SELECT p_partkey AS id,
        |  CASE WHEN p_partkey % 2 = 0
        |    THEN sha256('<html><body><p></p><div></div></body></html>')
        |    ELSE sha256('<html><body><p></p></body></html>') END AS dom_hash,
        |  p_partkey % 2 <> 0 AS layout_unchanged,
        |  sha256('<html><body><p>' || p_name || '</p>'
        |    || CASE WHEN p_partkey % 2 = 0 THEN '<div></div>' ELSE '' END
        |    || '</body></html>') AS body_hash
        |FROM part""".stripMargin),

    // A7 (protected-source rule): statement-level simplify_names — weak
    // aliases demote case-insensitive matches, case variants reduce, but
    // statements from protected datasets (OFAC et al.) are never removed
    // (consolidate.py:29-46,144-163). Even keys carry a weak alias that
    // demotes the 'wk' name; the ALL-CAPS duplicate from a protected
    // dataset always survives while the unprotected copy is removed.
    decl("q100_protected_name_statements",
      (s, d) => {
        import graft.operators.Consolidate
        val p = t(s, d, "part")
        val k = col("p_partkey")
        val wk = concat(lit("wk"), k.cast("string"))
        val stmts = array(
          struct(col("p_name").as("value"), lit("src_main").as("dataset")),
          struct(upper(col("p_name")).as("value"), lit("us_ofac_sdn").as("dataset")),
          struct(upper(col("p_name")).as("value"), lit("src_dup").as("dataset")),
          struct(wk.as("value"), lit("src_other").as("dataset")))
        val weak = when(k % 2 === 0, array(wk)).otherwise(array().cast("array<string>"))
        val kept = Consolidate.simplifyNameStatements(stmts, weak)
        p.select(k.as("id"),
          array_join(array_sort(transform(kept,
            s2 => concat_ws("|", s2.getField("value"), s2.getField("dataset")))), ";")
            .as("kept"))
      },
      """SELECT p_partkey AS id,
        |  array_to_string(list_sort(
        |    [p_name || '|src_main', upper(p_name) || '|us_ofac_sdn']
        |    || (CASE WHEN p_partkey % 2 = 0 THEN []::VARCHAR[]
        |        ELSE ['wk' || p_partkey::VARCHAR || '|src_other'] END)), ';') AS kept
        |FROM part""".stripMargin),

    // Satellite factories (helpers/vessels.py, helpers/securities.py):
    // make_security's ISIN entity (non-country prefixes carry no
    // country) and the vessel/org IMO id keys — valid IMOs reduce to
    // their 7 digits, invalid ones fall back to a slug so a faulty
    // source IMO still keys a stable entity.
    decl("q108_satellite_factories",
      (s, d) => {
        import graft.sources.Satellites
        val sup = t(s, d, "supplier")
        val sk = col("s_suppkey")
        val isin = concat(when(sk % 6 === 0, "xs").otherwise("de"),
          lpad(sk.cast("string"), 10, "0"))
        val imoRaw = when(sk % 3 === 0,
            concat(lit("IMO "), lpad((sk * 37 % 10000000L).cast("string"), 7, "0")))
          .otherwise(concat(lit("bad imo "), sk.cast("string")))
        val secFrame = Satellites.makeSecurity(sup.select(isin.as("isin")), col("isin"))
          .select(col("id").as("sec_id"),
            try_element_at(element_at(col("properties"), "isin"), lit(1)).as("sec_isin"),
            coalesce(try_element_at(element_at(col("properties"), "country"), lit(1)),
              lit("")).as("sec_country"))
        sup.select(sk.as("k"),
            concat(lit("isin-"), upper(isin)).as("sec_id"),
            Satellites.makeVesselImoId(imoRaw).as("vsl_id"),
            Satellites.makeOrgImoId(imoRaw).as("org_id"))
          .join(secFrame, "sec_id")
      },
      """WITH sup AS (
        |  SELECT s_suppkey AS k,
        |    (CASE WHEN s_suppkey % 6 = 0 THEN 'xs' ELSE 'de' END)
        |      || lpad(s_suppkey::VARCHAR, 10, '0') AS isin,
        |    CASE WHEN s_suppkey % 3 = 0
        |      THEN 'IMO ' || lpad(((s_suppkey * 37) % 10000000)::VARCHAR, 7, '0')
        |      ELSE 'bad imo ' || s_suppkey::VARCHAR END AS imo_raw
        |  FROM supplier),
        |imo AS (
        |  SELECT k, isin, imo_raw,
        |    regexp_replace(upper(imo_raw), '[^0-9]', '', 'g') AS d
        |  FROM sup),
        |keyed AS (
        |  SELECT k, isin, imo_raw,
        |    CASE WHEN strlen(d) = 7 AND
        |      ((ascii(substr(d,1,1))-48)*7 + (ascii(substr(d,2,1))-48)*6
        |       + (ascii(substr(d,3,1))-48)*5 + (ascii(substr(d,4,1))-48)*4
        |       + (ascii(substr(d,5,1))-48)*3 + (ascii(substr(d,6,1))-48)*2) % 10
        |        = ascii(substr(d,7,1))-48
        |      THEN d
        |      ELSE regexp_replace(regexp_replace(lower(trim(imo_raw)),
        |        '[^a-z0-9]+', '-', 'g'), '^-+|-+$', '', 'g') END AS imo_key
        |  FROM imo)
        |SELECT 'isin-' || upper(isin) AS sec_id, k,
        |  'imo-vsl-' || imo_key AS vsl_id,
        |  'imo-org-' || imo_key AS org_id,
        |  upper(isin) AS sec_isin,
        |  CASE WHEN upper(isin) LIKE 'XS%' THEN '' ELSE lower(substr(isin, 1, 2)) END AS sec_country
        |FROM keyed""".stripMargin),

    // K11 (full document): per-dataset index.json with the statistics
    // passthrough (entity/target/thing counts, last_change), issue
    // levels from the issue log, resources and run metadata
    // (exporters/metadata/__init__.py:30-130).
    decl("q104_dataset_index",
      (s, d) => {
        val o = t(s, d, "orders")
        val ok = col("o_orderkey")
        def stmtsOf(rows: org.apache.spark.sql.DataFrame, prop: Column, value: Column) =
          rows.select(
            md5(concat(prop, col("o_orderkey").cast("string"))).as("id"),
            concat(lit("o"), col("o_orderkey").cast("string")).as("entityId"),
            concat(lit("o"), col("o_orderkey").cast("string")).as("canonicalId"),
            prop.as("prop"),
            when(col("o_orderkey") % 3 === 0, "Person").otherwise("Company").as("schema"),
            value.as("value"),
            when(col("o_orderkey") % 2 === 0, "ds_even").otherwise("ds_odd").as("dataset"),
            lit("en").as("lang"), lit("crawl").as("origin"),
            value.as("originalValue"),
            col("o_orderdate").cast("timestamp").as("firstSeen"),
            col("o_orderdate").cast("timestamp").as("lastSeen"),
            lit(false).as("external"))
        val stmts = stmtsOf(o, lit("status"), col("o_orderstatus"))
          .unionByName(stmtsOf(o.filter(ok % 13 === 0), lit("topics"), lit("sanction")))
        val issues = o.filter(ok % 11 === 3).select(
          when(ok % 2 === 0, "ds_even").otherwise("ds_odd").as("dataset"),
          when(ok % 4 === 3, "error").otherwise("warning").as("level"))
        Exporters.datasetIndexJson(stmts, issues,
          version = "v20260101", runTime = "2026-01-01T00:00:00")
      },
      """WITH st AS (
        |  SELECT o_orderkey AS ok,
        |    CASE WHEN o_orderkey % 2 = 0 THEN 'ds_even' ELSE 'ds_odd' END AS ds,
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'Person' ELSE 'Company' END AS sch,
        |    o_orderdate
        |  FROM orders),
        |base AS (
        |  SELECT ds, COUNT(DISTINCT ok) AS ec,
        |    COUNT(DISTINCT ok) FILTER (WHERE ok % 13 = 0) AS tc,
        |    COUNT(*) + COUNT(*) FILTER (WHERE ok % 13 = 0) AS stc,
        |    list_sort(list_distinct(list(sch))) AS schemata,
        |    max(strftime(o_orderdate, '%Y-%m-%d')) AS lc
        |  FROM st GROUP BY ds),
        |iss AS (
        |  SELECT ds, level, COUNT(*) AS n FROM (
        |    SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'ds_even' ELSE 'ds_odd' END AS ds,
        |      CASE WHEN o_orderkey % 4 = 3 THEN 'error' ELSE 'warning' END AS level
        |    FROM orders WHERE o_orderkey % 11 = 3)
        |  GROUP BY ds, level),
        |issj AS (SELECT ds, string_agg('"' || level || '":' || n::VARCHAR, ',' ORDER BY level) AS j,
        |    SUM(n) AS ic FROM iss GROUP BY ds)
        |SELECT b.ds AS dataset,
        |  '{"name":"' || b.ds || '","entity_count":' || ec
        |  || ',"target_count":' || tc
        |  || ',"thing_count":' || ec
        |  || ',"statement_count":' || stc
        |  || ',"schemata":["' || array_to_string(schemata, '","') || '"]'
        |  || ',"last_change":"' || lc || '","issue_levels":{' || COALESCE(i.j, '')
        |  || '},"issue_count":' || COALESCE(ic, 0)
        |  || ',"version":"v20260101","updated_at":"2026-01-01T00:00:00"'
        |  || ',"last_export":"2026-01-01T00:00:00","result":"successful"'
        |  || ',"resources":[{"name":"entities.ftm.json","path":"entities.ftm.json"},'
        |  || '{"name":"names.txt","path":"names.txt"},'
        |  || '{"name":"senzing.json","path":"senzing.json"},'
        |  || '{"name":"statistics.json","path":"statistics.json"},'
        |  || '{"name":"targets.nested.json","path":"targets.nested.json"},'
        |  || '{"name":"targets.simple.csv","path":"targets.simple.csv"}]}' AS json
        |FROM base b LEFT JOIN issj i ON b.ds = i.ds""".stripMargin)
  )
}
