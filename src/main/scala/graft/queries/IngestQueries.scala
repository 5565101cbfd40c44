package graft.queries

import graft.operators.{EntityAssembler, Exporters}
import graft.sources.Ingestion
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
        |  FROM orders GROUP BY 1)""".stripMargin)
  )
}
