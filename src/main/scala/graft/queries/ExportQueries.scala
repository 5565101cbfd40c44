package graft.queries

import graft.operators.{Adjacency, Exporters}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Adjacency operators (J1/J2/J12-adjacent) and the consolidated export
  * products (K1/K3/K4/K6/K7/K8) exercised over a synthetic FtM-style
  * entity graph derived deterministically from the TPC-H tables:
  * customers become Person/Company entities, orders spawn Sanction /
  * Identification / Security satellites pointing at them, suppliers
  * become Vessels, and a small Address pool is shared via
  * `addressEntity` refs. Every oracle recomputes the product straight
  * from the base tables — the Spark side must flow through the real
  * entity frame + adjacency operators to match.
  */
object ExportQueries {

  private val EmptyArr = array().cast("array<string>")

  private def m(pairs: (String, Column)*): Column =
    map_filter(
      map(pairs.flatMap { case (k, v) => Seq(lit(k), v) }: _*),
      (_, v) => size(v) > 0).as("properties")

  /** The shared synthetic entity frame, cached per (session, dir): the
    * export products are N plans over ONE entity frame (the engine's
    * documented pattern — Exporters scaladoc), so the query-side frame
    * is persisted exactly like a real caller would persist the
    * assembled entity table before fanning out exporters. Without this
    * the adjacency branches re-derive the six-way union per reference
    * (37 scans in q84's plan). */
  private val entityCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  def syntheticEntities(s: SparkSession, d: String): DataFrame =
    entityCache.getOrElseUpdate((s, d),
      buildSyntheticEntities(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Release every cached entity frame — the hook a long-lived session
    * calls when it is done with the export query family (the cache is
    * otherwise intentionally run-scoped, like a real caller's persisted
    * entity table across an export fan-out). */
  def unpersistAll(): Unit =
    entityCache.keys.toSeq.foreach { key =>
      entityCache.remove(key).foreach(_.unpersist(blocking = false))
    }

  private def buildSyntheticEntities(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
    val k = col("c_custkey")
    val custEnt = cust.select(
      concat(lit("c"), k.cast("string")).as("id"),
      when(k % 4 === 0, "Company").otherwise("Person").as("schema"),
      m(
        "name" -> array(col("c_name")),
        "alias" -> when(k % 5 === 0,
          array(upper(col("c_name")), concat(col("c_name"), lit(" Ltd"))))
          .otherwise(EmptyArr),
        "topics" -> when(k % 3 === 0, array(lit("sanction")))
          .when(k % 3 === 1, array(lit("poi"))).otherwise(EmptyArr),
        "country" -> array(lower(col("n_name"))),
        "birthDate" -> when(k % 4 =!= 0,
          array(concat(lit("19"), (lit(50) + k % 50).cast("string"))))
          .otherwise(EmptyArr),
        "gender" -> when(k % 4 =!= 0,
          when(k % 2 === 0, array(lit("male"))).otherwise(array(lit("female"))))
          .otherwise(EmptyArr),
        "addressEntity" -> array(concat(lit("a"), (k % 97).cast("string"))),
        "programId" -> when(k % 3 === 0,
          array(concat(lit("ZZ-"), (k % 5).cast("string")))).otherwise(EmptyArr),
        "registrationNumber" -> when(k % 15 === 0,
            array(concat(lit("RN"), k.cast("string")),
              concat(lit("ZZ-"), (k % 5).cast("string"))))
          .when(k % 6 === 0, array(concat(lit("RN"), k.cast("string"))))
          .otherwise(EmptyArr),
        "innCode" -> when(k % 6 === 1,
          array(concat(lit("INN"), k.cast("string")))).otherwise(EmptyArr),
        "leiCode" -> when(k % 4 === 0 && k % 8 === 0,
          array(concat(lit("LEI"), k.cast("string")))).otherwise(EmptyArr),
        "isinCode" -> when(k % 4 === 0 && k % 8 === 4,
          array(concat(lit("OWNISIN"), k.cast("string")))).otherwise(EmptyArr),
        "imoNumber" -> when(k % 20 === 0,
          array(concat(lit("IMO"), lpad((k * 37 % 10000000L).cast("string"), 7, "0"))))
          .otherwise(EmptyArr)))

    val addrEnt = t(s, d, "customer")
      .select((col("c_custkey") % 97).as("ak")).distinct()
      .select(
        concat(lit("a"), col("ak").cast("string")).as("id"),
        lit("Address").as("schema"),
        m(
          "full" -> array(concat(lit("No. "), (col("ak") * 3).cast("string"), lit(" Main St"))),
          "name" -> array(concat(lit("Addr "), col("ak").cast("string")))))

    val o = t(s, d, "orders")
    val ok = col("o_orderkey")
    val sancEnt = o.filter(ok % 5 === 0).select(
      concat(lit("s"), ok.cast("string")).as("id"),
      lit("Sanction").as("schema"),
      m(
        "entity" -> array(concat(lit("c"), col("o_custkey").cast("string"))),
        "program" -> array(concat(lit("PROG-"), (ok % 7).cast("string"))),
        "startDate" -> array(date_format(col("o_orderdate"), "yyyy-MM-dd")),
        "programId" -> array(concat(lit("ZZ-"), (ok % 5).cast("string")))))

    val identEnt = o.filter(ok % 5 === 1).select(
      concat(lit("i"), ok.cast("string")).as("id"),
      lit("Identification").as("schema"),
      m(
        "holder" -> array(concat(lit("c"), col("o_custkey").cast("string"))),
        "number" -> array(concat(lit("NUM"), (ok % 1000).cast("string"))),
        "country" -> array(concat(lit("cc"), (ok % 10).cast("string")))))

    val secEnt = o.filter(ok % 5 === 2).select(
      concat(lit("sec"), ok.cast("string")).as("id"),
      lit("Security").as("schema"),
      m(
        "issuer" -> array(concat(lit("c"), col("o_custkey").cast("string"))),
        "isin" -> array(concat(lit("IS"), (ok % 997).cast("string")))))

    val sup = t(s, d, "supplier")
      .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
    val sk = col("s_suppkey")
    val vesselEnt = sup.select(
      concat(lit("v"), sk.cast("string")).as("id"),
      lit("Vessel").as("schema"),
      m(
        "name" -> array(concat(lit("Vessel "), col("s_name"))),
        "imoNumber" -> when(sk % 3 =!= 0,
            when(sk % 5 === 0,
              array(concat(lit("IMO"), lpad((sk * 37 % 10000000L).cast("string"), 7, "0")),
                concat(lit("IMO"), lpad((sk * 41 % 10000000L).cast("string"), 7, "0"))))
              .otherwise(array(concat(lit("IMO"), lpad((sk * 37 % 10000000L).cast("string"), 7, "0")))))
          .otherwise(EmptyArr),
        "flag" -> array(lower(col("n_name"))),
        "mmsi" -> when(sk % 2 === 0, array(concat(lit("MM"), sk.cast("string"))))
          .otherwise(EmptyArr),
        "topics" -> when(sk % 4 === 0, array(lit("sanction"))).otherwise(EmptyArr)))

    custEnt.unionByName(addrEnt).unionByName(sancEnt)
      .unionByName(identEnt).unionByName(secEnt).unionByName(vesselEnt)
  }

  /** Shared oracle CTEs mirroring the synthetic construction. */
  private val SqlCust =
    """cust AS (
      |  SELECT c_custkey AS k, c_name, lower(n_name) AS country,
      |    CASE WHEN c_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END AS sch
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey)""".stripMargin

  val decls: Seq[Decl] = Seq(

    // J1/J2: the adjacency edge frame, both directions.
    decl("q70_adjacency",
      (s, d) => Adjacency.adjacent(syntheticEntities(s, d))
        .select(col("id"), col("direction"), col("prop"),
          col("other_id"), col("other_schema")),
      s"""WITH $SqlCust,
         |addr_k AS (SELECT DISTINCT c_custkey % 97 AS ak FROM customer),
         |fwd AS (
         |  SELECT 'c' || k::VARCHAR AS id, 'addressEntity' AS prop,
         |    'a' || ak::VARCHAR AS other_id, 'Address' AS other_schema
         |  FROM cust JOIN addr_k ON k % 97 = ak
         |  UNION ALL
         |  SELECT 's' || o_orderkey::VARCHAR, 'entity', 'c' || o_custkey::VARCHAR,
         |    CASE WHEN o_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END
         |  FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_orderkey % 5 = 0
         |  UNION ALL
         |  SELECT 'i' || o_orderkey::VARCHAR, 'holder', 'c' || o_custkey::VARCHAR,
         |    CASE WHEN o_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END
         |  FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_orderkey % 5 = 1
         |  UNION ALL
         |  SELECT 'sec' || o_orderkey::VARCHAR, 'issuer', 'c' || o_custkey::VARCHAR,
         |    CASE WHEN o_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END
         |  FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_orderkey % 5 = 2),
         |inv AS (
         |  SELECT 'a' || (k % 97)::VARCHAR AS id, 'addressEntity' AS prop,
         |    'c' || k::VARCHAR AS other_id, sch AS other_schema
         |  FROM cust
         |  UNION ALL
         |  SELECT 'c' || o_custkey::VARCHAR, 'entity', 's' || o_orderkey::VARCHAR, 'Sanction'
         |  FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_orderkey % 5 = 0
         |  UNION ALL
         |  SELECT 'c' || o_custkey::VARCHAR, 'holder', 'i' || o_orderkey::VARCHAR, 'Identification'
         |  FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_orderkey % 5 = 1
         |  UNION ALL
         |  SELECT 'c' || o_custkey::VARCHAR, 'issuer', 'sec' || o_orderkey::VARCHAR, 'Security'
         |  FROM orders JOIN customer ON o_custkey = c_custkey WHERE o_orderkey % 5 = 2)
         |SELECT id, 'fwd' AS direction, prop, other_id, other_schema FROM fwd
         |UNION ALL
         |SELECT id, 'inv', prop, other_id, other_schema FROM inv""".stripMargin),

    // K1/F13: deterministic FtM JSON lines (sorted keys, sorted values).
    decl("q71_ftm_json",
      (s, d) => {
        val ents = syntheticEntities(s, d).filter(col("id").startsWith("c"))
        ents.select(col("id"),
          Exporters.ftmJsonLine(col("id"), col("schema"), col("properties")).as("json"))
      },
      s"""WITH $SqlCust
         |SELECT 'c' || k::VARCHAR AS id,
         |  '{"id":"c' || k::VARCHAR || '","schema":"' || sch || '","properties":{'
         |  || array_to_string(list_filter([
         |    '"addressEntity":["a' || (k % 97)::VARCHAR || '"]',
         |    CASE WHEN k % 5 = 0 THEN '"alias":["' || upper(c_name) || '","' || c_name || ' Ltd"]' END,
         |    CASE WHEN k % 4 != 0 THEN '"birthDate":["19' || (50 + k % 50)::VARCHAR || '"]' END,
         |    '"country":["' || country || '"]',
         |    CASE WHEN k % 4 != 0 THEN '"gender":["' || (CASE WHEN k % 2 = 0 THEN 'male' ELSE 'female' END) || '"]' END,
         |    CASE WHEN k % 20 = 0 THEN '"imoNumber":["IMO' || lpad(((k * 37) % 10000000)::VARCHAR, 7, '0') || '"]' END,
         |    CASE WHEN k % 6 = 1 THEN '"innCode":["INN' || k::VARCHAR || '"]' END,
         |    CASE WHEN k % 4 = 0 AND k % 8 = 4 THEN '"isinCode":["OWNISIN' || k::VARCHAR || '"]' END,
         |    CASE WHEN k % 4 = 0 AND k % 8 = 0 THEN '"leiCode":["LEI' || k::VARCHAR || '"]' END,
         |    '"name":["' || c_name || '"]',
         |    CASE WHEN k % 3 = 0 THEN '"programId":["ZZ-' || (k % 5)::VARCHAR || '"]' END,
         |    CASE WHEN k % 15 = 0 THEN '"registrationNumber":["RN' || k::VARCHAR || '","ZZ-' || (k % 5)::VARCHAR || '"]'
         |         WHEN k % 6 = 0 THEN '"registrationNumber":["RN' || k::VARCHAR || '"]' END,
         |    CASE WHEN k % 3 = 0 THEN '"topics":["sanction"]'
         |         WHEN k % 3 = 1 THEN '"topics":["poi"]' END
         |  ], x -> x IS NOT NULL), ',') || '}}' AS json
         |FROM cust""".stripMargin),

    // K3: targets.simple.csv — the full 16-column header with aliases,
    // typed-value countries/identifiers, phones/emails and the
    // provenance columns (simplecsv.py:17-35).
    decl("q72_simple_csv",
      (s, d) => Exporters.simpleCsv(syntheticEntities(s, d)),
      s"""WITH $SqlCust,
         |sanc AS (
         |  SELECT o_custkey AS k,
         |    string_agg(DISTINCT 'PROG-' || (o_orderkey % 7)::VARCHAR || ' - ' || strftime(o_orderdate, '%Y-%m-%d'), ';' ORDER BY 'PROG-' || (o_orderkey % 7)::VARCHAR || ' - ' || strftime(o_orderdate, '%Y-%m-%d')) AS sanctions
         |  FROM orders WHERE o_orderkey % 5 = 0 GROUP BY o_custkey),
         |idents AS (
         |  SELECT o_custkey AS k,
         |    string_agg(DISTINCT 'NUM' || (o_orderkey % 1000)::VARCHAR, ';' ORDER BY 'NUM' || (o_orderkey % 1000)::VARCHAR) AS numbers,
         |    string_agg(DISTINCT 'cc' || (o_orderkey % 10)::VARCHAR, ';' ORDER BY 'cc' || (o_orderkey % 10)::VARCHAR) AS ccs
         |  FROM orders WHERE o_orderkey % 5 = 1 GROUP BY o_custkey),
         |cust_rows AS (
         |  SELECT 'c' || c.k::VARCHAR AS id, c.sch AS schema, c.c_name AS name,
         |    CASE WHEN c.k % 5 = 0
         |      THEN array_to_string(list_sort([upper(c.c_name), c.c_name || ' Ltd']), ';')
         |      ELSE '' END AS aliases,
         |    CASE WHEN c.k % 4 != 0 THEN '19' || (50 + c.k % 50)::VARCHAR ELSE '' END AS birth_date,
         |    array_to_string(list_sort(list_distinct(list_filter(
         |      [c.country] || string_split(COALESCE(i.ccs, ''), ';'),
         |      x -> len(x) > 0))), ';') AS countries,
         |    'No. ' || ((c.k % 97) * 3)::VARCHAR || ' Main St' AS addresses,
         |    COALESCE(array_to_string(list_sort(list_distinct(list_filter(
         |      (CASE WHEN c.k % 15 = 0 THEN ['RN' || c.k::VARCHAR, 'ZZ-' || (c.k % 5)::VARCHAR]
         |            WHEN c.k % 6 = 0 THEN ['RN' || c.k::VARCHAR] ELSE [] END
         |       || (CASE WHEN c.k % 6 = 1 THEN ['INN' || c.k::VARCHAR] ELSE [] END)
         |       || (CASE WHEN c.k % 4 = 0 AND c.k % 8 = 0 THEN ['LEI' || c.k::VARCHAR] ELSE [] END)
         |       || (CASE WHEN c.k % 4 = 0 AND c.k % 8 = 4 THEN ['OWNISIN' || c.k::VARCHAR] ELSE [] END)
         |       || (CASE WHEN c.k % 20 = 0 THEN ['IMO' || lpad(((c.k * 37) % 10000000)::VARCHAR, 7, '0')] ELSE [] END)
         |       || (CASE WHEN c.k % 3 = 0 THEN ['ZZ-' || (c.k % 5)::VARCHAR] ELSE [] END)
         |       || string_split(COALESCE(i.numbers, ''), ';')),
         |      x -> len(x) > 0 AND NOT (c.k % 3 = 0 AND x = 'ZZ-' || (c.k % 5)::VARCHAR)))), ';'), '') AS identifiers,
         |    COALESCE(s.sanctions, '') AS sanctions,
         |    '' AS phones, '' AS emails,
         |    CASE WHEN c.k % 3 = 0 THEN 'ZZ-' || (c.k % 5)::VARCHAR ELSE '' END AS program_ids,
         |    '' AS dataset, '' AS first_seen, '' AS last_seen, '' AS last_change
         |  FROM cust c
         |  LEFT JOIN sanc s ON c.k = s.k
         |  LEFT JOIN idents i ON c.k = i.k
         |  WHERE c.k % 3 IN (0, 1)),
         |vessel_rows AS (
         |  SELECT 'v' || s_suppkey::VARCHAR AS id, 'Vessel' AS schema,
         |    'Vessel ' || s_name AS name, '' AS aliases, '' AS birth_date,
         |    lower(n_name) AS countries, '' AS addresses,
         |    array_to_string(list_sort(
         |      (CASE WHEN s_suppkey % 3 = 0 THEN []::VARCHAR[]
         |            WHEN s_suppkey % 5 = 0 THEN
         |              ['IMO' || lpad(((s_suppkey * 37) % 10000000)::VARCHAR, 7, '0'),
         |               'IMO' || lpad(((s_suppkey * 41) % 10000000)::VARCHAR, 7, '0')]
         |            ELSE ['IMO' || lpad(((s_suppkey * 37) % 10000000)::VARCHAR, 7, '0')] END)
         |      || ['MM' || s_suppkey::VARCHAR]), ';') AS identifiers,
         |    '' AS sanctions, '' AS phones, '' AS emails, '' AS program_ids,
         |    '' AS dataset, '' AS first_seen, '' AS last_seen, '' AS last_change
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |  WHERE s_suppkey % 4 = 0)
         |SELECT * FROM cust_rows UNION ALL SELECT * FROM vessel_rows""".stripMargin),

    // K4: nested depth-1 adjacency sets.
    decl("q73_nested_adjacency",
      (s, d) => Exporters.nestedAdjacency(syntheticEntities(s, d))
        .select(col("id"), array_join(col("adjacent_ids"), ";").as("adjacent")),
      s"""WITH $SqlCust,
         |edges AS (
         |  SELECT 'c' || k::VARCHAR AS a, 'a' || (k % 97)::VARCHAR AS b FROM cust
         |  UNION ALL
         |  SELECT 's' || o_orderkey::VARCHAR, 'c' || o_custkey::VARCHAR
         |  FROM orders WHERE o_orderkey % 5 = 0
         |  UNION ALL
         |  SELECT 'i' || o_orderkey::VARCHAR, 'c' || o_custkey::VARCHAR
         |  FROM orders WHERE o_orderkey % 5 = 1
         |  UNION ALL
         |  SELECT 'sec' || o_orderkey::VARCHAR, 'c' || o_custkey::VARCHAR
         |  FROM orders WHERE o_orderkey % 5 = 2),
         |sym AS (SELECT a, b FROM edges UNION ALL SELECT b, a FROM edges)
         |SELECT a AS id, array_to_string(list_sort(list_distinct(list(b))), ';') AS adjacent
         |FROM sym GROUP BY a""".stripMargin),

    // K6: the full senzing record — typed NAMES with hash dedup,
    // RISKS/ADDRESSES/DATES/COUNTRIES/CONTACTS families, typed +
    // adjacent + statement-level IDENTIFIERS with seen-value dedup and
    // the OTHER_ID fallback, LAST_CHANGE — every family recomputed
    // independently by the oracle (senzing.py:78-273).
    decl("q84_senzing",
      (s, d) => Exporters.senzing(
        syntheticEntities(s, d).withColumn("last_change", lit("2026-02-01"))),
      s"""WITH $SqlCust,
         |idents AS (
         |  SELECT o_custkey AS k,
         |    list_sort(list_distinct(list(
         |      'NATIONAL_ID_NUMBER=NUM' || (o_orderkey % 1000)::VARCHAR
         |      || '|cc' || (o_orderkey % 10)::VARCHAR))) AS nat
         |  FROM orders WHERE o_orderkey % 5 = 1 GROUP BY o_custkey),
         |cust_rows AS (
         |  SELECT 'c' || c.k::VARCHAR AS record_id,
         |    CASE WHEN sch = 'Person' THEN 'PERSON' ELSE 'ORGANIZATION' END AS record_type,
         |    CASE WHEN sch = 'Person' THEN (CASE WHEN c.k % 2 = 0 THEN 'M' ELSE 'F' END) END AS gender,
         |    '2026-02-01' AS last_change,
         |    sch <> 'Person' AS is_org,
         |    (CASE WHEN c.k % 5 = 0 THEN 2 ELSE 1 END)::BIGINT AS n_names,
         |    '[{"NAME_TYPE":"PRIMARY","' || (CASE WHEN sch = 'Person' THEN 'NAME_FULL' ELSE 'NAME_ORG' END)
         |      || '":"' || c_name || '"}'
         |      || CASE WHEN c.k % 5 = 0 THEN ',{"NAME_TYPE":"ALIAS","'
         |           || (CASE WHEN sch = 'Person' THEN 'NAME_FULL' ELSE 'NAME_ORG' END)
         |           || '":"' || c_name || ' Ltd"}' ELSE '' END || ']' AS names_json,
         |    CASE WHEN c.k % 3 = 0 THEN 'sanction' WHEN c.k % 3 = 1 THEN 'poi' ELSE '' END AS risks,
         |    'ADDR_FULL=No. ' || ((c.k % 97) * 3)::VARCHAR || ' Main St' AS addresses,
         |    CASE WHEN c.k % 4 <> 0 THEN 'DATE_OF_BIRTH=19' || (50 + c.k % 50)::VARCHAR ELSE '' END AS dates,
         |    (CASE WHEN sch = 'Person' THEN 'NATIONALITY=' ELSE 'COUNTRY_OF_ASSOCIATION=' END) || country AS countries,
         |    '' AS contacts,
         |    array_to_string(list_sort(list_distinct(
         |      (CASE WHEN c.k % 15 = 0 THEN ['NATIONAL_ID_NUMBER=RN' || c.k::VARCHAR,
         |                                  'NATIONAL_ID_NUMBER=ZZ-' || (c.k % 5)::VARCHAR]
         |            WHEN c.k % 6 = 0 THEN ['NATIONAL_ID_NUMBER=RN' || c.k::VARCHAR] ELSE [] END)
         |      || (CASE WHEN c.k % 6 = 1 THEN ['TAX_ID_NUMBER=INN' || c.k::VARCHAR] ELSE [] END)
         |      || (CASE WHEN c.k % 8 = 0 THEN ['LEI_NUMBER=LEI' || c.k::VARCHAR] ELSE [] END)
         |      || COALESCE(i.nat, [])
         |      || (CASE WHEN c.k % 3 = 0 AND c.k % 15 <> 0 THEN ['OTHER_ID:programId=ZZ-' || (c.k % 5)::VARCHAR] ELSE [] END)
         |      || (CASE WHEN c.k % 8 = 4 THEN ['ISIN_NUMBER=OWNISIN' || c.k::VARCHAR] ELSE [] END)
         |      || (CASE WHEN c.k % 20 = 0 THEN ['IMO_NUMBER=IMO' || lpad(((c.k * 37) % 10000000)::VARCHAR, 7, '0')] ELSE [] END)
         |      || ['OTHER_ID:OPEN_SANCTIONS=c' || c.k::VARCHAR])), ';') AS identifiers,
         |    '' AS source_links, '' AS relationships
         |  FROM cust c LEFT JOIN idents i ON c.k = i.k),
         |vessel_rows AS (
         |  SELECT 'v' || s_suppkey::VARCHAR, 'VESSEL', NULL, '2026-02-01', TRUE, 1::BIGINT,
         |    '[{"NAME_TYPE":"PRIMARY","NAME_ORG":"Vessel ' || s_name || '"}]',
         |    CASE WHEN s_suppkey % 4 = 0 THEN 'sanction' ELSE '' END,
         |    '', '', '', '',
         |    array_to_string(list_sort(list_distinct(
         |      (CASE WHEN s_suppkey % 3 = 0 THEN []::VARCHAR[]
         |            WHEN s_suppkey % 5 = 0 THEN
         |              ['IMO_NUMBER=IMO' || lpad(((s_suppkey * 37) % 10000000)::VARCHAR, 7, '0'),
         |               'IMO_NUMBER=IMO' || lpad(((s_suppkey * 41) % 10000000)::VARCHAR, 7, '0')]
         |            ELSE ['IMO_NUMBER=IMO' || lpad(((s_suppkey * 37) % 10000000)::VARCHAR, 7, '0')] END)
         |      || (CASE WHEN s_suppkey % 2 = 0 THEN ['MMSI_NUMBER=MM' || s_suppkey::VARCHAR] ELSE [] END)
         |      || ['OTHER_ID:OPEN_SANCTIONS=v' || s_suppkey::VARCHAR])), ';'),
         |    '', ''
         |  FROM supplier),
         |sec_rows AS (
         |  SELECT 'sec' || o_orderkey::VARCHAR, NULL, NULL, '2026-02-01', FALSE, 1::BIGINT,
         |    '[{"NAME_TYPE":"PRIMARY","NAME_FULL":"Security"}]', '', '', '', '', '',
         |    array_to_string(list_sort(
         |      ['ISIN_NUMBER=IS' || (o_orderkey % 997)::VARCHAR,
         |       'OTHER_ID:OPEN_SANCTIONS=sec' || o_orderkey::VARCHAR]), ';'),
         |    '', ''
         |  FROM orders WHERE o_orderkey % 5 = 2)
         |SELECT * FROM cust_rows UNION ALL SELECT * FROM vessel_rows
         |UNION ALL SELECT * FROM sec_rows""".stripMargin),

    // K7: securities rollup — the full 15-column issuer table
    // (securities.py:45-60): PermID/RIC columns, boolean flags,
    // datasets/risk_datasets, squashed aliases, referents.
    decl("q85_securities",
      (s, d) => Exporters.securities(syntheticEntities(s, d)),
      s"""WITH $SqlCust,
         |secs AS (
         |  SELECT o_custkey AS k,
         |    list_sort(list_distinct(list('IS' || (o_orderkey % 997)::VARCHAR))) AS sec_isins
         |  FROM orders WHERE o_orderkey % 5 = 2 GROUP BY o_custkey)
         |SELECT c.c_name AS caption,
         |  CASE WHEN c.k % 8 = 0 THEN 'LEI' || c.k::VARCHAR ELSE '' END AS lei,
         |  '' AS perm_id,
         |  COALESCE(array_to_string(list_sort(list_distinct(
         |    (CASE WHEN c.k % 8 = 4 THEN ['OWNISIN' || c.k::VARCHAR] ELSE [] END)
         |    || COALESCE(s.sec_isins, []))), ';'), '') AS isins,
         |  '' AS ric,
         |  c.country AS countries,
         |  'true' AS sanctioned, 'false' AS eo_14071, 'false' AS public,
         |  'c' || c.k::VARCHAR AS id, '' AS url, '' AS datasets, '' AS risk_datasets,
         |  array_to_string(list_sort(list_distinct(
         |    [c.c_name] || (CASE WHEN c.k % 5 = 0
         |      THEN [upper(c.c_name), c.c_name || ' Ltd'] ELSE [] END))), ';') AS aliases,
         |  '' AS referents
         |FROM cust c LEFT JOIN secs s ON c.k = s.k
         |WHERE c.k % 4 = 0 AND c.k % 3 = 0""".stripMargin),

    // A2/K9: country facets split things vs targets + sanction programs.
    decl("q95_entity_facets",
      (s, d) => graft.operators.Statistics.entityFacets(syntheticEntities(s, d)),
      s"""WITH $SqlCust,
         |exploded AS (
         |  SELECT 'c' || k::VARCHAR AS id, country AS key, (k % 3 IN (0, 1)) AS is_target
         |  FROM cust
         |  UNION ALL
         |  SELECT 'i' || o_orderkey::VARCHAR, 'cc' || (o_orderkey % 10)::VARCHAR, FALSE
         |  FROM orders WHERE o_orderkey % 5 = 1)
         |SELECT 'country_all' AS facet, key, COUNT(DISTINCT id) AS cnt
         |FROM exploded GROUP BY key
         |UNION ALL
         |SELECT 'country_targets', key, COUNT(DISTINCT id)
         |FROM exploded WHERE is_target GROUP BY key
         |UNION ALL
         |SELECT 'sanction_program', 'PROG-' || (o_orderkey % 7)::VARCHAR, COUNT(*)
         |FROM orders WHERE o_orderkey % 5 = 0
         |GROUP BY o_orderkey % 7""".stripMargin),

    // K4 (full fidelity): targets.nested.json — each target's FtM dict
    // with adjacency-reached props replaced by the adjacents' FULL
    // dicts (entity.py:174-198); the oracle rebuilds every nested dict
    // from the base tables.
    decl("q103_nested_target_json",
      (s, d) => Exporters.nestedTargetJsonLines(syntheticEntities(s, d)),
      s"""WITH $SqlCust,
         |sanc AS (
         |  SELECT o_custkey AS k, '"entity":[' || string_agg(DISTINCT
         |      '{"id":"s' || o_orderkey::VARCHAR || '","schema":"Sanction","properties":{"entity":["c'
         |      || o_custkey::VARCHAR || '"],"program":["PROG-' || (o_orderkey % 7)::VARCHAR
         |      || '"],"programId":["ZZ-' || (o_orderkey % 5)::VARCHAR
         |      || '"],"startDate":["' || strftime(o_orderdate, '%Y-%m-%d') || '"]}}',
         |      ',' ORDER BY '{"id":"s' || o_orderkey::VARCHAR || '","schema":"Sanction","properties":{"entity":["c'
         |      || o_custkey::VARCHAR || '"],"program":["PROG-' || (o_orderkey % 7)::VARCHAR
         |      || '"],"programId":["ZZ-' || (o_orderkey % 5)::VARCHAR
         |      || '"],"startDate":["' || strftime(o_orderdate, '%Y-%m-%d') || '"]}}') || ']' AS j
         |  FROM orders WHERE o_orderkey % 5 = 0 GROUP BY o_custkey),
         |idn AS (
         |  SELECT o_custkey AS k, '"holder":[' || string_agg(DISTINCT
         |      '{"id":"i' || o_orderkey::VARCHAR || '","schema":"Identification","properties":{"country":["cc'
         |      || (o_orderkey % 10)::VARCHAR || '"],"holder":["c' || o_custkey::VARCHAR
         |      || '"],"number":["NUM' || (o_orderkey % 1000)::VARCHAR || '"]}}',
         |      ',' ORDER BY '{"id":"i' || o_orderkey::VARCHAR || '","schema":"Identification","properties":{"country":["cc'
         |      || (o_orderkey % 10)::VARCHAR || '"],"holder":["c' || o_custkey::VARCHAR
         |      || '"],"number":["NUM' || (o_orderkey % 1000)::VARCHAR || '"]}}') || ']' AS j
         |  FROM orders WHERE o_orderkey % 5 = 1 GROUP BY o_custkey),
         |sec AS (
         |  SELECT o_custkey AS k, '"issuer":[' || string_agg(DISTINCT
         |      '{"id":"sec' || o_orderkey::VARCHAR || '","schema":"Security","properties":{"isin":["IS'
         |      || (o_orderkey % 997)::VARCHAR || '"],"issuer":["c' || o_custkey::VARCHAR || '"]}}',
         |      ',' ORDER BY '{"id":"sec' || o_orderkey::VARCHAR || '","schema":"Security","properties":{"isin":["IS'
         |      || (o_orderkey % 997)::VARCHAR || '"],"issuer":["c' || o_custkey::VARCHAR || '"]}}') || ']' AS j
         |  FROM orders WHERE o_orderkey % 5 = 2 GROUP BY o_custkey),
         |cust_rows AS (
         |  SELECT 'c' || c.k::VARCHAR AS id,
         |    '{"id":"c' || c.k::VARCHAR || '","schema":"' || c.sch || '","properties":{'
         |    || array_to_string(list_filter([
         |      '"addressEntity":[{"id":"a' || (c.k % 97)::VARCHAR
         |        || '","schema":"Address","properties":{"full":["No. ' || ((c.k % 97) * 3)::VARCHAR
         |        || ' Main St"],"name":["Addr ' || (c.k % 97)::VARCHAR || '"]}}]',
         |      CASE WHEN c.k % 5 = 0 THEN '"alias":["' || upper(c.c_name) || '","' || c.c_name || ' Ltd"]' END,
         |      CASE WHEN c.k % 4 != 0 THEN '"birthDate":["19' || (50 + c.k % 50)::VARCHAR || '"]' END,
         |      '"country":["' || c.country || '"]',
         |      s.j,
         |      CASE WHEN c.k % 4 != 0 THEN '"gender":["' || (CASE WHEN c.k % 2 = 0 THEN 'male' ELSE 'female' END) || '"]' END,
         |      i.j,
         |      CASE WHEN c.k % 20 = 0 THEN '"imoNumber":["IMO' || lpad(((c.k * 37) % 10000000)::VARCHAR, 7, '0') || '"]' END,
         |      CASE WHEN c.k % 6 = 1 THEN '"innCode":["INN' || c.k::VARCHAR || '"]' END,
         |      CASE WHEN c.k % 4 = 0 AND c.k % 8 = 4 THEN '"isinCode":["OWNISIN' || c.k::VARCHAR || '"]' END,
         |      x.j,
         |      CASE WHEN c.k % 4 = 0 AND c.k % 8 = 0 THEN '"leiCode":["LEI' || c.k::VARCHAR || '"]' END,
         |      '"name":["' || c.c_name || '"]',
         |      CASE WHEN c.k % 3 = 0 THEN '"programId":["ZZ-' || (c.k % 5)::VARCHAR || '"]' END,
         |      CASE WHEN c.k % 15 = 0 THEN '"registrationNumber":["RN' || c.k::VARCHAR || '","ZZ-' || (c.k % 5)::VARCHAR || '"]'
         |           WHEN c.k % 6 = 0 THEN '"registrationNumber":["RN' || c.k::VARCHAR || '"]' END,
         |      CASE WHEN c.k % 3 = 0 THEN '"topics":["sanction"]' ELSE '"topics":["poi"]' END
         |    ], x2 -> x2 IS NOT NULL), ',') || '}}' AS json
         |  FROM cust c
         |  LEFT JOIN sanc s ON c.k = s.k
         |  LEFT JOIN idn i ON c.k = i.k
         |  LEFT JOIN sec x ON c.k = x.k
         |  WHERE c.k % 3 IN (0, 1)),
         |vessel_rows AS (
         |  SELECT 'v' || s_suppkey::VARCHAR AS id,
         |    '{"id":"v' || s_suppkey::VARCHAR || '","schema":"Vessel","properties":{'
         |    || array_to_string(list_filter([
         |      '"flag":["' || lower(n_name) || '"]',
         |      CASE WHEN s_suppkey % 3 != 0 THEN '"imoNumber":' ||
         |        (CASE WHEN s_suppkey % 5 = 0 THEN
         |          '["' || array_to_string(list_sort([
         |            'IMO' || lpad(((s_suppkey * 37) % 10000000)::VARCHAR, 7, '0'),
         |            'IMO' || lpad(((s_suppkey * 41) % 10000000)::VARCHAR, 7, '0')]), '","') || '"]'
         |         ELSE '["IMO' || lpad(((s_suppkey * 37) % 10000000)::VARCHAR, 7, '0') || '"]' END) END,
         |      '"mmsi":["MM' || s_suppkey::VARCHAR || '"]',
         |      '"name":["Vessel ' || s_name || '"]',
         |      '"topics":["sanction"]'
         |    ], x2 -> x2 IS NOT NULL), ',') || '}}' AS json
         |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
         |  WHERE s_suppkey % 4 = 0)
         |SELECT * FROM cust_rows UNION ALL SELECT * FROM vessel_rows""".stripMargin),

    // K9 (full document): statistics.json with the reference's complete
    // structure — last_change, schemata, qnames, counts, target/thing
    // facet blocks, sanction programs, per-(schema,prop) fill rates —
    // over a compact bespoke frame (nation/region derived) so the
    // oracle can rebuild the document byte-for-byte. (In this model's
    // compact lattice every schema descends from Thing, so
    // things.total == entity_count here.)
    decl("q102_statistics_json",
      (s, d) => {
        val n = t(s, d, "nation")
        val nk = col("n_nationkey")
        val lc = concat(lit("2026-01-0"), (lit(1) + nk % 9).cast("string"))
        val persons = n.filter(nk % 2 === 1).select(
          concat(lit("p"), nk.cast("string")).as("id"),
          lit("Person").as("schema"),
          m(
            "name" -> array(col("n_name")),
            "country" -> array(concat(lit("r"), (nk % 5).cast("string"))),
            "birthDate" -> array(concat(lit("19"), (lit(50) + nk).cast("string"))),
            "topics" -> when(nk % 3 === 0, array(lit("sanction"))).otherwise(EmptyArr)),
          lc.as("last_change"))
        val companies = n.filter(nk % 2 === 0).select(
          concat(lit("co"), nk.cast("string")).as("id"),
          lit("Company").as("schema"),
          m(
            "name" -> array(col("n_name")),
            "country" -> array(concat(lit("r"), (nk % 5).cast("string"))),
            "registrationNumber" -> when(nk % 4 === 0,
              array(concat(lit("R"), nk.cast("string")))).otherwise(EmptyArr),
            "topics" -> when(nk % 3 === 1, array(lit("poi"))).otherwise(EmptyArr)),
          lc.as("last_change"))
        val r = t(s, d, "region")
        val sancs = r.select(
          concat(lit("sx"), col("r_regionkey").cast("string")).as("id"),
          lit("Sanction").as("schema"),
          m(
            "entity" -> array(lit("p1")),
            "programId" -> array(concat(lit("PR-"), (col("r_regionkey") % 2).cast("string")))),
          lit("2026-01-01").as("last_change"))
        graft.operators.Statistics.statisticsJson(
          persons.unionByName(companies).unionByName(sancs))
      },
      s"""WITH ents AS (
        |  SELECT 'p' || n_nationkey::VARCHAR AS eid,
        |    'Person' AS sch, 'r' || (n_nationkey % 5)::VARCHAR AS country,
        |    n_nationkey % 3 = 0 AS is_target,
        |    '2026-01-0' || (1 + n_nationkey % 9)::VARCHAR AS lc,
        |    ['birthDate', 'country', 'name']
        |      || (CASE WHEN n_nationkey % 3 = 0 THEN ['topics'] ELSE [] END) AS pk
        |  FROM nation WHERE n_nationkey % 2 = 1
        |  UNION ALL
        |  SELECT 'co' || n_nationkey::VARCHAR,
        |    'Company', 'r' || (n_nationkey % 5)::VARCHAR, n_nationkey % 3 = 1,
        |    '2026-01-0' || (1 + n_nationkey % 9)::VARCHAR,
        |    ['country', 'name']
        |      || (CASE WHEN n_nationkey % 4 = 0 THEN ['registrationNumber'] ELSE [] END)
        |      || (CASE WHEN n_nationkey % 3 = 1 THEN ['topics'] ELSE [] END)
        |  FROM nation WHERE n_nationkey % 2 = 0
        |  UNION ALL
        |  SELECT 'sx' || r_regionkey::VARCHAR,
        |    'Sanction', NULL, FALSE, '2026-01-01', ['entity', 'programId']
        |  FROM region),
        |tpr AS (SELECT country AS code, eid FROM ents
        |        WHERE is_target AND country IS NOT NULL),
        |thpr AS (SELECT country AS code, eid FROM ents
        |         WHERE country IS NOT NULL),
        |${PipelineQueries.sqlHllEst("tc", "tpr")},
        |${PipelineQueries.sqlHllEst("th", "thpr")},
        |tot AS (SELECT COUNT(*) AS ec, COUNT(*) FILTER (WHERE is_target) AS tc,
        |  max(lc) AS mlc FROM ents),
        |schl AS (SELECT string_agg('"' || sch || '"', ',' ORDER BY sch) AS j
        |  FROM (SELECT DISTINCT sch FROM ents)),
        |qn AS (SELECT string_agg('"' || sch || ':' || p || '"', ',' ORDER BY sch, p) AS j
        |  FROM (SELECT DISTINCT sch, unnest(pk) AS p FROM ents)),
        |tcf AS (SELECT COALESCE(string_agg('{"code":"' || country || '","count":'
        |    || cnt::VARCHAR || ',"label":"' || country || '","est_distinct":'
        |    || he.est || '}', ',' ORDER BY cnt DESC, country), '') AS j
        |  FROM (SELECT country, COUNT(*) AS cnt FROM ents
        |        WHERE is_target AND country IS NOT NULL GROUP BY country) tq
        |  JOIN he_tc he ON he.code = tq.country),
        |tsf AS (SELECT COALESCE(string_agg('{"name":"' || sch || '","count":' || cnt::VARCHAR
        |    || ',"label":"' || sch || '","plural":"' || sch || 's"}', ',' ORDER BY cnt DESC, sch), '') AS j
        |  FROM (SELECT sch, COUNT(*) AS cnt FROM ents WHERE is_target GROUP BY sch)),
        |pgf AS (SELECT COALESCE(string_agg('{"id":"PR-' || pr::VARCHAR || '","count":'
        |    || cnt::VARCHAR || '}', ',' ORDER BY pr), '') AS j
        |  FROM (SELECT r_regionkey % 2 AS pr, COUNT(*) AS cnt FROM region GROUP BY r_regionkey % 2)),
        |thcf AS (SELECT COALESCE(string_agg('{"code":"' || country || '","count":'
        |    || cnt::VARCHAR || ',"label":"' || country || '","est_distinct":'
        |    || he.est || '}', ',' ORDER BY cnt DESC, country), '') AS j
        |  FROM (SELECT country, COUNT(*) AS cnt FROM ents
        |        WHERE country IS NOT NULL GROUP BY country) tq
        |  JOIN he_th he ON he.code = tq.country),
        |thsf AS (SELECT COALESCE(string_agg('{"name":"' || sch || '","count":' || cnt::VARCHAR
        |    || ',"label":"' || sch || '","plural":"' || sch || 's"}', ',' ORDER BY cnt DESC, sch), '') AS j
        |  FROM (SELECT sch, COUNT(*) AS cnt FROM ents GROUP BY sch)),
        |ewp AS (SELECT string_agg('{"schema":"' || sch || '","property":"' || p
        |    || '","count":' || cnt::VARCHAR || ',"total":' || total::VARCHAR
        |    || ',"fill_rate":' || ((cnt::DOUBLE / total::DOUBLE)::DECIMAL(8,6))::VARCHAR
        |    || '}', ',' ORDER BY sch, p) AS j
        |  FROM (SELECT sch, p, COUNT(*) AS cnt
        |        FROM (SELECT sch, unnest(pk) AS p FROM ents) GROUP BY sch, p)
        |  JOIN (SELECT sch, COUNT(*) AS total FROM ents GROUP BY sch) USING (sch))
        |SELECT '{"last_change":"' || tot.mlc || '","schemata":[' || schl.j
        |  || '],"properties":[' || qn.j
        |  || '],"entity_count":' || tot.ec
        |  || ',"target_count":' || tot.tc
        |  || ',"targets":{"total":' || tot.tc
        |  || ',"countries":[' || tcf.j
        |  || '],"schemata":[' || tsf.j
        |  || ']},"sanctions":{"programs":[' || pgf.j
        |  || ']},"things":{"total":' || tot.ec
        |  || ',"countries":[' || thcf.j
        |  || '],"schemata":[' || thsf.j
        |  || '],"entities_with_prop":[' || ewp.j
        |  || ']}}' AS json
        |FROM tot, schl, qn, tcf, tsf, pgf, thcf, thsf, ewp""".stripMargin),

    // K8: maritime rows, one per IMO.
    decl("q86_maritime",
      (s, d) => Exporters.maritime(syntheticEntities(s, d)),
      """WITH vessels AS (
        |  SELECT s_suppkey AS sk, 'Vessel ' || s_name AS caption, lower(n_name) AS flag
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey),
        |vessel_imos AS (
        |  SELECT sk, caption, flag,
        |    unnest(CASE
        |      WHEN sk % 3 = 0 THEN ['']
        |      WHEN sk % 5 = 0 THEN ['IMO' || lpad(((sk * 37) % 10000000)::VARCHAR, 7, '0'),
        |                            'IMO' || lpad(((sk * 41) % 10000000)::VARCHAR, 7, '0')]
        |      ELSE ['IMO' || lpad(((sk * 37) % 10000000)::VARCHAR, 7, '0')] END) AS imo
        |  FROM vessels)
        |SELECT 'VESSEL' AS row_type, caption, imo,
        |  CASE WHEN sk % 4 = 0 THEN 'sanction' ELSE '' END AS risk_topics,
        |  flag AS flags,
        |  CASE WHEN sk % 2 = 0 THEN 'MM' || sk::VARCHAR ELSE '' END AS mmsis,
        |  'v' || sk::VARCHAR AS id
        |FROM vessel_imos
        |UNION ALL
        |SELECT 'ORGANIZATION', c_name,
        |  'IMO' || lpad(((c_custkey * 37) % 10000000)::VARCHAR, 7, '0'),
        |  CASE WHEN c_custkey % 3 = 0 THEN 'sanction' WHEN c_custkey % 3 = 1 THEN 'poi' ELSE '' END,
        |  '', '', 'c' || c_custkey::VARCHAR
        |FROM customer WHERE c_custkey % 20 = 0""".stripMargin)
  ) :+ hllFacetDecl

  // q320 (round-15): the statistics country facet's SKETCHED distinct
  // arm — A2's per-country entity counts with the q286 portable HLL
  // beside the exact countDistinct: at 100 TB the exact arm's
  // (country, id) shuffle grows with the corpus while the sketch is
  // O(m) per country and mergeable across shards/days; gating both in
  // ONE row proves the estimate against its truth. Registers, the
  // scaled harmonic numerator, and the bias-corrected estimate are
  // hash-gated; the oracle replays the trailing-zero rank and the one
  // IEEE division over the same exploded (country, id) frame the q95
  // facet counts.
  private def hllFacetDecl: Decl =
    decl("q320_facet_distinct_hll",
      (s, d) => graft.operators.Statistics.countryFacetSketched(
        syntheticEntities(s, d), p = 8),
      s"""WITH $SqlCust,
         |ex AS (
         |  SELECT 'c' || k::VARCHAR AS id, country AS key FROM cust
         |  UNION ALL
         |  SELECT 'i' || o_orderkey::VARCHAR,
         |    'cc' || (o_orderkey % 10)::VARCHAR
         |  FROM orders WHERE o_orderkey % 5 = 1),
         |h AS (SELECT key, ${PipelineQueries.sqlHash60("id")} AS h FROM ex),
         |r AS (SELECT key, h % 256 AS reg, h // 256 AS s FROM h),
         |rho AS (SELECT key, reg,
         |        CASE WHEN s = 0 THEN 53
         |             ELSE bit_count((s & -s) - 1) + 1 END AS rho FROM r),
         |mreg AS (SELECT key, reg, MAX(rho)::BIGINT AS mr
         |         FROM rho GROUP BY 1, 2),
         |agg AS (SELECT key, COUNT(*)::BIGINT AS n_registers_set,
         |        SUM(mr)::BIGINT AS register_sum,
         |        SUM(1::BIGINT << (53 - mr)::INT)::BIGINT AS setnum
         |        FROM mreg GROUP BY 1),
         |ex2 AS (SELECT key, COUNT(DISTINCT id)::BIGINT AS exact_distinct
         |        FROM ex GROUP BY 1)
         |SELECT 'country_all' AS facet, agg.key, ex2.exact_distinct,
         |  agg.n_registers_set, agg.register_sum,
         |  (agg.setnum + (256 - agg.n_registers_set)
         |     * (1::BIGINT << 53))::BIGINT AS harmonic_num,
         |  ${PipelineQueries.sqlHllEstCase(256L, 53,
              "agg.n_registers_set", "agg.setnum")} AS est_distinct
         |FROM agg JOIN ex2 USING (key)""".stripMargin)
}
