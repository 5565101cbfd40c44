package graft.queries

/** DuckDB oracle for q109: recomputes EVERY published product of the v2
  * ETL run straight from the base tables (see [[EtlQueries]] for the
  * entity model). The digest is COUNT plus the order-independent sum of
  * a 60-bit md5-prefix fold per line — the fold matches Spark's
  * `conv(substring(md5(x),1,15),16,10)` exactly.
  */
object EtlOracle {

  /** 60-bit md5-prefix fold of an expression, as DuckDB SQL. */
  private[queries] def fold(e: String): String =
    s"list_sum(list_transform(generate_series(1,15), i -> " +
      s"(strpos('0123456789abcdef', substr(md5($e),i,1))-1)::BIGINT << (4*(15-i))))"

  private[queries] def digest(product: String, linesCte: String): String =
    s"""SELECT '$product' AS product, COUNT(*) AS n_lines,
       |  SUM(${fold("line")})::DECIMAL(38,0)::VARCHAR AS hash_sum
       |FROM $linesCte""".stripMargin

  val sql: String =
    s"""WITH cust AS (
       |  SELECT c_custkey AS k, c_name,
       |    CASE WHEN c_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END AS sch,
       |    lower(n_name) AS country
       |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
       |ftm AS (
       |  SELECT k,
       |    '{"id":"c' || k::VARCHAR || '","schema":"' || sch || '","properties":{'
       |    || concat_ws(',',
       |        CASE WHEN k % 50 = 0 THEN '"alias":["' || upper(c_name) || '"]' END,
       |        CASE WHEN k % 4 != 0 THEN '"birthDate":["19' || (50 + k % 50)::VARCHAR || '"]' END,
       |        '"country":["' || country || '"]',
       |        '"name":["' || c_name || '"]',
       |        CASE WHEN k % 4 = 0 THEN '"registrationNumber":["RN' || k::VARCHAR || '"]' END,
       |        CASE WHEN k % 3 = 0 THEN '"topics":["sanction"]' END)
       |    || '}}' AS line
       |  FROM cust),
       |name_lines AS (
       |  SELECT DISTINCT line FROM (
       |    SELECT c_name AS line FROM cust
       |    UNION ALL SELECT upper(c_name) FROM cust WHERE k % 50 = 0)),
       |delta_lines AS (
       |  SELECT '{"op":"' || (CASE WHEN k % 7 = 0 THEN 'ADD' ELSE 'MOD' END)
       |    || '","entity":' || line || '}' AS line
       |  FROM ftm WHERE k % 7 = 0 OR k % 11 = 0 OR k % 50 = 0
       |  UNION ALL
       |  SELECT '{"op":"DEL","entity":{"id":"x' || k::VARCHAR
       |    || '","schema":"Person","properties":{"name":["Ghost '
       |    || k::VARCHAR || '"]}}}'
       |  FROM cust WHERE k % 13 = 0),
       |v2s AS (
       |  SELECT 'c'||k::VARCHAR AS eid, 'c'||k::VARCHAR AS cid, sch,
       |    'name' AS prop, 'name' AS ptype, c_name AS value, k FROM cust
       |  UNION ALL SELECT 'c'||k::VARCHAR, 'c'||k::VARCHAR, sch,
       |    'country', 'country', country, k FROM cust
       |  UNION ALL SELECT 'c'||k::VARCHAR, 'c'||k::VARCHAR, sch,
       |    'birthDate', 'date', '19'||(50 + k % 50)::VARCHAR, k FROM cust WHERE k % 4 != 0
       |  UNION ALL SELECT 'c'||k::VARCHAR, 'c'||k::VARCHAR, sch,
       |    'registrationNumber', 'identifier', 'RN'||k::VARCHAR, k FROM cust WHERE k % 4 = 0
       |  UNION ALL SELECT 'c'||k::VARCHAR, 'c'||k::VARCHAR, sch,
       |    'topics', 'topic', 'sanction', k FROM cust WHERE k % 3 = 0
       |  UNION ALL SELECT 'd'||k::VARCHAR, 'c'||k::VARCHAR, sch,
       |    'name', 'name', c_name, k FROM cust WHERE k % 50 = 0
       |  UNION ALL SELECT 'd'||k::VARCHAR, 'c'||k::VARCHAR, sch,
       |    'alias', 'name', upper(c_name), k FROM cust WHERE k % 50 = 0),
       |stmt_lines AS (
       |  SELECT md5('etl_a|'||eid||'|'||prop||'|'||value) || '|' || eid || '|'
       |    || cid || '|' || prop || '|' || ptype || '|' || sch || '|' || value
       |    || '|' || value || '|etl_a|en|crawl|false|'
       |    || (CASE WHEN eid LIKE 'c%' AND k % 7 != 0
       |              AND NOT (prop = 'name' AND k % 11 = 0)
       |         THEN '2025-01-01' ELSE '2026-01-01' END)
       |    || '|2026-01-01' AS line
       |  FROM v2s),
       |simple_lines AS (
       |  SELECT 'c'||k::VARCHAR || '|' || sch || '|' || c_name || '|'
       |    || (CASE WHEN k % 50 = 0 THEN upper(c_name) ELSE '' END) || '|'
       |    || (CASE WHEN k % 4 != 0 THEN '19'||(50 + k % 50)::VARCHAR ELSE '' END) || '|'
       |    || country || '||'
       |    || (CASE WHEN k % 4 = 0 THEN 'RN'||k::VARCHAR ELSE '' END)
       |    || '|||||etl_a|||' AS line
       |  FROM cust WHERE k % 3 = 0),
       |counts AS (
       |  SELECT (SELECT COUNT(*) FROM cust) AS n_ent,
       |    (SELECT COUNT(*) FROM v2s) AS n_stmt,
       |    (SELECT COUNT(*) FROM cust WHERE k % 3 = 0) AS n_target),
       |catalog_lines AS (
       |  SELECT '{"name":"etl_a","entity_count":' || n_ent::VARCHAR
       |    || ',"statement_count":' || n_stmt::VARCHAR
       |    || ',"schemata":["Company","Person"],"last_change":"2026-01-01"}' AS line
       |  FROM counts),
       |nested_lines AS (
       |  SELECT line FROM ftm WHERE k % 3 = 0),
       |pr AS (
       |  SELECT k, sch, prop FROM (
       |    SELECT k, sch, 'name' AS prop FROM cust
       |    UNION ALL SELECT k, sch, 'country' FROM cust
       |    UNION ALL SELECT k, sch, 'birthDate' FROM cust WHERE k % 4 != 0
       |    UNION ALL SELECT k, sch, 'registrationNumber' FROM cust WHERE k % 4 = 0
       |    UNION ALL SELECT k, sch, 'topics' FROM cust WHERE k % 3 = 0
       |    UNION ALL SELECT k, sch, 'alias' FROM cust WHERE k % 50 = 0)),
       |schemata_json AS (
       |  SELECT string_agg(DISTINCT '"' || sch || '"', ',' ORDER BY '"' || sch || '"') AS j
       |  FROM cust),
       |properties_json AS (
       |  SELECT string_agg(DISTINCT '"' || sch || ':' || prop || '"', ','
       |    ORDER BY '"' || sch || ':' || prop || '"') AS j
       |  FROM pr),
       |tpr AS (SELECT country AS code, 'c' || k::VARCHAR AS eid
       |        FROM cust WHERE k % 3 = 0),
       |thpr AS (SELECT country AS code, 'c' || k::VARCHAR AS eid FROM cust),
       |${PipelineQueries.sqlHllEst("tc", "tpr")},
       |${PipelineQueries.sqlHllEst("th", "thpr")},
       |tcountry_json AS (
       |  SELECT COALESCE(string_agg(
       |    '{"code":"' || country || '","count":' || cnt || ',"label":"' || country
       |      || '","est_distinct":' || he.est || '}',
       |    ',' ORDER BY cnt DESC, country), '') AS j
       |  FROM (SELECT country, COUNT(*) AS cnt FROM cust WHERE k % 3 = 0
       |        GROUP BY country) tq
       |  JOIN he_tc he ON he.code = tq.country),
       |thcountry_json AS (
       |  SELECT COALESCE(string_agg(
       |    '{"code":"' || country || '","count":' || cnt || ',"label":"' || country
       |      || '","est_distinct":' || he.est || '}',
       |    ',' ORDER BY cnt DESC, country), '') AS j
       |  FROM (SELECT country, COUNT(*) AS cnt FROM cust GROUP BY country) tq
       |  JOIN he_th he ON he.code = tq.country),
       |tschema_json AS (
       |  SELECT COALESCE(string_agg(
       |    '{"name":"' || sch || '","count":' || cnt || ',"label":"' || sch
       |      || '","plural":"' || sch || 's"}',
       |    ',' ORDER BY cnt DESC, sch), '') AS j
       |  FROM (SELECT sch, COUNT(*) AS cnt FROM cust WHERE k % 3 = 0 GROUP BY sch)),
       |thschema_json AS (
       |  SELECT COALESCE(string_agg(
       |    '{"name":"' || sch || '","count":' || cnt || ',"label":"' || sch
       |      || '","plural":"' || sch || 's"}',
       |    ',' ORDER BY cnt DESC, sch), '') AS j
       |  FROM (SELECT sch, COUNT(*) AS cnt FROM cust GROUP BY sch)),
       |ewp_json AS (
       |  SELECT COALESCE(string_agg(
       |    '{"schema":"' || sch || '","property":"' || prop || '","count":' || cnt
       |      || ',"total":' || total || ',"fill_rate":'
       |      || ((cnt::DOUBLE / total::DOUBLE)::DECIMAL(8,6))::VARCHAR || '}',
       |    ',' ORDER BY sch, prop), '') AS j
       |  FROM (SELECT p.sch, p.prop, COUNT(*) AS cnt, t.total
       |        FROM pr p JOIN (SELECT sch, COUNT(*) AS total FROM cust GROUP BY sch) t
       |          ON p.sch = t.sch
       |        GROUP BY p.sch, p.prop, t.total)),
       |stats_lines AS (
       |  SELECT '{"last_change":null,"schemata":[' || s.j
       |    || '],"properties":[' || p.j
       |    || '],"entity_count":' || c.n_ent
       |    || ',"target_count":' || c.n_target
       |    || ',"targets":{"total":' || c.n_target
       |    || ',"countries":[' || tc.j
       |    || '],"schemata":[' || ts.j
       |    || ']},"sanctions":{"programs":[]},"things":{"total":' || c.n_ent
       |    || ',"countries":[' || thc.j
       |    || '],"schemata":[' || ths.j
       |    || '],"entities_with_prop":[' || ewp.j || ']}}' AS line
       |  FROM schemata_json s, properties_json p, counts c, tcountry_json tc,
       |       tschema_json ts, thcountry_json thc, thschema_json ths, ewp_json ewp),
       |senzing_lines AS (
       |  SELECT '{"DATA_SOURCE":"etl_a","RECORD_ID":"c' || k::VARCHAR
       |    || '","RECORD_TYPE":"'
       |    || (CASE WHEN k % 4 = 0 THEN 'ORGANIZATION' ELSE 'PERSON' END)
       |    || '","NAMES":[{"NAME_TYPE":"PRIMARY","'
       |    || (CASE WHEN k % 4 = 0 THEN 'NAME_ORG' ELSE 'NAME_FULL' END)
       |    || '":"' || c_name || '"}]'
       |    || (CASE WHEN k % 3 = 0 THEN ',"RISKS":[{"TOPIC":"sanction"}]' ELSE '' END)
       |    || (CASE WHEN k % 4 != 0 THEN ',"DATES":[{"DATE_OF_BIRTH":"19'
       |         || (50 + k % 50)::VARCHAR || '"}]' ELSE '' END)
       |    || ',"COUNTRIES":[{"'
       |    || (CASE WHEN k % 4 = 0 THEN 'COUNTRY_OF_ASSOCIATION' ELSE 'NATIONALITY' END)
       |    || '":"' || country || '"}]'
       |    || ',"IDENTIFIERS":['
       |    || (CASE WHEN k % 4 = 0 THEN '{"NATIONAL_ID_NUMBER":"RN' || k::VARCHAR || '"},' ELSE '' END)
       |    || '{"OTHER_ID_TYPE":"OPEN_SANCTIONS","OTHER_ID_NUMBER":"c' || k::VARCHAR
       |    || '"}]}' AS line
       |  FROM cust),
       |index_lines AS (
       |  SELECT '{"name":"etl_a","entity_count":' || n_ent::VARCHAR
       |    || ',"target_count":' || n_target::VARCHAR
       |    || ',"thing_count":' || n_ent::VARCHAR
       |    || ',"statement_count":' || n_stmt::VARCHAR
       |    || ',"schemata":["Company","Person"],"last_change":"2026-01-01"'
       |    || ',"issue_levels":{},"issue_count":0,"version":"v2"'
       |    || ',"updated_at":"2026-01-01 00:00:00"'
       |    || ',"last_export":"2026-01-01 00:00:00","result":"successful"'
       |    || ',"resources":['
       |    || '{"name":"catalog.json","path":"catalog.json"},'
       |    || '{"name":"entities.delta.json","path":"entities.delta.json"},'
       |    || '{"name":"entities.ftm.json","path":"entities.ftm.json"},'
       |    || '{"name":"index.json","path":"index.json"},'
       |    || '{"name":"names.txt","path":"names.txt"},'
       |    || '{"name":"senzing.json","path":"senzing.json"},'
       |    || '{"name":"statements.csv","path":"statements.csv"},'
       |    || '{"name":"statistics.json","path":"statistics.json"},'
       |    || '{"name":"targets.nested.json","path":"targets.nested.json"},'
       |    || '{"name":"targets.simple.csv","path":"targets.simple.csv"}'
       |    || ']}' AS line
       |  FROM counts)
       |SELECT product, n_lines, hash_sum FROM (
       |  ${digest("entities.ftm.json", "(SELECT line FROM ftm)")}
       |  UNION ALL ${digest("names.txt", "name_lines")}
       |  UNION ALL ${digest("entities.delta.json", "delta_lines")}
       |  UNION ALL ${digest("catalog.json", "catalog_lines")}
       |  UNION ALL ${digest("index.json", "index_lines")}
       |  UNION ALL ${digest("statistics.json", "stats_lines")}
       |  UNION ALL ${digest("targets.nested.json", "nested_lines")}
       |  UNION ALL ${digest("senzing.json", "senzing_lines")}
       |  UNION ALL ${digest("statements.csv", "stmt_lines")}
       |  UNION ALL ${digest("targets.simple.csv", "simple_lines")})
       |ORDER BY product""".stripMargin

  /** DuckDB oracle for q113 (crawl + enrichment composed into one ETL
    * run — see [[EtlQueries]] for the entity model). Match arithmetic:
    * customer names are unique, so blocked pairs are exactly the
    * name-equal (s{k}, t{k}) for even k with Jaccard 1.0; the
    * judgement gate routes k%10=0 POSITIVE → internal (canonicalized
    * into s{k}), k%10=6 NEGATIVE → dropped, the rest → external
    * candidates; the same-id short-circuit adds the t-side s{k}
    * (k%10=0) as an unjudged external. External statements appear in
    * statements.csv with external=true and in NO entity-view product
    * (ftm/names/targets). */
  val enrichSql: String = {
    val canon = "(CASE WHEN k % 10 = 0 THEN 's' ELSE 't' END) || k::VARCHAR"
    val ext = "(CASE WHEN k % 10 = 0 THEN 'false' ELSE 'true' END)"
    s"""WITH cust AS (SELECT c_custkey AS k, c_name FROM customer),
       |ftm_lines AS (
       |  SELECT '{"id":"s' || k::VARCHAR || '","schema":"Person","properties":{'
       |    || '"name":["' || c_name
       |    || (CASE WHEN k % 10 = 0 THEN '","Same ' || k::VARCHAR ELSE '' END) || '"]'
       |    || (CASE WHEN k % 10 = 0
       |        THEN ',"registrationNumber":["X' || k::VARCHAR || '"]' ELSE '' END)
       |    || (CASE WHEN k % 3 = 0 THEN ',"topics":["sanction"]' ELSE '' END)
       |    || '}}' AS line
       |  FROM cust),
       |name_lines AS (
       |  SELECT DISTINCT c_name AS line FROM cust
       |  UNION
       |  SELECT DISTINCT 'Same ' || k::VARCHAR FROM cust WHERE k % 10 = 0),
       |stmt_lines AS (
       |  SELECT md5('enr_a|s' || k::VARCHAR || '|name|' || c_name)
       |    || '|s' || k::VARCHAR || '|s' || k::VARCHAR
       |    || '|name|name|Person|' || c_name || '|' || c_name
       |    || '|enr_a|en|crawl|false|2026-02-01|2026-02-01' AS line
       |  FROM cust
       |  UNION ALL
       |  SELECT md5('enr_a|s' || k::VARCHAR || '|topics|sanction')
       |    || '|s' || k::VARCHAR || '|s' || k::VARCHAR
       |    || '|topics|topic|Person|sanction|sanction'
       |    || '|enr_a|en|crawl|false|2026-02-01|2026-02-01'
       |  FROM cust WHERE k % 3 = 0
       |  UNION ALL
       |  SELECT md5('ext_b|t' || k::VARCHAR || '|name|' || c_name)
       |    || '|t' || k::VARCHAR || '|' || $canon
       |    || '|name|name|Person|' || c_name || '|' || c_name
       |    || '|enr_a|en|enrich|' || $ext || '|2026-02-01|2026-02-01'
       |  FROM cust WHERE k % 2 = 0 AND k % 10 != 6
       |  UNION ALL
       |  SELECT md5('ext_b|t' || k::VARCHAR || '|registrationNumber|X' || k::VARCHAR)
       |    || '|t' || k::VARCHAR || '|' || $canon
       |    || '|registrationNumber|identifier|Person|X' || k::VARCHAR || '|X' || k::VARCHAR
       |    || '|enr_a|en|enrich|' || $ext || '|2026-02-01|2026-02-01'
       |  FROM cust WHERE k % 2 = 0 AND k % 10 != 6
       |  UNION ALL
       |  SELECT md5('ext_b|t' || k::VARCHAR || '|topics|sanction')
       |    || '|t' || k::VARCHAR || '|' || $canon
       |    || '|topics|topic|Person|sanction|sanction'
       |    || '|enr_a|en|enrich|' || $ext || '|2026-02-01|2026-02-01'
       |  FROM cust WHERE k % 2 = 0 AND k % 10 != 6 AND k % 3 = 0
       |  UNION ALL
       |  -- same-id matches short-circuit to POSITIVE/internal
       |  -- (resolver.get_judgement on identical canonical ids), so the
       |  -- 'Same k' target statements land external=false
       |  SELECT md5('ext_b|s' || k::VARCHAR || '|name|Same ' || k::VARCHAR)
       |    || '|s' || k::VARCHAR || '|s' || k::VARCHAR
       |    || '|name|name|Person|Same ' || k::VARCHAR || '|Same ' || k::VARCHAR
       |    || '|enr_a|en|enrich|false|2026-02-01|2026-02-01'
       |  FROM cust WHERE k % 10 = 0),
       |simple_lines AS (
       |  SELECT 's' || k::VARCHAR || '|Person|' || c_name || '|'
       |    || (CASE WHEN k % 10 = 0 THEN 'Same ' || k::VARCHAR ELSE '' END) || '||||'
       |    || (CASE WHEN k % 10 = 0 THEN 'X' || k::VARCHAR ELSE '' END)
       |    || '|||||enr_a|||' AS line
       |  FROM cust WHERE k % 3 = 0)
       |SELECT product, n_lines, hash_sum FROM (
       |  ${digest("entities.ftm.json", "ftm_lines")}
       |  UNION ALL ${digest("names.txt", "name_lines")}
       |  UNION ALL ${digest("statements.csv", "stmt_lines")}
       |  UNION ALL ${digest("targets.simple.csv", "simple_lines")})
       |ORDER BY product""".stripMargin
  }

  /** q115: the enrichment-expansion run — subjects "alpha k", matched
    * targets t_k (k%10==0) POSITIVE-merged into s_k, and the 2-hop
    * expansion emitting the Ownership edge o_k and owner w_k, all
    * internal. Statement lines mirror StatementIO.exportCsv's column
    * order with model-derived prop types (asset/owner → entity). */
  val expandSql: String = {
    s"""WITH ks AS (SELECT c_custkey AS k FROM customer),
       |tens AS (SELECT k FROM ks WHERE k % 10 = 0),
       |name_lines AS (
       |  SELECT DISTINCT 'alpha ' || k::VARCHAR AS line FROM ks
       |  UNION
       |  SELECT DISTINCT 'wanda ' || k::VARCHAR FROM tens),
       |stmt_lines AS (
       |  SELECT md5('enr_x|s' || k::VARCHAR || '|name|alpha ' || k::VARCHAR)
       |    || '|s' || k::VARCHAR || '|s' || k::VARCHAR
       |    || '|name|name|Company|alpha ' || k::VARCHAR || '|alpha ' || k::VARCHAR
       |    || '|enr_x|en|crawl|false|2026-02-01|2026-02-01' AS line
       |  FROM ks
       |  UNION ALL
       |  -- matched target: canonicalized into the subject cluster
       |  SELECT md5('ext_y|t' || k::VARCHAR || '|name|alpha ' || k::VARCHAR)
       |    || '|t' || k::VARCHAR || '|s' || k::VARCHAR
       |    || '|name|name|Company|alpha ' || k::VARCHAR || '|alpha ' || k::VARCHAR
       |    || '|enr_x|en|enrich|false|2026-02-01|2026-02-01'
       |  FROM tens
       |  UNION ALL
       |  -- hop-1 Ownership edge entity (asset -> t_k, owner -> w_k);
       |  -- the asset VALUE canonicalizes to the cluster id s_k
       |  -- (apply_statement rewrites entity-ref values), while
       |  -- original_value keeps the raw t_k provenance
       |  SELECT md5('ext_y|o' || k::VARCHAR || '|asset|t' || k::VARCHAR)
       |    || '|o' || k::VARCHAR || '|o' || k::VARCHAR
       |    || '|asset|entity|Ownership|s' || k::VARCHAR || '|t' || k::VARCHAR
       |    || '|enr_x|en|enrich|false|2026-02-01|2026-02-01'
       |  FROM tens
       |  UNION ALL
       |  SELECT md5('ext_y|o' || k::VARCHAR || '|owner|w' || k::VARCHAR)
       |    || '|o' || k::VARCHAR || '|o' || k::VARCHAR
       |    || '|owner|entity|Ownership|w' || k::VARCHAR || '|w' || k::VARCHAR
       |    || '|enr_x|en|enrich|false|2026-02-01|2026-02-01'
       |  FROM tens
       |  UNION ALL
       |  -- hop-2 owner person
       |  SELECT md5('ext_y|w' || k::VARCHAR || '|name|wanda ' || k::VARCHAR)
       |    || '|w' || k::VARCHAR || '|w' || k::VARCHAR
       |    || '|name|name|Person|wanda ' || k::VARCHAR || '|wanda ' || k::VARCHAR
       |    || '|enr_x|en|enrich|false|2026-02-01|2026-02-01'
       |  FROM tens)
       |SELECT product, n_lines, hash_sum FROM (
       |  ${digest("names.txt", "name_lines")}
       |  UNION ALL ${digest("statements.csv", "stmt_lines")})
       |ORDER BY product""".stripMargin
  }
}