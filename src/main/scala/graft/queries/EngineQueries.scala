package graft.queries

import graft.model.Statement
import graft.operators.{Consolidate, EntityAssembler, Statistics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Statement/entity engine operators exercised over the synthetic tables:
  * rows are melted into Statement form, run through the real engine
  * operators (typed Aggregator assembly, consolidation expressions,
  * fill-rate statistics), and flattened back to an oracle-checkable shape.
  */
object EngineQueries {

  /** Melt orders into statements: entity o<key>, props from columns.
    * Schema is LegalEntity for one prop and Person for the rest, so
    * assembly must narrow to Person (common_schema semantics). */
  private def orderStatements(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders")
    def st(prop: String, value: org.apache.spark.sql.Column, schema: String) =
      o.select(
        md5(concat_ws("|", col("o_orderkey").cast("string"), lit(prop), value.cast("string"))).as("id"),
        concat(lit("o"), col("o_orderkey").cast("string")).as("entityId"),
        concat(lit("o"), col("o_orderkey").cast("string")).as("canonicalId"),
        lit(prop).as("prop"), lit(schema).as("schema"),
        value.cast("string").as("value"), lit("orders").as("dataset"),
        lit("en").as("lang"), lit("crawl").as("origin"),
        value.cast("string").as("originalValue"),
        col("o_orderdate").as("firstSeen"), col("o_orderdate").as("lastSeen"),
        lit(false).as("external"))
    st("status", col("o_orderstatus"), "LegalEntity")
      .unionByName(st("priority", col("o_orderpriority"), "Person"))
      .unionByName(st("ref", col("o_custkey"), "Person"))
      .unionByName(st("ref", concat(lit("c"), col("o_custkey").cast("string")), "Person"))
  }

  val decls: Seq[Decl] = Seq(

    // A1: statement → entity assembly through the columnar fast path
    // (two-level Catalyst aggregation with once-per-entity schema
    // narrowing); the typed Aggregator variant is covered by
    // EntityAssemblerSpec. Output flattened per (entity, prop).
    decl("q30_assemble_entities",
      (s, d) => {
        val entities = EntityAssembler.assembleColumnar(orderStatements(s, d))
        entities
          .select(col("id").as("entity_id"), col("schema"),
            explode(col("properties")).as(Seq("prop", "vals")))
          .select(col("entity_id"), col("schema"), col("prop"),
            concat_ws(",", col("vals")).as("joined_vals"))
      },
      """WITH stmts AS (
        |  SELECT 'o' || o_orderkey::VARCHAR AS entity_id, 'status' AS prop, o_orderstatus AS value FROM orders
        |  UNION ALL SELECT 'o' || o_orderkey::VARCHAR, 'priority', o_orderpriority FROM orders
        |  UNION ALL SELECT 'o' || o_orderkey::VARCHAR, 'ref', o_custkey::VARCHAR FROM orders
        |  UNION ALL SELECT 'o' || o_orderkey::VARCHAR, 'ref', 'c' || o_custkey::VARCHAR FROM orders)
        |SELECT entity_id, 'Person' AS schema, prop,
        |  string_agg(DISTINCT value, ',' ORDER BY value) AS joined_vals
        |FROM stmts GROUP BY entity_id, prop""".stripMargin),

    // A6: prefix-date simplification via the consolidate expression.
    decl("q31_prefix_dates",
      (s, d) => t(s, d, "lineitem")
        .select(col("l_orderkey"),
          explode(array(
            date_format(col("l_shipdate"), "yyyy-MM-dd"),
            date_format(col("l_shipdate"), "yyyy-MM"),
            date_format(col("l_shipdate"), "yyyy"),
            (year(col("l_shipdate")) + 10).cast("string"))).as("v"))
        .groupBy(col("l_orderkey"))
        .agg(array_sort(collect_set(col("v"))).as("vals"))
        .select(col("l_orderkey"),
          concat_ws(",", Consolidate.simplifyPrefixDates(col("vals"))).as("kept")),
      """WITH vals AS (
        |  SELECT DISTINCT l_orderkey, v FROM (
        |    SELECT l_orderkey, strftime(l_shipdate, '%Y-%m-%d') AS v FROM lineitem
        |    UNION ALL SELECT l_orderkey, strftime(l_shipdate, '%Y-%m') FROM lineitem
        |    UNION ALL SELECT l_orderkey, strftime(l_shipdate, '%Y') FROM lineitem
        |    UNION ALL SELECT l_orderkey, (year(l_shipdate) + 10)::VARCHAR FROM lineitem))
        |SELECT l_orderkey, string_agg(v, ',' ORDER BY v) AS kept
        |FROM vals a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM vals b WHERE b.l_orderkey = a.l_orderkey
        |    AND length(b.v) > length(a.v) AND substr(b.v, 1, length(a.v)) = a.v)
        |GROUP BY l_orderkey""".stripMargin),

    // A2: per-(schema, prop) fill rates over a statement frame.
    decl("q32_fill_rates",
      (s, d) => Statistics.fillRates(
        orderStatements(s, d)
          // drop the 'ref' prop for ~half the entities so fill_rate < 1
          .filter(!(col("prop") === "ref" && col("entityId").substr(lit(2), lit(99)).cast("long") % 2 === 0)))
        .select(col("schema"), col("prop"), col("entities"),
          col("fill_rate").cast("decimal(18,6)").cast("double").as("fill_rate")),
      """WITH stmts AS (
        |  SELECT 'o' || o_orderkey::VARCHAR AS cid, 'LegalEntity' AS schema, 'status' AS prop FROM orders
        |  UNION ALL SELECT 'o' || o_orderkey::VARCHAR, 'Person', 'priority' FROM orders
        |  UNION ALL SELECT 'o' || o_orderkey::VARCHAR, 'Person', 'ref' FROM orders WHERE o_orderkey % 2 != 0
        |  UNION ALL SELECT 'o' || o_orderkey::VARCHAR, 'Person', 'ref' FROM orders WHERE o_orderkey % 2 != 0),
        |totals AS (SELECT schema, COUNT(DISTINCT cid) AS total FROM stmts GROUP BY schema)
        |SELECT s.schema, s.prop, COUNT(DISTINCT s.cid) AS entities,
        |  CAST(CAST(COUNT(DISTINCT s.cid)::DOUBLE / any_value(t.total)::DOUBLE AS DECIMAL(18,6)) AS DOUBLE) AS fill_rate
        |FROM stmts s JOIN totals t ON s.schema = t.schema
        |GROUP BY s.schema, s.prop""".stripMargin),

    // A8/R4: undirected-edge canonical bucketing.
    decl("q33_undirected_edges",
      (s, d) => t(s, d, "lineitem")
        .select(Consolidate.undirectedKey(
          col("l_suppkey").cast("string"),
          (col("l_partkey") % 10).cast("string")).as("edge_key"),
          col("l_orderkey"))
        .groupBy(col("edge_key"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders")),
      """SELECT least(l_suppkey::VARCHAR, (l_partkey % 10)::VARCHAR) || '|' ||
        |       greatest(l_suppkey::VARCHAR, (l_partkey % 10)::VARCHAR) AS edge_key,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1""".stripMargin),

    // J11/T7: partial-ISO interval-overlap join within a bucket.
    decl("q34_interval_overlap",
      (s, d) => {
        val o = t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM").as("m_start"),
          date_format(col("o_orderdate") + expr("INTERVAL 45 DAYS"), "yyyy-MM").as("m_end"))
        val a = o.select(col("o_custkey"), col("o_orderkey").as("k1"),
          col("m_start").as("s1"), col("m_end").as("e1"))
        val b = o.select(col("o_custkey"), col("o_orderkey").as("k2"),
          col("m_start").as("s2"), col("m_end").as("e2"))
        a.join(b, Seq("o_custkey"))
          .filter(col("k1") < col("k2") &&
            Consolidate.intervalsOverlap(col("s1"), col("e1"), col("s2"), col("e2")))
          .select(col("o_custkey"), col("k1"), col("k2"))
      },
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    strftime(o_orderdate, '%Y-%m') AS ms,
        |    strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m') AS me
        |  FROM orders)
        |SELECT a.o_custkey, a.o_orderkey AS k1, b.o_orderkey AS k2
        |FROM o a JOIN o b ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        |WHERE (a.ms || '-01') <= strftime(last_day(CAST(b.me || '-01' AS DATE)), '%Y-%m-%d')
        |  AND (b.ms || '-01') <= strftime(last_day(CAST(a.me || '-01' AS DATE)), '%Y-%m-%d')""".stripMargin),

    // contrib/dead_statements.py (round-12): the maintenance DELETE
    // that drops statements whose dataset left the published catalog.
    // The catalog name set is crawl metadata (hundreds of rows) —
    // broadcast into a LEFT-ANTI join, the statement table scanned
    // once, never shuffled; survivors reported per dataset so the
    // operation's effect is itself the gated result.
    decl("q256_dead_statements",
      (s, d) => {
        import s.implicits._
        val o = t(s, d, "orders")
        val stmts = o.select(col("o_orderkey").as("stmt_id"),
          concat(lit("ds_"), (col("o_orderkey") % 5).cast("string")).as("dataset"))
        val catalog = Seq("ds_0", "ds_2", "ds_3").toDF("dataset")
        stmts.join(broadcast(catalog), Seq("dataset"), "left_semi")
          .groupBy(col("dataset"))
          .agg(count(lit(1)).as("live_statements"))
      },
      """SELECT 'ds_' || (o_orderkey % 5)::VARCHAR AS dataset,
        |  COUNT(*)::BIGINT AS live_statements
        |FROM orders
        |WHERE 'ds_' || (o_orderkey % 5)::VARCHAR IN ('ds_0', 'ds_2', 'ds_3')
        |GROUP BY 1""".stripMargin),

    // contrib/suggest_assertions.py (round-12): derive per-schema
    // min/max assertion suggestions from the dataset's own statistics
    // (the reference reads statistics.json and emits min = 85% of the
    // count, max = 2x). INTEGER floor arithmetic ((n*85)/100) instead
    // of the reference's float int() — the deliberate portability
    // deviation every float barrier in this repo follows; int(n*0.85)
    // is one ulp from flooring for some n, (n*85)//100 is exact on
    // any engine.
    decl("q257_suggest_assertions",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        ents.groupBy(col("schema"))
          .agg(count(lit(1)).as("n"))
          .select(col("schema"), col("n"),
            expr("n * 85 div 100").as("assert_min"),
            (col("n") * 2).as("assert_max"))
      },
      // schema population replayed from the fixture construction rules:
      // customers (Person/Company by k%4), addresses (distinct k%97),
      // orders fan out satellites by o_orderkey%5 (Sanction=0,
      // Identification=1, Security=2), suppliers are Vessels.
      """WITH pop AS (
        |  SELECT CASE WHEN c_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END AS schema
        |  FROM customer
        |  UNION ALL
        |  SELECT 'Address' FROM (SELECT DISTINCT c_custkey % 97 FROM customer)
        |  UNION ALL
        |  SELECT CASE o_orderkey % 5 WHEN 0 THEN 'Sanction'
        |    WHEN 1 THEN 'Identification' ELSE 'Security' END
        |  FROM orders WHERE o_orderkey % 5 IN (0, 1, 2)
        |  UNION ALL
        |  SELECT 'Vessel' FROM supplier)
        |SELECT schema, COUNT(*)::BIGINT AS n,
        |  (COUNT(*) * 85 // 100)::BIGINT AS assert_min,
        |  (COUNT(*) * 2)::BIGINT AS assert_max
        |FROM pop GROUP BY schema""".stripMargin),

    // contrib/topic_check.py + contrib/key_length.py (round-12): the
    // publish-side QA report — targets carrying NO topics (the
    // screening-export smell topic_check hunts) and entity ids longer
    // than the 255-byte store key bound (key_length's check; F10's
    // make_slug caps at exactly this). One pass, two counters per
    // schema, zero if clean — the shape of a production data test.
    decl("q258_publish_qa",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        val empty = array().cast("array<string>")
        val topics = coalesce(element_at(col("properties"), "topics"), empty)
        ents.groupBy(col("schema"))
          .agg(
            sum(when(size(topics) === 0 &&
              col("schema").isin("Person", "Company"), 1L).otherwise(0L))
              .as("untopiced_things"),
            sum(when(length(col("id")) > 255, 1L).otherwise(0L))
              .as("overlong_ids"))
      },
      """WITH ents AS (
        |  SELECT 'c' || c_custkey::VARCHAR AS id,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END AS schema,
        |    (c_custkey % 3) IN (0, 1) AS has_topics
        |  FROM customer
        |  UNION ALL
        |  SELECT 'a' || ak::VARCHAR, 'Address', FALSE
        |  FROM (SELECT DISTINCT c_custkey % 97 AS ak FROM customer)
        |  UNION ALL
        |  SELECT CASE o_orderkey % 5 WHEN 0 THEN 's' WHEN 1 THEN 'i' ELSE 'sec' END
        |      || o_orderkey::VARCHAR,
        |    CASE o_orderkey % 5 WHEN 0 THEN 'Sanction'
        |      WHEN 1 THEN 'Identification' ELSE 'Security' END,
        |    FALSE
        |  FROM orders WHERE o_orderkey % 5 IN (0, 1, 2)
        |  UNION ALL
        |  SELECT 'v' || s_suppkey::VARCHAR, 'Vessel', FALSE FROM supplier)
        |SELECT schema,
        |  SUM(CASE WHEN NOT has_topics AND schema IN ('Person', 'Company')
        |           THEN 1 ELSE 0 END)::BIGINT AS untopiced_things,
        |  SUM(CASE WHEN length(id) > 255 THEN 1 ELSE 0 END)::BIGINT AS overlong_ids
        |FROM ents GROUP BY schema""".stripMargin)
  )
}
