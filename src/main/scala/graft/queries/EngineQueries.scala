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
        |  AND (b.ms || '-01') <= strftime(last_day(CAST(a.me || '-01' AS DATE)), '%Y-%m-%d')""".stripMargin)
  )
}
