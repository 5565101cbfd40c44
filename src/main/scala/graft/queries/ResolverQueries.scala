package graft.queries

import graft.operators.{AutoMerge, ConnectedComponents, EdgeDedup, Enricher, Reviews, Validators}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Validators, auto-merge heuristics, edge dedupe, the enrichment
  * judgement flow, version ordering and first-wins DB load — the
  * resolver/quality side of SURVEY §2 (J8, R2, R4, J10/J12/P5, A3/A11,
  * O5/T6, K12/K13), each oracle-checked.
  */
object ResolverQueries {

  private val EmptyArr = array().cast("array<string>")

  private def m(pairs: (String, Column)*): Column =
    map_filter(
      map(pairs.flatMap { case (k, v) => Seq(lit(k), v) }: _*),
      (_, v) => size(v) > 0).as("properties")

  /** The q185 decision pipeline — REAL AutoMerge judgements feeding the
    * negative-constrained closure: positive pairs from the Vessel
    * IMO+name rule on consecutive keys, negative pairs from the
    * disjoint-ids rule on skip-one keys. Returns the flagged closure
    * (id, component, vetoed) plus the negative pairs (a, b) — shared by
    * q185 (the closure gate) and q191 (vetoed components routed into
    * the review queue). */
  private def negativeClosure(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val c = t(s, d, "customer")
    val keys = c.select(col("c_custkey").as("k"))
    val arr1 = (v: Column) => array(v)
    val pairsA = keys.alias("l")
      .join(keys.alias("r"), col("l.k") + 1 === col("r.k"))
      .select(col("l.k").as("a"), col("r.k").as("b"))
    val decidedA = pairsA.withColumn("res", AutoMerge.decide(
      lit("Vessel"),
      arr1(concat(lit("IM"), col("a").cast("string"))),
      arr1(concat(lit("IM"), col("a").cast("string"))),
      arr1(lit("Alpha")),
      when(col("a") % 4 =!= 3, arr1(lit("alpha"))).otherwise(arr1(lit("Beta"))),
      EmptyArr, EmptyArr, arr1(lit("us")), arr1(lit("ca")),
      EmptyArr, EmptyArr, EmptyArr, EmptyArr, EmptyArr, EmptyArr,
      EmptyArr, EmptyArr))
    val pairsB = keys.alias("l")
      .join(keys.alias("r2"), col("l.k") + 2 === col("r2.k"))
      .select(col("l.k").as("a"), col("r2.k").as("b"))
    val pkGate = col("a") % 8 === 1 || col("a") % 8 === 3
    val decidedB = pairsB.withColumn("res", AutoMerge.decide(
      lit("Person"),
      EmptyArr, EmptyArr, arr1(lit("Alpha")), arr1(lit("Beta")),
      EmptyArr, EmptyArr, arr1(lit("us")), arr1(lit("ca")),
      EmptyArr, EmptyArr, EmptyArr, EmptyArr, EmptyArr, EmptyArr,
      when(pkGate, arr1(concat(lit("P"), col("a").cast("string"))))
        .otherwise(EmptyArr),
      when(pkGate, arr1(concat(lit("Q"), col("a").cast("string"))))
        .otherwise(EmptyArr)))
    val pos = decidedA.filter(col("res.decision") === AutoMerge.Positive)
      .select(col("a"), col("b"))
    val neg = decidedB.filter(col("res.decision") === AutoMerge.Negative)
      .select(col("a"), col("b"))
    (ConnectedComponents.runWithNegatives(
      keys.select(col("k").as("id")), pos, neg), neg)
  }

  /** The q210/q219 linkage fixture: candidate pairs (consecutive
    * custkeys, both endpoints required) with three boolean agreement
    * fields whose rates differ between the planted latent match class
    * (k%5=0) and the rest. Returns (k, g1, g2, g3). */
  private def fsFixture(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer")
    c.alias("l")
      .join(c.alias("r"), col("r.c_custkey") === col("l.c_custkey") + 1)
      .select(col("l.c_custkey").as("k"))
      .select(col("k"),
        when(col("k") % 5 === 0, col("k") % 7 =!= 0)
          .otherwise(col("k") % 11 === 0).as("g1"),
        when(col("k") % 5 === 0, col("k") % 3 =!= 0)
          .otherwise(col("k") % 13 === 0).as("g2"),
        when(col("k") % 5 === 0, col("k") % 2 === 0)
          .otherwise(col("k") % 17 === 0).as("g3"))
  }

  /** Shared EM-training CTE chain (q210 + q219): pairs, gammas (k
    * carried for the calibration gate), value counts, and the three
    * unrolled EM rounds ending in the trained params p3. */
  private val fsEmSqlCtes: String =
    """WITH pr AS (SELECT a.c_custkey AS k FROM customer a
      |  JOIN customer b ON b.c_custkey = a.c_custkey + 1),
      |g AS (SELECT k,
      |  CASE WHEN k % 5 = 0 THEN k % 7 <> 0 ELSE k % 11 = 0 END AS g1,
      |  CASE WHEN k % 5 = 0 THEN k % 3 <> 0 ELSE k % 13 = 0 END AS g2,
      |  CASE WHEN k % 5 = 0 THEN k % 2 = 0 ELSE k % 17 = 0 END AS g3
      |  FROM pr),
      |vc AS (SELECT g1, g2, g3, COUNT(*)::BIGINT AS n FROM g GROUP BY 1, 2, 3),
      |p0 AS (SELECT 0.1::DOUBLE AS lam, 0.9::DOUBLE AS m1, 0.9::DOUBLE AS m2,
      |  0.9::DOUBLE AS m3, 0.1::DOUBLE AS u1, 0.1::DOUBLE AS u2, 0.1::DOUBLE AS u3),
      |e1 AS (SELECT vc.*, CAST(
      |  (lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
      |       * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
      |       * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END)) /
      |  ((lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
      |        * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
      |        * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END))
      |   + ((1.0 - lam) * (CASE WHEN g1 THEN u1 ELSE 1.0 - u1 END)
      |                  * (CASE WHEN g2 THEN u2 ELSE 1.0 - u2 END)
      |                  * (CASE WHEN g3 THEN u3 ELSE 1.0 - u3 END)))
      |  AS DECIMAL(14,12))::DOUBLE AS w FROM vc CROSS JOIN p0),
      |p1 AS (SELECT
      |  CAST(SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE / SUM(n)::DOUBLE AS DECIMAL(12,9))::DOUBLE AS lam,
      |  CAST(SUM(CAST(CASE WHEN g1 THEN w * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS m1,
      |  CAST(SUM(CAST(CASE WHEN g2 THEN w * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS m2,
      |  CAST(SUM(CAST(CASE WHEN g3 THEN w * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS m3,
      |  CAST(SUM(CAST(CASE WHEN g1 THEN (1.0 - w) * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST((1.0 - w) * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS u1,
      |  CAST(SUM(CAST(CASE WHEN g2 THEN (1.0 - w) * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST((1.0 - w) * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS u2,
      |  CAST(SUM(CAST(CASE WHEN g3 THEN (1.0 - w) * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST((1.0 - w) * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS u3
      |  FROM e1),
      |e2 AS (SELECT vc.*, CAST(
      |  (lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
      |       * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
      |       * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END)) /
      |  ((lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
      |        * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
      |        * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END))
      |   + ((1.0 - lam) * (CASE WHEN g1 THEN u1 ELSE 1.0 - u1 END)
      |                  * (CASE WHEN g2 THEN u2 ELSE 1.0 - u2 END)
      |                  * (CASE WHEN g3 THEN u3 ELSE 1.0 - u3 END)))
      |  AS DECIMAL(14,12))::DOUBLE AS w FROM vc CROSS JOIN p1),
      |p2 AS (SELECT
      |  CAST(SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE / SUM(n)::DOUBLE AS DECIMAL(12,9))::DOUBLE AS lam,
      |  CAST(SUM(CAST(CASE WHEN g1 THEN w * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS m1,
      |  CAST(SUM(CAST(CASE WHEN g2 THEN w * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS m2,
      |  CAST(SUM(CAST(CASE WHEN g3 THEN w * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS m3,
      |  CAST(SUM(CAST(CASE WHEN g1 THEN (1.0 - w) * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST((1.0 - w) * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS u1,
      |  CAST(SUM(CAST(CASE WHEN g2 THEN (1.0 - w) * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST((1.0 - w) * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS u2,
      |  CAST(SUM(CAST(CASE WHEN g3 THEN (1.0 - w) * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST((1.0 - w) * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS u3
      |  FROM e2),
      |e3 AS (SELECT vc.*, CAST(
      |  (lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
      |       * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
      |       * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END)) /
      |  ((lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
      |        * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
      |        * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END))
      |   + ((1.0 - lam) * (CASE WHEN g1 THEN u1 ELSE 1.0 - u1 END)
      |                  * (CASE WHEN g2 THEN u2 ELSE 1.0 - u2 END)
      |                  * (CASE WHEN g3 THEN u3 ELSE 1.0 - u3 END)))
      |  AS DECIMAL(14,12))::DOUBLE AS w FROM vc CROSS JOIN p2),
      |p3 AS (SELECT
      |  CAST(SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE / SUM(n)::DOUBLE AS DECIMAL(12,9))::DOUBLE AS lam,
      |  CAST(SUM(CAST(CASE WHEN g1 THEN w * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS m1,
      |  CAST(SUM(CAST(CASE WHEN g2 THEN w * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS m2,
      |  CAST(SUM(CAST(CASE WHEN g3 THEN w * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST(w * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS m3,
      |  CAST(SUM(CAST(CASE WHEN g1 THEN (1.0 - w) * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST((1.0 - w) * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS u1,
      |  CAST(SUM(CAST(CASE WHEN g2 THEN (1.0 - w) * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST((1.0 - w) * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS u2,
      |  CAST(SUM(CAST(CASE WHEN g3 THEN (1.0 - w) * n ELSE 0.0 END AS DECIMAL(30,12)))::DOUBLE
      |     / SUM(CAST((1.0 - w) * n AS DECIMAL(30,12)))::DOUBLE AS DECIMAL(12,9))::DOUBLE AS u3
      |  FROM e3)""".stripMargin

  val decls: Seq[Decl] = Seq(

    // J8: two-hop self-reference detection.
    decl("q74_self_reference",
      (s, d) => {
        val o = t(s, d, "orders")
        val ok = col("o_orderkey")
        val a = o.select(concat(lit("p"), ok.cast("string")).as("id"),
          lit("UnknownLink").as("schema"),
          m("subject" -> array(concat(lit("q"), ok.cast("string")))))
        val b = o.select(concat(lit("q"), ok.cast("string")).as("id"),
          lit("UnknownLink").as("schema"),
          m("object" -> when(ok % 3 === 0,
            array(concat(lit("p"), ok.cast("string")))).otherwise(EmptyArr)))
        Validators.selfReferences(a.unionByName(b))
      },
      """SELECT 'p' || o_orderkey::VARCHAR AS id, 'subject' AS prop,
        |  'q' || o_orderkey::VARCHAR AS other_id, 'object' AS other_prop
        |FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT 'q' || o_orderkey::VARCHAR, 'object',
        |  'p' || o_orderkey::VARCHAR, 'subject'
        |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin),

    // Assertions: min/max count gates over the synthetic entity frame.
    decl("q75_assertions",
      (s, d) => Validators.checkAssertions(
        ExportQueries.syntheticEntities(s, d),
        Seq(
          Validators.Assertion("entity_count", "gte", "", 100),
          Validators.Assertion("entity_count", "lte", "", 10),
          Validators.Assertion("schema_entities", "gte", "Person", 10),
          Validators.Assertion("schema_entities", "gte", "Airplane", 1),
          Validators.Assertion("country_entities", "gte", "cc1", 1),
          Validators.Assertion("countries", "lte", "", 1000))),
      """WITH total AS (
        |  SELECT (SELECT COUNT(*) FROM customer)
        |    + (SELECT COUNT(DISTINCT c_custkey % 97) FROM customer)
        |    + (SELECT COUNT(*) FROM orders WHERE o_orderkey % 5 IN (0, 1, 2))
        |    + (SELECT COUNT(*) FROM supplier) AS n),
        |persons AS (SELECT COUNT(*) AS n FROM customer WHERE c_custkey % 4 != 0),
        |cc1 AS (SELECT COUNT(DISTINCT o_orderkey) AS n FROM orders
        |  WHERE o_orderkey % 5 = 1 AND o_orderkey % 10 = 1),
        |ncountries AS (
        |  SELECT COUNT(*) AS n FROM (
        |    SELECT DISTINCT lower(n_name) AS c FROM customer JOIN nation ON c_nationkey = n_nationkey
        |    UNION SELECT DISTINCT 'cc' || (o_orderkey % 10)::VARCHAR FROM orders WHERE o_orderkey % 5 = 1))
        |SELECT 'entity_count' AS metric, '' AS key, 'gte' AS comparison, 100::BIGINT AS threshold,
        |  n::BIGINT AS actual, n >= 100 AS passed, NOT (n >= 100) AS fatal FROM total
        |UNION ALL
        |SELECT 'entity_count', '', 'lte', 10, n::BIGINT, n <= 10, FALSE FROM total
        |UNION ALL
        |SELECT 'schema_entities', 'Person', 'gte', 10, n::BIGINT, n >= 10, NOT (n >= 10) FROM persons
        |UNION ALL
        |SELECT 'schema_entities', 'Airplane', 'gte', 1, 0::BIGINT, FALSE, TRUE
        |UNION ALL
        |SELECT 'country_entities', 'cc1', 'gte', 1, n::BIGINT, n >= 1, NOT (n >= 1) FROM cc1
        |UNION ALL
        |SELECT 'countries', '', 'lte', 1000, n::BIGINT, n <= 1000, FALSE FROM ncountries""".stripMargin),

    // A3/K13: issue level counts with share of total.
    decl("q76_issue_counts",
      (s, d) => Validators.issueCounts(Q.events(s, d), "event_type")
        .select(col("level"), col("n"),
          col("share").cast("decimal(18,6)").cast("double").as("share")),
      """SELECT event_type AS level, COUNT(*) AS n,
        |  CAST(CAST(COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM events)::DOUBLE AS DECIMAL(18,6)) AS DOUBLE) AS share
        |FROM events GROUP BY event_type""".stripMargin),

    // R2: auto-merge pair rules.
    decl("q77_automerge",
      (s, d) => {
        val sup = t(s, d, "supplier")
        val sk = col("s_suppkey")
        val arr1 = (v: Column) => array(v)
        val pair = sup.select(sk.as("pair_id"),
          when(sk % 4 === 0, "Vessel").when(sk % 4 === 1, "Person")
            .when(sk % 4 === 2, "Company").otherwise("Security").as("schema"),
          arr1(concat(lit("IM"), (sk % 50).cast("string"))).as("l_imos"),
          when(sk % 3 === 0, arr1(concat(lit("IM"), (sk % 50).cast("string"))))
            .otherwise(arr1(concat(lit("IM"), (sk % 50 + 1).cast("string")))).as("r_imos"),
          arr1(concat(lit("Alpha "), (sk % 20).cast("string"))).as("l_names"),
          when(sk % 2 === 0, arr1(concat(lit("alpha "), (sk % 20).cast("string"))))
            .otherwise(arr1(lit("Beta"))).as("r_names"),
          when(sk % 5 === 0, arr1(lit("IS1"))).otherwise(EmptyArr).as("l_isins"),
          when(sk % 5 === 0, arr1(lit("IS2"))).otherwise(EmptyArr).as("r_isins"),
          arr1(lit("ru")).as("l_countries"),
          when(sk % 7 === 0, arr1(lit("ru"))).otherwise(arr1(lit("us"))).as("r_countries"),
          arr1(concat(lit("N"), sk.cast("string"))).as("l_inns"),
          when(sk % 3 === 1, arr1(concat(lit("N"), sk.cast("string"))))
            .otherwise(arr1(lit("X"))).as("r_inns"),
          arr1(concat(lit("G"), sk.cast("string"))).as("l_ogrns"),
          when(sk % 2 === 0, arr1(concat(lit("G"), sk.cast("string"))))
            .otherwise(arr1(lit("Y"))).as("r_ogrns"),
          when(sk % 9 === 0, arr1(lit("LEI1"))).otherwise(EmptyArr).as("l_leis"),
          when(sk % 9 === 0, arr1(lit("LEI1"))).otherwise(EmptyArr).as("r_leis"),
          when(sk % 10 === 1, arr1(lit("P1"))).otherwise(EmptyArr).as("l_pk"),
          when(sk % 10 === 1, arr1(lit("P2"))).otherwise(EmptyArr).as("r_pk"))
        pair.withColumn("res", AutoMerge.decide(col("schema"),
            col("l_imos"), col("r_imos"), col("l_names"), col("r_names"),
            col("l_isins"), col("r_isins"), col("l_countries"), col("r_countries"),
            col("l_inns"), col("r_inns"), col("l_ogrns"), col("r_ogrns"),
            col("l_leis"), col("r_leis"), col("l_pk"), col("r_pk")))
          .select(col("pair_id"), col("schema"),
            col("res.decision").as("decision"), col("res.rule").as("rule"))
      },
      """SELECT s_suppkey AS pair_id,
        |  CASE WHEN s_suppkey % 4 = 0 THEN 'Vessel' WHEN s_suppkey % 4 = 1 THEN 'Person'
        |       WHEN s_suppkey % 4 = 2 THEN 'Company' ELSE 'Security' END AS schema,
        |  CASE
        |    WHEN s_suppkey % 4 = 0 AND s_suppkey % 3 = 0 AND s_suppkey % 2 = 0 THEN 'POSITIVE'
        |    WHEN s_suppkey % 4 = 1 AND s_suppkey % 7 = 0 AND s_suppkey % 3 = 1 THEN 'POSITIVE'
        |    WHEN s_suppkey % 4 = 2 AND s_suppkey % 7 = 0 AND s_suppkey % 2 = 0 THEN 'POSITIVE'
        |    WHEN s_suppkey % 4 = 2 AND (s_suppkey % 9 = 0 OR s_suppkey % 3 = 0) THEN 'POSITIVE'
        |    WHEN s_suppkey % 4 = 1 AND s_suppkey % 10 = 1 THEN 'NEGATIVE'
        |    WHEN s_suppkey % 4 = 3 AND s_suppkey % 5 = 0 THEN 'NEGATIVE'
        |  END AS decision,
        |  CASE
        |    WHEN s_suppkey % 4 = 0 AND s_suppkey % 3 = 0 AND s_suppkey % 2 = 0 THEN 'vessel_imo'
        |    WHEN s_suppkey % 4 = 1 AND s_suppkey % 7 = 0 AND s_suppkey % 3 = 1 THEN 'ru_inn'
        |    WHEN s_suppkey % 4 = 2 AND s_suppkey % 7 = 0 AND s_suppkey % 2 = 0 THEN 'ru_ogrn'
        |    WHEN s_suppkey % 4 = 2 AND (s_suppkey % 9 = 0 OR s_suppkey % 3 = 0) THEN 'org_identifier'
        |    WHEN s_suppkey % 4 = 1 AND s_suppkey % 10 = 1 THEN 'pk_ids'
        |    WHEN s_suppkey % 4 = 3 AND s_suppkey % 5 = 0 THEN 'security_isin'
        |  END AS rule
        |FROM supplier""".stripMargin),

    // R4/J11/T7: full edge dedupe with protected-prop veto.
    decl("q78_edge_dedup",
      (s, d) => {
        val o = t(s, d, "orders").filter(col("o_orderkey") % 4 === 0)
        val ok = col("o_orderkey")
        val edges = o.select(
          ok.as("edge_id"),
          lit("Membership").as("schema"),
          concat(lit("p"), (col("o_custkey") % 100).cast("string")).as("source"),
          concat(lit("org"), (ok % 40).cast("string")).as("target"),
          lit("1995-01").as("startDate"),
          lit("1995-12").as("endDate"),
          when(ok % 7 === 0, EmptyArr)
            .otherwise(array(concat(lit("Role "), (ok % 3).cast("string"))))
            .as("protected"))
        EdgeDedup.mergeGroups(edges, directedSchemas = Set("Membership"))
      },
      """WITH e AS (
        |  SELECT o_orderkey AS eid, o_custkey % 100 AS pk, o_orderkey % 40 AS tk,
        |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |         ELSE 'role-' || (o_orderkey % 3)::VARCHAR END AS role
        |  FROM orders WHERE o_orderkey % 4 = 0),
        |g AS (SELECT pk, tk, min(eid) AS canon, COUNT(*) AS members,
        |    COUNT(DISTINCT role) AS nroles
        |  FROM e GROUP BY pk, tk)
        |SELECT eid AS edge_id,
        |  CASE WHEN nroles <= 1 AND members > 1 THEN canon ELSE eid END AS cluster,
        |  nroles > 1 AS vetoed
        |FROM e JOIN g USING (pk, tk)""".stripMargin),

    // J10/P5: enrichment judgement gate with same-id short-circuit and
    // person cutoff.
    decl("q79_enrich_gate",
      (s, d) => {
        val c = t(s, d, "customer")
        val k = col("c_custkey")
        val subjects = c.filter(k % 2 === 0)
          .select(concat(lit("c"), k.cast("string")).as("sid"))
        val targets = c.filter(k % 3 === 0)
          .select(concat(lit("c"), k.cast("string")).as("tid"))
        val cands = c.filter(k % 2 === 0).select(
          concat(lit("c"), k.cast("string")).as("subject_id"),
          concat(lit("c"), ((k * 7) % 1500 + 1).cast("string")).as("target_id"),
          ((k % 5).cast("double") / 10.0 + 0.3).as("score"))
        val matches = Enricher.withSameIdMatches(cands,
          c.filter(k % 2 === 0), c.filter(k % 3 === 0),
          concat(lit("c"), col("c_custkey").cast("string")),
          concat(lit("c"), col("c_custkey").cast("string")))
        val decisions = c.filter(k % 2 === 0 && (k % 8 === 0 || k % 8 === 2)).select(
          concat(lit("c"), k.cast("string")).as("subject_id"),
          concat(lit("c"), ((k * 7) % 1500 + 1).cast("string")).as("target_id"),
          when(k % 8 === 0, "POSITIVE").otherwise("NEGATIVE").as("judgement"))
        val gated = Enricher.judgementGate(matches, decisions)
        // person cutoff on the subject side
        val subjDeath = c.select(
          concat(lit("c"), k.cast("string")).as("subject_id"),
          when(k % 10 === 0, concat(lit("19"), (lit(60) + k % 30).cast("string")))
            .otherwise(lit(null).cast("string")).as("death"))
        gated.join(subjDeath, "subject_id")
          .filter(Enricher.personAlive(col("death"), lit(null).cast("string"),
            lit("2020-01-01")))
          .select(col("subject_id"), col("target_id"),
            col("score").cast("decimal(18,6)").cast("double").as("score"), col("route"))
      },
      """WITH rows0 AS (
        |  SELECT 'c' || c_custkey::VARCHAR AS subject_id,
        |    'c' || ((c_custkey * 7) % 1500 + 1)::VARCHAR AS target_id,
        |    (c_custkey % 5)::DOUBLE / 10.0 + 0.3 AS score,
        |    CASE WHEN c_custkey % 8 = 0 THEN 'internal'
        |         WHEN c_custkey % 8 = 2 THEN NULL
        |         ELSE 'external' END AS route,
        |    c_custkey AS k
        |  FROM customer WHERE c_custkey % 2 = 0
        |  UNION ALL
        |  -- same-id matches short-circuit to internal (resolver
        |  -- get_judgement: identical ids are POSITIVE unconditionally)
        |  SELECT 'c' || c_custkey::VARCHAR, 'c' || c_custkey::VARCHAR, 1.0,
        |    'internal', c_custkey
        |  FROM customer WHERE c_custkey % 6 = 0)
        |SELECT subject_id, target_id,
        |  CAST(CAST(score AS DECIMAL(18,6)) AS DOUBLE) AS score, route
        |FROM rows0
        |WHERE route IS NOT NULL AND k % 10 != 0""".stripMargin),

    // J12: bounded 2-hop graph expansion from sanctioned seeds.
    decl("q80_graph_expand",
      (s, d) => {
        val seeds = t(s, d, "customer").filter(col("c_custkey") % 200 === 0)
          .select(concat(lit("c"), col("c_custkey").cast("string")).as("id"))
        graft.operators.Adjacency.expand(
          ExportQueries.syntheticEntities(s, d), seeds, hops = 2)
      },
      """WITH seeds AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 200 = 0)
        |SELECT DISTINCT id FROM (
        |  SELECT 'c' || k::VARCHAR AS id FROM seeds
        |  UNION ALL SELECT 'a' || (k % 97)::VARCHAR FROM seeds
        |  UNION ALL SELECT 's' || o_orderkey::VARCHAR FROM orders JOIN seeds ON o_custkey = k
        |    WHERE o_orderkey % 5 = 0
        |  UNION ALL SELECT 'i' || o_orderkey::VARCHAR FROM orders JOIN seeds ON o_custkey = k
        |    WHERE o_orderkey % 5 = 1
        |  UNION ALL SELECT 'sec' || o_orderkey::VARCHAR FROM orders JOIN seeds ON o_custkey = k
        |    WHERE o_orderkey % 5 = 2
        |  UNION ALL SELECT 'c' || c_custkey::VARCHAR FROM customer JOIN seeds
        |    ON c_custkey % 97 = k % 97)""".stripMargin),

    // A11/O4: occupancy status state machine over partial-ISO dates.
    decl("q81_occupancy_status",
      (s, d) => {
        val o = t(s, d, "orders")
        val ok = col("o_orderkey")
        val start = date_format(col("o_orderdate"), "yyyy-MM")
        val end = when(ok % 4 === 0, lit(""))
          .when(ok % 4 === 1, date_format(col("o_orderdate") + expr("INTERVAL 400 DAYS"), "yyyy"))
          .otherwise(date_format(col("o_orderdate") + expr("INTERVAL 2000 DAYS"), "yyyy-MM-dd"))
        val death = when(ok % 9 === 0, lit("1998")).otherwise(lit(null).cast("string"))
        o.select(ok.as("o_orderkey"),
          Enricher.occupancyStatus(start, end, death, lit("1998-06-15")).as("status"))
      },
      """SELECT o_orderkey,
        |  CASE
        |    WHEN (CASE WHEN o_orderkey % 4 = 0 THEN NULL
        |               WHEN o_orderkey % 4 = 1 THEN make_date(year(o_orderdate + INTERVAL 400 DAY), 12, 31)
        |               ELSE (o_orderdate + INTERVAL 2000 DAY)::DATE END) < DATE '1998-06-15'
        |         OR (o_orderkey % 9 = 0 AND DATE '1998-12-31' < DATE '1998-06-15')
        |      THEN 'ended'
        |    WHEN make_date(year(o_orderdate), month(o_orderdate), 1) <= DATE '1998-06-15'
        |         AND (o_orderkey % 4 = 0
        |              OR (CASE WHEN o_orderkey % 4 = 1 THEN make_date(year(o_orderdate + INTERVAL 400 DAY), 12, 31)
        |                       ELSE (o_orderdate + INTERVAL 2000 DAY)::DATE END) >= DATE '1998-06-15')
        |      THEN 'current'
        |    ELSE 'unknown'
        |  END AS status
        |FROM orders""".stripMargin),

    // O5/T6: version ordering — newest-first walk with a bounded window.
    decl("q83_version_window",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = t(s, d, "orders")
        val versions = o.select(col("o_orderkey"),
            explode(array(lit(1), lit(2), lit(3))).as("v"))
          .filter(col("o_orderkey") % (col("v") + 1) =!= 0)
          .select(col("o_orderkey"),
            concat(lit("2024-0"), col("v").cast("string")).as("version"))
        val w = Window.partitionBy("o_orderkey").orderBy(col("version").desc)
        versions.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("o_orderkey"), col("version"), col("rn"))
      },
      """SELECT o_orderkey, version, rn FROM (
        |  SELECT o_orderkey, version,
        |    row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        |  FROM (SELECT o_orderkey, '2024-0' || v::VARCHAR AS version
        |    FROM orders, generate_series(1, 3) AS g(v)
        |    WHERE o_orderkey % (v + 1) != 0))
        |WHERE rn <= 2""".stripMargin),

    // R3/R5/R1: the resolver decision journal — latest judgement wins,
    // UNSURE overrides dissolve earlier merges — canonicalized via CC
    // with lexicographic-minimum cluster ids.
    decl("q90_resolver_journal",
      (s, d) => {
        val c = t(s, d, "customer")
        val k = col("c_custkey")
        val t1 = lit("2026-01-01 00:00:00").cast("timestamp")
        val t2 = lit("2026-01-02 00:00:00").cast("timestamp")
        val merges = c.filter(k % 5 === 1).select(
          concat(lit("c"), k.cast("string")).as("a"),
          concat(lit("c"), (k + 1).cast("string")).as("b"),
          lit(graft.operators.Resolver.Positive).as("judgement"),
          lit("auto").as("user"), t1.as("decided_at"))
        val explodes = c.filter(k % 10 === 6).select(
          concat(lit("c"), k.cast("string")).as("a"),
          concat(lit("c"), (k + 1).cast("string")).as("b"),
          lit(graft.operators.Resolver.Unsure).as("judgement"),
          lit("review").as("user"), t2.as("decided_at"))
        val nodes = c.select(concat(lit("c"), k.cast("string")).as("id"))
        graft.operators.Resolver.canonicalize(nodes,
          merges.unionByName(explodes))
      },
      // A true REPLAY of the journal semantics, not a closed form: the
      // original oracle assumed seed-42's contiguous custkeys (every
      // k%5==1 has k+1 present), which the second-seed sweep caught —
      // canonicalize only links a merge whose BOTH endpoints are nodes.
      // Live edge = Positive (k%5==1) not overridden by the later
      // Unsure (k%10==6), with k+1 existing in customer; canonical =
      // string-min of the 2-node component = the a side (a,b always
      // share digit count since a%10 ∈ {1,6} — never a trailing 9).
      """WITH live AS (
        |  SELECT 'c' || c.c_custkey::VARCHAR AS a,
        |         'c' || (c.c_custkey + 1)::VARCHAR AS b
        |  FROM customer c
        |  JOIN customer c2 ON c2.c_custkey = c.c_custkey + 1
        |  WHERE c.c_custkey % 5 = 1 AND c.c_custkey % 10 != 6)
        |SELECT n.id AS id, COALESCE(live.a, n.id) AS canonical
        |FROM (SELECT 'c' || c_custkey::VARCHAR AS id FROM customer) n
        |LEFT JOIN live ON n.id = live.b""".stripMargin),

    // R1 (negative half) + R2 end to end: the signature
    // entity-resolution semantics — automatic judgements from the REAL
    // rule engine feed the negative-constrained closure
    // (zavod/zavod/integration/dedupe.py:22-39: negative judgements
    // veto cluster joins). Family A runs consecutive candidate pairs
    // (k, k+1) through AutoMerge.decide with Vessel IMO+name inputs
    // arranged so POSITIVE fires iff k % 4 != 3 — merged runs of up to
    // four entities; family B runs skip-one pairs (k, k+2) through the
    // Pakistani disjoint-ids rule, NEGATIVE iff k % 8 ∈ {1, 3}. A
    // k≡1 (mod 8) negative spans one merged run (veto fires); a k≡3
    // negative straddles two runs (no veto) — both outcomes occur on
    // any key set. Both pair families require BOTH endpoints to exist
    // (the q90 second-seed lesson), and the oracle replays decisions,
    // closure (recursive CTE) and veto with no contiguity assumption.
    decl("q185_negative_constrained_closure",
      (s, d) => negativeClosure(s, d)._1,
      """WITH RECURSIVE ex AS (SELECT c_custkey AS k FROM customer),
        |pos AS (SELECT a.k AS a, b.k AS b FROM ex a
        |  JOIN ex b ON b.k = a.k + 1 WHERE a.k % 4 != 3),
        |neg AS (SELECT a.k AS a, b.k AS b FROM ex a
        |  JOIN ex b ON b.k = a.k + 2 WHERE a.k % 8 IN (1, 3)),
        |sym AS (SELECT a AS x, b AS y FROM pos UNION SELECT b, a FROM pos),
        |reach(id, m) AS (
        |  SELECT k, k FROM ex
        |  UNION
        |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x),
        |comp AS (SELECT id, MIN(m) AS component FROM reach GROUP BY id),
        |vet AS (SELECT DISTINCT ca.component FROM neg
        |  JOIN comp ca ON neg.a = ca.id
        |  JOIN comp cb ON neg.b = cb.id AND ca.component = cb.component)
        |SELECT c.id, c.component, (vet.component IS NOT NULL) AS vetoed
        |FROM comp c LEFT JOIN vet ON c.component = vet.component""".stripMargin),

    // The veto flag gets its CONSUMER (round-10 brief #5): components
    // the negative-constrained closure flagged are routed into the
    // review state machine as conflict rows — the reference's resolver
    // sends exactly these to human judgement (UNSURE queue,
    // zavod/zavod/integration/dedupe.py:93-128) rather than silently
    // keeping or splitting the merge. One review row per vetoed
    // component: the member list is what the reviewer sees
    // (source_value), the negative-pair count is the extraction under
    // review, and the row enters via the REAL q144 upsert
    // (Reviews.reviewExtraction on empty state) then surfaces through
    // the unaccepted() export gate — so a vetoed cluster now BLOCKS
    // export until a reviewer decides, exactly the reference's
    // assert_all_accepted contract. Scale shape: member lists aggregate
    // per component (vetoed components are rare and bounded by the
    // closure's own cluster sizes), the upsert is the q144 full-outer
    // equi-join on key.
    decl("q191_vetoed_review_queue",
      (s, d) => {
        val (cc, neg) = negativeClosure(s, d)
        val compOf = cc.select(col("id"), col("component"))
        val nveto = neg
          .join(compOf.withColumnRenamed("id", "a")
            .withColumnRenamed("component", "ca"), Seq("a"))
          .join(compOf.withColumnRenamed("id", "b")
            .withColumnRenamed("component", "cb"), Seq("b"))
          .filter(col("ca") === col("cb"))
          .groupBy(col("ca")).agg(count(lit(1)).as("n_vetoes"))
          .withColumnRenamed("ca", "component")
        val members = cc.filter(col("vetoed"))
          .groupBy(col("component"))
          .agg(concat_ws(",", sort_array(collect_list(col("id")))).as("members"),
            count(lit(1)).as("n_members"))
        val incoming = members.join(nveto, Seq("component"))
          .select(
            concat(lit("veto-"), col("component").cast("string")).as("key"),
            col("members").as("source_value"),
            concat(lit("negative-pairs:"), col("n_vetoes").cast("string"),
              lit(";members:"), col("n_members").cast("string"))
              .as("original_extraction"),
            lit(1L).as("crawler_version"),
            lit("dedupe-veto").as("origin"))
        val emptyState = incoming.limit(0).select(
          col("key"), col("source_value"), col("original_extraction"),
          col("original_extraction").as("extracted_data"),
          lit(false).as("accepted"), col("crawler_version"), col("origin"),
          lit("").as("last_seen_version"), lit("").as("modified_version"),
          lit("").as("modified_by"))
        val state = Reviews.reviewExtraction(emptyState, incoming, "r1")
        Reviews.unaccepted(state, "r1")
          .select(col("key"), col("source_value"), col("original_extraction"),
            col("extracted_data"), col("accepted"), col("origin"),
            col("modified_by"))
      },
      """WITH RECURSIVE ex AS (SELECT c_custkey AS k FROM customer),
        |pos AS (SELECT a.k AS a, b.k AS b FROM ex a
        |  JOIN ex b ON b.k = a.k + 1 WHERE a.k % 4 != 3),
        |neg AS (SELECT a.k AS a, b.k AS b FROM ex a
        |  JOIN ex b ON b.k = a.k + 2 WHERE a.k % 8 IN (1, 3)),
        |sym AS (SELECT a AS x, b AS y FROM pos UNION SELECT b, a FROM pos),
        |reach(id, m) AS (
        |  SELECT k, k FROM ex
        |  UNION
        |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x),
        |comp AS (SELECT id, MIN(m) AS component FROM reach GROUP BY id),
        |nv AS (SELECT ca.component AS component, COUNT(*)::BIGINT AS n_vetoes
        |  FROM neg JOIN comp ca ON neg.a = ca.id
        |  JOIN comp cb ON neg.b = cb.id AND ca.component = cb.component
        |  GROUP BY 1),
        |mem AS (SELECT component,
        |  string_agg(id::VARCHAR, ',' ORDER BY id) AS members
        |  FROM comp WHERE component IN (SELECT component FROM nv)
        |  GROUP BY 1),
        |mm AS (SELECT component, members,
        |  (SELECT COUNT(*) FROM comp c2
        |   WHERE c2.component = mem.component)::BIGINT AS n_members
        |  FROM mem)
        |SELECT 'veto-' || mm.component::VARCHAR AS key,
        |  members AS source_value,
        |  'negative-pairs:' || nv.n_vetoes::VARCHAR ||
        |    ';members:' || n_members::VARCHAR AS original_extraction,
        |  'negative-pairs:' || nv.n_vetoes::VARCHAR ||
        |    ';members:' || n_members::VARCHAR AS extracted_data,
        |  FALSE AS accepted, 'dedupe-veto' AS origin,
        |  'crawler' AS modified_by
        |FROM mm JOIN nv ON mm.component = nv.component""".stripMargin),

    // R1 incremental (round-11): the resolver's DAILY regime — a new
    // decision batch lands on yesterday's canonicalization fixpoint.
    // Base state: q19's per-nation path graphs, resolved by the full
    // fixpoint. The batch then (a) bridges nation pairs (an edge
    // between the min custkeys of nations 2k and 2k+1 — both endpoints
    // must exist, the q90 second-seed rule), (b) attaches a shifted
    // twin (+10M) of every customer to its base node, exercising
    // new-node attachment. `ConnectedComponents.incremental` contracts
    // the batch onto the component graph (O(batch) rows), runs the
    // fixpoint THERE, and broadcast-remaps — the big labeling is
    // scanned twice and never iterated or shuffled. The oracle is the
    // analytic closure: components = min custkey per nation PAIR,
    // twins inherit their base's component.
    decl("q209_incremental_components",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val c = t(s, d, "customer")
        val w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
        val pathEdges = c.withColumn("next", lead(col("c_custkey"), 1).over(w))
          .filter(col("next").isNotNull)
          .select(col("c_custkey").cast("long").as("src"),
            col("next").cast("long").as("dst"))
        val nodes = c.select(col("c_custkey").cast("long").as("id"))
        val prev = ConnectedComponents.run(nodes, pathEdges)
        val mins = c.groupBy(col("c_nationkey").as("n"))
          .agg(min(col("c_custkey")).cast("long").as("mk"))
        val bridges = mins.filter(col("n") % 2 === 0)
          .select(expr("n div 2").as("g"), col("mk").as("src"))
          .join(mins.filter(col("n") % 2 === 1)
            .select(expr("n div 2").as("g"), col("mk").as("dst")), Seq("g"))
          .select(col("src"), col("dst"))
        val attach = c.select(
          (col("c_custkey") + 10000000L).cast("long").as("src"),
          col("c_custkey").cast("long").as("dst"))
        val twins = c.select((col("c_custkey") + 10000000L).cast("long").as("id"))
        ConnectedComponents.incremental(
          prev, bridges.unionByName(attach), twins)
          .select(col("id").as("custkey"), col("component"))
      },
      """WITH grp AS (
        |  SELECT c_custkey::BIGINT AS custkey,
        |    (min(c_custkey) OVER (PARTITION BY c_nationkey // 2))::BIGINT AS component
        |  FROM customer)
        |SELECT custkey, component FROM grp
        |UNION ALL
        |SELECT custkey + 10000000, component FROM grp""".stripMargin),

    // R2 companion (round-11): Fellegi–Sunter probabilistic linkage
    // trained by EM — the unsupervised complement to the deterministic
    // AutoMerge rules. Candidate pairs (consecutive custkeys, both
    // endpoints required) carry three boolean agreement fields whose
    // rates differ between a planted latent match class (k%5=0) and
    // the rest; the engine aggregates pairs ONCE into the ≤2^3-row
    // comparison-vector value-count table and EM iterates over THAT
    // (per-round cost independent of pair count — the Splink shape).
    // The oracle replays all three EM rounds: every weight round-trips
    // DECIMAL(14,12), every sum is exact decimal, every new parameter
    // rounds through DECIMAL(12,9) — training is bit-replayable across
    // engines by construction.
    decl("q210_fellegi_sunter_em",
      (s, d) => {
        val pairs = fsFixture(s, d)
        val gs = Seq("g1", "g2", "g3")
        val vc = graft.operators.Linkage.comparisonVectorCounts(pairs, gs)
        val params = graft.operators.Linkage.fellegiSunterEm(vc, gs)
        graft.operators.Linkage.fsScorePatterns(vc, gs, params)
          .crossJoin(broadcast(params))
      },
      fsEmSqlCtes + "\n" +
      """SELECT g1, g2, g3, n,
        |  CAST(
        |  (lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
        |       * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
        |       * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END)) /
        |  ((lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
        |        * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
        |        * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END))
        |   + ((1.0 - lam) * (CASE WHEN g1 THEN u1 ELSE 1.0 - u1 END)
        |                  * (CASE WHEN g2 THEN u2 ELSE 1.0 - u2 END)
        |                  * (CASE WHEN g3 THEN u3 ELSE 1.0 - u3 END)))
        |  AS DECIMAL(14,12))::DOUBLE AS match_probability,
        |  CAST(log2(lam / (1.0 - lam))
        |    + log2((CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END) / (CASE WHEN g1 THEN u1 ELSE 1.0 - u1 END))
        |    + log2((CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END) / (CASE WHEN g2 THEN u2 ELSE 1.0 - u2 END))
        |    + log2((CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END) / (CASE WHEN g3 THEN u3 ELSE 1.0 - u3 END))
        |  AS DECIMAL(12,4))::DOUBLE AS match_weight,
        |  lam AS lambda, m1 AS m_g1, m2 AS m_g2, m3 AS m_g3,
        |  u1 AS u_g1, u2 AS u_g2, u3 AS u_g3
        |FROM vc CROSS JOIN p3""".stripMargin),

    // Calibration curve for the trained FS model (round-11): per-pair
    // posterior probabilities binned into deciles, each bin reporting
    // the mean prediction against the EMPIRICAL planted-match rate —
    // the reliability diagram that tells a reviewer whether "0.9"
    // means 90%. Scoring a pair is a broadcast join against the
    // ≤ 2^K-row pattern table (one codegen'd projection at any pair
    // count); the oracle replays training (shared CTE chain), scoring,
    // binning and both exact-decimal ratios.
    decl("q219_fs_calibration",
      (s, d) => {
        val pairs = fsFixture(s, d)
        val gs = Seq("g1", "g2", "g3")
        val vc = graft.operators.Linkage.comparisonVectorCounts(pairs, gs)
        val params = graft.operators.Linkage.fellegiSunterEm(vc, gs)
        val pat = graft.operators.Linkage.fsScorePatterns(vc, gs, params)
          .select(col("g1"), col("g2"), col("g3"),
            col("match_probability").as("p"))
        val n = count(lit(1))
        pairs.join(broadcast(pat), gs)
          .withColumn("latent", col("k") % 5 === 0)
          .withColumn("bin", least(floor(col("p") * 10), lit(9L)).cast("long"))
          .groupBy("bin").agg(
            n.as("n"),
            (sum(col("p").cast("decimal(30,12)")).cast("double") /
              n.cast("double")).cast("decimal(10,6)").cast("double")
              .as("mean_predicted"),
            (sum(when(col("latent"), 1L).otherwise(0L)).cast("double") /
              n.cast("double")).cast("decimal(10,6)").cast("double")
              .as("empirical_rate"))
      },
      fsEmSqlCtes + "\n" +
      """, pp AS (SELECT g.k, CAST(
        |  (lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
        |       * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
        |       * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END)) /
        |  ((lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
        |        * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
        |        * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END))
        |   + ((1.0 - lam) * (CASE WHEN g1 THEN u1 ELSE 1.0 - u1 END)
        |                  * (CASE WHEN g2 THEN u2 ELSE 1.0 - u2 END)
        |                  * (CASE WHEN g3 THEN u3 ELSE 1.0 - u3 END)))
        |  AS DECIMAL(14,12))::DOUBLE AS p FROM g CROSS JOIN p3),
        |b AS (SELECT LEAST(floor(p * 10), 9)::BIGINT AS bin, p,
        |  (k % 5 = 0) AS latent FROM pp)
        |SELECT bin, COUNT(*)::BIGINT AS n,
        |  CAST(SUM(CAST(p AS DECIMAL(30,12)))::DOUBLE / COUNT(*)::DOUBLE
        |    AS DECIMAL(10,6))::DOUBLE AS mean_predicted,
        |  CAST(SUM(CASE WHEN latent THEN 1 ELSE 0 END)::DOUBLE / COUNT(*)::DOUBLE
        |    AS DECIMAL(10,6))::DOUBLE AS empirical_rate
        |FROM b GROUP BY 1""".stripMargin),

    // The composed ER pipeline (round-11): the full Splink workflow as
    // one gate — candidate pairs → comparison vectors → EM-trained FS
    // model → posterior threshold (0.75 keeps the two high-evidence
    // patterns, posterior 0.99/0.80 on seed A) → transitive closure to
    // entity clusters. This gives the trained model its CONSUMER: the
    // resolver merges on calibrated probability, not hand rules. The
    // oracle replays training, scoring, the threshold and the closure
    // (recursive CTE) end-to-end.
    decl("q223_er_clusters",
      (s, d) => {
        val pairs = fsFixture(s, d)
        val gs = Seq("g1", "g2", "g3")
        val vc = graft.operators.Linkage.comparisonVectorCounts(pairs, gs)
        val params = graft.operators.Linkage.fellegiSunterEm(vc, gs)
        val pat = graft.operators.Linkage.fsScorePatterns(vc, gs, params)
          .select(col("g1"), col("g2"), col("g3"),
            col("match_probability").as("p"))
        val edges = pairs.join(broadcast(pat), gs)
          .where(col("p") > 0.75)
          .select(col("k").as("src"), (col("k") + 1).as("dst"))
        val nodes = t(s, d, "customer").select(col("c_custkey").as("id"))
        ConnectedComponents.run(nodes, edges)
          .select(col("id").as("custkey"), col("component"))
      },
      fsEmSqlCtes.replaceFirst("WITH ", "WITH RECURSIVE ") + "\n" +
      """, pp AS (SELECT g.k, CAST(
        |  (lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
        |       * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
        |       * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END)) /
        |  ((lam * (CASE WHEN g1 THEN m1 ELSE 1.0 - m1 END)
        |        * (CASE WHEN g2 THEN m2 ELSE 1.0 - m2 END)
        |        * (CASE WHEN g3 THEN m3 ELSE 1.0 - m3 END))
        |   + ((1.0 - lam) * (CASE WHEN g1 THEN u1 ELSE 1.0 - u1 END)
        |                  * (CASE WHEN g2 THEN u2 ELSE 1.0 - u2 END)
        |                  * (CASE WHEN g3 THEN u3 ELSE 1.0 - u3 END)))
        |  AS DECIMAL(14,12))::DOUBLE AS p FROM g CROSS JOIN p3),
        |ed AS (SELECT k AS a, k + 1 AS b FROM pp WHERE p > 0.75),
        |sym AS (SELECT a AS x, b AS y FROM ed UNION SELECT b, a FROM ed),
        |nodes AS (SELECT c_custkey AS id FROM customer),
        |reach(id, m) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x)
        |SELECT id AS custkey, MIN(m) AS component FROM reach GROUP BY id""".stripMargin),

    // SCD2 + as-of enrichment (round-11): the standard warehouse
    // pattern end-to-end — the q216 dimension (order-status runs per
    // customer) probed by month-end checkpoints through the AsOf
    // operator (union + running window, ONE exchange, no range join).
    // "What was each customer's status at each month end?" — probes
    // before a customer's first order correctly surface null.
    decl("q224_scd2_asof",
      (s, d) => {
        val o = t(s, d, "orders")
        val seqc = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long") *
          10000000000L + col("o_orderkey")
        val dim = graft.operators.Delta.scd2(o, col("o_custkey"), seqc, col("o_orderstatus"))
          .select(col("key").as("ck"), col("valid_from").as("seq"),
            col("value").as("status"))
        val probes = o.select(col("o_custkey").as("ck")).distinct()
          .crossJoin(o.select(
            (datediff(last_day(col("o_orderdate")), lit("1970-01-01")).cast("long") *
              10000000000L + 9999999999L).as("seq"),
            date_format(last_day(col("o_orderdate")), "yyyy-MM").as("month"))
            .distinct())
        graft.operators.AsOf.asOfJoin(probes, dim, "ck", "seq")
      },
      """WITH c AS (SELECT o_custkey AS key,
        |  date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT * 10000000000
        |    + o_orderkey AS seq,
        |  o_orderstatus AS value FROM orders),
        |cp AS (SELECT key, seq, value FROM (
        |  SELECT key, seq, value,
        |    lag(value) OVER (PARTITION BY key ORDER BY seq) AS pv,
        |    row_number() OVER (PARTITION BY key ORDER BY seq) AS rn
        |  FROM c) WHERE rn = 1 OR pv IS DISTINCT FROM value),
        |dim AS (SELECT key AS ck, seq AS vf, value AS status FROM cp),
        |probes AS (SELECT ck, seq, month FROM
        |  (SELECT DISTINCT o_custkey AS ck FROM orders)
        |  CROSS JOIN (SELECT DISTINCT
        |    date_diff('day', DATE '1970-01-01', last_day(o_orderdate))::BIGINT
        |      * 10000000000 + 9999999999 AS seq,
        |    strftime(last_day(o_orderdate), '%Y-%m') AS month FROM orders)),
        |j AS (SELECT p.ck, p.seq, p.month, d.status,
        |  row_number() OVER (PARTITION BY p.ck, p.seq
        |    ORDER BY d.vf DESC NULLS LAST) AS rn
        |  FROM probes p LEFT JOIN dim d ON d.ck = p.ck AND d.vf <= p.seq)
        |SELECT ck, seq, month, status FROM j WHERE rn = 1""".stripMargin),

    // P3/J13: schema-subtree filter + stateful position categorisation.
    decl("q91_schema_filter_positions",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        // P3: Organization subtree = Company entities here
        val orgs = graft.operators.Resolver.schemaFilter(ents, "Organization")
        val positions = orgs.select(col("id").as("position_id"))
        val state = t(s, d, "customer")
          .filter(col("c_custkey") % 8 === 0)
          .select(concat(lit("c"), col("c_custkey").cast("string")).as("position_id"),
            when(col("c_custkey") % 16 === 0, "approved").otherwise("rejected")
              .as("category"),
            lit("reviewer").as("reviewed_by"))
        val (categorized, _) = graft.operators.Positions.categorize(positions, state)
        categorized.select(col("position_id"), col("category"))
      },
      """SELECT 'c' || c_custkey::VARCHAR AS position_id,
        |  CASE WHEN c_custkey % 16 = 0 THEN 'approved'
        |       WHEN c_custkey % 8 = 0 THEN 'rejected'
        |       ELSE 'pending' END AS category
        |FROM customer WHERE c_custkey % 4 = 0""".stripMargin),

    // K9 adjunct (stateful/programs.py:240-248): the keyed program
    // registry with duplicate-key assertion, then the dangling-program
    // validator — Sanction programId values that resolve to no
    // registry key, the q08 anti-join shape against a broadcast
    // dimension. The oracle replays the anti-join itself (no
    // closed-form key-domain assumption — nation keys are bijected on
    // the second seed, so which programs dangle changes with the seed).
    decl("q187_program_registry",
      (s, d) => {
        val reg = graft.operators.Programs.registry(
          t(s, d, "nation").select(
            concat(lit("PRG"), col("n_nationkey").cast("string")).as("program_key"),
            col("n_name").as("title")))
        val sanctions = t(s, d, "orders")
          .filter(col("o_orderkey") % 5 === 1)
          .select(concat(lit("s"), col("o_orderkey").cast("string")).as("sid"),
            concat(lit("PRG"), (col("o_orderkey") % 40).cast("string")).as("pk"))
        graft.operators.Programs.danglingPrograms(
          sanctions, col("sid"), col("pk"), reg)
      },
      """SELECT 's' || o_orderkey::VARCHAR AS id,
        |  'PRG' || (o_orderkey % 40)::VARCHAR AS program_key
        |FROM orders WHERE o_orderkey % 5 = 1
        |  AND 'PRG' || (o_orderkey % 40)::VARCHAR NOT IN
        |    (SELECT 'PRG' || n_nationkey::VARCHAR FROM nation)""".stripMargin),

    // K12: DB load with first-row-wins conflict handling.
    decl("q87_db_load_firstwins",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val o = t(s, d, "orders")
        val w = Window.partitionBy(col("stmt_id"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        o.select((col("o_orderkey") % 1000).as("stmt_id"),
            col("o_orderkey"), col("o_orderdate"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("stmt_id"), col("o_orderkey").as("keeper"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_date"))
      },
      """SELECT stmt_id, o_orderkey AS keeper, strftime(o_orderdate, '%Y-%m-%d') AS first_date
        |FROM (SELECT o_orderkey % 1000 AS stmt_id, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_orderkey % 1000 ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn = 1""".stripMargin)
  )
}
