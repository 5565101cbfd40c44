package graft.queries

import graft.operators.Adjacency
import org.apache.spark.sql.functions._
import Q._

/** The reference's ANALYST workload mirrored as oracle-gated queries —
  * the ad-hoc SQL users run against the published data products
  * (the reference's analysis directory), re-expressed over the synthetic FtM
  * entity graph ([[ExportQueries.syntheticEntities]]) through the real
  * engine operators (adjacency, rollup cells, semi/anti joins):
  *
  *  - q236 ← analysis/most_sanctioned.md:1-19 — per-person sanction
  *    COUNT ranking through the statement→Sanction adjacency, with
  *    distinct-rollup name/country cells and a country gate;
  *  - q237 ← analysis/sanctions_over_time.md:1-26 — the sanction
  *    listing-date time series: one row per Sanction with its target's
  *    identity/country and the sanction's program/date rollups;
  *  - q238 ← analysis/eu_not_ch.md:1-22 — "on list A but not list B":
  *    a semi-join against one program's targets, an anti-join (the
  *    reference's NOT EXISTS) against another's, rollup cells on the
  *    survivors;
  *  - q239 ← analysis/isin_sanctioned.md:1-15 — securities whose
  *    issuer is sanctioned, with the per-issuer program array rollup
  *    and the reference's HAVING NOT ANY(...) exclusion;
  *  - q241 ← analysis/nabc_nsdc_bday_diff.md — cross-dataset
  *    birthDate conflicts through the canonical-id statement
  *    self-join;
  *  - q242 ← analysis/ofsi_american_dates.md — the month/day
  *    format-swap detector (disagreeing dates sharing the year);
  *  - q243 ← analysis/rejected_values.md — the rejected-value rollup
  *    off the REAL cleaning dispatch (the reference groups
  *    'Rejected%' issues by raw value);
  *  - q245 ← analysis/all_peps.md:1-19 — the name-variant × country
  *    expansion per entity with birthDate rollup cells (one row per
  *    (variant, country) pair, the screening-export shape).
  *
  *  - q247 ← analysis/db_maintenance.md — the cache-retention
  *    runbook's "delete the oldest 20000 enrichment cache rows under
  *    a url prefix" as an engine maintenance op
  *    ([[graft.sources.Sources.cacheEvictOldest]]: bottom-k victim
  *    selection via TakeOrdered + broadcast anti-join, never a global
  *    sort of the cache).
  *
  *  - q250 ← analysis/eu_targets.md — the dataset-scoped screening
  *    export: country-gated TARGET entities (the real risk-topic gate,
  *    P1) joined to their sanctions, one row per (entity, sanction)
  *    with name/birth/program/date rollup cells (authority/reason have
  *    no fixture analog; program/startDate carry the same shape);
  *  - q251 ← analysis/program_notes.md — sanction detail rows with the
  *    reference's per-dataset EXCLUSIONS (`sc.dataset <> ...` twice)
  *    and the LEFT OUTER notes-statement join;
  *  - q252 ← analysis/sanctioned_company_names.md — the procurement
  *    join feed: one (id, name) row per Company name variant.
  *
  * With q247 (db_maintenance.md's cache retention; its VACUUM/REINDEX
  * half maps to the store's own maintenance family — q208 compaction,
  * q240 posting compaction, Snapshot vacuum), all 12 analysis/ files
  * are oracle-gated.
  *
  * Round 13 closes the contrib/ QA runbooks' query-shaped surface:
  *  - q265 ← contrib/compare_pack.py:22-133 — the two-pack
  *    entity-level diff ([[graft.operators.Delta.comparePacks]]);
  *  - q266 ← contrib/check_hierarchy.py:20-42 — the catalog hierarchy
  *    audit ([[graft.operators.Validators.checkHierarchy]]).
  *
  * Scale shape: every join is either broadcast-sized (program target
  * lists, dimension rollups) or a key-partitioned equi-join on the
  * entity id; rollups are per-entity array ops on the already-grouped
  * properties map — no corpus-wide window anywhere.
  */
object AnalystQueries {

  private val TargetCountries = Seq("nation_3", "nation_7", "nation_11")

  /** Two-dataset birthDate statement fixture for the cross-list
    * disagreement reports (q241/q242): every customer contributes a
    * birthDate statement to ds_a, and ds_b re-reports it verbatim
    * (k%4 ∈ {0,3}), with day/month SWAPPED (k%4 = 1 — the American-
    * date ingestion bug the reference's ofsi_american_dates.md hunts)
    * or with a different year (k%4 = 2 — a genuine conflict). */
  private def bdayStatements(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val c = t(s, d, "customer")
    val k = col("c_custkey")
    val yearA = (lit(1950) + k % 50).cast("string")
    val month = concat(lit("0"), (lit(1) + k % 9).cast("string"))
    val day = (lit(10) + k % 19).cast("string")
    val vA = concat_ws("-", yearA, month, day)
    val vB = when(k % 4 === 1, concat_ws("-", yearA, day, month))
      .when(k % 4 === 2,
        concat_ws("-", (lit(1951) + k % 50).cast("string"), month, day))
      .otherwise(vA)
    def side(ds: String, v: org.apache.spark.sql.Column) = c.select(
      concat(lit("c"), k.cast("string")).as("canonical_id"),
      lit(ds).as("dataset"), lit("birthDate").as("prop"),
      v.as("value"), col("c_name").as("caption"))
    side("ds_a", vA).unionByName(side("ds_b", vB))
  }

  private val SqlBday =
    """bd AS (
      |  SELECT 'c' || c_custkey::VARCHAR AS canonical_id, c_name AS caption,
      |    (1950 + c_custkey % 50)::VARCHAR || '-0' ||
      |      (1 + c_custkey % 9)::VARCHAR || '-' ||
      |      (10 + c_custkey % 19)::VARCHAR AS a_bday,
      |    CASE c_custkey % 4
      |      WHEN 1 THEN (1950 + c_custkey % 50)::VARCHAR || '-' ||
      |        (10 + c_custkey % 19)::VARCHAR || '-0' ||
      |        (1 + c_custkey % 9)::VARCHAR
      |      WHEN 2 THEN (1951 + c_custkey % 50)::VARCHAR || '-0' ||
      |        (1 + c_custkey % 9)::VARCHAR || '-' ||
      |        (10 + c_custkey % 19)::VARCHAR
      |      ELSE (1950 + c_custkey % 50)::VARCHAR || '-0' ||
      |        (1 + c_custkey % 9)::VARCHAR || '-' ||
      |        (10 + c_custkey % 19)::VARCHAR END AS b_bday
      |  FROM customer)""".stripMargin

  val decls: Seq[Decl] = Seq(

    // analysis/most_sanctioned.md — persons from the gated countries
    // ranked by how many DISTINCT sanctions point at them, with the
    // name/alias and country rollup cells the analysts chart.
    decl("q236_analyst_most_sanctioned",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        val persons = ents.filter(col("schema") === "Person")
          .select(col("id"),
            element_at(col("properties"), "name").as("nm"),
            coalesce(element_at(col("properties"), "alias"),
              array().cast("array<string>")).as("al"),
            element_at(col("properties"), "country").as("co"))
          .filter(arrays_overlap(col("co"),
            array(TargetCountries.map(lit): _*)))
          .select(col("id"),
            element_at(col("nm"), 1).as("caption"),
            concat_ws("; ", array_sort(col("co"))).as("countries"),
            concat_ws("; ",
              array_sort(array_distinct(concat(col("nm"), col("al")))))
              .as("names"))
        // the reference's `ssl.entity_id = ssa.value AND ssa.schema =
        // 'Sanction'` self-join IS the inverted adjacency edge
        val sanc = Adjacency.adjacent(ents)
          .filter(col("direction") === "inv" && col("prop") === "entity" &&
            col("other_id").startsWith("s"))
          .select(col("id"), col("other_id").as("sanction_id"))
        persons.join(sanc, "id")
          .groupBy(col("id"), col("caption"), col("countries"), col("names"))
          .agg(countDistinct(col("sanction_id")).as("sanctions"))
      },
      """WITH cust AS (
        |  SELECT c_custkey AS k, c_name, lower(n_name) AS country
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |p AS (SELECT k, c_name, country,
        |    array_to_string(list_sort(list_distinct(
        |      CASE WHEN k % 5 = 0
        |           THEN [c_name, upper(c_name), c_name || ' Ltd']
        |           ELSE [c_name] END)), '; ') AS names
        |  FROM cust
        |  WHERE k % 4 != 0 AND country IN ('nation_3', 'nation_7', 'nation_11'))
        |SELECT 'c' || k::VARCHAR AS id, c_name AS caption,
        |  country AS countries, names,
        |  COUNT(DISTINCT o_orderkey)::BIGINT AS sanctions
        |FROM p JOIN orders ON o_custkey = k AND o_orderkey % 5 = 0
        |GROUP BY 1, 2, 3, 4""".stripMargin),

    // analysis/sanctions_over_time.md — the listing-date time series:
    // one row per Sanction through the FORWARD adjacency to its
    // target, carrying the target's identity/country and the
    // sanction's program / programId / startDate rollup cells plus the
    // derived listing year the analysts bucket by.
    decl("q237_analyst_sanctions_over_time",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        val adj = Adjacency.adjacent(ents)
          .filter(col("direction") === "fwd" && col("prop") === "entity")
          .select(col("id").as("sanction_id"), col("other_id").as("target_id"),
            col("other_schema").as("entity_type"))
        val sancProps = ents.filter(col("schema") === "Sanction")
          .select(col("id").as("sanction_id"),
            concat_ws(", ", element_at(col("properties"), "program"))
              .as("program"),
            concat_ws(", ", element_at(col("properties"), "programId"))
              .as("program_id"),
            element_at(element_at(col("properties"), "startDate"), 1)
              .as("start_date"))
        val tgt = ents.filter(col("schema").isin("Person", "Company"))
          .select(col("id").as("target_id"),
            element_at(element_at(col("properties"), "name"), 1)
              .as("main_name"),
            element_at(element_at(col("properties"), "country"), 1)
              .as("linked_country"))
        adj.join(sancProps, "sanction_id").join(tgt, "target_id")
          .select(col("sanction_id"), col("target_id"), col("entity_type"),
            col("main_name"), col("linked_country"), col("program"),
            col("program_id"), col("start_date"),
            substring(col("start_date"), 1, 4).as("listing_year"))
      },
      """WITH cust AS (
        |  SELECT c_custkey AS k, c_name, lower(n_name) AS country,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END AS sch
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |s AS (SELECT o_orderkey AS ok, o_custkey AS ck,
        |    strftime(o_orderdate, '%Y-%m-%d') AS sd
        |  FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT 's' || ok::VARCHAR AS sanction_id,
        |  'c' || ck::VARCHAR AS target_id, sch AS entity_type,
        |  c_name AS main_name, country AS linked_country,
        |  'PROG-' || (ok % 7)::VARCHAR AS program,
        |  'ZZ-' || (ok % 5)::VARCHAR AS program_id,
        |  sd AS start_date, substr(sd, 1, 4) AS listing_year
        |FROM s JOIN cust ON ck = k""".stripMargin),

    // analysis/eu_not_ch.md — targets on one authority's list but not
    // another's: country-gated entities, a semi-join against the
    // PROG-1 target set, the reference's NOT EXISTS as an anti-join
    // against PROG-2's, rollup cells on the survivors.
    decl("q238_analyst_list_difference",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        val sprog = ents.filter(col("schema") === "Sanction")
          .select(
            element_at(element_at(col("properties"), "entity"), 1).as("tid"),
            element_at(element_at(col("properties"), "program"), 1)
              .as("program"))
        val listA = sprog.filter(col("program") === "PROG-1")
          .select(col("tid")).distinct()
        val listB = sprog.filter(col("program") === "PROG-2")
          .select(col("tid")).distinct()
        val tgts = ents.filter(col("schema").isin("Person", "Company"))
          .select(col("id"), col("schema").as("type"),
            element_at(element_at(col("properties"), "country"), 1)
              .as("country"),
            element_at(element_at(col("properties"), "name"), 1)
              .as("main_name"),
            concat_ws("; ", coalesce(element_at(col("properties"), "birthDate"),
              array().cast("array<string>"))).as("birth_dates"))
          .filter(col("country").isin(TargetCountries.map(lit): _*))
        tgts
          .join(broadcast(listA), col("id") === listA("tid"), "left_semi")
          .join(broadcast(listB), col("id") === listB("tid"), "left_anti")
      },
      """WITH cust AS (
        |  SELECT c_custkey AS k, c_name, lower(n_name) AS country,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END AS sch
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |sanc AS (SELECT o_custkey AS ck,
        |    'PROG-' || (o_orderkey % 7)::VARCHAR AS prog
        |  FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT 'c' || k::VARCHAR AS id, sch AS type, country,
        |  c_name AS main_name,
        |  CASE WHEN k % 4 != 0 THEN '19' || (50 + k % 50)::VARCHAR
        |       ELSE '' END AS birth_dates
        |FROM cust
        |WHERE country IN ('nation_3', 'nation_7', 'nation_11')
        |  AND EXISTS (SELECT 1 FROM sanc WHERE ck = k AND prog = 'PROG-1')
        |  AND NOT EXISTS (SELECT 1 FROM sanc WHERE ck = k AND prog = 'PROG-2')""".stripMargin),

    // analysis/isin_sanctioned.md — securities whose issuer carries
    // sanctions: the per-issuer sorted program rollup plus the
    // reference's HAVING NOT 'x' = ANY(ARRAY_AGG(...)) exclusion.
    decl("q239_analyst_isin_sanctioned",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        val secs = ents.filter(col("schema") === "Security")
          .select(
            element_at(element_at(col("properties"), "isin"), 1).as("isin"),
            element_at(element_at(col("properties"), "issuer"), 1)
              .as("issuer_id"))
        val progs = ents.filter(col("schema") === "Sanction")
          .select(
            element_at(element_at(col("properties"), "entity"), 1).as("tid"),
            element_at(element_at(col("properties"), "program"), 1)
              .as("program"))
          .groupBy(col("tid"))
          .agg(array_sort(collect_set(col("program"))).as("ps"))
        val issuers = ents.filter(col("schema").isin("Person", "Company"))
          .select(col("id").as("issuer_id"), col("schema").as("issuer_type"),
            element_at(element_at(col("properties"), "name"), 1).as("caption"))
        secs.join(progs, col("issuer_id") === col("tid"))
          .filter(!array_contains(col("ps"), lit("PROG-3")))
          .join(issuers, "issuer_id")
          .select(col("isin"), col("issuer_id"), col("issuer_type"),
            col("caption"), concat_ws("; ", col("ps")).as("programs"))
          .distinct()
      },
      """WITH cust AS (
        |  SELECT c_custkey AS k, c_name,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END AS sch
        |  FROM customer),
        |sec AS (SELECT 'IS' || (o_orderkey % 997)::VARCHAR AS isin,
        |    o_custkey AS ck
        |  FROM orders WHERE o_orderkey % 5 = 2),
        |sanc AS (SELECT o_custkey AS ck,
        |    'PROG-' || (o_orderkey % 7)::VARCHAR AS prog
        |  FROM orders WHERE o_orderkey % 5 = 0),
        |pr AS (SELECT ck,
        |    array_to_string(list_sort(list_distinct(list(prog))), '; ')
        |      AS programs,
        |    list_contains(list(prog), 'PROG-3') AS has3
        |  FROM sanc GROUP BY ck)
        |SELECT DISTINCT sec.isin, 'c' || sec.ck::VARCHAR AS issuer_id,
        |  cust.sch AS issuer_type, cust.c_name AS caption, pr.programs
        |FROM sec JOIN pr ON sec.ck = pr.ck JOIN cust ON cust.k = sec.ck
        |WHERE NOT pr.has3""".stripMargin),

    // analysis/nabc_nsdc_bday_diff.md — the cross-dataset field
    // CONFLICT report: two lists report a birthDate for the same
    // canonical entity and the values disagree. The reference shape is
    // a statement self-join on canonical_id gated by (dataset, prop)
    // on each side; at scale it is a key-partitioned equi-join on the
    // canonical id, never dataset×dataset.
    decl("q241_analyst_bday_conflicts",
      (s, d) => {
        val st = bdayStatements(s, d)
        val a = st.filter(col("dataset") === "ds_a" && col("prop") === "birthDate")
          .select(col("canonical_id"), col("caption"), col("value").as("a_bday"))
        val b = st.filter(col("dataset") === "ds_b" && col("prop") === "birthDate")
          .select(col("canonical_id"), col("value").as("b_bday"))
        a.join(b, "canonical_id")
          .filter(col("a_bday") =!= col("b_bday"))
          .select(col("canonical_id"), col("caption"), col("a_bday"),
            col("b_bday"))
      },
      s"""WITH $SqlBday
        |SELECT canonical_id, caption, a_bday, b_bday
        |FROM bd WHERE a_bday <> b_bday""".stripMargin),

    // analysis/ofsi_american_dates.md — the month/day format-swap
    // detector: same canonical entity, two lists, birthDates that
    // DISAGREE but share the leading year — the signature of one list
    // having ingested the other's date with month and day swapped.
    // The reference's SUBSTR(value, 0, 5) year-equality gate verbatim,
    // plus the explicit swap test the analyst eyeballs.
    decl("q242_analyst_date_format_swap",
      (s, d) => {
        val st = bdayStatements(s, d)
        val a = st.filter(col("dataset") === "ds_a")
          .select(col("canonical_id"), col("value").as("a_bday"))
        val b = st.filter(col("dataset") === "ds_b")
          .select(col("canonical_id"), col("value").as("b_bday"))
        a.join(b, "canonical_id")
          .filter(col("a_bday") =!= col("b_bday") &&
            substring(col("a_bday"), 1, 4) === substring(col("b_bday"), 1, 4))
          .select(col("canonical_id"), col("a_bday"), col("b_bday"),
            (substring(col("a_bday"), 6, 2) === substring(col("b_bday"), 9, 2) &&
              substring(col("a_bday"), 9, 2) === substring(col("b_bday"), 6, 2))
              .as("swapped"))
      },
      s"""WITH $SqlBday
        |SELECT canonical_id, a_bday, b_bday,
        |  (substr(a_bday, 6, 2) = substr(b_bday, 9, 2) AND
        |   substr(a_bday, 9, 2) = substr(b_bday, 6, 2)) AS swapped
        |FROM bd
        |WHERE a_bday <> b_bday AND substr(a_bday, 1, 4) = substr(b_bday, 1, 4)""".stripMargin),

    // analysis/rejected_values.md — the rejected-value rollup: which
    // raw values does the cleaning layer reject, how often, under
    // which property. Runs the REAL per-type cleaning dispatch
    // (ValueClean.cleanInto — the q69 machinery) over the melted
    // statement frame and groups the clean-IS-NULL rows by raw value,
    // exactly the reference's GROUP BY data->>'value' over
    // 'Rejected%' issues.
    decl("q243_analyst_rejected_values",
      (s, d) => {
        import graft.functions.ValueClean
        val o = t(s, d, "orders")
        val k = col("o_orderkey")
        val ptype = when(k % 6 === 0, "date").when(k % 6 === 1, "identifier")
          .when(k % 6 === 2, "name").when(k % 6 === 3, "topic")
          .when(k % 6 === 4, "address").otherwise("phone")
        val value = when(k % 6 === 0,
            concat(date_format(col("o_orderdate"), "yyyy-MM-dd"), lit("T12:34:56")))
          .when(k % 6 === 1,
            concat(lit("IMO "), lpad((k * 37 % 10000000L).cast("string"), 7, "0")))
          .when(k % 6 === 2, when(k % 2 === 0, lit("7")).otherwise(col("o_orderpriority")))
          .when(k % 6 === 3, lit("Sanction"))
          .when(k % 6 === 4, when(k % 2 === 0, lit("NY")).otherwise(lit("Long Street 1")))
          .otherwise(concat(lit("+1-"), col("o_custkey").cast("string")))
        val base = o.select(k, ptype.as("ptype"), value.as("value"))
        val res = ValueClean.cleanInto(base, "res", col("ptype"), col("value"),
          idFormat = when(col("ptype") === "identifier", "imo"),
          formats = Set("imo"))
        res.filter(col("res.clean").isNull)
          .groupBy(col("value"))
          .agg(max(col("ptype")).as("prop"), count(lit(1)).as("n"))
      },
      {
        val imoD = "regexp_replace(value, '[^0-9]', '', 'g')"
        val imoSum = (1 to 6).map(i =>
          s"(ascii(substr($imoD, $i, 1)) - 48) * ${8 - i}").mkString(" + ")
        s"""WITH melted AS (
           |  SELECT o_orderkey,
           |    CASE o_orderkey % 6 WHEN 0 THEN 'date' WHEN 1 THEN 'identifier' WHEN 2 THEN 'name'
           |      WHEN 3 THEN 'topic' WHEN 4 THEN 'address' ELSE 'phone' END AS ptype,
           |    CASE o_orderkey % 6
           |      WHEN 0 THEN strftime(o_orderdate, '%Y-%m-%d') || 'T12:34:56'
           |      WHEN 1 THEN 'IMO ' || lpad(((o_orderkey * 37) % 10000000)::VARCHAR, 7, '0')
           |      WHEN 2 THEN CASE WHEN o_orderkey % 2 = 0 THEN '7' ELSE o_orderpriority END
           |      WHEN 3 THEN 'Sanction'
           |      WHEN 4 THEN CASE WHEN o_orderkey % 2 = 0 THEN 'NY' ELSE 'Long Street 1' END
           |      ELSE '+1-' || o_custkey::VARCHAR END AS value
           |  FROM orders),
           |checked AS (
           |  SELECT o_orderkey, ptype, value,
           |    CASE WHEN ptype = 'identifier'
           |         THEN len($imoD) = 7 AND ($imoSum) % 10 = (ascii(substr($imoD, 7, 1)) - 48)
           |         ELSE TRUE END AS id_ok
           |  FROM melted),
           |cleaned AS (
           |  SELECT value, ptype,
           |    CASE ptype
           |      WHEN 'date' THEN substr(value, 1, 10)
           |      WHEN 'identifier' THEN CASE WHEN id_ok THEN regexp_replace(upper(trim(value)), '[\\s-]', '', 'g') END
           |      WHEN 'name' THEN CASE WHEN len(value) >= 2 AND NOT regexp_matches(value, '^[0-9]+$$') THEN value END
           |      WHEN 'topic' THEN lower(value)
           |      ELSE value END AS clean
           |  FROM checked)
           |SELECT value, MAX(ptype) AS prop, COUNT(*)::BIGINT AS n
           |FROM cleaned WHERE clean IS NULL GROUP BY value""".stripMargin
      }),

    // analysis/all_peps.md — the screening-export expansion: one row
    // per (name variant, linked country) pair per entity, carrying the
    // entity's rollup cells. The reference's statement-level
    // sn(prop_type=name) × sc(prop_type=country) self-join IS a
    // per-entity explode of the two value arrays — expressed that way
    // the plan needs no self-join at all, just two generators over the
    // already-grouped properties map.
    decl("q245_analyst_name_variants",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        val base = ents.filter(col("schema").isin("Person", "Company"))
          .select(col("id").as("entity_id"),
            element_at(element_at(col("properties"), "name"), 1)
              .as("main_name"),
            array_distinct(concat(
              element_at(col("properties"), "name"),
              coalesce(element_at(col("properties"), "alias"),
                array().cast("array<string>")))).as("variants"),
            element_at(col("properties"), "country").as("countries"),
            concat_ws("; ",
              coalesce(element_at(col("properties"), "birthDate"),
                array().cast("array<string>"))).as("birth_date"))
        base
          .select(col("entity_id"), col("main_name"),
            explode(col("countries")).as("country"),
            col("variants"), col("birth_date"))
          .filter(col("country").isin(TargetCountries.map(lit): _*))
          .select(col("entity_id"), col("main_name"), col("country"),
            explode(col("variants")).as("name_variant"), col("birth_date"))
      },
      """WITH cust AS (
        |  SELECT c_custkey AS k, c_name, lower(n_name) AS country
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  WHERE lower(n_name) IN ('nation_3', 'nation_7', 'nation_11')),
        |v AS (SELECT k, c_name, country,
        |    unnest(list_distinct(
        |      CASE WHEN k % 5 = 0
        |           THEN [c_name, upper(c_name), c_name || ' Ltd']
        |           ELSE [c_name] END)) AS name_variant
        |  FROM cust)
        |SELECT 'c' || k::VARCHAR AS entity_id, c_name AS main_name,
        |  country, name_variant,
        |  CASE WHEN k % 4 != 0 THEN '19' || (50 + k % 50)::VARCHAR
        |       ELSE '' END AS birth_date
        |FROM v""".stripMargin),

    // analysis/db_maintenance.md — the cache-retention runbook:
    // "delete the oldest 20000 cached enrichment items" under one url
    // prefix. The victim set is an exact bottom-k by (timestamp, url)
    // — Spark's TakeOrderedAndProject, an O(n)-heap per partition —
    // broadcast into a left-anti join, so the cache table is scanned
    // once and never globally sorted (the shape that still works when
    // the cache is billions of rows and the eviction is 20k).
    decl("q247_analyst_cache_retention",
      (s, d) => {
        import graft.sources.Sources
        val o = t(s, d, "orders")
        val k = col("o_orderkey")
        val cache = o.select(
          concat(
            when(k % 3 === 0, "https://externals.example.org/")
              .otherwise("https://data.example.org/"),
            k.cast("string")).as("url"),
          col("o_orderdate").as("fetched_at"))
        Sources.cacheEvictOldest(cache, "https://externals.example.org/", 500)
          .select(col("url"),
            date_format(col("fetched_at"), "yyyy-MM-dd").as("fetched_on"))
      },
      """WITH cache AS (
        |  SELECT CASE WHEN o_orderkey % 3 = 0
        |           THEN 'https://externals.example.org/' || o_orderkey::VARCHAR
        |           ELSE 'https://data.example.org/' || o_orderkey::VARCHAR END AS url,
        |    o_orderdate AS fetched_at
        |  FROM orders),
        |victims AS (
        |  SELECT url FROM cache
        |  WHERE url LIKE 'https://externals.example.org/%'
        |  ORDER BY fetched_at ASC, url ASC LIMIT 500)
        |SELECT c.url, strftime(c.fetched_at, '%Y-%m-%d') AS fetched_on
        |FROM cache c WHERE c.url NOT IN (SELECT url FROM victims)""".stripMargin),

    // analysis/eu_targets.md — the dataset-scoped screening export:
    // country-gated TARGET entities (the REAL risk-topic gate —
    // arrays_overlap against FtmModel.riskTopics, P1) joined through
    // the sanction pointer, one row per (entity, sanction) carrying
    // the entity's name/birth rollup cells and the sanction's
    // program/date. The reference orders by sanction first_seen for
    // the analyst's eyeball; the gate hashes rows order-free.
    decl("q250_analyst_eu_targets",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        val risks = lit(graft.model.FtmModel.riskTopics.toSeq.sorted.toArray)
        val empty = array().cast("array<string>")
        val tgts = ents.filter(col("schema").isin("Person", "Company"))
          .filter(arrays_overlap(
            coalesce(element_at(col("properties"), "topics"), empty), risks))
          .select(col("id"), col("schema").as("type"),
            element_at(element_at(col("properties"), "country"), 1)
              .as("country"),
            element_at(element_at(col("properties"), "name"), 1)
              .as("main_name"),
            concat_ws("; ", array_sort(array_distinct(concat(
              element_at(col("properties"), "name"),
              coalesce(element_at(col("properties"), "alias"), empty)))))
              .as("other_names"),
            concat_ws("; ",
              coalesce(element_at(col("properties"), "birthDate"), empty))
              .as("birth_dates"))
          .filter(col("country").isin(TargetCountries.map(lit): _*))
        val sanc = ents.filter(col("schema") === "Sanction")
          .select(col("id").as("sanction_id"),
            element_at(element_at(col("properties"), "entity"), 1).as("tid"),
            element_at(element_at(col("properties"), "program"), 1)
              .as("program"),
            element_at(element_at(col("properties"), "startDate"), 1)
              .as("sanction_date"))
        tgts.join(sanc, col("id") === col("tid"))
          .select(col("id"), col("type"), col("country"), col("main_name"),
            col("other_names"), col("birth_dates"), col("sanction_id"),
            col("program"), col("sanction_date"))
      },
      """WITH cust AS (
        |  SELECT c_custkey AS k, c_name, lower(n_name) AS country,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END AS sch
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |tg AS (
        |  SELECT k, c_name, country, sch,
        |    array_to_string(list_sort(list_distinct(
        |      CASE WHEN k % 5 = 0
        |           THEN [c_name, upper(c_name), c_name || ' Ltd']
        |           ELSE [c_name] END)), '; ') AS other_names,
        |    CASE WHEN k % 4 != 0 THEN '19' || (50 + k % 50)::VARCHAR
        |         ELSE '' END AS birth_dates
        |  FROM cust
        |  WHERE k % 3 != 2
        |    AND country IN ('nation_3', 'nation_7', 'nation_11'))
        |SELECT 'c' || k::VARCHAR AS id, sch AS type, country,
        |  c_name AS main_name, other_names, birth_dates,
        |  's' || o_orderkey::VARCHAR AS sanction_id,
        |  'PROG-' || (o_orderkey % 7)::VARCHAR AS program,
        |  strftime(o_orderdate, '%Y-%m-%d') AS sanction_date
        |FROM tg JOIN orders ON o_custkey = k AND o_orderkey % 5 = 0""".stripMargin),

    // analysis/program_notes.md — sanction detail rows with the
    // reference's dataset EXCLUSIONS (two `sc.dataset <>` predicates)
    // and the LEFT OUTER join to the notes statement (a sanction
    // without notes still reports, with an empty cell — coalesced on
    // both engines so the hash never sees an engine-specific NULL
    // rendering).
    decl("q251_analyst_program_notes",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        val o = t(s, d, "orders")
        val ok = col("o_orderkey")
        val sanc = o.filter(ok % 5 === 0)
          .select(concat(lit("s"), ok.cast("string")).as("sanction_id"),
            concat(lit("c"), col("o_custkey").cast("string")).as("target_id"),
            concat(lit("ds_"), (ok % 4).cast("string")).as("dataset"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_seen"))
          .filter(col("dataset") =!= "ds_1" && col("dataset") =!= "ds_2")
        val notes = o.filter(ok % 5 === 0 && ok % 3 === 0)
          .select(concat(lit("s"), ok.cast("string")).as("sanction_id"),
            concat(lit("note for s"), ok.cast("string")).as("note"))
        val tgt = ents.filter(col("schema").isin("Person", "Company"))
          .select(col("id").as("target_id"), col("schema").as("entity_type"),
            element_at(element_at(col("properties"), "name"), 1).as("name"))
        sanc.join(notes, Seq("sanction_id"), "left")
          .join(tgt, "target_id")
          .select(col("target_id").as("id"), col("name"), col("entity_type"),
            col("dataset"), col("first_seen"),
            coalesce(col("note"), lit("")).as("notes"))
      },
      """WITH cust AS (
        |  SELECT c_custkey AS k, c_name,
        |    CASE WHEN c_custkey % 4 = 0 THEN 'Company' ELSE 'Person' END AS sch
        |  FROM customer),
        |sanc AS (
        |  SELECT 's' || o_orderkey::VARCHAR AS sanction_id,
        |    o_custkey AS ck, 'ds_' || (o_orderkey % 4)::VARCHAR AS dataset,
        |    strftime(o_orderdate, '%Y-%m-%d') AS first_seen,
        |    CASE WHEN o_orderkey % 3 = 0
        |         THEN 'note for s' || o_orderkey::VARCHAR ELSE '' END AS notes
        |  FROM orders WHERE o_orderkey % 5 = 0
        |    AND 'ds_' || (o_orderkey % 4)::VARCHAR NOT IN ('ds_1', 'ds_2'))
        |SELECT 'c' || ck::VARCHAR AS id, c_name AS name, sch AS entity_type,
        |  dataset, first_seen, notes
        |FROM sanc JOIN cust ON ck = k""".stripMargin),

    // analysis/sanctioned_company_names.md — the procurement-join
    // feed: one (id, name) row per Company name VARIANT (name + alias
    // statements, the reference's prop_type = 'name' projection).
    decl("q252_analyst_company_names",
      (s, d) => {
        val ents = ExportQueries.syntheticEntities(s, d)
        val empty = array().cast("array<string>")
        ents.filter(col("schema") === "Company")
          .select(col("id"),
            explode(array_distinct(concat(
              element_at(col("properties"), "name"),
              coalesce(element_at(col("properties"), "alias"), empty))))
              .as("name"))
      },
      """SELECT 'c' || c_custkey::VARCHAR AS id,
        |  unnest(list_distinct(
        |    CASE WHEN c_custkey % 5 = 0
        |         THEN [c_name, upper(c_name), c_name || ' Ltd']
        |         ELSE [c_name] END)) AS name
        |FROM customer WHERE c_custkey % 4 = 0""".stripMargin),

    // contrib/compare_pack.py:22-133 — the two-pack entity-level diff:
    // assemble BOTH statement packs (internal view = external=false
    // only; external view = all statements), then the four
    // dict.items() set differences. Fixture: pack A omits entities
    // o_orderkey%11=7 (B-only ids), pack B omits %13=0 (A-only ids),
    // B perturbs an INTERNAL prop at %17=3 (both views diff, both
    // directions) and an EXTERNAL-only prop at %19=5 (externals diff,
    // internals agree) — all four script outputs non-trivially
    // exercised. Spark diffs 32-byte content hashes (Delta.entityHash
    // over the assembled map); the oracle independently replays
    // assembly as a canonical prop=value string per entity and diffs
    // by string inequality — hash-vs-string agreement IS the gate.
    decl("q265_compare_packs",
      (s, d) => {
        def pack(tag: String): org.apache.spark.sql.DataFrame = {
          val o = t(s, d, "orders")
          val base = if (tag == "b") o.filter(col("o_orderkey") % 13 =!= 0)
                     else o.filter(col("o_orderkey") % 11 =!= 7)
          val prio = if (tag == "b")
            when(col("o_orderkey") % 17 === 3,
              concat(col("o_orderpriority"), lit("-B")))
              .otherwise(col("o_orderpriority"))
            else col("o_orderpriority")
          val ref = if (tag == "b")
            when(col("o_orderkey") % 19 === 5, col("o_custkey") + 1)
              .otherwise(col("o_custkey"))
            else col("o_custkey")
          def st(prop: String, value: org.apache.spark.sql.Column,
              external: Boolean) =
            base.select(
              concat(lit("o"), col("o_orderkey").cast("string")).as("entityId"),
              concat(lit("o"), col("o_orderkey").cast("string")).as("canonicalId"),
              lit(prop).as("prop"), lit("Person").as("schema"),
              value.cast("string").as("value"), lit("orders").as("dataset"),
              col("o_orderdate").as("firstSeen"),
              col("o_orderdate").as("lastSeen"),
              lit(external).as("external"))
          st("status", col("o_orderstatus"), external = false)
            .unionByName(st("priority", prio, external = false))
            .unionByName(st("ref", ref, external = true))
        }
        graft.operators.Delta.comparePacks(pack("a"), pack("b"))
          .withColumnRenamed("view", "view_kind")
      },
      """WITH base_a AS (SELECT * FROM orders WHERE o_orderkey % 11 != 7),
        |base_b AS (SELECT * FROM orders WHERE o_orderkey % 13 != 0),
        |stmts AS (
        |  SELECT 'a' AS pack, 'o' || o_orderkey::VARCHAR AS entity_id,
        |         'status' AS prop, o_orderstatus AS value, false AS ext
        |  FROM base_a
        |  UNION ALL SELECT 'a', 'o' || o_orderkey::VARCHAR, 'priority',
        |    o_orderpriority, false FROM base_a
        |  UNION ALL SELECT 'a', 'o' || o_orderkey::VARCHAR, 'ref',
        |    o_custkey::VARCHAR, true FROM base_a
        |  UNION ALL SELECT 'b', 'o' || o_orderkey::VARCHAR, 'status',
        |    o_orderstatus, false FROM base_b
        |  UNION ALL SELECT 'b', 'o' || o_orderkey::VARCHAR, 'priority',
        |    CASE WHEN o_orderkey % 17 = 3 THEN o_orderpriority || '-B'
        |         ELSE o_orderpriority END, false FROM base_b
        |  UNION ALL SELECT 'b', 'o' || o_orderkey::VARCHAR, 'ref',
        |    CASE WHEN o_orderkey % 19 = 5 THEN (o_custkey + 1)::VARCHAR
        |         ELSE o_custkey::VARCHAR END, true FROM base_b),
        |views AS (
        |  SELECT 'internal' AS vw, pack, entity_id, prop, value
        |  FROM stmts WHERE NOT ext
        |  UNION ALL SELECT 'external', pack, entity_id, prop, value FROM stmts),
        |ent AS (SELECT vw, pack, entity_id,
        |        string_agg(DISTINCT prop || '=' || value, ';'
        |          ORDER BY prop || '=' || value) AS state
        |        FROM views GROUP BY 1, 2, 3),
        |j AS (SELECT COALESCE(a.vw, b.vw) AS vw,
        |             COALESCE(a.entity_id, b.entity_id) AS entity_id,
        |             a.state AS sa, b.state AS sb
        |      FROM (SELECT * FROM ent WHERE pack = 'a') a
        |      FULL OUTER JOIN (SELECT * FROM ent WHERE pack = 'b') b
        |        ON a.vw = b.vw AND a.entity_id = b.entity_id)
        |SELECT vw AS view_kind, 'in_a_not_b' AS side, entity_id FROM j
        |WHERE sa IS NOT NULL AND (sb IS NULL OR sb <> sa)
        |UNION ALL
        |SELECT vw, 'in_b_not_a', entity_id FROM j
        |WHERE sb IS NOT NULL AND (sa IS NULL OR sa <> sb)""".stripMargin),

    // contrib/check_hierarchy.py:20-42 — the catalog hierarchy audit:
    // orphan datasets (no children AND no entry_point) and live leaf
    // datasets no collection includes. Fixture catalog from
    // nation/region: nations are leaf datasets (entry_point dropped at
    // %5=0, disabled at %7=3), regions are collections whose children
    // are their nations MINUS the %3=1 ones (so some leaves are
    // uncollected), plus one childless entry-point-less collection.
    // Overlapping rules mean one dataset can carry both issues — the
    // script's two loops warn independently, and so does the operator.
    decl("q266_catalog_hierarchy_audit",
      (s, d) => {
        val n = t(s, d, "nation")
        val datasets = n.select(
          concat(lit("ds_"), col("n_nationkey").cast("string")).as("name"),
          lit(false).as("is_collection"),
          (col("n_nationkey") % 7 === 3).as("disabled"),
          when(col("n_nationkey") % 5 =!= 0, lit("crawler.py"))
            .otherwise(lit(null).cast("string")).as("entry_point"))
        val collections = t(s, d, "region").select(
            concat(lit("col_"), col("r_regionkey").cast("string")).as("name"),
            lit(true).as("is_collection"), lit(false).as("disabled"),
            lit(null).cast("string").as("entry_point"))
          .unionByName(s.range(1).select(lit("col_empty").as("name"),
            lit(true).as("is_collection"), lit(false).as("disabled"),
            lit(null).cast("string").as("entry_point")))
        val children = n.filter(col("n_nationkey") % 3 =!= 1)
          .select(
            concat(lit("col_"), col("n_regionkey").cast("string")).as("collection"),
            concat(lit("ds_"), col("n_nationkey").cast("string")).as("child"))
        graft.operators.Validators.checkHierarchy(
          datasets.unionByName(collections), children)
      },
      """WITH datasets AS (
        |  SELECT 'ds_' || n_nationkey::VARCHAR AS name,
        |         false AS is_collection, n_nationkey % 7 = 3 AS disabled,
        |         CASE WHEN n_nationkey % 5 != 0 THEN 'crawler.py' END
        |           AS entry_point
        |  FROM nation),
        |cat AS (
        |  SELECT * FROM datasets
        |  UNION ALL
        |  SELECT 'col_' || r_regionkey::VARCHAR, true, false, NULL FROM region
        |  UNION ALL SELECT 'col_empty', true, false, NULL),
        |ch AS (SELECT 'col_' || n_regionkey::VARCHAR AS collection,
        |              'ds_' || n_nationkey::VARCHAR AS child
        |       FROM nation WHERE n_nationkey % 3 != 1)
        |SELECT name, 'no_children_no_entry_point' AS issue FROM cat
        |WHERE entry_point IS NULL
        |  AND name NOT IN (SELECT collection FROM ch)
        |UNION ALL
        |SELECT name, 'not_in_any_collection' FROM cat
        |WHERE NOT is_collection AND NOT disabled
        |  AND name NOT IN (SELECT child FROM ch)""".stripMargin))
}
