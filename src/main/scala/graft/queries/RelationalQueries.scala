package graft.queries

import graft.operators.{ConnectedComponents, Dedup, Delta, Statistics}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** SURVEY §2 relational operator surface expressed over the synthetic
  * TPC-H-ish tables, each with a DuckDB oracle. Numeric discipline for
  * oracle parity: sums go through DECIMAL (exact, order-independent)
  * and are cast back to DOUBLE; derived dates/timestamps are emitted as
  * ISO strings; ranking windows carry deterministic tie-breaks.
  */
object RelationalQueries {

  val decls: Seq[Decl] = Seq(

    // S1/A2: scan + filter + hash aggregate (the flagship pricing summary).
    decl("q01_pricing_summary",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order")),
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin),

    // S1/P2: predicate + projection pushdown to the parquet scan.
    decl("q02_scan_filter",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
          col("l_quantity") < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag")),
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 10""".stripMargin),

    // T1/S2: collection = union of leaf scans.
    decl("q03_union_collection",
      (s, d) => {
        val o = t(s, d, "orders")
        val a = o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_custkey"), lit("archive").as("src"))
        val b = o.filter(col("o_orderstatus") === "O")
          .select(col("o_orderkey"), col("o_custkey"), lit("live").as("src"))
        a.unionByName(b).groupBy("src")
          .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("nc"))
      },
      """SELECT src, COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS nc FROM (
        |  SELECT o_orderkey, o_custkey, 'archive' AS src FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, 'live' AS src FROM orders WHERE o_orderstatus = 'O'
        |) GROUP BY src""".stripMargin),

    // J1: adjacency equi-joins with a broadcast dimension.
    decl("q04_join_adjacency",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("order_cnt"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total")),
      """SELECT n_name, COUNT(*) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin),

    // J3: canonicalization as a broadcast hash join against a small map.
    decl("q05_broadcast_canonical",
      (s, d) => t(s, d, "lineitem")
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty")),
      """SELECT s_name, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name""".stripMargin),

    // J5/T5: first_seen preservation = left join + coalesce.
    decl("q06_left_coalesce",
      (s, d) => t(s, d, "orders")
        .join(t(s, d, "customer").filter(col("c_acctbal") > 0)
          .select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), coalesce(col("c_name"), lit("UNKNOWN")).as("resolved"))
        .groupBy("resolved").agg(count(lit(1)).as("n")),
      """SELECT COALESCE(c_name, 'UNKNOWN') AS resolved, COUNT(*) AS n
        |FROM orders LEFT JOIN (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0) c
        |ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin),

    // J6/T4/A4: versioned delta — full-outer join of hash frames → ADD/MOD/DEL.
    decl("q07_delta_versions",
      (s, d) => {
        val o = t(s, d, "orders")
        def hashed(df: org.apache.spark.sql.DataFrame) = df.select(
          col("o_orderkey").as("id"),
          md5(concat_ws("|", col("o_orderkey").cast("string"), col("o_orderstatus"),
            col("o_totalprice").cast("decimal(18,2)").cast("string"))).as("hash"))
        val prev = hashed(o.filter(col("o_orderkey") % 10 =!= 0))
        val curr = hashed(
          o.withColumn("o_totalprice",
            when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))
            .filter(col("o_orderkey") % 10 =!= 3))
        Delta.diff(prev, curr)
      },
      """WITH prev AS (
        |  SELECT o_orderkey AS id,
        |    md5(o_orderkey::VARCHAR || '|' || o_orderstatus || '|' || CAST(o_totalprice AS DECIMAL(18,2))::VARCHAR) AS hash
        |  FROM orders WHERE o_orderkey % 10 != 0),
        |curr AS (
        |  SELECT o_orderkey AS id,
        |    md5(o_orderkey::VARCHAR || '|' || o_orderstatus || '|' ||
        |      CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS DECIMAL(18,2))::VARCHAR) AS hash
        |  FROM orders WHERE o_orderkey % 10 != 3)
        |SELECT COALESCE(prev.id, curr.id) AS id,
        |  CASE WHEN prev.id IS NULL THEN 'ADD'
        |       WHEN curr.id IS NULL THEN 'DEL'
        |       WHEN prev.hash != curr.hash THEN 'MOD' END AS op
        |FROM prev FULL OUTER JOIN curr ON prev.id = curr.id
        |WHERE (CASE WHEN prev.id IS NULL THEN 'ADD'
        |            WHEN curr.id IS NULL THEN 'DEL'
        |            WHEN prev.hash != curr.hash THEN 'MOD' END) IS NOT NULL""".stripMargin),

    // J7: dangling-reference detection = anti join.
    decl("q08_anti_dangling",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey")),
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin),

    // P6-adjacent: semi join (ids already seen).
    decl("q09_semi_join",
      (s, d) => t(s, d, "part")
        .join(t(s, d, "lineitem"), col("p_partkey") === col("l_partkey"), "left_semi")
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n")),
      """SELECT p_brand, COUNT(*) AS n FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        |GROUP BY p_brand""".stripMargin),

    // J11/T7: equi + range (interval) join.
    decl("q10_range_join",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n")),
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderpriority""".stripMargin),

    // O2: top-k per group via ranking window with deterministic tie-break.
    decl("q11_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, d, "orders").withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("rnk"))
      },
      """SELECT o_custkey, o_orderkey, rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) WHERE rnk <= 3""".stripMargin),

    // O3: score-ratio pruning against the per-group best.
    decl("q12_score_ratio",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
        t(s, d, "orders")
          .withColumn("best", max(col("o_totalprice")).over(w))
          .filter(col("o_totalprice") >= col("best") * 0.5)
          .select(col("o_custkey"), col("o_orderkey"))
      },
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    max(o_totalprice) OVER (PARTITION BY o_custkey) AS best
        |  FROM orders) WHERE o_totalprice >= best * 0.5""".stripMargin),

    // A4: order-insensitive entity hash (sorted aggregation inside md5).
    decl("q13_entity_hash",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(md5(concat_ws("|",
          transform(array_sort(collect_list(col("l_partkey"))), x => x.cast("string"))))
          .as("ehash")),
      """SELECT l_orderkey, md5(string_agg(l_partkey::VARCHAR, '|' ORDER BY l_partkey)) AS ehash
        |FROM lineitem GROUP BY l_orderkey""".stripMargin),

    // T2: set intersection.
    decl("q14_intersect",
      (s, d) => {
        val o = t(s, d, "orders")
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
      },
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin),

    // T3: set difference.
    decl("q15_except",
      (s, d) => {
        val o = t(s, d, "orders")
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
          .except(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
      },
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin),

    // A10/O4: min/max date picks + active-range predicate.
    decl("q16_minmax_dates",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("first_ship"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_ship"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("orderkey"), col("first_ship"), col("last_ship"),
          (date_format(col("o_orderdate"), "yyyy-MM-dd") <= col("first_ship")).as("started_after_order")),
      """SELECT l_orderkey AS orderkey,
        |  strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
        |  strftime(max(l_shipdate), '%Y-%m-%d') AS last_ship,
        |  strftime(any_value(o_orderdate), '%Y-%m-%d') <= strftime(min(l_shipdate), '%Y-%m-%d') AS started_after_order
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_orderkey""".stripMargin),

    // P1/T2: target filter = risk-topic overlap on a collected topic set.
    decl("q17_target_filter",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(collect_set(col("o_orderstatus")).as("topics"))
        .filter(arrays_overlap(col("topics"), array(lit("P"))))
        .select(col("custkey")),
      """SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'""".stripMargin),

    // A2/K9/O1: statistics facets — several independent groupBys unioned.
    decl("q18_statistics_facets",
      (s, d) => {
        val schemaFacet = Statistics.facets(t(s, d, "orders"),
          Seq("schema" -> "o_orderstatus", "priority" -> "o_orderpriority"))
        val countryFacet = Statistics.facets(
          t(s, d, "customer")
            .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey")),
          Seq("country" -> "n_name"))
        schemaFacet.unionByName(countryFacet)
      },
      """SELECT 'schema' AS facet, o_orderstatus AS key, COUNT(*) AS cnt FROM orders GROUP BY 2
        |UNION ALL
        |SELECT 'priority' AS facet, o_orderpriority AS key, COUNT(*) AS cnt FROM orders GROUP BY 2
        |UNION ALL
        |SELECT 'country' AS facet, n_name AS key, COUNT(*) AS cnt
        |FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 2""".stripMargin),

    // R1: resolver connected components — path graph per nation, so the
    // oracle (min custkey per nation) checks real transitive closure.
    decl("q19_connected_components",
      (s, d) => {
        val c = t(s, d, "customer")
        val w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
        val edges = c.withColumn("next", lead(col("c_custkey"), 1).over(w))
          .filter(col("next").isNotNull)
          .select(col("c_custkey").as("src"), col("next").as("dst"))
        val nodes = c.select(col("c_custkey").as("id"))
        ConnectedComponents.run(nodes, edges)
          .select(col("id").as("custkey"), col("component"))
      },
      """SELECT c_custkey AS custkey,
        |  min(c_custkey) OVER (PARTITION BY c_nationkey) AS component
        |FROM customer""".stripMargin),

    // K3/O6: rollup cells — sorted distinct concat.
    decl("q20_rollup_concat",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(concat_ws(";", array_sort(collect_set(col("o_orderpriority")))).as("cell")),
      """SELECT o_custkey, string_agg(DISTINCT o_orderpriority, ';' ORDER BY o_orderpriority) AS cell
        |FROM orders GROUP BY o_custkey""".stripMargin),

    // K5/A5: distinct squashed names.
    decl("q21_distinct_names",
      (s, d) => t(s, d, "part")
        .select(lower(col("p_name")).as("name"))
        .filter(length(col("name")) > 3)
        .distinct(),
      """SELECT DISTINCT lower(p_name) AS name FROM part WHERE length(lower(p_name)) > 3""".stripMargin),

    // F10: deterministic slug/hash entity IDs.
    decl("q22_make_id",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          concat(lit("od-"), substring(md5(concat_ws("|", lit("order"),
            col("o_orderkey").cast("string"), col("o_custkey").cast("string"))), 1, 16))
            .as("ent_id")),
      """SELECT o_orderkey,
        |  'od-' || substr(md5('order' || '|' || o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR), 1, 16) AS ent_id
        |FROM orders""".stripMargin),

    // F3: multi-format date parse chain (extract_date analog).
    decl("q23_date_parse_chain",
      (s, d) => t(s, d, "orders")
        .withColumn("raw",
          when(col("o_orderkey") % 2 === 0, date_format(col("o_orderdate"), "dd.MM.yyyy"))
            .otherwise(date_format(col("o_orderdate"), "yyyy/MM/dd")))
        .select(col("o_orderkey"),
          date_format(coalesce(
            expr("try_to_date(raw, 'dd.MM.yyyy')"),
            expr("try_to_date(raw, 'yyyy/MM/dd')")), "yyyy-MM-dd").as("iso")),
      """SELECT o_orderkey,
        |  strftime(COALESCE(try_strptime(raw, '%d.%m.%Y'), try_strptime(raw, '%Y/%m/%d')), '%Y-%m-%d') AS iso
        |FROM (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 0 THEN strftime(o_orderdate, '%d.%m.%Y')
        |       ELSE strftime(o_orderdate, '%Y/%m/%d') END AS raw
        |  FROM orders)""".stripMargin),

    // F8: multi-delimiter split + explode (generator).
    decl("q24_multi_split",
      (s, d) => t(s, d, "part")
        .select(col("p_brand"), explode(split(col("p_name"), " ")).as("tok"))
        .groupBy(col("p_brand")).agg(countDistinct(col("tok")).as("ntok")),
      """SELECT p_brand, COUNT(DISTINCT tok) AS ntok FROM (
        |  SELECT p_brand, unnest(string_split(p_name, ' ')) AS tok FROM part)
        |GROUP BY p_brand""".stripMargin),

    // Streaming-analog batch shape: tumbling-window aggregation.
    decl("q25_events_hourly",
      (s, d) => Q.events(s, d)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total")),
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour, event_type,
        |  COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2""".stripMargin),

    // Sessionization: gaps-and-islands with lag + cumulative logic.
    decl("q26_sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        Q.events(s, d)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1).otherwise(0))
          .groupBy(col("user_id")).agg(sum(col("new_sess")).as("n_sessions"))
      },
      """SELECT user_id, SUM(new_sess)::BIGINT AS n_sessions FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT user_id, ts,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |    FROM events))
        |GROUP BY user_id""".stripMargin),

    // Ordered funnel (round-11): view → click → purchase per user,
    // each stage's timestamp the MIN strictly after the previous
    // stage's — the product-analytics staple. Three stage-filtered
    // aggregates chained by user_id equi-joins (never a per-event
    // self-join, never a window over the whole event stream): at
    // 100 TB each stage is one shuffle on user_id of an
    // already-aggregated frame. Epoch-micros keep the arithmetic
    // integer-exact across engines.
    decl("q214_funnel",
      (s, d) => {
        val e = Q.events(s, d)
        val us = unix_micros(col("ts"))
        val v = e.filter(col("event_type") === "view").groupBy("user_id")
          .agg(min(us).as("t_view"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id").where(us > col("t_view"))
          .groupBy("user_id").agg(min(us).as("t_click"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id").where(us > col("t_click"))
          .groupBy("user_id").agg(min(us).as("t_purchase"))
        e.select("user_id").distinct()
          .join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
            when(col("t_purchase").isNotNull, 3L)
              .when(col("t_click").isNotNull, 2L)
              .when(col("t_view").isNotNull, 1L)
              .otherwise(0L).as("stage"))
      },
      """WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t_view
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(epoch_us(ts)) AS t_click
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE event_type = 'click' AND epoch_us(ts) > t_view GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(epoch_us(ts)) AS t_purchase
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE event_type = 'purchase' AND epoch_us(ts) > t_click GROUP BY 1)
        |SELECT u.user_id, t_view, t_click, t_purchase,
        |  (CASE WHEN t_purchase IS NOT NULL THEN 3
        |        WHEN t_click IS NOT NULL THEN 2
        |        WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS stage
        |FROM (SELECT DISTINCT user_id FROM events) u
        |LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
        |LEFT JOIN p USING (user_id)""".stripMargin),

    // Trailing-window anomaly gate (round-11): hourly event counts per
    // type, z-scored against the PRECEDING 24 observed hours. The
    // variance comes from exact integer window sums (Σx, Σx²) turned
    // into doubles at the end — no engine-specific Welford/naive
    // stddev drift to absorb, only sqrt's libm ulps, which the 6-dp
    // barrier covers (the q129 ln precedent). Full windows only, and
    // zero-variance windows are excluded rather than emitted as ±inf.
    decl("q215_hourly_anomaly",
      (s, d) => {
        val h = Q.events(s, d)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("cnt"))
        val win = Window.partitionBy("event_type").orderBy("hr")
          .rowsBetween(-24, -1)
        val sd = h
          .withColumn("sdbl", sum(col("cnt")).over(win).cast("double"))
          .withColumn("ssq", sum(col("cnt") * col("cnt")).over(win).cast("double"))
          .withColumn("n", count(lit(1)).over(win))
          .where(col("n") === 24)
          .withColumn("varr", (col("ssq") - col("sdbl") * col("sdbl") / 24.0) / 23.0)
          .where(col("varr") > 0)
          .withColumn("z", ((col("cnt").cast("double") - col("sdbl") / 24.0) /
            sqrt(col("varr"))).cast("decimal(10,6)").cast("double"))
        sd.select(col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("cnt"), col("z"), (col("z") > 3.0).as("anomalous"))
      },
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, hr, cnt,
        |  SUM(cnt) OVER win::DOUBLE AS sdbl,
        |  SUM(cnt * cnt) OVER win::DOUBLE AS ssq,
        |  COUNT(*) OVER win AS n
        |  FROM h WINDOW win AS (PARTITION BY event_type ORDER BY hr
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |v AS (SELECT event_type, hr, cnt,
        |  (ssq - sdbl * sdbl / 24.0) / 23.0 AS varr, sdbl
        |  FROM w WHERE n = 24),
        |z AS (SELECT event_type, hr, cnt,
        |  CAST((cnt::DOUBLE - sdbl / 24.0) / sqrt(varr) AS DECIMAL(10,6))::DOUBLE AS z
        |  FROM v WHERE varr > 0)
        |SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
        |  cnt, z, z > 3.0 AS anomalous FROM z""".stripMargin),

    // SCD type-2 dimension build (round-11): each customer's order-
    // status history collapsed to value runs with validity intervals —
    // the warehouse-standard slowly-changing-dimension shape T5's
    // first/last_seen is the degenerate case of. The change-sequence
    // number (epoch-days in the high digits, the unique orderkey in
    // the low) makes ordering strict and engine-portable; value
    // comparison is null-safe on both sides (IS DISTINCT FROM).
    decl("q216_scd2_dimension",
      (s, d) => {
        val o = t(s, d, "orders")
        val seq = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long") *
          10000000000L + col("o_orderkey")
        Delta.scd2(o, col("o_custkey"), seq, col("o_orderstatus"))
      },
      """WITH c AS (SELECT o_custkey AS key,
        |  date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT * 10000000000
        |    + o_orderkey AS seq,
        |  o_orderstatus AS value FROM orders),
        |cp AS (SELECT key, seq, value FROM (
        |  SELECT key, seq, value,
        |    lag(value) OVER (PARTITION BY key ORDER BY seq) AS pv,
        |    row_number() OVER (PARTITION BY key ORDER BY seq) AS rn
        |  FROM c) WHERE rn = 1 OR pv IS DISTINCT FROM value)
        |SELECT key, value, seq AS valid_from,
        |  lead(seq) OVER (PARTITION BY key ORDER BY seq) AS valid_to,
        |  lead(seq) OVER (PARTITION BY key ORDER BY seq) IS NULL AS is_current
        |FROM cp""".stripMargin),

    // Custom whole-operator plan (round-11, builder-brief preference
    // (c)): top-3 lineitems per supplier through graft.plans.
    // TopKPerGroup — a custom LogicalPlan + SparkStrategy + two
    // SparkPlans (partial bounded heap per input partition →
    // EnsureRequirements-inserted hash exchange → final heap). Unlike
    // the window encoding (q11's shape) the exchange carries at most
    // k rows per (group, partition) and NOTHING is ever sorted — the
    // partial-aggregate trick applied to an operator Spark only
    // offers in global form (TakeOrderedAndProject). Equality with
    // the window form is spec-locked; here the oracle replays it as
    // the standard row_number query.
    decl("q222_native_topk_per_group",
      (s, d) => {
        val l = t(s, d, "lineitem")
        graft.plans.TopK.topKPerGroup(
          l.select(col("l_suppkey").cast("long").as("suppkey"),
            col("l_orderkey").cast("long").as("orderkey"),
            col("l_linenumber").cast("long").as("linenumber"),
            col("l_extendedprice").as("price")),
          Seq(col("suppkey")),
          Seq(col("price").desc, col("orderkey"), col("linenumber")),
          k = 3)
      },
      """SELECT suppkey, orderkey, linenumber, price FROM (
        |  SELECT l_suppkey::BIGINT AS suppkey, l_orderkey::BIGINT AS orderkey,
        |    l_linenumber::BIGINT AS linenumber, l_extendedprice AS price,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn <= 3""".stripMargin),

    // ANALYZE-TABLE stats collection (round-11): per-column
    // n/nulls/min/max/NDV in ONE aggregate pass per column family —
    // the metadata pipeline that feeds the q221 advisor and any CBO.
    // NDV is the KMV aggregate (bounded state, mergeable); min/max
    // computed on the TYPED value then rendered, so numeric order is
    // never lexicographic.
    decl("q225_table_stats",
      (s, d) => {
        val l = t(s, d, "lineitem")
        def stats(name: String, v: Column, render: Column => Column) =
          l.agg(
            count(lit(1)).as("n"),
            sum(when(v.isNull, 1L).otherwise(0L)).as("nulls"),
            graft.functions.Sketches.kmvDistinct(
              Dedup.hash60(concat(lit(name + "|"), v.cast("string"))), 128).as("s"),
            render(min(v)).as("min_value"),
            render(max(v)).as("max_value"))
            .select(lit(name).as("column_name"), col("n"), col("nulls"),
              col("s.est_distinct").as("ndv_est"), col("min_value"), col("max_value"))
        val str = (c: Column) => c.cast("string")
        val dt = (c: Column) => date_format(c, "yyyy-MM-dd")
        stats("l_orderkey", col("l_orderkey"), str)
          .unionByName(stats("l_suppkey", col("l_suppkey"), str))
          .unionByName(stats("l_returnflag", col("l_returnflag"), str))
          .unionByName(stats("l_shipdate", col("l_shipdate"), dt))
      },
      {
        // render: SQL agg-result formatter matching the Spark side's
        // per-column renderer (::VARCHAR for string-safe types,
        // strftime for dates — min/max on TYPED values, rendered last)
        def block(name: String, render: String => String) =
          s"""SELECT '$name' AS column_name, COUNT(*)::BIGINT AS n,
             |  SUM(CASE WHEN $name IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls,
             |  (SELECT CASE WHEN COUNT(*) < 128 THEN COUNT(*)::BIGINT
             |     ELSE CAST((127::HUGEINT * 1152921504606846976::HUGEINT)
             |          // MAX(CASE WHEN rk <= 128 THEN h END) AS BIGINT) END
             |   FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM
             |     (SELECT DISTINCT ${PipelineQueries.sqlHash60(s"('$name|' || $name::VARCHAR)")} AS h
             |      FROM lineitem WHERE $name IS NOT NULL))) AS ndv_est,
             |  ${render(s"MIN($name)")} AS min_value,
             |  ${render(s"MAX($name)")} AS max_value
             |FROM lineitem""".stripMargin
        val asVarchar = (e: String) => s"$e::VARCHAR"
        val asDate = (e: String) => s"strftime($e, '%Y-%m-%d')"
        Seq(
          block("l_orderkey", asVarchar),
          block("l_suppkey", asVarchar),
          block("l_returnflag", asVarchar),
          block("l_shipdate", asDate))
          .mkString("\nUNION ALL\n")
      }),

    // dbt-style constraint suite (round-11): PK uniqueness, FK
    // integrity (the q08 anti-join shape), NOT NULL and accepted-value
    // checks as ONE report frame — each check a count aggregate or a
    // broadcast/shuffle anti-join, composable at any table size.
    decl("q226_constraint_suite",
      (s, d) => {
        val l = t(s, d, "lineitem"); val o = t(s, d, "orders")
        val p = t(s, d, "part"); val su = t(s, d, "supplier")
        val c = t(s, d, "customer")
        def check(name: String, violations: Column, from: DataFrame) =
          from.agg(coalesce(violations, lit(0L)).as("violations"))
            .select(lit(name).as("check_name"), col("violations"),
              (col("violations") === 0L).as("passed"))
        val pkDup = l.groupBy("l_orderkey", "l_linenumber")
          .agg(count(lit(1)).as("c")).where(col("c") > 1)
        val fkPart = l.join(p, col("l_partkey") === col("p_partkey"), "left_anti")
        val fkSupp = l.join(su, col("l_suppkey") === col("s_suppkey"), "left_anti")
        val fkCust = o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
        check("pk_lineitem_unique", sum(col("c") - 1), pkDup)
          .unionByName(check("fk_lineitem_part", count(lit(1)), fkPart))
          .unionByName(check("fk_lineitem_supplier", count(lit(1)), fkSupp))
          .unionByName(check("fk_orders_customer", count(lit(1)), fkCust))
          .unionByName(check("not_null_orderdate",
            sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)), o))
          .unionByName(check("range_discount_0_1",
            sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L)
              .otherwise(0L)), l))
          .unionByName(check("accepted_returnflag",
            sum(when(col("l_returnflag").isin("A", "N", "R"), 0L).otherwise(1L)), l))
      },
      """SELECT 'pk_lineitem_unique' AS check_name,
        |  COALESCE(SUM(c - 1), 0)::BIGINT AS violations,
        |  COALESCE(SUM(c - 1), 0) = 0 AS passed
        |FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber
        |      HAVING COUNT(*) > 1)
        |UNION ALL SELECT 'fk_lineitem_part', COUNT(*)::BIGINT, COUNT(*) = 0
        |FROM lineitem WHERE l_partkey NOT IN (SELECT p_partkey FROM part)
        |UNION ALL SELECT 'fk_lineitem_supplier', COUNT(*)::BIGINT, COUNT(*) = 0
        |FROM lineitem WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier)
        |UNION ALL SELECT 'fk_orders_customer', COUNT(*)::BIGINT, COUNT(*) = 0
        |FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |UNION ALL SELECT 'not_null_orderdate',
        |  SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) = 0 FROM orders
        |UNION ALL SELECT 'range_discount_0_1',
        |  SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN 1 ELSE 0 END)::BIGINT,
        |  SUM(CASE WHEN l_discount < 0.0 OR l_discount > 1.0 THEN 1 ELSE 0 END) = 0
        |FROM lineitem
        |UNION ALL SELECT 'accepted_returnflag',
        |  SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END)::BIGINT,
        |  SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 0 ELSE 1 END) = 0
        |FROM lineitem""".stripMargin),

    // TPC-H Q3 shape (shipping-priority top-10): the classic
    // three-way join + float revenue aggregate, with the house float
    // discipline — per-row revenue quantized DECIMAL(30,12), summed
    // exactly, rounded 4 dp for the ranking, ties broken on the key.
    decl("q227_tpch_q3",
      (s, d) => {
        val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        val o = t(s, d, "orders")
          .where(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
        val l = t(s, d, "lineitem")
          .where(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
        val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(30,12)")
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
            col("o_orderpriority"))
          .agg(sum(rev).cast("double").cast("decimal(18,4)").cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
        |  o_orderpriority,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,12)))::DOUBLE
        |    AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),

    // TPC-H Q5 shape (local-supplier volume): the six-way star join
    // with the same-nation constraint; dims broadcast, revenue through
    // the exact-decimal barrier.
    decl("q228_tpch_q5",
      (s, d) => {
        val rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(30,12)")
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(t(s, d, "nation")), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
          .where(col("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(sum(rev).cast("double").cast("decimal(18,4)").cast("double").as("revenue"))
      },
      """SELECT n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,12)))::DOUBLE
        |    AS DECIMAL(18,4)) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin),

    // OLAP breadth (round-11): CUBE over (status, priority) — every
    // grouping-set combination plus the grand total in one pass
    // (Spark expands cube to a single shuffle with grouping-id).
    decl("q230_cube_facets",
      (s, d) => t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total")),
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin),

    // OLAP breadth (round-11): pivot — order counts by status, one
    // column per priority class (fixed column set so the schema is
    // static and engine-portable).
    decl("q231_pivot_priorities",
      (s, d) => {
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        t(s, d, "orders")
          .groupBy(col("o_orderstatus").as("status"))
          .pivot("o_orderpriority", prios)
          .agg(count(lit(1)))
          .select(col("status"),
            coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
            coalesce(col("2-HIGH"), lit(0L)).as("high"),
            coalesce(col("3-MEDIUM"), lit(0L)).as("medium"),
            coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("notspec"),
            coalesce(col("5-LOW"), lit(0L)).as("low"))
      },
      """SELECT o_orderstatus AS status,
        |  SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS urgent,
        |  SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)::BIGINT AS high,
        |  SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END)::BIGINT AS medium,
        |  SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END)::BIGINT AS notspec,
        |  SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END)::BIGINT AS low
        |FROM orders GROUP BY o_orderstatus""".stripMargin),

    // OLAP breadth (round-11): ranking-window family — ntile deciles
    // and percent_rank of account balance within each nation (2-dp
    // balances make exact ties structural, so the rank functions'
    // tie semantics themselves are under test; percent_rank is an
    // exact small-integer ratio, engine-portable as a raw double).
    decl("q232_balance_deciles",
      (s, d) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            ntile(10).over(w).cast("long").as("decile"),
            percent_rank().over(
              Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").asc))
              .as("pct_rank"))
      },
      """SELECT c_custkey, c_nationkey,
        |  ntile(10) OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal, c_custkey)::BIGINT AS decile,
        |  percent_rank() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal) AS pct_rank
        |FROM customer""".stripMargin),

    // Native session-window aggregation (round-12): full per-session
    // rows (start, last event, size, value mass) through Spark's
    // session_window — the dedicated UpdatingSessions physical
    // operator (one shuffle on user_id, sessions merged in a single
    // sorted pass per key; no self-join, no corpus-wide window), where
    // q26 only counted session boundaries with lag/cumsum. Boundary
    // semantics pinned by SessionWindowSpec: a gap of EXACTLY
    // 30 minutes EXTENDS the session (Spark merges on touch —
    // measured, not assumed), so the oracle's new-session test is
    // `> gap`. The value mass is summed in DECIMAL so the result is
    // order-independent (the seed-B double-sum rule).
    decl("q246_session_window",
      (s, d) => {
        val e = Q.events(s, d)
        e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"),
            date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_event"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
          .select(col("user_id"),
            date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
            col("last_event"), col("n_events"), col("total_value"))
      },
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x)
        |SELECT user_id,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_event,
        |  COUNT(*)::BIGINT AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid""".stripMargin),

    // OLAP breadth (round-12): the TPC-H Q18 shape — "large-volume
    // orders": a groupBy-HAVING on the fact table semi-gates the
    // order/customer join. Quantities are integral in the fixture
    // (checked), so the volume sum is an exact BIGINT; the price
    // travels as integer cents (the q112 rule — no double→decimal
    // rounding-mode seam between engines).
    decl("q254_q18_large_orders",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val big = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
          .filter(col("sum_qty") > 260)
        t(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
            round(col("o_totalprice") * 100).cast("long").as("total_cents"),
            col("sum_qty"))
      },
      """WITH big AS (
        |  SELECT l_orderkey, SUM(l_quantity::BIGINT)::BIGINT AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING SUM(l_quantity::BIGINT) > 260)
        |SELECT c_name, c_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |  round(o_totalprice * 100)::BIGINT AS total_cents, sum_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON c_custkey = o_custkey""".stripMargin),

    // OLAP breadth (round-12): the TPC-H Q21 shape — "the supplier
    // solely to blame on a multi-supplier order" (EXISTS another
    // supplier's line + NOT EXISTS another supplier's offending line).
    // The engine runs the AGGREGATION REWRITE a 100 TB plan wants: the
    // two correlated quantifiers collapse into per-(order, supplier)
    // counts, so only AGGREGATED frames ever shuffle (4 exchanges
    // measured; lineitem feeds two consumers as map-side-combined
    // partials) and there is never a line-granularity self-join —
    // while the DuckDB oracle runs the TEXTBOOK correlated
    // EXISTS/NOT-EXISTS form, so the rewrite's equivalence is itself
    // what the gate checks.
    decl("q255_q21_sole_blame",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val os = li.groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_r"))
        val perOrder = os.groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_supp"),
            sum(when(col("n_r") > 0, 1L).otherwise(0L)).as("n_supp_r"))
        val blamed = os.filter(col("n_r") > 0)
          .join(perOrder, "l_orderkey")
          .filter(col("n_supp") > 1 && col("n_supp_r") === 1)
        blamed.groupBy(col("l_suppkey"))
          .agg(sum(col("n_r")).as("numwait"))
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("numwait"))
      },
      """SELECT s_suppkey, s_name, COUNT(*)::BIGINT AS numwait
        |FROM lineitem l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY s_suppkey, s_name""".stripMargin),

    // Time-series resample + forward fill (round-12): the dense-grid
    // shape every metrics warehouse needs — per-user hourly buckets
    // materialized for EVERY hour between the user's first and last
    // observation (sequence + explode: the grid is generated per key,
    // never a cross-join against a global calendar), missing hours
    // carried forward with last-non-null over a per-key window (one
    // shuffle on user_id). The grid is bounded by each key's own span,
    // so a 100 TB corpus pays rows ∝ Σ(span_k), not keys × calendar.
    decl("q261_gap_fill_resample",
      (s, d) => {
        val e = Q.events(s, d)
        val hourly = e
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("v"))
        val grid = hourly.groupBy("user_id")
          .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
              .as("hr"))
        val w = Window.partitionBy("user_id").orderBy("hr")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "hr"), "left")
          .select(col("user_id"),
            date_format(col("hr"), "yyyy-MM-dd HH:00").as("hour"),
            col("v").isNotNull.as("observed"),
            last(col("v"), ignoreNulls = true).over(w).cast("double")
              .as("value"))
      },
      """WITH hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS v
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
        |  FROM (SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1
        |        FROM hourly GROUP BY 1)),
        |j AS (SELECT g.user_id, g.hr, h.v
        |      FROM grid g LEFT JOIN hourly h USING (user_id, hr))
        |SELECT user_id, strftime(hr, '%Y-%m-%d %H:00') AS hour,
        |  v IS NOT NULL AS observed,
        |  CAST(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hr
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS value
        |FROM j""".stripMargin),

    // OHLC bars (round-12): open/high/low/close per (user, hour) —
    // the finance-standard downsample. Open/close are positional
    // (first/last row by (ts, event_id) — two row_number windows over
    // the same one exchange); high/low compare doubles without
    // summing, so every output value is an INPUT value, bit-exact on
    // any engine.
    decl("q262_ohlc_bars",
      (s, d) => {
        val e = Q.events(s, d)
          .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"),
            col("ts"), col("event_id"), col("value"))
        val wAsc = Window.partitionBy("user_id", "hr")
          .orderBy(col("ts").asc, col("event_id").asc)
        val wDesc = Window.partitionBy("user_id", "hr")
          .orderBy(col("ts").desc, col("event_id").desc)
        e.withColumn("rn", row_number().over(wAsc))
          .withColumn("rd", row_number().over(wDesc))
          .groupBy(col("user_id"), col("hr"))
          .agg(max(when(col("rn") === 1, col("value"))).as("open"),
            max(col("value")).as("high"), min(col("value")).as("low"),
            max(when(col("rd") === 1, col("value"))).as("close"),
            count(lit(1)).as("n_trades"))
          .select(col("user_id"),
            date_format(col("hr"), "yyyy-MM-dd HH:00").as("hour"),
            col("open"), col("high"), col("low"), col("close"),
            col("n_trades"))
      },
      """WITH x AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr, value,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM events)
        |SELECT user_id, strftime(hr, '%Y-%m-%d %H:00') AS hour,
        |  MAX(CASE WHEN rn = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MAX(CASE WHEN rd = 1 THEN value END) AS close,
        |  COUNT(*)::BIGINT AS n_trades
        |FROM x GROUP BY 1, 2""".stripMargin),

    // T5: first_seen / last_seen SCD columns.
    decl("q27_first_last_seen",
      (s, d) => Q.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_seen")),
      """SELECT user_id, event_type,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen
        |FROM events GROUP BY user_id, event_type""".stripMargin),

    // q273 (round-13): SEMI-STRUCTURED schema-on-read — the events
    // stream carries a JSON props column (the reference's crawlers
    // emit exactly such free-form property bags); extract a typed
    // field with an EXPLICIT schema at the scan (from_json with a
    // declared struct — no sampling-based inference pass, which at
    // 100 TB would be a second full scan) and aggregate on it like any
    // native column. Value sums ride the per-row-quantize + integer-
    // cents gate (the q270 discipline), so no double edge anywhere.
    decl("q273_json_props_extract",
      (s, d) => {
        val ev = Q.events(s, d).select(col("event_type"),
          col("value").cast("decimal(14,2)").as("v"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.IntegerType))))
            .getField("k").as("k"))
        ev.groupBy(col("event_type"), expr("k % 10").as("kb"))
          .agg(count(lit(1)).as("n"),
            (sum(col("v").cast("decimal(30,12)")) * lit(100)).cast("long")
              .as("sum_value_cents"),
            min("k").as("min_k"), max("k").as("max_k"))
      },
      """WITH ev AS (SELECT event_type, value::DECIMAL(14,2) AS v,
        |  CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
        |SELECT event_type, k % 10 AS kb, COUNT(*)::BIGINT AS n,
        |  (SUM(CAST(v AS DECIMAL(30,12))) * 100)::BIGINT AS sum_value_cents,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM ev GROUP BY 1, 2""".stripMargin),

    // q278 (round-13): the TPC-H Q17 shape — "small-quantity orders for
    // a part class": lines whose quantity is under 20% of their part's
    // average. The correlated scalar subquery DECORRELATES into one
    // per-part aggregate joined back (the rewrite a 100 TB plan needs:
    // lineitem is scanned twice but never self-joined at line
    // granularity, and the per-part avg frame is partkey-aggregated —
    // tiny — before the join). The 0.2·avg comparison is kept EXACT:
    // qty < sum/(5·cnt) ⟺ 5·cnt·qty < sum in integers (quantities are
    // integral), so no float boundary can flip a row between engines;
    // revenue lands as an exact decimal-summed cents integer per
    // brand, with the DuckDB oracle running the textbook correlated
    // form so the decorrelation itself is what the gate checks.
    decl("q278_tpch_q17",
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_partkey"),
          col("l_quantity").cast("long").as("qty"),
          col("l_extendedprice").cast("decimal(14,2)").as("price"))
        val perPart = li.groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("cnt"))
        val promo = t(s, d, "part")
          .where(col("p_type") === "PROMO")
          .select(col("p_partkey"), col("p_brand"))
        li.join(perPart, col("l_partkey") === col("pk"))
          .where(lit(5L) * col("cnt") * col("qty") < col("sum_qty"))
          .join(promo, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_small"),
            (sum(col("price").cast("decimal(30,12)")) * lit(100))
              .cast("long").as("sum_cents"))
      },
      """SELECT p_brand, COUNT(*)::BIGINT AS n_small,
        |  (SUM(CAST(l_extendedprice::DECIMAL(14,2) AS DECIMAL(30,12)))
        |   * 100)::BIGINT AS sum_cents
        |FROM lineitem l JOIN part ON p_partkey = l_partkey
        |WHERE p_type = 'PROMO'
        |  AND 5 * (SELECT COUNT(*) FROM lineitem i
        |           WHERE i.l_partkey = l.l_partkey) * l.l_quantity::BIGINT
        |      < (SELECT SUM(i.l_quantity::BIGINT) FROM lineitem i
        |         WHERE i.l_partkey = l.l_partkey)
        |GROUP BY 1""".stripMargin),

    // q284 (round-13): the TPC-H Q10 shape — returned-item customer
    // ranking for a quarter. Revenue terms price·(1−disc)·100 are
    // single IEEE multiplies rounded per-row to integer CENTS (both
    // engines compute the identical double, then round it identically)
    // and summed as exact longs — no decimal edge anywhere; the
    // top-20 is deterministic via an explicit (revenue DESC, custkey)
    // tie-break rather than a bare LIMIT, which is engine-undefined on
    // revenue ties. The date filter prunes at the orders scan before
    // any join (plan: filter under the join, broadcast nation).
    decl("q284_tpch_q10",
      (s, d) => {
        val o = t(s, d, "orders")
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val li = t(s, d, "lineitem")
          .where(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * 100).cast("long").as("rev_cents"))
        val perCust = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("rev_cents")).as("revenue_cents"))
        // top-20 via TakeOrderedAndProject (distributed heap, no global
        // exchange) under the full deterministic ordering; the explicit
        // rank is then a 20-row frame — the only globally-ordered
        // window, per the house rule
        val top = perCust
          .orderBy(col("revenue_cents").desc, col("o_custkey").asc)
          .limit(20)
        val ranked = top.withColumn("rk", row_number().over(
          Window.orderBy(col("revenue_cents").desc, col("o_custkey").asc)))
        ranked
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            col("revenue_cents"), col("rk"))
      },
      """WITH pc AS (
        |  SELECT o_custkey,
        |    SUM(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT)
        |      ::BIGINT AS revenue_cents
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1),
        |rk AS (SELECT o_custkey, revenue_cents,
        |       ROW_NUMBER() OVER (ORDER BY revenue_cents DESC, o_custkey)
        |         AS rk
        |       FROM pc)
        |SELECT c_custkey, c_name, n_name, revenue_cents, rk::BIGINT AS rk
        |FROM rk JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE rk <= 20""".stripMargin),

    // q290 (round-14): the TPC-H Q2 shape — "the supplier(s) achieving
    // the minimum cost per part within a region" — the correlated-MIN
    // subquery every warehouse benchmark opens with, adapted to this
    // schema (no partsupp table: per-(part, supplier) unit cost =
    // MIN over their lineitems of extendedprice·100 div quantity,
    // exact integer cents — quantities are integral). The ENGINE runs
    // the aggregation rewrite (per-part min as a groupBy + equality
    // join back — only aggregated frames shuffle, never a correlated
    // per-row subquery; same discipline as q255's Q21 rewrite), keeps
    // ALL min-achieving suppliers (ties are data, not an ORDER BY
    // accident), and restricts to one region via broadcast dims. The
    // oracle runs the textbook correlated form — the rewrite's
    // equivalence is what the gate checks.
    decl("q290_tpch_q2_min_cost_supplier",
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_partkey"),
          col("l_suppkey"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT) div CAST(l_quantity AS BIGINT)")
            .as("unit_cents"))
        val sup = t(s, d, "supplier")
          .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
          .join(t(s, d, "region").where(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
        val cost = li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"), col("s_suppkey"), col("s_name"),
            col("n_name"))
          .agg(min(col("unit_cents")).as("min_unit_cents"))
        val best = cost.groupBy(col("l_partkey").as("pk"))
          .agg(min(col("min_unit_cents")).as("best_cents"))
        cost.join(best, col("l_partkey") === col("pk")
            && col("min_unit_cents") === col("best_cents"))
          .join(t(s, d, "part").where(col("p_type") === "PROMO"),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_partkey"), col("p_brand"), col("s_suppkey"),
            col("s_name"), col("n_name"), col("min_unit_cents"))
      },
      """WITH sup AS (
        |  SELECT s_suppkey, s_name, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |cost AS (
        |  SELECT l_partkey, s_suppkey, s_name, n_name,
        |    MIN(round(l_extendedprice * 100)::BIGINT // l_quantity::BIGINT)
        |      ::BIGINT AS min_unit_cents
        |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2, 3, 4)
        |SELECT p_partkey, p_brand, c.s_suppkey, c.s_name, c.n_name,
        |  c.min_unit_cents
        |FROM cost c JOIN part ON c.l_partkey = p_partkey
        |WHERE p_type = 'PROMO'
        |  AND c.min_unit_cents = (SELECT MIN(c2.min_unit_cents) FROM cost c2
        |                          WHERE c2.l_partkey = c.l_partkey)""".stripMargin),

    // q291 (round-14): the TPC-H Q4 shape — order-priority checking:
    // per-priority count of a quarter's orders with AT LEAST ONE
    // returned line. The engine plans EXISTS as a LEFT SEMI join (the
    // decorrelation every engine must get right: an order with five
    // returned lines counts ONCE); the oracle runs the textbook
    // correlated EXISTS. Priority counts make the semi-vs-inner
    // distinction load-bearing — an inner join would overcount
    // multi-line orders and break the hash.
    decl("q291_tpch_q4",
      (s, d) => {
        val o = t(s, d, "orders")
          .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        val returned = t(s, d, "lineitem")
          .where(col("l_returnflag") === "R").select(col("l_orderkey"))
        o.join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
      },
      """SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_returnflag = 'R')
        |GROUP BY 1""".stripMargin),

    // q292 (round-14): the TPC-H Q16 shape — parts/supplier
    // relationship: DISTINCT supplier count per (brand, type, size
    // bucket), EXCLUDING a supplier blacklist (here: suppliers in
    // nations 0–4). The engine plans NOT IN (no NULLs by construction)
    // as a LEFT ANTI join before the distinct aggregation; the oracle
    // runs the textbook NOT IN subquery. countDistinct makes the
    // anti-join placement load-bearing: excluding AFTER the count
    // would differ whenever an excluded supplier shares a (brand,
    // type, size) cell with a kept one.
    decl("q292_tpch_q16",
      (s, d) => {
        val excluded = t(s, d, "supplier")
          .where(col("s_nationkey") < 5).select(col("s_suppkey"))
        val li = t(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey"))
          .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
        li.join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"),
            expr("p_size div 10").as("size_bucket"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      },
      """SELECT p_brand, p_type, p_size // 10 AS size_bucket,
        |  COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_nationkey < 5)
        |GROUP BY 1, 2, 3""".stripMargin),

    // q293 (round-14): the TPC-H Q13 shape — customer order-count
    // DISTRIBUTION ("how many customers placed exactly k orders").
    // The engine's shape is LEFT OUTER join → count non-null keys per
    // customer → count customers per count. The outer-ness is
    // load-bearing twice: zero-order customers must appear (count 0 is
    // the largest bucket of the distribution), and count(o_orderkey)
    // (nulls excluded) — NOT count(*) — is what makes an unmatched row
    // count as 0 rather than 1. The orders side carries a real filter
    // (urgent orders excluded) so unmatched ≠ absent-from-orders.
    decl("q293_tpch_q13",
      (s, d) => {
        val o = t(s, d, "orders")
          .where(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_orderkey"), col("o_custkey"))
        val perCust = t(s, d, "customer").select(col("c_custkey"))
          .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust.groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
      },
      """SELECT c_count, COUNT(*)::BIGINT AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin),

    // q294 (round-14): the TPC-H Q15 shape — top supplier(s) by
    // quarterly revenue: a revenue view (one aggregate), then the
    // suppliers ACHIEVING its maximum (scalar-max equality join — ties
    // are kept, never broken by an ORDER BY accident). Revenue is
    // exact integer e4-units: cents(extendedprice) × (100 −
    // basis-points(discount)) — both factors integral by construction,
    // so the sum, the max, and the equality are engine-portable with
    // no float in sight. The max is a 1-row broadcast, not a window.
    decl("q294_tpch_q15_top_supplier",
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select(col("l_suppkey"),
            (expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
              * (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
              .as("rev_e4"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("rev_e4")).as("total_rev_e4"))
        val top = rev.agg(max(col("total_rev_e4")).as("best_e4"))
        rev.join(broadcast(top), col("total_rev_e4") === col("best_e4"))
          .join(t(s, d, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
      },
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    SUM(round(l_extendedprice * 100)::BIGINT
        |        * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS total_rev_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_rev_e4
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)""".stripMargin),

    // q295 (round-14): the TPC-H Q22 shape — "global sales
    // opportunity": customers with above-average positive balance and
    // no RECENT orders (none since 1999 — lapsed, not absent; every
    // synthetic customer has some order), counted per nation. Two
    // decorrelations in one query: the scalar AVG subquery becomes a
    // 1-row broadcast compared in exact integers (balance_cents·N >
    // total_cents — the division never happens, so there is no float
    // and no rounding rule to disagree on), and the date-filtered
    // NOT EXISTS becomes a LEFT ANTI join on the filtered orders.
    decl("q295_tpch_q22_lapsed_customers",
      (s, d) => {
        val cust = t(s, d, "customer").select(col("c_custkey"),
          col("c_nationkey"),
          expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
        val avgRef = cust.where(col("bal_cents") > 0L)
          .agg(sum(col("bal_cents")).as("tot_cents"),
            count(lit(1)).as("n_pos"))
        val recent = t(s, d, "orders")
          .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(avgRef))
          .where(col("bal_cents") * col("n_pos") > col("tot_cents"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal_cents")).as("totacctbal_cents"))
      },
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |    round(c_acctbal * 100)::BIGINT AS bal_cents
        |  FROM customer)
        |SELECT c_nationkey, COUNT(*)::BIGINT AS numcust,
        |  SUM(bal_cents)::BIGINT AS totacctbal_cents
        |FROM cust c
        |WHERE bal_cents * (SELECT COUNT(*) FROM cust WHERE bal_cents > 0)
        |      > (SELECT SUM(bal_cents) FROM cust WHERE bal_cents > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1""".stripMargin),

    // q296 (round-14): the TPC-H Q20 shape — "potential part
    // promotion", adapted (no partsupp): suppliers in a region who
    // DOMINATE at least one PROMO part — ship more than an EIGHTH of
    // that part's total quantity (~30 suppliers touch each part, so
    // an eighth is ~4× the fair share; TPC-H's literal 50% never
    // fires on this distribution). Nested decorrelation chain: the
    // correlated fraction-of-sum subquery becomes a per-part total
    // joined back (8·supplier_qty > part_total, integers — quantities
    // are integral doubles), and the outer IN becomes a LEFT SEMI
    // against the dominating (supplier) set. The semi placement is
    // load-bearing: a supplier dominating three parts lists once.
    decl("q296_tpch_q20_dominant_suppliers",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(t(s, d, "part").where(col("p_type") === "PROMO")
            .select(col("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast("long").as("qty"))
        val perSupp = li.groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("qty")).as("supp_qty"))
        val perPart = li.groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("qty")).as("part_qty"))
        val dominant = perSupp.join(perPart, col("l_partkey") === col("pk"))
          .where(col("supp_qty") * 8L > col("part_qty"))
          .select(col("l_suppkey")).distinct()
        t(s, d, "supplier")
          .join(t(s, d, "nation"), col("s_nationkey") === col("n_nationkey"))
          .where(col("n_regionkey") === 2)
          .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"), col("n_name"))
      },
      """SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_regionkey = 2
        |  AND s_suppkey IN (
        |    SELECT l_suppkey
        |    FROM lineitem l JOIN part ON l_partkey = p_partkey
        |    WHERE p_type = 'PROMO'
        |    GROUP BY l.l_partkey, l_suppkey
        |    HAVING SUM(l_quantity::BIGINT) * 8 >
        |      (SELECT SUM(l2.l_quantity::BIGINT) FROM lineitem l2
        |       JOIN part p2 ON l2.l_partkey = p2.p_partkey
        |       WHERE p2.p_type = 'PROMO' AND l2.l_partkey = l.l_partkey))""".stripMargin),

    // q297 (round-14): the TPC-H Q11 shape — "important stock": one
    // nation's per-part shipped value, keeping parts above 0.1% of
    // that NATION'S total (Q11's exact structure: the filter and the
    // denominator share a sub-plan). The scalar total is a 1-row
    // broadcast and the threshold compares in exact integers
    // (part_e4 · 1000 > nation_e4) — group-vs-global fraction
    // predicates are where float thresholds silently diverge between
    // engines, so the division is never performed.
    decl("q297_tpch_q11_important_value",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .join(broadcast(t(s, d, "supplier")
            .where(col("s_nationkey") === 3).select(col("s_suppkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey"),
            (expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
              * (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
              .as("val_e4"))
        val grouped = li.groupBy(col("l_partkey"))
          .agg(sum(col("val_e4")).as("part_val_e4"))
        val total = li.agg(sum(col("val_e4")).as("nation_val_e4"))
        grouped.crossJoin(broadcast(total))
          .where(col("part_val_e4") * 1000L > col("nation_val_e4"))
          .select(col("l_partkey"), col("part_val_e4"))
      },
      """WITH li AS (
        |  SELECT l_partkey,
        |    round(l_extendedprice * 100)::BIGINT
        |      * (100 - round(l_discount * 100)::BIGINT) AS val_e4
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE s_nationkey = 3)
        |SELECT l_partkey, SUM(val_e4)::BIGINT AS part_val_e4
        |FROM li
        |GROUP BY 1
        |HAVING SUM(val_e4) * 1000 > (SELECT SUM(val_e4) FROM li)""".stripMargin),

    // q298 (round-14): the TPC-H Q19 shape — disjunctive predicate
    // revenue: OR of three conjunctive (brand, size-range,
    // quantity-range) branches across a join. The plan matters more
    // than the arithmetic here: the part-side conjuncts (brand, size)
    // must prune the PART scan and the lineitem-side bounds
    // (quantity between the union of branch ranges) must reach the
    // LINEITEM scan as a pushed filter even though the full predicate
    // straddles the join — the classic "derive single-side filters
    // from a cross-side OR" test.
    decl("q298_tpch_q19_disjunctive",
      (s, d) => {
        val branch = (brand: String, sizeHi: Int, qLo: Int, qHi: Int) =>
          col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
            col("l_quantity").between(qLo, qHi)
        t(s, d, "lineitem")
          // derived single-side bound: every branch needs quantity in
          // [1, 30] — pushed to the scan independently of the OR
          .where(col("l_quantity").between(1, 30))
          .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
          .where(branch("Brand#12", 5, 1, 11) || branch("Brand#23", 10, 10, 20)
            || branch("Brand#34", 15, 20, 30))
          .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            * (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
            .as("revenue_e4"), count(lit(1)).as("n_lines"))
      },
      """SELECT SUM(round(l_extendedprice * 100)::BIGINT
        |         * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_e4,
        |  COUNT(*)::BIGINT AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin),

    // q305 (round-14): COHORT RETENTION matrix — the product-analytics
    // staple: users bucketed by first-activity week; for each
    // (cohort, week-offset) cell, how many of that cohort were active.
    // Two aggregates and one equi-join on user_id: first-seen is a
    // min-aggregate (mergeable, map-side combined), the matrix is a
    // countDistinct over (cohort, offset) — no window, no per-user
    // sort, weeks in exact integer epoch arithmetic (µs div week).
    decl("q305_cohort_retention",
      (s, d) => {
        val ev = Q.events(s, d).select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
        val first = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
        val sizes = first.groupBy("cohort_week")
          .agg(countDistinct(col("user_id")).as("cohort_size"))
        ev.join(first, "user_id")
          .groupBy(col("cohort_week"),
            (col("wk") - col("cohort_week")).as("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(sizes, "cohort_week")
          .select(col("cohort_week"), col("week_offset"), col("n_active"),
            col("cohort_size"))
      },
      """WITH ev AS (SELECT user_id,
        |  epoch_ns(ts) // 1000 // 604800000000 AS wk FROM events),
        |fs AS (SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY 1),
        |sz AS (SELECT cohort_week, COUNT(DISTINCT user_id)::BIGINT
        |       AS cohort_size FROM fs GROUP BY 1)
        |SELECT fs.cohort_week, ev.wk - fs.cohort_week AS week_offset,
        |  COUNT(DISTINCT ev.user_id)::BIGINT AS n_active, sz.cohort_size
        |FROM ev JOIN fs USING (user_id)
        |JOIN sz ON fs.cohort_week = sz.cohort_week
        |GROUP BY 1, 2, 4""".stripMargin),

    // q307 (round-14): the TPC-H Q6 shape — the simplest query in the
    // suite and the purest SCAN test: one filter (date year + discount
    // band + quantity cap), one global aggregate, nothing else. Every
    // predicate must reach the parquet scan (PushedFilters); the
    // forecast-revenue product is exact e4 integers (cents × basis
    // points), so the oracle agrees to the last digit.
    decl("q307_tpch_q6",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && expr("CAST(round(l_discount * 100) AS BIGINT)").between(5, 7)
          && col("l_quantity") < 24)
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
          * expr("CAST(round(l_discount * 100) AS BIGINT)"))
          .as("revenue_e4"), count(lit(1)).as("n_lines")),
      """SELECT SUM(round(l_extendedprice * 100)::BIGINT
        |      * round(l_discount * 100)::BIGINT)::BIGINT AS revenue_e4,
        |  COUNT(*)::BIGINT AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND round(l_discount * 100)::BIGINT BETWEEN 5 AND 7
        |  AND l_quantity < 24""".stripMargin),

    // q308 (round-14): the TPC-H Q12 shape — shipping-mode priority
    // audit (adapted: return-flag classes stand in for ship modes):
    // per class, CONDITIONAL counts of high- vs low-priority orders in
    // a shipping window. One join + one aggregate whose payload is two
    // CASE sums — the shape that teaches conditional aggregation
    // pushes into the partial-agg phase instead of becoming two scans.
    decl("q308_tpch_q12",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count")),
      """SELECT l_returnflag,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin),

    // q309 (round-14): the TPC-H Q14 shape — promotion-revenue share:
    // what fraction of a month's revenue came from PROMO parts. The
    // classic ratio-of-conditional-sums; emitted as exact integer
    // numerator + denominator + floor-division basis points, so the
    // one place engines usually diverge (the final float division)
    // never happens.
    decl("q309_tpch_q14",
      (s, d) => t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-03-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"))
        .select((expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
          * (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
          .as("rev_e4"), col("p_type"))
        .agg(sum(when(col("p_type") === "PROMO", col("rev_e4"))
          .otherwise(0L)).as("promo_rev_e4"),
          sum(col("rev_e4")).as("total_rev_e4"))
        .select(col("promo_rev_e4"), col("total_rev_e4"),
          expr("(10000 * promo_rev_e4) div total_rev_e4").as("promo_bp")),
      """WITH li AS (SELECT
        |  round(l_extendedprice * 100)::BIGINT
        |    * (100 - round(l_discount * 100)::BIGINT) AS rev_e4, p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'),
        |s AS (SELECT
        |  SUM(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)::BIGINT
        |    AS promo_rev_e4,
        |  SUM(rev_e4)::BIGINT AS total_rev_e4 FROM li)
        |SELECT promo_rev_e4, total_rev_e4,
        |  (10000 * promo_rev_e4) // total_rev_e4 AS promo_bp FROM s""".stripMargin),

    // q310 (round-14): the TPC-H Q7 shape — volume shipping between
    // two nations: revenue flowing supplier-nation → customer-nation,
    // for the (0,1)/(1,0) pair, by ship year. Two dimension chains off
    // one fact scan (supplier side broadcast, customer side rides the
    // orders join); the pair filter must land BEFORE the aggregate.
    decl("q310_tpch_q7",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).cast("long").as("l_year"),
            (expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
              * (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
              .as("rev_e4"))
        li.join(broadcast(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey").cast("long")
              .as("supp_nation"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer").select(col("c_custkey"),
            col("c_nationkey").cast("long").as("cust_nation")),
            col("o_custkey") === col("c_custkey"))
          .where((col("supp_nation") === 0L && col("cust_nation") === 1L)
            || (col("supp_nation") === 1L && col("cust_nation") === 0L))
          .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
          .agg(sum(col("rev_e4")).as("revenue_e4"),
            count(lit(1)).as("n_lines"))
      },
      """SELECT s_nationkey::BIGINT AS supp_nation,
        |  c_nationkey::BIGINT AS cust_nation,
        |  year(l_shipdate)::BIGINT AS l_year,
        |  SUM(round(l_extendedprice * 100)::BIGINT
        |    * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_e4,
        |  COUNT(*)::BIGINT AS n_lines
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE (s_nationkey = 0 AND c_nationkey = 1)
        |   OR (s_nationkey = 1 AND c_nationkey = 0)
        |GROUP BY 1, 2, 3""".stripMargin),

    // q311 (round-14): the TPC-H Q8 shape — national market share:
    // within one customer region and one part type, what share of
    // yearly revenue did nation 3's suppliers take. Ratio of
    // conditional sums again (the q309 discipline: integer numerator,
    // denominator, floor-division basis points — never a float), over
    // a 4-dimension star join where region and type prune FIRST.
    decl("q311_tpch_q8",
      (s, d) => {
        val cust = t(s, d, "customer")
          .join(t(s, d, "nation"), col("c_nationkey") === col("n_nationkey"))
          .where(col("n_regionkey") === 2)
          .select(col("c_custkey"))
        t(s, d, "lineitem")
          .join(t(s, d, "part").where(col("p_type") === "PROMO")
            .select(col("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
          .join(broadcast(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(year(col("l_shipdate")).cast("long").as("o_year"),
            (expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
              * (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)")))
              .as("rev_e4"),
            col("s_nationkey"))
          .groupBy(col("o_year"))
          .agg(sum(when(col("s_nationkey") === 3, col("rev_e4"))
            .otherwise(0L)).as("nation_rev_e4"),
            sum(col("rev_e4")).as("total_rev_e4"))
          .select(col("o_year"), col("nation_rev_e4"), col("total_rev_e4"),
            expr("(10000 * nation_rev_e4) div total_rev_e4").as("share_bp"))
      },
      """WITH li AS (SELECT year(l_shipdate)::BIGINT AS o_year,
        |  round(l_extendedprice * 100)::BIGINT
        |    * (100 - round(l_discount * 100)::BIGINT) AS rev_e4,
        |  s_nationkey
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE p_type = 'PROMO'
        |    AND o_custkey IN (SELECT c_custkey FROM customer
        |      JOIN nation ON c_nationkey = n_nationkey
        |      WHERE n_regionkey = 2)),
        |s AS (SELECT o_year,
        |  SUM(CASE WHEN s_nationkey = 3 THEN rev_e4 ELSE 0 END)::BIGINT
        |    AS nation_rev_e4,
        |  SUM(rev_e4)::BIGINT AS total_rev_e4 FROM li GROUP BY 1)
        |SELECT o_year, nation_rev_e4, total_rev_e4,
        |  (10000 * nation_rev_e4) // total_rev_e4 AS share_bp FROM s""".stripMargin),

    // q312 (round-14): the TPC-H Q9 shape — product-line profit by
    // supplier nation and order year: profit = revenue − cost (cost
    // adapted to retail_cents·qty·100 — the schema has no partsupp),
    // in the same e4 integer units so profit sums exactly even when
    // NEGATIVE (the sign is data: discounted lines can sell below
    // retail). The biggest join fan in the suite after Q8 — part
    // filter prunes first, supplier dim broadcasts.
    decl("q312_tpch_q9",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "part").where(col("p_type") === "STANDARD")
          .select(col("p_partkey"),
            expr("CAST(round(p_retailprice * 100) AS BIGINT)")
              .as("retail_cents")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").cast("long")
            .as("supp_nation"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders").select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("supp_nation"), col("o_year"),
          (expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
            * (lit(100L) - expr("CAST(round(l_discount * 100) AS BIGINT)"))
            - col("retail_cents") * col("l_quantity").cast("long") * lit(100L))
            .as("amount_e4"))
        .groupBy(col("supp_nation"), col("o_year"))
        .agg(sum(col("amount_e4")).as("profit_e4"),
          count(lit(1)).as("n_lines")),
      """SELECT s_nationkey::BIGINT AS supp_nation,
        |  year(o_orderdate)::BIGINT AS o_year,
        |  SUM(round(l_extendedprice * 100)::BIGINT
        |      * (100 - round(l_discount * 100)::BIGINT)
        |    - round(p_retailprice * 100)::BIGINT * l_quantity::BIGINT * 100
        |  )::BIGINT AS profit_e4,
        |  COUNT(*)::BIGINT AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_type = 'STANDARD'
        |GROUP BY 1, 2""".stripMargin)
  )
}
