package graft.queries

import graft.operators.{Bloom, Ivm, Layout, Snapshot}
import org.apache.spark.sql.functions._
import Q._
import PipelineQueries.sqlHash60

/** Physical-layout operators at query level: zone-map data skipping,
  * Z-order clustering, and compaction planning — the file-level
  * machinery a 100 TB deployment of this engine relies on for cheap
  * scans. Each oracle replays the layout arithmetic (min/max envelopes,
  * bit interleaving, start-offset packing) in plain SQL, so the pruning
  * logic itself — not just the surviving rows — is hash-checked.
  */
object LayoutQueries {

  /** SQL fragment: interleave the low `bits` bits of `x` (even) and `y`
    * (odd) — bit-for-bit [[Layout.zInterleave]]. Disjoint positions make
    * `+` exact OR in both engines. */
  private def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")

  /** The q182 three-version manifest chain (v1 initial load, v2 append,
    * v3 compaction) — shared by q182 (manifest arithmetic gate) and
    * q190 (as-of timestamp resolution over the same chain). */
  private def manifestChain(li: org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val rowId = concat(col("l_orderkey"), lit("|"), col("l_linenumber"))
    val v1src = li.where(col("l_shipdate") < to_timestamp(lit("1995-06-01")))
    val v2add = li.where(col("l_shipdate") >= to_timestamp(lit("1995-06-01")))
    val m1 = Snapshot.manifestEntries(v1src, rowId, col("l_orderkey"),
      files = 16, version = 1L)
    val m2 = Snapshot.commitAppend(m1,
      Snapshot.manifestEntries(v2add, rowId, col("l_orderkey"),
        files = 4, version = 2L), version = 2L)
    val m3 = Snapshot.commitCompact(m2, smallRows = 3000L,
      targetRows = 6000L, version = 3L)
    (m1, m2, m3)
  }

  /** The oracle half of [[manifestChain]]: WITH-chain through m1/m2/m3
    * (no final SELECT), shared by the q182 and q190 oracles. */
  private def manifestChainCtes: String =
    s"""WITH li AS (SELECT l_orderkey, l_linenumber, l_shipdate,
       |  ${sqlHash60("(l_orderkey::VARCHAR || '|' || l_linenumber::VARCHAR)")} AS h
       |  FROM lineitem),
       |m1 AS (SELECT 1::BIGINT AS version, h % 16 AS file_id,
       |       COUNT(*)::BIGINT AS n_rows, MIN(l_orderkey)::BIGINT AS min_key,
       |       MAX(l_orderkey)::BIGINT AS max_key
       |       FROM li WHERE l_shipdate < TIMESTAMP '1995-06-01' GROUP BY 2),
       |add2 AS (SELECT h % 4 AS fid, COUNT(*)::BIGINT AS n_rows,
       |        MIN(l_orderkey)::BIGINT AS min_key, MAX(l_orderkey)::BIGINT AS max_key
       |        FROM li WHERE l_shipdate >= TIMESTAMP '1995-06-01' GROUP BY 1),
       |b1 AS (SELECT MAX(file_id) + 1 AS base FROM m1),
       |m2 AS (SELECT 2::BIGINT AS version, file_id, n_rows, min_key, max_key FROM m1
       |       UNION ALL
       |       SELECT 2::BIGINT, fid + b1.base, n_rows, min_key, max_key FROM add2, b1),
       |keep AS (SELECT file_id, n_rows, min_key, max_key FROM m2 WHERE n_rows >= 3000),
       |small AS (SELECT file_id, n_rows, min_key, max_key FROM m2 WHERE n_rows < 3000),
       |b2 AS (SELECT MAX(file_id) + 1 AS base FROM m2),
       |pk AS (SELECT n_rows, min_key, max_key,
       |       COALESCE(SUM(n_rows) OVER (ORDER BY file_id
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS strt
       |       FROM small),
       |grp AS (SELECT (strt // 6000)::BIGINT AS g, SUM(n_rows)::BIGINT AS n_rows,
       |        MIN(min_key) AS min_key, MAX(max_key) AS max_key FROM pk GROUP BY 1),
       |m3 AS (SELECT 3::BIGINT AS version, file_id, n_rows, min_key, max_key FROM keep
       |       UNION ALL
       |       SELECT 3::BIGINT, (g + b2.base)::BIGINT, n_rows, min_key, max_key FROM grp, b2)""".stripMargin

  /** The q196/q197 merge fixture: v1 = the whole table clustered into
    * 16 key-range files (key = l_orderkey*8 + l_linenumber, unique);
    * source ops drawn from the middle fifth of the key domain
    * (l_orderkey mod 7: 0 → update qty+100, 3 → delete, 5 → insert at
    * key+kmax+1, i.e. past the domain) — so the COW touch set is only
    * the ~4 files whose envelopes meet the band, and carried /
    * rewritten / added are all non-trivially exercised. Returns
    * (target, source, v1 manifest). */
  private[queries] def mergeFixture(li: org.apache.spark.sql.DataFrame):
      (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
    val kb = broadcast(li
      .agg(max(expr("l_orderkey * 8 + l_linenumber")).as("_kmax"),
        min(expr("l_orderkey * 8 + l_linenumber")).as("_kmin"))
      .select(col("_kmax"), expr("_kmax div 16 + 1").as("_w"),
        expr("_kmin + ((_kmax - _kmin) * 4) div 10").as("_lo"),
        expr("_kmin + ((_kmax - _kmin) * 6) div 10").as("_hi")))
    // the synthetic lineitem repeats (orderkey, linenumber) pairs, so
    // collapse to unique keys first (min qty — deterministic in both
    // engines); l_orderkey is recoverable as key div 8 (linenumber
    // 1..7 never carries)
    val uniq = li.groupBy(expr("l_orderkey * 8 + l_linenumber").as("key"))
      .agg(min(col("l_quantity")).as("qty"))
    val keyed = uniq.crossJoin(kb)
      .select(col("key"), expr("key div 8").as("l_orderkey"), col("qty"),
        col("_w"), col("_lo"), col("_hi"), col("_kmax"))
    val target = keyed
      .select(expr("key div _w").as("file_id"), col("key"), col("qty"))
    val band = keyed.filter(col("key") >= col("_lo") && col("key") <= col("_hi"))
    val source = band.filter(expr("l_orderkey % 7 = 0"))
        .select(col("key"), lit("U").as("op"), (col("qty") + lit(100.0d)).as("qty"))
      .unionByName(band.filter(expr("l_orderkey % 7 = 3"))
        .select(col("key"), lit("D").as("op"), col("qty")))
      .unionByName(band.filter(expr("l_orderkey % 7 = 5"))
        .select((col("key") + col("_kmax") + lit(1L)).as("key"),
          lit("U").as("op"), col("qty")))
    // Eager per-query barriers (round-17, guide §2.4 — remove
    // recomputation the optimizer cannot see): every consumer references
    // target/source/m1 from MANY differently-pruned branches of one plan
    // (mergeCow alone touches target 4× and source 4×), and because the
    // projections differ, ReuseExchange never dedupes the uniq-groupBy
    // subtree — q208's single evaluation spawned 154 jobs, ~20 of them
    // ~1 s re-evaluations of this fixture. Measured on q208 (fresh-JVM
    // steady, sf0.1/32cpus): no barrier 15.6 s → target+rows2 12.2 →
    // +source/m1 7.6; the QueryScoped.cached variant measured 57 s (the
    // InMemoryRelation starves AQE of stats and serializes wide rows),
    // so the RDD-leaf barrier is the shape that wins, exactly as the
    // incremental-CC batch barriers found in r16. The ~1 s eager
    // constant is paid once per consumer query and the localCheckpoint
    // blocks are released by the harness boundary sweep.
    val targetCp = target.localCheckpoint(true)
    // manifest derives from the MATERIALIZED target so its own eager
    // barrier costs one manifest-sized aggregate, not a third uniq pass
    val m1 = Snapshot.manifestEntriesBy(targetCp, col("file_id"), col("key"),
      version = 1L)
    (targetCp, source.localCheckpoint(true), m1.localCheckpoint(true))
  }

  /** The oracle half of [[mergeFixture]]: WITH-chain through tgt/src
    * (no final SELECT), shared by the q196 and q197 oracles. */
  private[queries] def mergeFixtureCtes: String =
    s"""WITH kb AS (SELECT MAX(l_orderkey * 8 + l_linenumber)::BIGINT AS kmax,
       |            MIN(l_orderkey * 8 + l_linenumber)::BIGINT AS kmin FROM lineitem),
       |k2 AS (SELECT kmax, kmax // 16 + 1 AS w,
       |       kmin + ((kmax - kmin) * 4) // 10 AS lo,
       |       kmin + ((kmax - kmin) * 6) // 10 AS hi FROM kb),
       |tgt0 AS (SELECT (l_orderkey * 8 + l_linenumber)::BIGINT AS key,
       |         MIN(l_quantity) AS qty FROM lineitem GROUP BY 1),
       |tgt AS (SELECT (key // k2.w)::BIGINT AS file_id, key, qty,
       |        key // 8 AS l_orderkey FROM tgt0, k2),
       |band AS (SELECT t.* FROM tgt t, k2 WHERE t.key BETWEEN k2.lo AND k2.hi),
       |src AS (SELECT key, 'U' AS op, qty + 100 AS sv FROM band WHERE l_orderkey % 7 = 0
       |        UNION ALL
       |        SELECT key, 'D', qty FROM band WHERE l_orderkey % 7 = 3
       |        UNION ALL
       |        SELECT key + k2.kmax + 1, 'U', qty FROM band, k2 WHERE l_orderkey % 7 = 5)""".stripMargin

  val decls: Seq[Decl] = Seq(

    // Zone-map skipping: events land in ingest-ordered files (250 rows
    // each), which are naturally time-clustered (ts tracks event_id in
    // any append log) — so a 10%-of-timespan range predicate prunes
    // ~90% of files from the MIN/MAX envelopes alone. The result
    // carries files_total/files_scanned, so the oracle re-derives the
    // zone map and the candidate set, not just the surviving rows; a
    // wrongly pruned file would break the per-file aggregates.
    decl("q157_zone_map_skip",
      (s, d) => {
        val ev = Q.events(s, d)
          .select(col("event_id"), unix_micros(col("ts")).as("tsu"), col("value"))
          .withColumn("file_id", expr("event_id div 250"))
        val zm = Layout.zoneMap(ev, col("file_id"), Seq("tsu" -> col("tsu")))
        val bounds = ev.agg(min("tsu").as("_tlo"), max("tsu").as("_thi"))
          .select(expr("_tlo + ((_thi - _tlo) * 3) div 10").as("lo"),
            expr("_tlo + ((_thi - _tlo) * 4) div 10").as("hi"))
        val cands = Layout.candidateFiles(
          zm.crossJoin(broadcast(bounds)), "tsu", col("lo"), col("hi"))
        val totals = zm.agg(count(lit(1)).as("files_total"))
        val scanned = cands.agg(count(lit(1)).as("files_scanned"))
        Layout.skipScan(ev.drop("file_id").crossJoin(broadcast(bounds)),
            expr("event_id div 250"), cands,
            col("tsu") >= col("lo") && col("tsu") <= col("hi"))
          .groupBy("file_id")
          .agg(count(lit(1)).as("n_rows"),
            sum("value").cast("decimal(14,4)").cast("double").as("sum_value"))
          .crossJoin(broadcast(totals)).crossJoin(broadcast(scanned))
      },
      """WITH ev AS (SELECT event_id, epoch_ns(ts) // 1000 AS tsu, value,
        |            event_id // 250 AS file_id FROM events),
        |zm AS (SELECT file_id, MIN(tsu) AS min_tsu, MAX(tsu) AS max_tsu FROM ev GROUP BY 1),
        |bounds AS (SELECT MIN(tsu) + ((MAX(tsu) - MIN(tsu)) * 3) // 10 AS lo,
        |                  MIN(tsu) + ((MAX(tsu) - MIN(tsu)) * 4) // 10 AS hi FROM ev),
        |cand AS (SELECT file_id FROM zm, bounds WHERE max_tsu >= lo AND min_tsu <= hi),
        |tot AS (SELECT COUNT(*)::BIGINT AS files_total FROM zm),
        |sc AS (SELECT COUNT(*)::BIGINT AS files_scanned FROM cand)
        |SELECT e.file_id AS file_id, COUNT(*)::BIGINT AS n_rows,
        |  CAST(CAST(SUM(e.value) AS DECIMAL(14,4)) AS DOUBLE) AS sum_value,
        |  tot.files_total AS files_total, sc.files_scanned AS files_scanned
        |FROM ev e JOIN cand USING (file_id), bounds, tot, sc
        |WHERE e.tsu BETWEEN lo AND hi
        |GROUP BY 1, 4, 5""".stripMargin),

    // Z-order layout: orders are bucketed equi-width on (custkey,
    // order-day) into a 64x64 grid, bit-interleaved, and chopped into
    // 64 files along the curve. The per-file rectangles (min/max/span
    // of each dimension) ARE the clustering evidence — small spans mean
    // a rectangle query's zone-map intersection touches few files. The
    // oracle replays bucketing, the 6+6-bit interleave, and the file
    // assignment in SQL bit arithmetic.
    decl("q158_zorder_layout",
      (s, d) => {
        val o = t(s, d, "orders").select(
          col("o_custkey").cast("long").as("xv"),
          datediff(col("o_orderdate").cast("date"),
            lit("1995-01-01").cast("date")).cast("long").as("yv"))
        Layout.zorderReport(o, col("xv"), col("yv"), bits = 6, filesLog2 = 6)
      },
      s"""WITH o AS (SELECT o_custkey::BIGINT AS xv,
         |  date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::BIGINT AS yv
         |  FROM orders),
         |b AS (SELECT MIN(xv) AS xlo, MAX(xv) AS xhi,
         |             MIN(yv) AS ylo, MAX(yv) AS yhi FROM o),
         |z AS (SELECT ((xv - xlo) * 64) // (xhi - xlo + 1) AS x,
         |             ((yv - ylo) * 64) // (yhi - ylo + 1) AS y FROM o, b),
         |zz AS (SELECT x, y, ${zSql("x", "y", 6)} AS zval FROM z)
         |SELECT (zval >> 6)::BIGINT AS file_id, COUNT(*)::BIGINT AS n_rows,
         |  MIN(x)::BIGINT AS min_x, MAX(x)::BIGINT AS max_x,
         |  MIN(y)::BIGINT AS min_y, MAX(y)::BIGINT AS max_y,
         |  (MAX(x) - MIN(x))::BIGINT AS span_x,
         |  (MAX(y) - MIN(y))::BIGINT AS span_y
         |FROM zz GROUP BY 1""".stripMargin),

    // Compaction plan: document fragments (per source, 100-doc ingest
    // chunks — the small-file problem) pack into 64 KB output groups by
    // start offset, in (source, frag_idx) order. The plan is a pure
    // function of the fragment manifest, computed with the shared
    // two-phase prefix sum (no global ordered window over fragments);
    // the oracle proves it against a plain global cumsum and re-derives
    // the per-group rollup and the before/after file counts.
    decl("q159_compaction_plan",
      (s, d) => {
        val frags = t(s, d, "documents")
          .groupBy(col("source"), expr("doc_id div 100").as("frag_idx"))
          .agg(sum("n_chars").as("bytes"))
        val plan = Layout.compactionPlan(frags, targetBytes = 65536L)
        val tot = plan.agg(count(lit(1)).as("files_before"),
          countDistinct(col("out_group")).as("files_after"))
        plan.crossJoin(broadcast(tot))
      },
      """WITH fr AS (SELECT source, doc_id // 100 AS frag_idx,
        |            SUM(n_chars)::BIGINT AS bytes FROM documents GROUP BY 1, 2),
        |c AS (SELECT source, frag_idx, bytes,
        |      CAST(SUM(bytes) OVER (ORDER BY source, frag_idx
        |        ROWS UNBOUNDED PRECEDING) - bytes AS BIGINT) AS start_off FROM fr),
        |g AS (SELECT *, start_off // 65536 AS out_group FROM c),
        |r AS (SELECT out_group, SUM(bytes)::BIGINT AS group_bytes,
        |      COUNT(*)::BIGINT AS group_n_frags FROM g GROUP BY 1),
        |tot AS (SELECT COUNT(*)::BIGINT AS files_before,
        |        COUNT(DISTINCT out_group)::BIGINT AS files_after FROM g)
        |SELECT g.source AS source, g.frag_idx AS frag_idx, g.bytes AS bytes,
        |  g.start_off AS start_off, g.out_group AS out_group,
        |  r.group_bytes AS group_bytes, r.group_n_frags AS group_n_frags,
        |  tot.files_before AS files_before, tot.files_after AS files_after
        |FROM g JOIN r USING (out_group), tot""".stripMargin),

    // Deterministic Bloom runtime filter: urgent orders build a 64K-bit
    // bitset (bit_or groupBy — mergeable); lineitem probes it with three
    // broadcast joins + bitwise tests BEFORE the real join. The output
    // counts prove both properties structurally: n_match_after_bloom ==
    // n_match (no false negative ever) while n_bloom_pass sits between
    // n_match and n_probe (false positives exist and are bounded). The
    // oracle rebuilds the bitset and membership tests from the same
    // hash arithmetic — the filter itself is hash-checked.
    decl("q162_bloom_filter_join",
      (s, d) => {
        val m = 65536; val k = 3
        val urgent = t(s, d, "orders")
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")).distinct()
        val bits = Bloom.buildBits(urgent, col("o_orderkey"), m, k, "bf")
        val probe = t(s, d, "lineitem").select(col("l_orderkey"), col("l_returnflag"))
        Bloom.mightContain(probe, col("l_orderkey"), bits, m, k, "bf")
          .join(urgent.withColumn("__m", lit(1)),
            col("l_orderkey") === col("o_orderkey"), "left")
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_probe"),
            sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
            sum(when(col("__m").isNotNull, 1L).otherwise(0L)).as("n_match"),
            sum(when(col("bloom_pass") && col("__m").isNotNull, 1L).otherwise(0L))
              .as("n_match_after_bloom"))
      },
      s"""WITH u AS (SELECT DISTINCT o_orderkey FROM orders
         |           WHERE o_orderpriority = '1-URGENT'),
         |pos AS (${(0 until 3).map(j =>
             s"SELECT ${sqlHash60(s"('bf$j|' || o_orderkey::VARCHAR)")} % 65536 AS p FROM u")
             .mkString("\n  UNION ALL ")}),
         |wrd AS (SELECT p // 32 AS w,
         |        bit_or(1::BIGINT << (p % 32)) AS bits FROM pos GROUP BY 1),
         |pr AS (SELECT l_orderkey, l_returnflag,
         |  ${(0 until 3).map(j =>
             s"${sqlHash60(s"('bf$j|' || l_orderkey::VARCHAR)")} % 65536 AS p$j")
             .mkString(",\n  ")}
         |  FROM lineitem),
         |fl AS (SELECT pr.l_orderkey, pr.l_returnflag,
         |  ${(0 until 3).map(j =>
             s"COALESCE((w$j.bits & (1::BIGINT << (p$j % 32))) != 0, FALSE)")
             .mkString(" AND ")} AS pass
         |  FROM pr
         |  ${(0 until 3).map(j =>
             s"LEFT JOIN wrd w$j ON p$j // 32 = w$j.w").mkString("\n  ")}),
         |mt AS (SELECT fl.*, u.o_orderkey IS NOT NULL AS m
         |       FROM fl LEFT JOIN u ON fl.l_orderkey = u.o_orderkey)
         |SELECT l_returnflag, COUNT(*)::BIGINT AS n_probe,
         |  SUM(CASE WHEN pass THEN 1 ELSE 0 END)::BIGINT AS n_bloom_pass,
         |  SUM(CASE WHEN m THEN 1 ELSE 0 END)::BIGINT AS n_match,
         |  SUM(CASE WHEN pass AND m THEN 1 ELSE 0 END)::BIGINT AS n_match_after_bloom
         |FROM mt GROUP BY 1""".stripMargin),

    // BOTH scan gates in one plan — the deployment shape: a time-range
    // predicate prunes FILES via the zone map, then the bloom gates
    // ROWS on a key set (signup users), and only the doubly-surviving
    // rows pay the exact semi-join. Composed semantics must equal the
    // plain filter+join — the oracle computes that directly, plus the
    // accounting of both gates (files scanned, bloom passes, exact
    // matches), so each pruning layer's effect is hash-checked.
    decl("q178_composed_scan_gates",
      (s, d) => {
        val m = 65536; val kk = 3
        val ev = Q.events(s, d)
          .select(col("event_id"), col("event_type"), col("user_id"),
            unix_micros(col("ts")).as("tsu"))
          .withColumn("file_id", expr("event_id div 250"))
        val zm = Layout.zoneMap(ev, col("file_id"), Seq("tsu" -> col("tsu")))
        val bounds = ev.agg(min("tsu").as("_tlo"), max("tsu").as("_thi"))
          .select(expr("_tlo + ((_thi - _tlo) * 7) div 10").as("lo"),
            expr("_thi").as("hi"))
        val cands = Layout.candidateFiles(
          zm.crossJoin(broadcast(bounds)), "tsu", col("lo"), col("hi"))
        // a SELECTIVE key set (the synthetic corpus has few users and
        // every one signs up — the %7 slice keeps the gate meaningful)
        val signup = ev.where(col("event_type") === "signup" &&
            col("user_id") % 7 === 0)
          .select(col("user_id")).distinct()
        val bits = Bloom.buildBits(signup, col("user_id"), m, kk, "cg")
        val pruned = Layout.skipScan(
            ev.drop("file_id").crossJoin(broadcast(bounds)),
            expr("event_id div 250"), cands,
            col("tsu") >= col("lo") && col("tsu") <= col("hi"))
        val gated = Bloom.mightContain(pruned, col("user_id"), bits, m, kk, "cg")
        val exact = gated.where(col("bloom_pass"))
          .join(signup.withColumnRenamed("user_id", "__su"),
            col("user_id") === col("__su"), "left_semi")
        val filesScanned = cands.agg(count(lit(1)).as("files_scanned"))
        val bloomPassed = gated.agg(
          sum(when(col("bloom_pass"), 1L).otherwise(0L)).as("n_bloom_pass"),
          count(lit(1)).as("n_in_range"))
        exact.groupBy("event_type")
          .agg(count(lit(1)).as("n_rows"))
          .crossJoin(broadcast(filesScanned))
          .crossJoin(broadcast(bloomPassed))
      },
      s"""WITH ev AS (SELECT event_id, event_type, user_id,
         |  epoch_ns(ts) // 1000 AS tsu, event_id // 250 AS file_id FROM events),
         |bounds AS (SELECT MIN(tsu) + ((MAX(tsu) - MIN(tsu)) * 7) // 10 AS lo,
         |           MAX(tsu) AS hi FROM ev),
         |zm AS (SELECT file_id, MIN(tsu) AS mn, MAX(tsu) AS mx FROM ev GROUP BY 1),
         |cand AS (SELECT file_id FROM zm, bounds WHERE mx >= lo AND mn <= hi),
         |su AS (SELECT DISTINCT user_id FROM ev
         |       WHERE event_type = 'signup' AND user_id % 7 = 0),
         |pos AS (${(0 until 3).map(j =>
             s"SELECT ${sqlHash60(s"('cg$j|' || user_id::VARCHAR)")} % 65536 AS p FROM su")
             .mkString("\n  UNION ALL ")}),
         |wrd AS (SELECT p // 32 AS w, bit_or(1::BIGINT << (p % 32)) AS bits
         |        FROM pos GROUP BY 1),
         |pruned AS (SELECT e.* FROM ev e JOIN cand USING (file_id), bounds
         |           WHERE e.tsu BETWEEN lo AND hi),
         |fl AS (SELECT pruned.*,
         |  ${(0 until 3).map(j =>
             s"COALESCE((w$j.bits & (1::BIGINT << (p$j % 32))) != 0, FALSE)")
             .mkString(" AND ")} AS pass
         |  FROM (SELECT *, ${(0 until 3).map(j =>
             s"${sqlHash60(s"('cg$j|' || user_id::VARCHAR)")} % 65536 AS p$j")
             .mkString(", ")} FROM pruned) pruned
         |  ${(0 until 3).map(j =>
             s"LEFT JOIN wrd w$j ON p$j // 32 = w$j.w").mkString("\n  ")}),
         |acc AS (SELECT (SELECT COUNT(*) FROM cand)::BIGINT AS files_scanned,
         |        (SELECT SUM(CASE WHEN pass THEN 1 ELSE 0 END) FROM fl)::BIGINT AS n_bloom_pass,
         |        (SELECT COUNT(*) FROM fl)::BIGINT AS n_in_range)
         |SELECT fl.event_type AS event_type, COUNT(*)::BIGINT AS n_rows,
         |  acc.files_scanned, acc.n_bloom_pass, acc.n_in_range
         |FROM fl JOIN su USING (user_id), acc
         |WHERE fl.pass
         |GROUP BY 1, 3, 4, 5""".stripMargin),

    // Snapshot-commit manifest arithmetic over three table versions:
    // v1 = initial load (16 hash-assigned files with zone-map stats),
    // v2 = append commit (4 bigger files, ids offset past v1's max),
    // v3 = compaction commit (the small v1 files packed to ~6k-row
    // replacements by the prefix-sum grouping, the big v2 files carried
    // over untouched). The result is all three manifests — so the
    // commit arithmetic (id offsetting, row conservation, envelope
    // union, packing group assignment) is hash-checked end to end. The
    // FS half of the protocol (atomic pointer swap, reader isolation,
    // vacuum) is spec-gated in SnapshotSpec. The SQL prefix sum is a
    // plain ordered window, equivalent to the engine's two-phase form
    // because every small file id here is distinct and < 64 (one id
    // per %64 partition ⇒ the partition offset IS the exclusive prefix).
    decl("q182_snapshot_commits",
      (s, d) => {
        val (m1, m2, m3) = manifestChain(t(s, d, "lineitem"))
        m1.unionByName(m2).unionByName(m3)
      },
      manifestChainCtes + """
         |SELECT version, file_id, n_rows, min_key, max_key FROM m1
         |UNION ALL SELECT version, file_id, n_rows, min_key, max_key FROM m2
         |UNION ALL SELECT version, file_id, n_rows, min_key, max_key FROM m3""".stripMargin),

    // Manifest-pruned snapshot scan over a CLUSTERED layout: both
    // commits assign files by key range (l_orderkey div width — the
    // clusteredWrite layout, via Snapshot.manifestEntriesBy), so the
    // manifest envelopes are tight and the middle-fifth range query
    // prunes most files — the manifest IS the zone map, and pruning is
    // the same broadcast candidate-list join as q157, driven from the
    // snapshot layer. (Hash assignment, q182's choice for balance,
    // would give every file a full-domain envelope and prune NOTHING —
    // the layout/pruning trade stated on manifestEntriesBy.) Each scan
    // row recomputes its commit-time file id, so the scan, the
    // manifest, and the pruning hash-check each other: a wrongly
    // pruned file breaks the per-file counts, a wrong envelope breaks
    // files_scanned.
    decl("q183_snapshot_pruned_scan",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val split = to_timestamp(lit("1995-06-01"))
        // width from the key domain: 16 clustered v1 files, 4 coarser
        // ones for the append (a compaction-pending "recent" tier)
        val kb = broadcast(li.agg(max("l_orderkey").as("_kmax"))
          .select(expr("_kmax div 16 + 1").as("_w1"),
            expr("_kmax div 4 + 1").as("_w2")))
        val v1 = li.where(col("l_shipdate") < split).crossJoin(kb)
        val v2a = li.where(col("l_shipdate") >= split).crossJoin(kb)
        val m1 = Snapshot.manifestEntriesBy(v1,
          expr("l_orderkey div _w1"), col("l_orderkey"), version = 1L)
        val m2 = Snapshot.commitAppend(m1,
          Snapshot.manifestEntriesBy(v2a,
            expr("l_orderkey div _w2"), col("l_orderkey"), version = 2L),
          version = 2L)
        // data-derived range: the middle fifth of the key domain
        val bounds = li.agg(min("l_orderkey").as("_klo"), max("l_orderkey").as("_khi"))
          .select(expr("_klo + ((_khi - _klo) * 4) div 10").as("lo"),
            expr("_klo + ((_khi - _klo) * 6) div 10").as("hi"))
        val cands = Layout.candidateFiles(
          m2.crossJoin(broadcast(bounds)), "key", col("lo"), col("hi"))
        val base = broadcast(m1.agg((max(col("file_id")) + 1L).as("_base")))
        val fileId = when(col("l_shipdate") < split, expr("l_orderkey div _w1"))
          .otherwise(expr("l_orderkey div _w2") + col("_base"))
        val pruned = Layout.skipScan(
          li.crossJoin(kb).crossJoin(base).crossJoin(broadcast(bounds)),
          fileId, cands,
          col("l_orderkey") >= col("lo") && col("l_orderkey") <= col("hi"))
        val acc = broadcast(cands.agg(count(lit(1)).as("files_scanned"))
          .crossJoin(m2.agg(count(lit(1)).as("files_total"))))
        pruned.groupBy("file_id")
          .agg(count(lit(1)).as("n_rows_in_range"),
            min("l_orderkey").as("min_key_seen"), max("l_orderkey").as("max_key_seen"))
          .crossJoin(acc)
      },
      s"""WITH w AS (SELECT MAX(l_orderkey) // 16 + 1 AS w1,
         |           MAX(l_orderkey) // 4 + 1 AS w2 FROM lineitem),
         |m1 AS (SELECT l_orderkey // w.w1 AS file_id, COUNT(*)::BIGINT AS n_rows,
         |       MIN(l_orderkey)::BIGINT AS min_key, MAX(l_orderkey)::BIGINT AS max_key
         |       FROM lineitem, w WHERE l_shipdate < TIMESTAMP '1995-06-01' GROUP BY 1),
         |add2 AS (SELECT l_orderkey // w.w2 AS fid, COUNT(*)::BIGINT AS n_rows,
         |        MIN(l_orderkey)::BIGINT AS min_key, MAX(l_orderkey)::BIGINT AS max_key
         |        FROM lineitem, w WHERE l_shipdate >= TIMESTAMP '1995-06-01' GROUP BY 1),
         |b1 AS (SELECT MAX(file_id) + 1 AS base FROM m1),
         |m2 AS (SELECT file_id, n_rows, min_key, max_key FROM m1
         |       UNION ALL
         |       SELECT fid + b1.base, n_rows, min_key, max_key FROM add2, b1),
         |bounds AS (SELECT MIN(l_orderkey) + ((MAX(l_orderkey) - MIN(l_orderkey)) * 4) // 10 AS lo,
         |           MIN(l_orderkey) + ((MAX(l_orderkey) - MIN(l_orderkey)) * 6) // 10 AS hi
         |           FROM lineitem),
         |cand AS (SELECT file_id FROM m2, bounds WHERE max_key >= lo AND min_key <= hi),
         |rows2 AS (SELECT CASE WHEN l_shipdate < TIMESTAMP '1995-06-01'
         |            THEN l_orderkey // w.w1
         |            ELSE l_orderkey // w.w2 + (SELECT base FROM b1) END AS file_id,
         |          l_orderkey FROM lineitem, w),
         |acc AS (SELECT (SELECT COUNT(*) FROM cand)::BIGINT AS files_scanned,
         |        (SELECT COUNT(*) FROM m2)::BIGINT AS files_total)
         |SELECT r.file_id AS file_id, COUNT(*)::BIGINT AS n_rows_in_range,
         |  MIN(r.l_orderkey)::BIGINT AS min_key_seen,
         |  MAX(r.l_orderkey)::BIGINT AS max_key_seen,
         |  acc.files_scanned, acc.files_total
         |FROM rows2 r JOIN cand USING (file_id), bounds, acc
         |WHERE r.l_orderkey BETWEEN lo AND hi
         |GROUP BY 1, 5, 6""".stripMargin),

    // AS-OF TIMESTAMP resolution over the q182 manifest chain — the
    // relational half of Snapshot.resolveVersionAsOf (whose FS half is
    // SnapshotSpec-gated): each version carries a data-derived commit
    // timestamp (v1 publishes at the newest shipdate it contains, v2 at
    // the table's newest, v3 — the compaction — a day later), probes
    // are every shipdate month-start plus one "now" probe past v3, and
    // each probe resolves to the HIGHEST version committed at-or-before
    // it — Iceberg's snapshot-for-timestamp rule. The resolution is a
    // broadcast range join + max (the version set is O(versions), never
    // windowed), then each probe reports the table's live file/row
    // stats AS OF that instant. Probes older than v1 resolve to the
    // no-table sentinel (-1, 0 files, 0 rows). Scale shape: one
    // distinct-aggregation over the fact table for probes; everything
    // downstream is manifest-sized broadcasts.
    decl("q190_snapshot_asof_resolve",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val split = to_timestamp(lit("1995-06-01"))
        val (m1, m2, m3) = manifestChain(li)
        val perVersion = m1.unionByName(m2).unionByName(m3)
          .groupBy("version")
          .agg(count(lit(1)).as("files_live"), sum("n_rows").as("rows_live"))
        val vts = li.agg(
            max(when(col("l_shipdate") < split, col("l_shipdate"))).as("t1"),
            max(col("l_shipdate")).as("t2"))
          .select(explode(array(
            struct(lit(1L).as("version"), col("t1").as("commit_ts")),
            struct(lit(2L).as("version"), col("t2").as("commit_ts")),
            struct(lit(3L).as("version"),
              (col("t2") + expr("INTERVAL 1 DAY")).as("commit_ts")))).as("v"))
          .select(col("v.version").as("version"), col("v.commit_ts").as("commit_ts"))
        val probes = li
          .select(date_trunc("month", col("l_shipdate")).as("probe_ts")).distinct()
          .unionByName(li.agg(
            (max(col("l_shipdate")) + expr("INTERVAL 2 DAY")).as("probe_ts")))
        val resolved = probes
          .join(broadcast(vts), col("probe_ts") >= col("commit_ts"), "left")
          .groupBy("probe_ts").agg(max("version").as("version"))
        resolved.join(broadcast(perVersion), Seq("version"), "left")
          // STRING probe output: Spark serializes the fixture's
          // ns-precision timestamps as parquet timestamp[ns] where the
          // oracle's frame is us-precision — a dtype-only gate mismatch
          // (and DATE round-trips as datetime again); the probes are
          // day-grained, resolution still compares full timestamps above
          .select(date_format(col("probe_ts"), "yyyy-MM-dd").as("probe_ts"),
            coalesce(col("version"), lit(-1L)).as("version"),
            coalesce(col("files_live"), lit(0L)).as("files_live"),
            coalesce(col("rows_live"), lit(0L)).as("rows_live"))
      },
      manifestChainCtes + """,
         |vts AS (SELECT 1::BIGINT AS version,
         |          MAX(CASE WHEN l_shipdate < TIMESTAMP '1995-06-01'
         |              THEN l_shipdate END) AS commit_ts FROM lineitem
         |        UNION ALL SELECT 2::BIGINT, MAX(l_shipdate) FROM lineitem
         |        UNION ALL SELECT 3::BIGINT, MAX(l_shipdate) + INTERVAL 1 DAY
         |          FROM lineitem),
         |pv AS (SELECT version, COUNT(*)::BIGINT AS files_live,
         |       SUM(n_rows)::BIGINT AS rows_live FROM (
         |         SELECT * FROM m1 UNION ALL SELECT * FROM m2
         |         UNION ALL SELECT * FROM m3) GROUP BY 1),
         |probes AS (SELECT DISTINCT date_trunc('month', l_shipdate) AS probe_ts
         |           FROM lineitem
         |           UNION
         |           SELECT MAX(l_shipdate) + INTERVAL 2 DAY FROM lineitem),
         |res AS (SELECT probe_ts, MAX(vts.version) AS version FROM probes
         |        LEFT JOIN vts ON probe_ts >= commit_ts GROUP BY 1)
         |SELECT strftime(probe_ts, '%Y-%m-%d') AS probe_ts,
         |  COALESCE(res.version, -1)::BIGINT AS version,
         |  COALESCE(pv.files_live, 0)::BIGINT AS files_live,
         |  COALESCE(pv.rows_live, 0)::BIGINT AS rows_live
         |FROM res LEFT JOIN pv ON res.version = pv.version""".stripMargin),

    // Copy-on-write MERGE INTO over the snapshot store — the one
    // mutation the q182 append/compact chain can't express. The v2
    // manifest's action column IS the COW contract under test: the
    // ~12 files whose envelopes miss the source band must come out
    // `carried` (id-stable, straight from the v1 manifest, no data
    // rescan), the ~4 banded files `rewritten` under fresh monotone
    // ids, the out-of-domain inserts hash-packed into 2 `added`
    // files — and the oracle recomputes all of it (file ranking, id
    // offsets, envelope recompute, change counts) independently in
    // SQL. Scale shape: touch-set discovery is one semi-join +
    // distinct, broadcast back everywhere; the carried branch never
    // touches data; only banded rows ride the ops join.
    decl("q196_snapshot_merge_cow",
      (s, d) => {
        val (target, source, m1) = mergeFixture(t(s, d, "lineitem"))
        val (m2, _, changes) = Snapshot.mergeCow(target, source, m1,
          valCol = "qty", version = 2L, insertFiles = 2)
        val counts = broadcast(changes.agg(
          coalesce(sum(when(col("change_type") === "update", 1L)), lit(0L))
            .as("n_updated"),
          coalesce(sum(when(col("change_type") === "delete", 1L)), lit(0L))
            .as("n_deleted"),
          coalesce(sum(when(col("change_type") === "insert", 1L)), lit(0L))
            .as("n_inserted")))
        m2.crossJoin(counts)
      },
      mergeFixtureCtes + s""",
         |m1 AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows, MIN(key)::BIGINT AS min_key,
         |       MAX(key)::BIGINT AS max_key FROM tgt GROUP BY 1),
         |touched AS (SELECT DISTINCT t.file_id FROM tgt t JOIN src s ON t.key = s.key),
         |trk AS (SELECT file_id,
         |        (ROW_NUMBER() OVER (ORDER BY file_id % 64, file_id) - 1)::BIGINT AS rk FROM touched),
         |base AS (SELECT COALESCE(MAX(file_id) + 1, 0)::BIGINT AS b FROM m1),
         |nt AS (SELECT COUNT(*)::BIGINT AS n FROM touched),
         |surv AS (SELECT (base.b + trk.rk)::BIGINT AS file_id, tg.key,
         |         CASE WHEN s.op = 'U' THEN s.sv ELSE tg.qty END AS qty
         |         FROM tgt tg JOIN trk ON tg.file_id = trk.file_id
         |         LEFT JOIN src s ON tg.key = s.key
         |         CROSS JOIN base
         |         WHERE s.op IS NULL OR s.op = 'U'),
         |ins AS (SELECT (base.b + nt.n +
         |          ${sqlHash60("s.key::VARCHAR")} % 2)::BIGINT AS file_id,
         |        s.key, s.sv AS qty
         |        FROM src s CROSS JOIN base CROSS JOIN nt
         |        WHERE s.op = 'U' AND s.key NOT IN (SELECT key FROM tgt)),
         |m2 AS (SELECT 2::BIGINT AS version, file_id, n_rows, min_key, max_key,
         |         'carried' AS action
         |       FROM m1 WHERE file_id NOT IN (SELECT file_id FROM touched)
         |       UNION ALL
         |       SELECT 2::BIGINT, file_id, COUNT(*)::BIGINT, MIN(key)::BIGINT,
         |         MAX(key)::BIGINT, 'rewritten' FROM surv GROUP BY 2
         |       UNION ALL
         |       SELECT 2::BIGINT, file_id, COUNT(*)::BIGINT, MIN(key)::BIGINT,
         |         MAX(key)::BIGINT, 'added' FROM ins GROUP BY 2),
         |cnt AS (SELECT
         |  (SELECT COUNT(*) FROM tgt tg JOIN src s ON tg.key = s.key
         |   WHERE s.op = 'U' AND s.sv <> tg.qty)::BIGINT AS n_updated,
         |  (SELECT COUNT(*) FROM tgt tg JOIN src s ON tg.key = s.key
         |   WHERE s.op = 'D')::BIGINT AS n_deleted,
         |  (SELECT COUNT(*) FROM ins)::BIGINT AS n_inserted)
         |SELECT m2.version, m2.file_id, m2.n_rows, m2.min_key, m2.max_key,
         |  m2.action, cnt.n_updated, cnt.n_deleted, cnt.n_inserted
         |FROM m2, cnt""".stripMargin),

    // Reader-side change-data-feed across the merge: reconstruct the
    // row-level diff v1 → v2 by full-outer-joining the two versions'
    // rows on key — a DIFFERENT plan from the writer's change feed
    // (mergeCow derives its changes from the rewrite join; SnapshotSpec
    // asserts the two agree), and the oracle takes a third route,
    // classifying straight from the op table. Three independent
    // derivations of the same change set hash-checking each other.
    // Scale shape: the version diff shuffles on key once — inherent to
    // reader-side CDF; the writer-side feed is the free alternative
    // when the merge itself is in hand.
    decl("q197_snapshot_change_feed",
      (s, d) => {
        val (target, source, m1) = mergeFixture(t(s, d, "lineitem"))
        val (_, rows2, _) = Snapshot.mergeCow(target, source, m1,
          valCol = "qty", version = 2L, insertFiles = 2)
        target.select(col("key"), col("qty").as("_qa"))
          .join(rows2.select(col("key"), col("qty").as("_qb")),
            Seq("key"), "full_outer")
          .filter(col("_qa").isNull || col("_qb").isNull ||
            !(col("_qa") <=> col("_qb")))
          .select(col("key"),
            when(col("_qa").isNull, lit("insert"))
              .when(col("_qb").isNull, lit("delete"))
              .otherwise(lit("update")).as("change_type"),
            col("_qa").as("qty_before"), col("_qb").as("qty_after"))
      },
      mergeFixtureCtes + """
         |SELECT tg.key AS key, 'update' AS change_type,
         |  tg.qty AS qty_before, s.sv AS qty_after
         |FROM tgt tg JOIN src s ON tg.key = s.key
         |WHERE s.op = 'U' AND s.sv <> tg.qty
         |UNION ALL
         |SELECT tg.key, 'delete', tg.qty, NULL::DOUBLE
         |FROM tgt tg JOIN src s ON tg.key = s.key WHERE s.op = 'D'
         |UNION ALL
         |SELECT s.key, 'insert', NULL::DOUBLE, s.sv
         |FROM src s LEFT JOIN tgt tg ON s.key = tg.key
         |WHERE s.op = 'U' AND tg.key IS NULL""".stripMargin),

    // Incremental view maintenance off the change feed — the consumer
    // that makes the CDF worth emitting. The Spark side NEVER touches
    // the post-merge table: it builds the v1 view, then applies
    // mergeCow's writer feed through the delta rules (insert +v/+1,
    // delete −v/−1, update after−before/0) with a DECIMAL(30,12)
    // running sum. The oracle is the FULL RECOMPUTE over the post-merge
    // rows — so the gate proves incremental ≡ recompute exactly, on
    // both seeds, across engines. Scale shape: maintenance shuffles
    // the change feed (kilobytes) and merges into a group-sized view —
    // O(|changes| + |view|), never O(|table|); a recompute rescans
    // everything.
    decl("q199_ivm_change_feed",
      (s, d) => {
        val (target, source, m1) = mergeFixture(t(s, d, "lineitem"))
        val (_, _, changes) = Snapshot.mergeCow(target, source, m1,
          valCol = "qty", version = 2L, insertFiles = 2)
        val v1 = Ivm.buildSumCount(target, expr("key div 1024"), "qty")
        Ivm.applySumCountDelta(v1, changes, expr("key div 1024"))
          .select(col("group").as("grp"),
            col("sum_val").cast("double").as("sum_qty"), col("n"))
      },
      ivmViewOracle),

    // Range delete with METADATA-ONLY drops: on the key-clustered
    // fixture, deleting the middle band [lo, hi] drops the files whose
    // envelopes are CONTAINED in the range straight from the manifest
    // (no data read — their parquet is anti-join-pruned), rewrites only
    // the two boundary-straddling files, and carries the rest. The
    // oracle reclassifies every file from envelopes, replays the
    // boundary rewrite (fresh monotone ids), and recomputes the live
    // row/qty totals — so the file-skipping arithmetic itself is
    // hash-gated. Scale shape: a retention/GDPR sweep on a clustered
    // 100 TB table costs O(boundary files), not O(table) — the reason
    // lakehouse deletes are metadata operations.
    decl("q201_delete_range_metadata",
      (s, d) => {
        val (target, _, m1) = mergeFixture(t(s, d, "lineitem"))
        val b = t(s, d, "lineitem")
          .agg(max(expr("l_orderkey * 8 + l_linenumber")).as("_kmax"),
            min(expr("l_orderkey * 8 + l_linenumber")).as("_kmin"))
          .select(expr("_kmin + ((_kmax - _kmin) * 4) div 10").as("lo"),
            expr("_kmin + ((_kmax - _kmin) * 6) div 10").as("hi"))
          .head()
        val (lo, hi) = (b.getLong(0), b.getLong(1))
        val (audit, rows2) = Snapshot.deleteRange(target, m1, "qty", lo, hi, 2L)
        audit.crossJoin(broadcast(rows2.agg(
          count(lit(1)).as("rows_live"),
          coalesce(sum(col("qty").cast("decimal(30,12)")),
            lit(0).cast("decimal(30,12)")).cast("double").as("qty_live"))))
      },
      mergeFixtureCtes + """,
         |m1 AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows, MIN(key)::BIGINT AS min_key,
         |       MAX(key)::BIGINT AS max_key FROM tgt GROUP BY 1),
         |cls AS (SELECT m1.*, CASE
         |          WHEN max_key < k2.lo OR min_key > k2.hi THEN 'carried'
         |          WHEN min_key >= k2.lo AND max_key <= k2.hi THEN 'dropped'
         |          ELSE 'rewritten_src' END AS c
         |        FROM m1, k2),
         |bnd AS (SELECT file_id, (ROW_NUMBER() OVER (ORDER BY file_id % 64, file_id) - 1)::BIGINT AS rk
         |        FROM cls WHERE c = 'rewritten_src'),
         |base AS (SELECT COALESCE(MAX(file_id) + 1, 0)::BIGINT AS b FROM m1),
         |surv AS (SELECT (base.b + bnd.rk)::BIGINT AS file_id, tg.key, tg.qty
         |         FROM tgt tg, bnd, base, k2
         |         WHERE tg.file_id = bnd.file_id
         |           AND (tg.key < k2.lo OR tg.key > k2.hi)),
         |aud AS (SELECT 2::BIGINT AS version, file_id, n_rows, min_key, max_key,
         |          c AS action FROM cls WHERE c <> 'rewritten_src'
         |        UNION ALL
         |        SELECT 2::BIGINT, file_id, COUNT(*)::BIGINT, MIN(key)::BIGINT,
         |          MAX(key)::BIGINT, 'rewritten' FROM surv GROUP BY 2),
         |live AS (SELECT COUNT(*)::BIGINT AS rows_live,
         |         CAST(COALESCE(SUM(CAST(qty AS DECIMAL(30,12))), 0) AS DOUBLE) AS qty_live
         |         FROM tgt, k2 WHERE key < k2.lo OR key > k2.hi)
         |SELECT aud.version, aud.file_id, aud.n_rows, aud.min_key, aud.max_key,
         |  aud.action, live.rows_live, live.qty_live
         |FROM aud, live""".stripMargin)) :+ bloomTouchDecl :+ schemaEvolveDecl :+ minMaxIvmDecl :+ bloomMaintainDecl :+ lifecycleDecl :+ morDvDecl :+ morMergeDecl :+ advisorDecl :+ wapDecl :+ joinViewIvmDecl :+ branchMergeDecl :+ incrOptimizeDecl :+ rebaseDecl :+ advisorManifestDecl :+ morBloomDecl :+ clusterDepthDecl :+ equiDepthDecl :+ columnStatsDecl :+ rebalanceDecl :+ maintenanceAdvisorDecl :+ rebalanceExecDecl :+ indexAdvisorDecl :+ maintenanceRouterDecl :+ maintenanceLoopDecl :+ leaseMaintenanceDecl

  // q263 (round-12): MERGE-ON-READ deletion vectors — the other half
  // of the delete family. q201's deleteRange rewrites/drops files
  // EAGERLY (copy-on-write); here a skewed key-predicate delete lands
  // as (file_id, key) tombstones with ZERO data files touched
  // (write cost O(matched keys) — the constant-trickle GDPR shape),
  // reads subtract the DV with one anti-join, and compactDv
  // materializes exactly the files whose deleted fraction crosses the
  // threshold (the low-key files here, by construction), dropping
  // their DV entries. The gate checks the read-side invariant — live
  // rows after [MOR delete → compact → read] equal the plain filtered
  // base — AND the accounting (dv entries, files materialized, dv
  // entries surviving compaction), all replayed in SQL from the same
  // file-assignment and threshold rules.
  private def morDvDecl: Decl =
    decl("q263_mor_deletion_vectors",
      (s, d) => {
        import graft.operators.Snapshot
        val (target, _, _) = mergeFixture(t(s, d, "lineitem"))
        val kb = broadcast(t(s, d, "lineitem")
          .agg(max(expr("l_orderkey * 8 + l_linenumber")).as("_kmax"),
            min(expr("l_orderkey * 8 + l_linenumber")).as("_kmin"))
          .select(expr("_kmin + ((_kmax - _kmin) * 2) div 10").as("_cut")))
        val del = target.crossJoin(kb)
          .filter(col("key") <= col("_cut") && expr("(key div 8) % 3 = 0"))
          .select("key")
        val dv = Snapshot.deleteMor(target, del)
        val (rows2, dv2, audit) = Snapshot.compactDv(target, dv, threshold = 0.2)
        val live = Snapshot.readWithDv(rows2, dv2)
        val stats = broadcast(
          dv.agg(count(lit(1)).as("dv_entries"))
            .crossJoin(audit.agg(
              sum(when(col("materialized"), 1L).otherwise(0L))
                .as("files_materialized")))
            .crossJoin(dv2.agg(count(lit(1)).as("dv_after"))))
        live.select(col("key"), col("qty")).crossJoin(stats)
      },
      mergeFixtureCtes + """,
        |cut AS (SELECT (kmin + ((kmax - kmin) * 2) // 10)::BIGINT AS c
        |        FROM kb),
        |del AS (SELECT key FROM tgt, cut
        |        WHERE key <= cut.c AND (key // 8) % 3 = 0),
        |dv AS (SELECT t.file_id, t.key FROM tgt t JOIN del USING (key)),
        |pf AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows FROM tgt GROUP BY 1),
        |df AS (SELECT file_id, COUNT(*)::BIGINT AS n_del FROM dv GROUP BY 1),
        |aud AS (SELECT pf.file_id, pf.n_rows, COALESCE(df.n_del, 0) AS n_del,
        |          COALESCE(df.n_del, 0)::DOUBLE >= 0.2 * pf.n_rows::DOUBLE AS hot
        |        FROM pf LEFT JOIN df USING (file_id)),
        |stats AS (SELECT
        |    (SELECT COUNT(*) FROM dv)::BIGINT AS dv_entries,
        |    (SELECT COUNT(*) FROM aud WHERE hot)::BIGINT AS files_materialized,
        |    (SELECT COUNT(*) FROM dv JOIN aud USING (file_id)
        |       WHERE NOT aud.hot)::BIGINT AS dv_after)
        |SELECT t.key, t.qty, stats.dv_entries, stats.files_materialized,
        |  stats.dv_after
        |FROM tgt t, stats
        |WHERE t.key NOT IN (SELECT key FROM del)""".stripMargin)

  // q264 (round-12): MERGE-ON-READ merge — q196's mergeCow rewrites
  // every touched file (write amplification ∝ file sizes); mergeMor
  // serves the same upsert batch by tombstoning the matched rows into
  // the DV and APPENDING updated/new values under fresh file ids —
  // write cost O(|source|), no data file read or rewritten, the
  // high-frequency-upsert regime. The gate: the DV-subtracted read of
  // rows ∪ appends must equal the same merged state the COW oracle
  // computes, plus the write-side accounting (tombstones = matched
  // EXISTING rows only; appended = every upsert including inserts).
  private def morMergeDecl: Decl =
    decl("q264_mor_merge",
      (s, d) => {
        import graft.operators.Snapshot
        val (target, source, _) = mergeFixture(t(s, d, "lineitem"))
        val (dv, app) = Snapshot.mergeMor(target, source, "qty", insertFiles = 4)
        val live = Snapshot.readWithDv(
          target.select("file_id", "key", "qty").unionByName(app), dv)
        val stats = broadcast(
          dv.agg(count(lit(1)).as("dv_entries"))
            .crossJoin(app.agg(count(lit(1)).as("appended_rows"))))
        live.select(col("key"), col("qty")).crossJoin(stats)
      },
      mergeFixtureCtes + """,
        |matched AS (SELECT t.key FROM tgt t JOIN src USING (key)),
        |live AS (
        |  SELECT t.key, t.qty FROM tgt t
        |  WHERE t.key NOT IN (SELECT key FROM src)
        |  UNION ALL
        |  SELECT key, sv AS qty FROM src WHERE op = 'U'),
        |stats AS (SELECT
        |  (SELECT COUNT(*) FROM matched)::BIGINT AS dv_entries,
        |  (SELECT COUNT(*) FROM src WHERE op = 'U')::BIGINT AS appended_rows)
        |SELECT live.key, live.qty, stats.dv_entries, stats.appended_rows
        |FROM live, stats""".stripMargin)

  // q267 (round-13): the COW-vs-MOR advisor — the engine owns both
  // merge shapes, so the per-batch call between them is cost
  // arithmetic (Snapshot.adviseMerge) runnable BEFORE writing a byte.
  // Three batches span the regimes: 'point' (every 97th key across
  // the whole domain — COW would rewrite every file to change ~1% of
  // rows → mor), 'dense' (the whole middle band — the rewrite barely
  // exceeds the tombstone+append mass → cow), and 'mixed' (the q196
  // fixture source with updates+deletes+inserts, exercising every
  // term). The gate runs BOTH mutation paths per batch and emits the
  // MEASURED write masses beside the estimates; the oracle computes
  // each term once from first principles, so any estimate-vs-actual
  // divergence on the Spark side fails the hash.
  private def advisorDecl: Decl =
    decl("q267_cow_mor_advisor",
      (s, d) => {
        import graft.operators.Snapshot
        val (target, source, m1) = mergeFixture(t(s, d, "lineitem"))
        val b = t(s, d, "lineitem")
          .agg(max(expr("l_orderkey * 8 + l_linenumber")).as("_kmax"),
            min(expr("l_orderkey * 8 + l_linenumber")).as("_kmin"))
          .select(expr("_kmin + ((_kmax - _kmin) * 4) div 10").as("lo"),
            expr("_kmin + ((_kmax - _kmin) * 6) div 10").as("hi"))
          .head()
        val (lo, hi) = (b.getLong(0), b.getLong(1))
        val point = target.filter(col("key") % 97 === 0)
          .select(col("key"), lit("U").as("op"), (col("qty") + 1.0d).as("qty"))
        val dense = target.filter(col("key").between(lo, hi))
          .select(col("key"), lit("U").as("op"), (col("qty") + 1.0d).as("qty"))
        def run(tag: String, batch: org.apache.spark.sql.DataFrame) = {
          val adv = Snapshot.adviseMerge(target, batch, m1)
          val (m2, _, _) = Snapshot.mergeCow(target, batch, m1, "qty", 2L, 4)
          val cowActual = broadcast(m2.filter(col("action") =!= "carried")
            .agg(coalesce(sum(col("n_rows")), lit(0L)).as("cow_actual_rows")))
          val (dv, app) = Snapshot.mergeMor(target, batch, "qty", insertFiles = 4)
          val morActual = broadcast(dv.agg(count(lit(1)).as("dv_entries"))
            .crossJoin(app.agg(count(lit(1)).as("appended"))))
          adv.crossJoin(cowActual).crossJoin(morActual)
            .select(lit(tag).as("batch") +: adv.columns.map(col) :+
              col("cow_actual_rows") :+ col("dv_entries") :+ col("appended"): _*)
        }
        run("mixed", source)
          .unionByName(run("point", point))
          .unionByName(run("dense", dense))
      },
      mergeFixtureCtes + """,
        |batches AS (
        |  SELECT 'mixed' AS batch, key, op FROM src
        |  UNION ALL
        |  SELECT 'point', key, 'U' FROM tgt WHERE key % 97 = 0
        |  UNION ALL
        |  SELECT 'dense', key, 'U' FROM tgt, k2
        |  WHERE key BETWEEN k2.lo AND k2.hi),
        |m1 AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows FROM tgt GROUP BY 1),
        |mt AS (SELECT b.batch, t.file_id, b.op FROM tgt t JOIN batches b USING (key)),
        |tch AS (SELECT DISTINCT batch, file_id FROM mt),
        |tst AS (SELECT tch.batch, COUNT(*)::BIGINT AS files_touched,
        |        SUM(m1.n_rows)::BIGINT AS touched_rows
        |        FROM tch JOIN m1 USING (file_id) GROUP BY 1),
        |ms AS (SELECT batch, COUNT(*)::BIGINT AS matched_keys,
        |        SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END)::BIGINT AS matched_deletes
        |       FROM mt GROUP BY 1),
        |bu AS (SELECT batch, COUNT(*)::BIGINT AS upserts FROM batches
        |       WHERE op = 'U' GROUP BY 1),
        |bi AS (SELECT batch, COUNT(*)::BIGINT AS inserts FROM batches
        |       WHERE op = 'U' AND key NOT IN (SELECT key FROM tgt) GROUP BY 1),
        |nt AS (SELECT COUNT(*)::BIGINT AS n_target FROM tgt)
        |SELECT tst.batch, nt.n_target, ms.matched_keys, ms.matched_deletes,
        |  COALESCE(bi.inserts, 0)::BIGINT AS inserts, bu.upserts,
        |  tst.files_touched, tst.touched_rows,
        |  (tst.touched_rows - ms.matched_deletes + COALESCE(bi.inserts, 0))::BIGINT
        |    AS cow_write_rows,
        |  (ms.matched_keys + bu.upserts)::BIGINT AS mor_write_rows,
        |  ROUND(ms.matched_keys::DOUBLE / nt.n_target::DOUBLE, 6) AS dv_fraction,
        |  CASE WHEN (tst.touched_rows - ms.matched_deletes
        |             + COALESCE(bi.inserts, 0))::DOUBLE
        |         > 4.0 * (ms.matched_keys + bu.upserts)::DOUBLE
        |       THEN 'mor' ELSE 'cow' END AS recommend,
        |  (tst.touched_rows - ms.matched_deletes + COALESCE(bi.inserts, 0))::BIGINT
        |    AS cow_actual_rows,
        |  ms.matched_keys AS dv_entries, bu.upserts AS appended
        |FROM tst JOIN ms USING (batch) JOIN bu USING (batch)
        |  LEFT JOIN bi USING (batch) CROSS JOIN nt""".stripMargin)

  private def bloomTouchDecl: Decl = {
    val m = 4096; val k = 3
    // Manifest Bloom index → METADATA-ONLY merge touch-set discovery.
    // mergeCow's touch set today costs one semi-join over the TABLE; a
    // per-file bloom carried in the manifest answers "which files might
    // hold these keys" from files × 128 words of metadata instead — the
    // table's rows are never read to plan the merge (Iceberg/Parquet
    // bloom columns' role). The gate computes BOTH the bloom candidate
    // set and the exact touch set per file, plus candidate/touched/
    // false-positive counts, and the oracle replays the whole bitset
    // arithmetic (per-file bit_or fold, k-of-k probe hits) in SQL —
    // no false negative can hide: the exact set is recomputed
    // independently on both engines.
    decl("q202_manifest_bloom_touchset",
      (s, d) => {
        val (target, source, m1) = mergeFixture(t(s, d, "lineitem"))
        val fb = Bloom.buildFileBits(target, col("file_id"), col("key"), m, k, "mbf")
        val keys = source.select("key").distinct()
        val cand = Bloom.candidateFiles(keys, col("key"), fb, m, k, "mbf")
          .withColumn("bloom_candidate", lit(true))
        val exact = target.join(keys, Seq("key"), "left_semi")
          .select("file_id").distinct().withColumn("exactly_touched", lit(true))
        val flags = m1.select("file_id")
          .join(cand, Seq("file_id"), "left")
          .join(exact, Seq("file_id"), "left")
          .select(col("file_id"),
            coalesce(col("bloom_candidate"), lit(false)).as("bloom_candidate"),
            coalesce(col("exactly_touched"), lit(false)).as("exactly_touched"))
        val counts = broadcast(flags.agg(
          sum(when(col("bloom_candidate"), 1L).otherwise(0L)).as("n_candidates"),
          sum(when(col("exactly_touched"), 1L).otherwise(0L)).as("n_touched"),
          sum(when(col("bloom_candidate") && !col("exactly_touched"), 1L)
            .otherwise(0L)).as("n_false_pos"),
          sum(when(col("exactly_touched") && !col("bloom_candidate"), 1L)
            .otherwise(0L)).as("n_false_neg")))
        flags.crossJoin(counts)
      },
      mergeFixtureCtes + s""",
         |m1f AS (SELECT DISTINCT file_id FROM tgt),
         |ph AS (${(0 until k).map(j =>
             s"SELECT file_id, ${sqlHash60(s"('mbf$j|' || key::VARCHAR)")} % $m AS p FROM tgt")
             .mkString("\n  UNION ALL ")}),
         |fb AS (SELECT file_id, p // 32 AS w, bit_or(1::BIGINT << (p % 32)) AS bits
         |       FROM ph GROUP BY 1, 2),
         |sk AS (SELECT DISTINCT key FROM src),
         |pr AS (${(0 until k).map(j =>
             s"SELECT key, $j AS j, ${sqlHash60(s"('mbf$j|' || key::VARCHAR)")} % $m AS p FROM sk")
             .mkString("\n  UNION ALL ")}),
         |hit AS (SELECT pr.key, fb.file_id, COUNT(DISTINCT pr.j) AS h
         |        FROM pr JOIN fb ON pr.p // 32 = fb.w
         |        WHERE (fb.bits & (1::BIGINT << (pr.p % 32))) != 0
         |        GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT file_id FROM hit WHERE h = $k),
         |ex AS (SELECT DISTINCT t.file_id FROM tgt t JOIN sk ON t.key = sk.key),
         |fl AS (SELECT m1f.file_id,
         |         cand.file_id IS NOT NULL AS bloom_candidate,
         |         ex.file_id IS NOT NULL AS exactly_touched
         |       FROM m1f LEFT JOIN cand ON m1f.file_id = cand.file_id
         |                LEFT JOIN ex ON m1f.file_id = ex.file_id),
         |cnt AS (SELECT
         |  SUM(CASE WHEN bloom_candidate THEN 1 ELSE 0 END)::BIGINT AS n_candidates,
         |  SUM(CASE WHEN exactly_touched THEN 1 ELSE 0 END)::BIGINT AS n_touched,
         |  SUM(CASE WHEN bloom_candidate AND NOT exactly_touched THEN 1 ELSE 0 END)::BIGINT
         |    AS n_false_pos,
         |  SUM(CASE WHEN exactly_touched AND NOT bloom_candidate THEN 1 ELSE 0 END)::BIGINT
         |    AS n_false_neg
         |  FROM fl)
         |SELECT fl.file_id, fl.bloom_candidate, fl.exactly_touched,
         |  cnt.n_candidates, cnt.n_touched, cnt.n_false_pos, cnt.n_false_neg
         |FROM fl, cnt""".stripMargin)
  }

  private def schemaEvolveDecl: Decl =
    // Schema evolution by column mapping: "old files" (pre-1995-06
    // shipments) were written as (key, qty INT); the table then evolved
    // — qty RENAMED to quantity and WIDENED to double, a disc column
    // ADDED — and "new files" carry the new shape. readEvolved projects
    // the old files through the current schema (rename by mapping,
    // typed-NULL backfill, safe cast) with no data rewrite. The gate
    // aggregates across the mixed read — null-counting disc so the
    // backfill itself is hash-checked — and the oracle rebuilds the
    // union straight from lineitem. Scale shape: pure projection; no
    // shuffle added to the scan, evolution costs one manifest commit.
    decl("q203_schema_evolution",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val key = expr("l_orderkey * 8 + l_linenumber")
        val cut = to_timestamp(lit("1995-06-01"))
        val oldF = li.filter(col("l_shipdate") < cut)
          .select(key.as("key"), col("l_quantity").cast("int").as("qty"))
        val newF = li.filter(col("l_shipdate") >= cut)
          .select(key.as("key"), col("l_quantity").as("quantity"),
            col("l_discount").as("disc"))
        Snapshot.readEvolved(oldF, newF,
            renames = Map("qty" -> "quantity"),
            added = Seq(("disc", "double")))
          .groupBy(pmod(col("key"), lit(97L)).as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(col("quantity").cast("decimal(30,12)")).cast("double")
              .as("sum_quantity"),
            sum(when(col("disc").isNull, 1L).otherwise(0L)).as("n_disc_null"),
            coalesce(sum(col("disc").cast("decimal(30,12)")),
              lit(0).cast("decimal(30,12)")).cast("double").as("sum_disc"))
      },
      """WITH u AS (
        |  SELECT (l_orderkey * 8 + l_linenumber)::BIGINT AS key,
        |    l_quantity::INT::DOUBLE AS quantity, NULL::DOUBLE AS disc
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01'
        |  UNION ALL
        |  SELECT (l_orderkey * 8 + l_linenumber)::BIGINT, l_quantity, l_discount
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-06-01')
        |SELECT key % 97 AS bucket, COUNT(*)::BIGINT AS n,
        |  CAST(SUM(CAST(quantity AS DECIMAL(30,12))) AS DOUBLE) AS sum_quantity,
        |  SUM(CASE WHEN disc IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_disc_null,
        |  CAST(COALESCE(SUM(CAST(disc AS DECIMAL(30,12))), 0) AS DOUBLE) AS sum_disc
        |FROM u GROUP BY 1""".stripMargin)

  private def minMaxIvmDecl: Decl =
    // MIN/MAX IVM — the case delta rules CANNOT fully absorb: growth
    // (inserts, update-afters) folds into the stored extrema for free,
    // but a removal TOUCHING a group's min or max dirties it and only a
    // targeted recompute (rows of dirty groups, never the table)
    // restores the view. The gate checks both halves independently:
    // final min/max/n come from the oracle's FULL recompute (so the
    // clean-path least/greatest arithmetic is proven, not trusted), and
    // the `recomputed` flag is re-derived in SQL from the same
    // touches-the-extremum rule — maintenance COST is gated, not just
    // values. Scale shape: clean groups never touch data; dirty groups
    // cost O(their rows).
    decl("q204_ivm_minmax_dirty",
      (s, d) => {
        val (target, source, m1) = mergeFixture(t(s, d, "lineitem"))
        val (_, rows2, changes) = Snapshot.mergeCow(target, source, m1,
          valCol = "qty", version = 2L, insertFiles = 2)
        val v1 = Ivm.buildMinMax(target, expr("key div 1024"), "qty")
        Ivm.applyMinMaxDelta(v1, changes, expr("key div 1024"),
            rows2, expr("key div 1024"), "qty")
          .select(col("group").as("grp"), col("min_val").as("min_qty"),
            col("max_val").as("max_qty"), col("n"), col("recomputed"))
      },
      mergeFixtureCtes + """,
         |rows2 AS (SELECT tg.key, CASE WHEN s.op = 'U' THEN s.sv ELSE tg.qty END AS qty
         |          FROM tgt tg LEFT JOIN src s ON tg.key = s.key
         |          WHERE s.op IS NULL OR s.op = 'U'
         |          UNION ALL
         |          SELECT s.key, s.sv FROM src s LEFT JOIN tgt tg ON s.key = tg.key
         |          WHERE s.op = 'U' AND tg.key IS NULL),
         |v1 AS (SELECT key // 1024 AS grp, MIN(qty) AS mn, MAX(qty) AS mx
         |       FROM tgt GROUP BY 1),
         |chg AS (SELECT tg.key // 1024 AS grp, 'update' AS ct, tg.qty AS vb
         |        FROM tgt tg JOIN src s ON tg.key = s.key
         |        WHERE s.op = 'U' AND s.sv <> tg.qty
         |        UNION ALL
         |        SELECT tg.key // 1024, 'delete', tg.qty
         |        FROM tgt tg JOIN src s ON tg.key = s.key WHERE s.op = 'D'
         |        UNION ALL
         |        SELECT s.key // 1024, 'insert', NULL
         |        FROM src s LEFT JOIN tgt tg ON s.key = tg.key
         |        WHERE s.op = 'U' AND tg.key IS NULL),
         |dirty AS (SELECT DISTINCT c.grp FROM chg c LEFT JOIN v1 ON c.grp = v1.grp
         |          WHERE v1.grp IS NULL
         |             OR (c.ct IN ('delete', 'update')
         |                 AND (c.vb <= v1.mn OR c.vb >= v1.mx))),
         |fin AS (SELECT key // 1024 AS grp, MIN(qty) AS min_qty, MAX(qty) AS max_qty,
         |        COUNT(*)::BIGINT AS n FROM rows2 GROUP BY 1)
         |SELECT fin.grp, fin.min_qty, fin.max_qty, fin.n,
         |  dirty.grp IS NOT NULL AS recomputed
         |FROM fin LEFT JOIN dirty ON fin.grp = dirty.grp""".stripMargin)

  private def bloomMaintainDecl: Decl = {
    val m = 4096; val k = 3
    // Incremental bloom-index maintenance across the COW merge: carried
    // files keep their bitsets verbatim, only rewritten/added files
    // rebuild from their own rows — the index inherits mergeCow's
    // O(touched files) cost model. The Spark side takes the incremental
    // path end-to-end (v1 index + merge + maintain); the oracle is the
    // FULL REBUILD over the post-merge table (file-id arithmetic
    // replayed from the q196 chain, bitset fold from q202), so the gate
    // proves incremental ≡ rebuild BIT-IDENTICAL across engines.
    decl("q206_bloom_index_maintenance",
      (s, d) => {
        val (target, source, m1) = mergeFixture(t(s, d, "lineitem"))
        val prevBits = Bloom.buildFileBits(target, col("file_id"), col("key"),
          m, k, "mbf")
        val (m2, rows2, _) = Snapshot.mergeCow(target, source, m1,
          valCol = "qty", version = 2L, insertFiles = 2)
        Bloom.maintainFileBits(prevBits, m2, rows2, col("key"), m, k, "mbf")
      },
      mergeFixtureCtes + s""",
         |m1 AS (SELECT file_id, MAX(key) AS mx FROM tgt GROUP BY 1),
         |touched AS (SELECT DISTINCT t.file_id FROM tgt t JOIN src s ON t.key = s.key),
         |trk AS (SELECT file_id,
         |        (ROW_NUMBER() OVER (ORDER BY file_id % 64, file_id) - 1)::BIGINT AS rk FROM touched),
         |base AS (SELECT COALESCE(MAX(file_id) + 1, 0)::BIGINT AS b FROM m1),
         |nt AS (SELECT COUNT(*)::BIGINT AS n FROM touched),
         |r2 AS (SELECT tg.file_id, tg.key FROM tgt tg
         |       WHERE tg.file_id NOT IN (SELECT file_id FROM touched)
         |       UNION ALL
         |       SELECT (base.b + trk.rk)::BIGINT, tg.key
         |       FROM tgt tg JOIN trk ON tg.file_id = trk.file_id
         |       LEFT JOIN src s ON tg.key = s.key CROSS JOIN base
         |       WHERE s.op IS NULL OR s.op = 'U'
         |       UNION ALL
         |       SELECT (base.b + nt.n + ${sqlHash60("s.key::VARCHAR")} % 2)::BIGINT,
         |         s.key
         |       FROM src s CROSS JOIN base CROSS JOIN nt
         |       WHERE s.op = 'U' AND s.key NOT IN (SELECT key FROM tgt)),
         |ph AS (${(0 until k).map(j =>
             s"SELECT file_id, ${sqlHash60(s"('mbf$j|' || key::VARCHAR)")} % $m AS p FROM r2")
             .mkString("\n  UNION ALL ")})
         |SELECT file_id, p // 32 AS word_idx,
         |  bit_or(1::BIGINT << (p % 32)) AS bits
         |FROM ph GROUP BY 1, 2""".stripMargin)
  }

  private def lifecycleDecl: Decl =
    // The mutation lifecycle COMPOSED: one gate drives CDC merge →
    // IVM off the writer feed → retention range-delete (metadata
    // drops) → the view absorbing the delete (derived feed — the
    // documented CDF cost of metadata deletes) → small-file compaction
    // of what remains. The oracle replays EVERY stage in SQL — merge
    // file arithmetic (q196), delete classification + boundary rewrite
    // (q201), compaction packing (q182), and the view as a full
    // recompute over the final rows (q199) — so the composition, not
    // just the parts, is hash-gated. Scale shape: each stage keeps its
    // own bound (touch set / boundary files / manifest-sized packing /
    // change-sized view merge); composing them adds no table rescan.
    decl("q208_lakehouse_lifecycle",
      (s, d) => {
        val grp = expr("key div 1024")
        // NOTE measured, not guessed: persisting target/rows2 here was
        // tried and made the wall 2× WORSE (18.6 → 38.9 s at sf0.1) —
        // Catalyst's ReuseExchange already dedupes the shared subtrees
        // inside the single action, and persist forced serial
        // materialization + storage serialization on top
        val (target, source, m1) = mergeFixture(t(s, d, "lineitem"))
        val (m2, rows2x, changes) = Snapshot.mergeCow(target, source, m1,
          valCol = "qty", version = 2L, insertFiles = 2)
        val rows2 = rows2x.localCheckpoint(true)
        val v2 = Ivm.applySumCountDelta(
          Ivm.buildSumCount(target, grp, "qty"), changes, expr("key div 1024"))
        val b = t(s, d, "lineitem")
          .agg(min(expr("l_orderkey * 8 + l_linenumber")).as("kmin"),
            max(expr("l_orderkey * 8 + l_linenumber")).as("kmax")).head()
        val (lo2, hi2) = (b.getLong(0), b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 10)
        val (audit3, rows3) = Snapshot.deleteRange(rows2,
          m2.select("file_id", "n_rows", "min_key", "max_key"), "qty", lo2, hi2, 3L)
        val delFeed = rows2.filter(col("key").between(lo2, hi2))
          .select(col("key"), lit("delete").as("change_type"),
            col("qty").as("value_before"), lit(null).cast("double").as("value_after"))
        val v3 = Ivm.applySumCountDelta(v2, delFeed, expr("key div 1024"))
        val m3live = audit3.filter(col("action") =!= "dropped")
          .select(lit(3L).as("version"), col("file_id"), col("n_rows"),
            col("min_key"), col("max_key"))
        val m4 = Snapshot.commitCompact(m3live, smallRows = 2000L,
          targetRows = 6000L, version = 4L)
        val tot = broadcast(m4.agg(count(lit(1)).as("files_live"),
          sum(col("n_rows")).as("rows_live")))
        v3.select(col("group").as("grp"),
            col("sum_val").cast("double").as("sum_qty"), col("n"))
          .crossJoin(tot)
      },
      mergeFixtureCtes + s""",
         |m1 AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows, MIN(key)::BIGINT AS min_key,
         |       MAX(key)::BIGINT AS max_key FROM tgt GROUP BY 1),
         |touched AS (SELECT DISTINCT t.file_id FROM tgt t JOIN src s ON t.key = s.key),
         |trk AS (SELECT file_id,
         |        (ROW_NUMBER() OVER (ORDER BY file_id % 64, file_id) - 1)::BIGINT AS rk FROM touched),
         |base AS (SELECT COALESCE(MAX(file_id) + 1, 0)::BIGINT AS b FROM m1),
         |nt AS (SELECT COUNT(*)::BIGINT AS n FROM touched),
         |r2 AS (SELECT tg.file_id, tg.key, tg.qty FROM tgt tg
         |       WHERE tg.file_id NOT IN (SELECT file_id FROM touched)
         |       UNION ALL
         |       SELECT (base.b + trk.rk)::BIGINT, tg.key,
         |         CASE WHEN s.op = 'U' THEN s.sv ELSE tg.qty END
         |       FROM tgt tg JOIN trk ON tg.file_id = trk.file_id
         |       LEFT JOIN src s ON tg.key = s.key CROSS JOIN base
         |       WHERE s.op IS NULL OR s.op = 'U'
         |       UNION ALL
         |       SELECT (base.b + nt.n + ${sqlHash60("s.key::VARCHAR")} % 2)::BIGINT,
         |         s.key, s.sv
         |       FROM src s CROSS JOIN base CROSS JOIN nt
         |       WHERE s.op = 'U' AND s.key NOT IN (SELECT key FROM tgt)),
         |m2 AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows, MIN(key)::BIGINT AS min_key,
         |       MAX(key)::BIGINT AS max_key FROM r2 GROUP BY 1),
         |k3 AS (SELECT kmin AS lo2, kmin + (kmax - kmin) // 10 AS hi2 FROM kb),
         |cls AS (SELECT m2.*, CASE
         |          WHEN max_key < k3.lo2 OR min_key > k3.hi2 THEN 'carried'
         |          WHEN min_key >= k3.lo2 AND max_key <= k3.hi2 THEN 'dropped'
         |          ELSE 'rw' END AS c
         |        FROM m2, k3),
         |bnd AS (SELECT file_id, (ROW_NUMBER() OVER (ORDER BY file_id % 64, file_id) - 1)::BIGINT AS rk
         |        FROM cls WHERE c = 'rw'),
         |b3 AS (SELECT COALESCE(MAX(file_id) + 1, 0)::BIGINT AS b FROM m2),
         |surv3 AS (SELECT (b3.b + bnd.rk)::BIGINT AS file_id, r2.key, r2.qty
         |          FROM r2, bnd, b3, k3
         |          WHERE r2.file_id = bnd.file_id
         |            AND (r2.key < k3.lo2 OR r2.key > k3.hi2)),
         |m3 AS (SELECT file_id, n_rows, min_key, max_key FROM cls WHERE c = 'carried'
         |       UNION ALL
         |       SELECT file_id, COUNT(*)::BIGINT, MIN(key)::BIGINT, MAX(key)::BIGINT
         |       FROM surv3 GROUP BY 1),
         |keep AS (SELECT * FROM m3 WHERE n_rows >= 2000),
         |small AS (SELECT * FROM m3 WHERE n_rows < 2000),
         |b4 AS (SELECT COALESCE(MAX(file_id) + 1, 0)::BIGINT AS b FROM m3),
         |pk AS (SELECT n_rows,
         |       COALESCE(SUM(n_rows) OVER (ORDER BY file_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS strt
         |       FROM small),
         |grp2 AS (SELECT (strt // 6000)::BIGINT AS g, SUM(n_rows)::BIGINT AS n_rows
         |         FROM pk GROUP BY 1),
         |m4 AS (SELECT file_id, n_rows FROM keep
         |       UNION ALL SELECT g + b4.b, n_rows FROM grp2, b4),
         |tot AS (SELECT COUNT(*)::BIGINT AS files_live, SUM(n_rows)::BIGINT AS rows_live
         |        FROM m4),
         |rows3 AS (SELECT r2.key, r2.qty FROM r2, k3
         |          WHERE r2.key < k3.lo2 OR r2.key > k3.hi2),
         |vw AS (SELECT key // 1024 AS grp,
         |       CAST(SUM(CAST(qty AS DECIMAL(30,12))) AS DOUBLE) AS sum_qty,
         |       COUNT(*)::BIGINT AS n
         |       FROM rows3 GROUP BY 1)
         |SELECT vw.grp, vw.sum_qty, vw.n, tot.files_live, tot.rows_live
         |FROM vw, tot""".stripMargin)

  // q269 (round-13): WRITE–AUDIT–PUBLISH branching on the versioned
  // store (Snapshot.createBranch/commitToBranch/publishBranch — the
  // Iceberg WAP pattern). The staging writer commits to a named branch
  // ref (fresh global versions, CAS-claimed; `_CURRENT` untouched), the
  // audit queries run over the BRANCH head (here: quarantine staged
  // rows whose value exceeds 3× the published mean, decimal-summed so
  // the threshold is bit-identical in the oracle), and publish is ONE
  // atomic pointer fast-forward — O(pointer) regardless of staged data
  // size, the property that makes audit-gated ingestion viable at
  // 100 TB (a failed audit costs zero main-line churn). The oracle
  // replays every phase's state arithmetic; the isolation claims are
  // load-bearing in the result (main_during_stage must equal v1 AFTER
  // the branch committed, and the stale sibling branch's publish must
  // CONFLICT once main advanced past its fork base — the rebase rule).
  private def wapDecl: Decl =
    decl("q269_wap_branch_publish",
      (s, d) => {
        import graft.operators.Snapshot
        val ev = Q.events(s, d).select(col("event_id"), col("user_id"), col("value"))
        val v1 = ev.filter(expr("event_id % 3 != 0"))
        def mani(df: org.apache.spark.sql.DataFrame, v: Long) =
          Snapshot.manifestEntriesBy(df, pmod(col("event_id"), lit(16)),
            col("event_id"), version = v)
        // deterministic per-dataset path, pre-deleted (the q282 pattern)
        // — createTempDirectory leaked one orphan dir per evaluation
        val root = "/tmp/graft_q269_wap_" + Q.scratchTag(d)
        val fsH = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fsH.delete(new org.apache.hadoop.fs.Path(root), true)
        Snapshot.commit(s, root, 1L, v1, mani(v1, 1L), commitMillis = 1000L)
        Snapshot.createBranch(s, root, "wap")
        Snapshot.createBranch(s, root, "stale")
        val staged = ev.filter(expr("event_id % 3 = 0"))
        val stagedState = v1.unionByName(staged)
        Snapshot.commitToBranch(s, root, "wap", stagedState,
          mani(stagedState, 2L), commitMillis = 2000L)
        // isolation probe: _CURRENT still names v1 while the branch holds v2
        val mainDuring = Snapshot.readCurrent(s, root)
        val branchState = Snapshot.readBranch(s, root, "wap")
        val thr = broadcast(mainDuring.agg(
          (lit(3.0) * (sum(col("value").cast("decimal(30,12)")).cast("double")
            / count(lit(1)))).as("hi")))
        val quarantined = branchState.crossJoin(thr)
          .filter(expr("event_id % 3 = 0") && col("value") > col("hi"))
        val audited = branchState.crossJoin(thr)
          .filter(expr("event_id % 3 != 0") || !(col("value") > col("hi")))
          .drop("hi")
        Snapshot.commitToBranch(s, root, "wap", audited,
          mani(audited, 3L), commitMillis = 3000L)
        Snapshot.publishBranch(s, root, "wap")
        val mainAfter = Snapshot.readCurrent(s, root)
        // the sibling forked from v1; main is now v3 → publish must conflict
        val conflict =
          try { Snapshot.publishBranch(s, root, "stale"); 0L }
          catch { case _: Snapshot.CommitConflictException => 1L }
        def ph(tag: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n_rows"),
            coalesce(sum(col("value").cast("decimal(30,12)")).cast("double"),
              lit(0.0)).as("sum_value"),
            coalesce(sum(col("event_id")), lit(0L)).as("sum_id"))
            .select(lit(tag).as("phase"), col("n_rows"), col("sum_value"),
              col("sum_id"))
        ph("main_during_stage", mainDuring)
          .unionByName(ph("branch_staged", branchState))
          .unionByName(ph("quarantined", quarantined))
          .unionByName(ph("published", mainAfter))
          .unionByName(s.range(1).select(
            lit("stale_publish_conflict").as("phase"),
            lit(conflict).as("n_rows"), lit(0.0).as("sum_value"),
            lit(0L).as("sum_id")))
      },
      """WITH ev AS (SELECT event_id, user_id, value FROM events),
        |v1 AS (SELECT * FROM ev WHERE event_id % 3 <> 0),
        |thr AS (SELECT 3.0 * (CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE)
        |                      / COUNT(*)) AS hi FROM v1),
        |staged AS (SELECT * FROM ev WHERE event_id % 3 = 0),
        |br AS (SELECT * FROM v1 UNION ALL SELECT * FROM staged),
        |quar AS (SELECT s.* FROM staged s, thr WHERE s.value > thr.hi),
        |pub AS (SELECT b.* FROM br b, thr
        |        WHERE b.event_id % 3 <> 0 OR NOT (b.value > thr.hi))
        |SELECT 'main_during_stage' AS phase, COUNT(*)::BIGINT AS n_rows,
        |  CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE) AS sum_value,
        |  COALESCE(SUM(event_id), 0)::BIGINT AS sum_id FROM v1
        |UNION ALL
        |SELECT 'branch_staged', COUNT(*)::BIGINT,
        |  CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE),
        |  COALESCE(SUM(event_id), 0)::BIGINT FROM br
        |UNION ALL
        |SELECT 'quarantined', COUNT(*)::BIGINT,
        |  COALESCE(CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE), 0.0),
        |  COALESCE(SUM(event_id), 0)::BIGINT FROM quar
        |UNION ALL
        |SELECT 'published', COUNT(*)::BIGINT,
        |  CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE),
        |  COALESCE(SUM(event_id), 0)::BIGINT FROM pub
        |UNION ALL
        |SELECT 'stale_publish_conflict', 1::BIGINT, 0.0::DOUBLE, 0::BIGINT""".stripMargin)

  // q270 (round-13): JOIN-VIEW IVM — q199/q204 maintain aggregates of
  // ONE table under its change feed; this maintains an aggregate over a
  // fact ⋈ dimension JOIN under deltas on BOTH sides (fact inserts +
  // dimension attribute reassignments), the star-schema case where
  // naive IVM silently rescans: a dim row switching groups moves every
  // joined fact row, and the maintenance rule must fetch those facts'
  // totals by semi-join-scoping the fact table to the CHANGED keys only
  // (broadcast — metadata-sized), never rescanning it. The gate: the
  // maintained view is bit-identical (DECIMAL-summed) to a recompute
  // over (F∪ΔF) ⋈ D_new, and facts_touched/delta_rows ride along so the
  // oracle also checks the maintenance COST arithmetic (rows the dim
  // arm was allowed to read), not just the converged state.
  private def joinViewIvmDecl: Decl =
    decl("q270_ivm_join_view",
      (s, d) => {
        import graft.operators.Ivm
        // per-row quantization to the column's nominal precision (cents)
        // BEFORE any summation: the raw doubles carry binary junk in
        // decimal digits 3+, and summing that junk puts the two engines'
        // decimal requantizations on different sides of a cent — rounding
        // each ROW first is exact and identical in both, and the view
        // then compares as integer cents with no double edge anywhere
        val o = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("decimal(18,2)").as("o_totalprice"))
        val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
        val f0 = o.filter(expr("o_orderkey % 10 != 0"))
        val fd = o.filter(expr("o_orderkey % 10 = 0"))
        val changes = c.filter(expr("c_custkey % 17 = 0"))
          .select(col("c_custkey").as("key"), col("c_nationkey").as("attr_old"),
            expr("(c_nationkey + 7) % 25").as("attr_new"))
        val dimNew = c.select(col("c_custkey"),
          expr("CASE WHEN c_custkey % 17 = 0 THEN (c_nationkey + 7) % 25 " +
            "ELSE c_nationkey END").as("attr"))
        val view0 = Ivm.buildSumCount(
          f0.join(c, col("o_custkey") === col("c_custkey")),
          col("c_nationkey"), "o_totalprice")
        val maintained = Ivm.applyJoinViewDelta(view0,
          fd, col("o_custkey"), "o_totalprice",
          dimNew, col("c_custkey"), col("attr"),
          changes,
          f0, col("o_custkey"), "o_totalprice")
        val stats = broadcast(
          f0.join(changes.select(col("key")), col("o_custkey") === col("key"),
              "left_semi")
            .agg(count(lit(1)).as("facts_touched"))
            .crossJoin(fd.agg(count(lit(1)).as("delta_rows"))))
        maintained.select(col("group").as("grp"),
            (col("sum_val") * lit(100)).cast("long").as("sum_cents"),
            col("n"))
          .crossJoin(stats)
      },
      """WITH f0 AS (SELECT o_custkey, o_totalprice::DECIMAL(18,2) AS p
        |           FROM orders WHERE o_orderkey % 10 <> 0),
        |fd AS (SELECT o_custkey, o_totalprice::DECIMAL(18,2) AS p
        |       FROM orders WHERE o_orderkey % 10 = 0),
        |dn AS (SELECT c_custkey,
        |       CASE WHEN c_custkey % 17 = 0 THEN (c_nationkey + 7) % 25
        |            ELSE c_nationkey END AS attr FROM customer),
        |fall AS (SELECT * FROM f0 UNION ALL SELECT * FROM fd),
        |vw AS (SELECT dn.attr AS grp,
        |       (SUM(CAST(p AS DECIMAL(30,12))) * 100)::BIGINT AS sum_cents,
        |       COUNT(*)::BIGINT AS n
        |       FROM fall JOIN dn ON o_custkey = c_custkey GROUP BY 1),
        |tch AS (SELECT COUNT(*)::BIGINT AS facts_touched FROM f0
        |        WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                            WHERE c_custkey % 17 = 0)),
        |dr AS (SELECT COUNT(*)::BIGINT AS delta_rows FROM fd)
        |SELECT vw.grp, vw.sum_cents, vw.n, tch.facts_touched, dr.delta_rows
        |FROM vw, tch, dr""".stripMargin)

  // q275 (round-13): THREE-WAY BRANCH MERGE — the operation
  // publishBranch's rebase rule (q269) punts to the caller, closed.
  // Two branches diverge from a common base with overlapping edit
  // sets: updates, deletes, and inserts on arithmetic key classes so
  // every action arm is populated — unchanged (base), one-sided edits
  // (ours/theirs), agreeing edits incl. both-delete and same-value
  // insert (both), and genuine conflicts in all three flavors
  // (update-vs-update, update-vs-delete, insert-vs-insert). The
  // operator is two co-partitioned full-outer key joins
  // (Snapshot.threeWayMerge); the oracle replays the generic change
  // classification — NOT the fixture's case analysis — so the gate
  // checks the declared merge semantics, not the test's arithmetic.
  private def branchMergeDecl: Decl =
    decl("q275_branch_merge",
      (s, d) => {
        import graft.operators.Snapshot
        val ob = t(s, d, "orders").select(
          col("o_orderkey").cast("long").as("okey"),
          round(col("o_totalprice") * 100).cast("long").as("vb"))
        val base = ob.select(col("okey"), col("vb").as("cents"))
        val ours = ob.filter(expr("okey % 7 != 2"))
          .select(col("okey"),
            when(expr("okey % 7 = 1"), col("vb") + 100)
              .otherwise(col("vb")).as("cents"))
          .unionByName(ob.filter(expr("okey % 7 = 3"))
            .select((col("okey") + lit(3000000000L)).as("okey"),
              (col("vb") + 7).as("cents")))
        val theirs = ob.filter(expr("okey % 11 != 2"))
          .select(col("okey"),
            when(expr("okey % 11 = 1"), col("vb") + 200)
              .otherwise(col("vb")).as("cents"))
          .unionByName(ob.filter(expr("okey % 7 = 3 AND okey % 3 IN (0, 1)"))
            .select((col("okey") + lit(3000000000L)).as("okey"),
              when(expr("okey % 3 = 0"), col("vb") + 7)
                .otherwise(col("vb") + 9).as("cents")))
        Snapshot.threeWayMerge(base, ours, theirs, "okey", "cents")
      },
      """WITH ob AS MATERIALIZED (SELECT o_orderkey::BIGINT AS k,
        |       round(o_totalprice * 100)::BIGINT AS vb FROM orders),
        |b AS (SELECT k, vb AS v FROM ob),
        |o AS (SELECT k, CASE WHEN k % 7 = 1 THEN vb + 100 ELSE vb END AS v
        |      FROM ob WHERE k % 7 <> 2
        |      UNION ALL
        |      SELECT k + 3000000000, vb + 7 FROM ob WHERE k % 7 = 3),
        |th AS (SELECT k, CASE WHEN k % 11 = 1 THEN vb + 200 ELSE vb END AS v
        |       FROM ob WHERE k % 11 <> 2
        |       UNION ALL
        |       SELECT k + 3000000000,
        |         CASE WHEN k % 3 = 0 THEN vb + 7 ELSE vb + 9 END
        |       FROM ob WHERE k % 7 = 3 AND k % 3 IN (0, 1)),
        |j1 AS (SELECT COALESCE(b.k, o.k) AS k,
        |       b.k IS NOT NULL AS in_b, b.v AS v_b,
        |       o.k IS NOT NULL AS in_o, o.v AS v_o
        |       FROM b FULL JOIN o ON b.k = o.k),
        |j AS (SELECT COALESCE(j1.k, th.k) AS k,
        |      COALESCE(in_b, FALSE) AS in_b, v_b,
        |      COALESCE(in_o, FALSE) AS in_o, v_o,
        |      th.k IS NOT NULL AS in_t, th.v AS v_t
        |      FROM j1 FULL JOIN th ON j1.k = th.k),
        |cl AS (SELECT k, in_b, in_o, in_t, v_b, v_o, v_t,
        |       (in_o <> in_b OR v_o IS DISTINCT FROM v_b) AS ch_o,
        |       (in_t <> in_b OR v_t IS DISTINCT FROM v_b) AS ch_t,
        |       (in_o = in_t AND v_o IS NOT DISTINCT FROM v_t) AS same
        |       FROM j),
        |res AS (SELECT k AS okey,
        |  CASE WHEN NOT ch_o AND NOT ch_t THEN 'base'
        |       WHEN ch_o AND NOT ch_t THEN 'ours'
        |       WHEN ch_t AND NOT ch_o THEN 'theirs'
        |       WHEN same THEN 'both' ELSE 'conflict' END AS action,
        |  CASE WHEN NOT ch_o AND NOT ch_t THEN in_b
        |       WHEN ch_o AND NOT ch_t THEN in_o
        |       WHEN ch_t AND NOT ch_o THEN in_t
        |       WHEN same THEN in_o ELSE FALSE END AS present,
        |  CASE WHEN ch_o AND NOT ch_t THEN v_o
        |       WHEN ch_t AND NOT ch_o THEN v_t
        |       WHEN ch_o AND ch_t AND same THEN v_o
        |       WHEN NOT ch_o AND NOT ch_t THEN v_b END AS cents
        |  FROM cl)
        |SELECT okey, action, present,
        |  CASE WHEN present THEN cents END AS cents
        |FROM res""".stripMargin)

  // q279 (round-13): INCREMENTAL OPTIMIZE — clustered-table
  // maintenance that touches only what appends disturbed. Fixture: a
  // key-clustered table (disjoint file envelopes by construction) plus
  // three unclustered append files confined to the TOP key decile (the
  // recent-ingest shape), so only tail files overlap. The plan must
  // carry every untouched file verbatim, rewrite exactly the
  // overlapped + appended set, and re-pack it into disjoint
  // targetRows-row files — whose envelopes the oracle recomputes with
  // a plain ROW_NUMBER packing, gating the two-phase prefix-sum
  // equivalence along with the overlap arithmetic.
  private def incrOptimizeDecl: Decl =
    decl("q279_incremental_optimize",
      (s, d) => {
        import graft.operators.Layout
        val ob = t(s, d, "orders")
          .select(col("o_orderkey").cast("long").as("k"))
        val mx = broadcast(ob.agg(expr("(max(k) * 9) div 10").as("thr")))
        val rows = ob.crossJoin(mx)
          .select(col("k"),
            when(expr("k % 10 = 7") && col("k") > col("thr"),
              lit(1000000L) + expr("k % 3"))
              .otherwise(expr("k div 2048")).cast("long").as("file_id"))
        val manifest = rows.groupBy("file_id")
          .agg(count(lit(1)).as("n_rows"), min(col("k")).as("min_key"),
            max(col("k")).as("max_key"))
          .withColumn("clustered", col("file_id") < 1000000L)
        val aud = Layout.incrementalOptimize(rows, manifest,
          targetRows = 2048L, freshBase = 2000000L)
        val sm = broadcast(aud.agg(
          sum(when(col("phase") === "carried", 1L).otherwise(0L))
            .as("files_carried"),
          sum(when(col("phase") === "rewritten_src", 1L).otherwise(0L))
            .as("files_rewritten"),
          sum(when(col("phase") === "new", 1L).otherwise(0L))
            .as("files_new"),
          sum(when(col("phase") === "rewritten_src", col("n_rows"))
            .otherwise(0L)).as("rows_rewritten")))
        aud.crossJoin(sm)
      },
      """WITH ob AS MATERIALIZED (SELECT o_orderkey::BIGINT AS k FROM orders),
        |mx AS (SELECT (MAX(k) * 9) // 10 AS thr FROM ob),
        |rws AS MATERIALIZED (SELECT k,
        |       CASE WHEN k % 10 = 7 AND k > mx.thr THEN 1000000 + k % 3
        |            ELSE k // 2048 END AS file_id FROM ob, mx),
        |m1 AS MATERIALIZED (SELECT file_id, COUNT(*)::BIGINT AS n_rows,
        |      MIN(k)::BIGINT AS min_key, MAX(k)::BIGINT AS max_key,
        |      file_id < 1000000 AS clustered FROM rws GROUP BY 1),
        |app AS (SELECT * FROM m1 WHERE NOT clustered),
        |rwids AS (SELECT c.file_id FROM m1 c
        |          WHERE c.clustered AND EXISTS (SELECT 1 FROM app a
        |            WHERE c.min_key <= a.max_key AND c.max_key >= a.min_key)
        |          UNION ALL SELECT file_id FROM app),
        |rk AS (SELECT r.k, ROW_NUMBER() OVER (ORDER BY r.k) AS pos
        |       FROM rws r JOIN rwids USING (file_id)),
        |newf AS (SELECT (2000000 + (pos - 1) // 2048)::BIGINT AS file_id,
        |         COUNT(*)::BIGINT AS n_rows, MIN(k)::BIGINT AS min_key,
        |         MAX(k)::BIGINT AS max_key FROM rk GROUP BY 1),
        |aud AS (SELECT 'carried' AS phase, file_id, n_rows, min_key, max_key
        |        FROM m1 WHERE clustered
        |          AND file_id NOT IN (SELECT file_id FROM rwids)
        |        UNION ALL
        |        SELECT 'rewritten_src', file_id, n_rows, min_key, max_key
        |        FROM m1 WHERE file_id IN (SELECT file_id FROM rwids)
        |        UNION ALL
        |        SELECT 'new', file_id, n_rows, min_key, max_key FROM newf),
        |sm AS (SELECT
        |  SUM(CASE WHEN phase = 'carried' THEN 1 ELSE 0 END)::BIGINT
        |    AS files_carried,
        |  SUM(CASE WHEN phase = 'rewritten_src' THEN 1 ELSE 0 END)::BIGINT
        |    AS files_rewritten,
        |  SUM(CASE WHEN phase = 'new' THEN 1 ELSE 0 END)::BIGINT AS files_new,
        |  SUM(CASE WHEN phase = 'rewritten_src' THEN n_rows ELSE 0 END)::BIGINT
        |    AS rows_rewritten
        |  FROM aud)
        |SELECT aud.*, sm.* FROM aud, sm""".stripMargin)

  // q281 (round-13): REBASE → PUBLISH through the real snapshot store
  // — the flow q269 leaves at "rebase before publish", executed:
  // a branch stages edits, main advances past the fork base with
  // DISJOINT edits, the stale publish CONFLICTS (probed, counted),
  // rebaseBranch three-way-merges both edit sets (zero conflicting
  // keys by construction) advancing the fork base, and publish then
  // fast-forwards. The oracle replays the published state from the
  // edit-class arithmetic — the gate proves the merge preserved BOTH
  // sides' edits through the store round-trip.
  private def rebaseDecl: Decl =
    decl("q281_rebase_publish",
      (s, d) => {
        import graft.operators.Snapshot
        val ev = Q.events(s, d).select(col("event_id").as("k"),
          round(col("value") * 100).cast("long").as("v"))
        def mani(df: org.apache.spark.sql.DataFrame) =
          Snapshot.manifestEntriesBy(df, pmod(col("k"), lit(16)), col("k"),
            version = 0L)
        // deterministic per-dataset path, pre-deleted (the q282 pattern)
        // — createTempDirectory leaked one orphan dir per evaluation
        val root = "/tmp/graft_q281_rb_" + Q.scratchTag(d)
        val fsH = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fsH.delete(new org.apache.hadoop.fs.Path(root), true)
        Snapshot.commit(s, root, 1L, ev, mani(ev), commitMillis = 1000L)
        Snapshot.createBranch(s, root, "stage")
        // branch: update k%5=1 (+10), delete k%5=2
        val staged = ev.filter(expr("k % 5 != 2"))
          .select(col("k"), when(expr("k % 5 = 1"), col("v") + 10)
            .otherwise(col("v")).as("v"))
        Snapshot.commitToBranch(s, root, "stage", staged, mani(staged),
          commitMillis = 2000L)
        // main advances with the DISJOINT edit: update k%5=3 (+20)
        val main2 = ev.select(col("k"),
          when(expr("k % 5 = 3"), col("v") + 20).otherwise(col("v")).as("v"))
        Snapshot.commit(s, root, 3L, main2, mani(main2), commitMillis = 3000L)
        val staleConflict =
          try { Snapshot.publishBranch(s, root, "stage"); 0L }
          catch { case _: Snapshot.CommitConflictException => 1L }
        Snapshot.rebaseBranch(s, root, "stage", "k", "v", mani,
          commitMillis = 4000L)
        val published = Snapshot.publishBranch(s, root, "stage")
        val cur = Snapshot.readCurrent(s, root)
        cur.agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_cents"),
            sum(when(expr("k % 5 = 1"), col("v"))).as("sum_branch_edit"),
            sum(when(expr("k % 5 = 3"), col("v"))).as("sum_main_edit"))
          .select(lit(staleConflict).as("stale_publish_conflict"),
            lit(published - 3L).as("versions_past_main"),
            col("n_rows"), col("sum_cents"), col("sum_branch_edit"),
            col("sum_main_edit"))
      },
      """WITH ev AS (SELECT event_id AS k, round(value * 100)::BIGINT AS v
        |           FROM events),
        |pub AS (SELECT k, CASE WHEN k % 5 = 1 THEN v + 10
        |                       WHEN k % 5 = 3 THEN v + 20
        |                       ELSE v END AS v
        |        FROM ev WHERE k % 5 <> 2)
        |SELECT 1::BIGINT AS stale_publish_conflict,
        |  1::BIGINT AS versions_past_main,
        |  COUNT(*)::BIGINT AS n_rows, SUM(v)::BIGINT AS sum_cents,
        |  SUM(CASE WHEN k % 5 = 1 THEN v END)::BIGINT AS sum_branch_edit,
        |  SUM(CASE WHEN k % 5 = 3 THEN v END)::BIGINT AS sum_main_edit
        |FROM pub""".stripMargin)

  // q285 (round-14): the METADATA-ONLY COW-vs-MOR advisor — q267's
  // advisor decides from an exact semi-join over the TABLE; at 100 TB
  // the advisor must not read data to recommend, so
  // adviseMergeFromManifest answers from the manifest-carried per-file
  // Bloom index (q202's machinery) + n_rows alone. Bloom soundness
  // makes every estimate a ONE-SIDED bound; the gate runs estimate and
  // exact side by side and emits `bounds_hold`, and the oracle replays
  // the full bitset arithmetic AND the exact advisor from first
  // principles — a Spark-side bound violation breaks the hash, not
  // just the boolean.
  private def advisorManifestDecl: Decl = {
    val m = 4096; val k = 3
    decl("q285_metadata_only_advisor",
      (s, d) => {
        val (target, source, m1) = mergeFixture(t(s, d, "lineitem"))
        val fb = Bloom.buildFileBits(target, col("file_id"), col("key"),
          m, k, "mbf")
        val est = Snapshot.adviseMergeFromManifest(source, fb, m1, m, k, "mbf")
          .select("est_files_touched", "est_touched_rows",
            "est_matched_keys_max", "definite_inserts", "upserts",
            "deletes", "est_cow_write_rows_max", "est_mor_write_rows_max",
            "recommend_estimate")
        val exact = Snapshot.adviseMerge(target, source, m1)
          .select("files_touched", "touched_rows", "matched_keys",
            "matched_deletes", "inserts", "cow_write_rows",
            "mor_write_rows", "recommend")
        broadcast(est).crossJoin(broadcast(exact))
          .withColumn("bounds_hold",
            col("est_files_touched") >= col("files_touched") &&
              col("est_touched_rows") >= col("touched_rows") &&
              col("est_matched_keys_max") >= col("matched_keys") &&
              col("definite_inserts") <= col("inserts") &&
              col("est_cow_write_rows_max") >= col("cow_write_rows") &&
              col("est_mor_write_rows_max") >= col("mor_write_rows"))
      },
      mergeFixtureCtes + s""",
         |m1 AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows FROM tgt GROUP BY 1),
         |ph AS (${(0 until k).map(j =>
             s"SELECT file_id, ${sqlHash60(s"('mbf$j|' || key::VARCHAR)")} % $m AS p FROM tgt")
             .mkString("\n  UNION ALL ")}),
         |fb AS (SELECT file_id, p // 32 AS w, bit_or(1::BIGINT << (p % 32)) AS bits
         |       FROM ph GROUP BY 1, 2),
         |sk AS (SELECT DISTINCT key FROM src),
         |pr AS (${(0 until k).map(j =>
             s"SELECT key, $j AS j, ${sqlHash60(s"('mbf$j|' || key::VARCHAR)")} % $m AS p FROM sk")
             .mkString("\n  UNION ALL ")}),
         |hit AS (SELECT pr.key, fb.file_id, COUNT(DISTINCT pr.j) AS h
         |        FROM pr JOIN fb ON pr.p // 32 = fb.w
         |        WHERE (fb.bits & (1::BIGINT << (pr.p % 32))) != 0
         |        GROUP BY 1, 2),
         |pairs AS (SELECT key, file_id FROM hit WHERE h = $k),
         |cand AS (SELECT DISTINCT file_id FROM pairs),
         |est1 AS (SELECT COUNT(*)::BIGINT AS est_files_touched,
         |         COALESCE(SUM(m1.n_rows), 0)::BIGINT AS est_touched_rows
         |         FROM cand JOIN m1 USING (file_id)),
         |prs AS (SELECT DISTINCT key FROM pairs),
         |mk AS (SELECT COUNT(*)::BIGINT AS est_matched_keys_max FROM prs),
         |bu AS (SELECT COUNT(*)::BIGINT AS upserts FROM src WHERE op = 'U'),
         |bd AS (SELECT COUNT(*)::BIGINT AS deletes FROM src WHERE op = 'D'),
         |di AS (SELECT COUNT(*)::BIGINT AS definite_inserts FROM src
         |       WHERE op = 'U' AND key NOT IN (SELECT key FROM prs)),
         |mt AS (SELECT t.file_id, s.op FROM tgt t JOIN src s USING (key)),
         |tch AS (SELECT DISTINCT file_id FROM mt),
         |tste AS (SELECT COUNT(*)::BIGINT AS files_touched,
         |         COALESCE(SUM(m1.n_rows), 0)::BIGINT AS touched_rows
         |         FROM tch JOIN m1 USING (file_id)),
         |ms AS (SELECT COUNT(*)::BIGINT AS matched_keys,
         |       SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END)::BIGINT AS matched_deletes
         |       FROM mt),
         |bi AS (SELECT COUNT(*)::BIGINT AS inserts FROM src
         |       WHERE op = 'U' AND key NOT IN (SELECT key FROM tgt))
         |SELECT est1.est_files_touched, est1.est_touched_rows,
         |  mk.est_matched_keys_max, di.definite_inserts, bu.upserts,
         |  bd.deletes,
         |  (est1.est_touched_rows + bu.upserts)::BIGINT AS est_cow_write_rows_max,
         |  (mk.est_matched_keys_max + bu.upserts)::BIGINT AS est_mor_write_rows_max,
         |  CASE WHEN (est1.est_touched_rows + bu.upserts)::DOUBLE
         |         > 4.0 * (mk.est_matched_keys_max + bu.upserts)::DOUBLE
         |       THEN 'mor' ELSE 'cow' END AS recommend_estimate,
         |  tste.files_touched, tste.touched_rows, ms.matched_keys,
         |  ms.matched_deletes, bi.inserts,
         |  (tste.touched_rows - ms.matched_deletes + bi.inserts)::BIGINT
         |    AS cow_write_rows,
         |  (ms.matched_keys + bu.upserts)::BIGINT AS mor_write_rows,
         |  CASE WHEN (tste.touched_rows - ms.matched_deletes + bi.inserts)::DOUBLE
         |         > 4.0 * (ms.matched_keys + bu.upserts)::DOUBLE
         |       THEN 'mor' ELSE 'cow' END AS recommend,
         |  (est1.est_files_touched >= tste.files_touched
         |   AND est1.est_touched_rows >= tste.touched_rows
         |   AND mk.est_matched_keys_max >= ms.matched_keys
         |   AND di.definite_inserts <= bi.inserts
         |   AND (est1.est_touched_rows + bu.upserts)
         |         >= (tste.touched_rows - ms.matched_deletes + bi.inserts)
         |   AND (mk.est_matched_keys_max + bu.upserts)
         |         >= (ms.matched_keys + bu.upserts)) AS bounds_hold
         |FROM est1, mk, bu, bd, di, tste, ms, bi""".stripMargin)
  }

  // q287 (round-14): manifest Bloom maintenance across the MOR
  // compaction path — q206 proved maintainFileBits stays bit-identical
  // to a full rebuild across COW merges; this closes the OTHER
  // mutation family: deleteMor tombstones change no file bytes (the
  // blooms stand), compactDv then materializes hot files under FRESH
  // ids, and the index must rebuild exactly those from exactly their
  // surviving rows while cold files keep their bitsets verbatim. The
  // gate emits the per-file maintained index summary (word count, set
  // bits) PLUS a genuinely computed maintained-vs-full-rebuild
  // mismatch count (0); the oracle replays compaction (q263's rules,
  // incl. the fresh-id two-phase rank) and the bloom bitset fold
  // (q202's arithmetic) from first principles.
  private def morBloomDecl: Decl = {
    val m = 4096; val k = 3
    decl("q287_mor_bloom_maintenance",
      (s, d) => {
        import graft.operators.Snapshot
        val (target, _, _) = mergeFixture(t(s, d, "lineitem"))
        val kb = broadcast(t(s, d, "lineitem")
          .agg(max(expr("l_orderkey * 8 + l_linenumber")).as("_kmax"),
            min(expr("l_orderkey * 8 + l_linenumber")).as("_kmin"))
          .select(expr("_kmin + ((_kmax - _kmin) * 2) div 10").as("_cut")))
        val del = target.crossJoin(kb)
          .filter(col("key") <= col("_cut") && expr("(key div 8) % 3 = 0"))
          .select("key")
        val dv = Snapshot.deleteMor(target, del)
        val (rows2, dv2, audit) = Snapshot.compactDv(target, dv, threshold = 0.2)
        val prevBits = Bloom.buildFileBits(target, col("file_id"),
          col("key"), m, k, "mbf")
        val carried = audit.filter(!col("materialized"))
          .select(col("file_id"), lit("carried").as("action"))
        val fresh = rows2.select("file_id").distinct()
          .join(carried.select("file_id"), Seq("file_id"), "left_anti")
          .select(col("file_id"), lit("added").as("action"))
        val maintained = Bloom.maintainFileBits(prevBits,
          carried.unionByName(fresh), rows2, col("key"), m, k, "mbf")
        val full = Bloom.buildFileBits(rows2, col("file_id"), col("key"),
          m, k, "mbf")
        val mism = broadcast(maintained.withColumnRenamed("bits", "mb")
          .join(full.withColumnRenamed("bits", "fb"),
            Seq("file_id", "word_idx"), "full_outer")
          .agg(coalesce(sum(when(!(col("mb") <=> col("fb")), 1L)
            .otherwise(0L)), lit(0L)).as("n_mismatched_words")))
        val stats = broadcast(audit
          .agg(sum(when(col("materialized"), 1L).otherwise(0L))
            .as("files_materialized"))
          .crossJoin(dv2.agg(count(lit(1)).as("dv_after"))))
        maintained.groupBy("file_id")
          .agg(count(lit(1)).as("n_words"),
            sum(expr("bit_count(bits)")).cast("long").as("bits_set"))
          .crossJoin(mism).crossJoin(stats)
      },
      mergeFixtureCtes + s""",
         |cut AS (SELECT (kmin + ((kmax - kmin) * 2) // 10)::BIGINT AS c
         |        FROM kb),
         |del AS (SELECT key FROM tgt, cut
         |        WHERE key <= cut.c AND (key // 8) % 3 = 0),
         |dv AS (SELECT t.file_id, t.key FROM tgt t JOIN del USING (key)),
         |pf AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows FROM tgt GROUP BY 1),
         |df AS (SELECT file_id, COUNT(*)::BIGINT AS n_del FROM dv GROUP BY 1),
         |aud AS (SELECT pf.file_id, pf.n_rows, COALESCE(df.n_del, 0) AS n_del,
         |          COALESCE(df.n_del, 0)::DOUBLE >= 0.2 * pf.n_rows::DOUBLE AS hot
         |        FROM pf LEFT JOIN df USING (file_id)),
         |base AS (SELECT (MAX(file_id) + 1)::BIGINT AS b FROM tgt),
         |hotrk AS (SELECT file_id,
         |          (ROW_NUMBER() OVER (ORDER BY file_id % 64, file_id) - 1)::BIGINT AS rk
         |          FROM aud WHERE hot),
         |rows2 AS (
         |  SELECT t.file_id, t.key FROM tgt t JOIN aud USING (file_id)
         |  WHERE NOT aud.hot
         |  UNION ALL
         |  SELECT (base.b + hotrk.rk)::BIGINT AS file_id, t.key
         |  FROM tgt t JOIN hotrk USING (file_id), base
         |  WHERE t.key NOT IN (SELECT key FROM del)),
         |ph AS (${(0 until k).map(j =>
             s"SELECT file_id, ${sqlHash60(s"('mbf$j|' || key::VARCHAR)")} % $m AS p FROM rows2")
             .mkString("\n  UNION ALL ")}),
         |fb AS (SELECT file_id, p // 32 AS w, bit_or(1::BIGINT << (p % 32)) AS bits
         |       FROM ph GROUP BY 1, 2),
         |summ AS (SELECT file_id, COUNT(*)::BIGINT AS n_words,
         |         SUM(bit_count(bits))::BIGINT AS bits_set FROM fb GROUP BY 1),
         |stats AS (SELECT
         |  (SELECT COUNT(*) FROM aud WHERE hot)::BIGINT AS files_materialized,
         |  (SELECT COUNT(*) FROM dv JOIN aud USING (file_id)
         |     WHERE NOT aud.hot)::BIGINT AS dv_after)
         |SELECT summ.file_id, summ.n_words, summ.bits_set,
         |  0::BIGINT AS n_mismatched_words,
         |  stats.files_materialized, stats.dv_after
         |FROM summ, stats""".stripMargin)
  }

  // q304 (round-14): CLUSTERING-DEPTH report — the metadata-only
  // health metric behind "is OPTIMIZE worth it": overlap depth(k) =
  // how many file envelopes contain key k = how many files a point
  // probe at k must read. The fixture manifests the same rows twice
  // (half the table hash-layout — every envelope spans the key
  // domain — half clustered into disjoint 2000-key files), so the
  // profile shows exactly what mixed layouts cost: the hash files'
  // full-span +8 rides on top of the clustered +1. Boundary sweep in
  // exact integers (+1 at min, −1 at max+1, running sum over 2·files
  // sorted boundaries) — never reads a data byte, and the ordered
  // window runs over the manifest-sized boundary frame. The oracle
  // replays file assignment, envelopes, sweep, and segment widths.
  private def clusterDepthDecl: Decl =
    decl("q304_clustering_depth",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey").cast("long").as("k"))
        val clustered = Snapshot.manifestEntriesBy(
          li.where(pmod(col("k"), lit(2L)) === 0L),
          expr("k div 2000"), col("k"), version = 1L)
        val hashed = Snapshot.manifestEntriesBy(
          li.where(pmod(col("k"), lit(2L)) === 1L),
          lit(100L) + pmod(graft.operators.Dedup.hash60(
            col("k").cast("string")), lit(8L)),
          col("k"), version = 1L)
        Layout.clusteringDepth(clustered.unionByName(hashed))
      },
      s"""WITH rows0 AS (SELECT l_orderkey::BIGINT AS k FROM lineitem),
         |man AS (
         |  SELECT k // 2000 AS file_id, MIN(k) AS min_key, MAX(k) AS max_key
         |  FROM rows0 WHERE k % 2 = 0 GROUP BY 1
         |  UNION ALL
         |  SELECT 100 + ${sqlHash60("(k::VARCHAR)")} % 8,
         |    MIN(k), MAX(k) FROM rows0 WHERE k % 2 = 1 GROUP BY 1),
         |b AS (SELECT k, SUM(delta)::BIGINT AS d FROM (
         |  SELECT min_key AS k, 1 AS delta FROM man
         |  UNION ALL SELECT max_key + 1, -1 FROM man) GROUP BY 1),
         |sweep AS (SELECT k,
         |  SUM(d) OVER (ORDER BY k)::BIGINT AS depth,
         |  lead(k) OVER (ORDER BY k) AS next_k FROM b)
         |SELECT depth, COUNT(*)::BIGINT AS n_segments,
         |  SUM(next_k - k)::BIGINT AS span
         |FROM sweep WHERE next_k IS NOT NULL AND depth > 0
         |GROUP BY 1""".stripMargin)

  // q315 (round-14): EQUI-DEPTH layout plan — file boundaries from
  // EXACT key quantiles (q306's order-statistic machinery), so every
  // file holds ~n/8 ROWS regardless of key skew: the step Spark's
  // range partitioner approximates by sampling, done exactly and
  // deterministically (a sampled boundary moves between runs; an
  // order statistic cannot). l_orderkey is a multiset (≈4 lines per
  // order) and the quantiles are row-mass quantiles — duplicates at a
  // boundary stay together under the strict `>` assignment on both
  // engines. The oracle replays histogram, targets, boundaries,
  // assignment, and the manifest stats from first principles.
  private def equiDepthDecl: Decl =
    decl("q315_equidepth_layout",
      (s, d) => Layout.equiDepthPlan(t(s, d, "lineitem"),
        col("l_orderkey"), files = 8),
      """WITH k AS (SELECT l_orderkey::BIGINT AS k FROM lineitem),
        |h AS (SELECT k AS v, COUNT(*)::BIGINT AS cnt FROM k GROUP BY 1),
        |n AS (SELECT SUM(cnt)::BIGINT AS n FROM h),
        |c AS (SELECT v, cnt, SUM(cnt) OVER (ORDER BY v)::BIGINT AS cum FROM h),
        |q AS (SELECT unnest(generate_series(1, 7)) AS i),
        |b AS (SELECT q.i, c.v FROM c, n, q
        |      WHERE cum >= (n * i + 7) // 8
        |        AND cum - cnt < (n * i + 7) // 8),
        |asg AS (SELECT k.k,
        |  (SELECT COUNT(*) FROM b WHERE k.k > b.v)::BIGINT AS file_id
        |  FROM k)
        |SELECT 1::BIGINT AS version, file_id, COUNT(*)::BIGINT AS n_rows,
        |  MIN(k)::BIGINT AS min_key, MAX(k)::BIGINT AS max_key
        |FROM asg GROUP BY 2""".stripMargin)

  // q316 (round-14): per-file COLUMN STATS pruning — the EXACT
  // sibling of the q202 bloom index for enum-like columns: each file
  // carries its distinct l_returnflag set when it fits the cap (else
  // null = "unknown, cannot prune" — honest instead of silently
  // lossy, the Iceberg bounds contract). The gate emits the stats,
  // the stats-derived touch decision for `= 'R'`, the ACTUAL
  // contains-R recomputed from data (hash equality proves zero false
  // positives and zero false negatives — a bloom can only promise
  // half of that), and the cap-2 arm where the set overflows and the
  // decision honestly degrades to touch-everything.
  private def columnStatsDecl: Decl =
    decl("q316_column_stats_pruning",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(expr("l_orderkey div 2000").as("fid"),
            col("l_returnflag").as("v"))
        val stats = Layout.columnStats(li, col("fid"), col("v"), 16)
          // the cap-2 arm derives from the cap-16 stats without a second
          // scan: ndv > 16 ⟹ ndv > 2 (null stays null), else the set is
          // in hand and the tighter cap just re-checks its size
          .withColumn("vals_tight",
            when(size(split(col("vals"), ",")) <= 2, col("vals")))
        val actual = li.groupBy(col("fid").as("file_id"))
          .agg(max(when(col("v") === "R", 1L).otherwise(0L)).as("contains_r"))
        stats.join(actual, "file_id")
          .select(col("file_id"), col("n_rows"), col("n_nulls"), col("vals"),
            (col("vals").isNull
              || array_contains(split(col("vals"), ","), "R")).as("touch_r"),
            col("contains_r"),
            col("vals_tight"),
            (col("vals_tight").isNull
              || array_contains(split(col("vals_tight"), ","), "R"))
              .as("touch_r_tight"))
      },
      """WITH li AS (SELECT l_orderkey // 2000 AS file_id,
        |  l_returnflag AS v FROM lineitem),
        |dv AS (SELECT DISTINCT file_id, v FROM li WHERE v IS NOT NULL),
        |vs AS (SELECT file_id, COUNT(*)::BIGINT AS ndv,
        |       string_agg(v, ',' ORDER BY v) AS vals FROM dv GROUP BY 1),
        |st AS (SELECT li.file_id, COUNT(*)::BIGINT AS n_rows,
        |       SUM(CASE WHEN li.v IS NULL THEN 1 ELSE 0 END)::BIGINT
        |         AS n_nulls
        |       FROM li GROUP BY 1),
        |ac AS (SELECT file_id,
        |       MAX(CASE WHEN v = 'R' THEN 1 ELSE 0 END)::BIGINT
        |         AS contains_r FROM li GROUP BY 1)
        |SELECT st.file_id, st.n_rows, st.n_nulls,
        |  CASE WHEN COALESCE(vs.ndv, 0) <= 16 THEN COALESCE(vs.vals, '')
        |    END AS vals,
        |  (COALESCE(vs.ndv, 0) > 16
        |     OR (',' || COALESCE(vs.vals, '') || ',') LIKE '%,R,%')
        |    AS touch_r,
        |  ac.contains_r,
        |  CASE WHEN COALESCE(vs.ndv, 0) <= 2 THEN COALESCE(vs.vals, '')
        |    END AS vals_tight,
        |  (COALESCE(vs.ndv, 0) > 2
        |     OR (',' || COALESCE(vs.vals, '') || ',') LIKE '%,R,%')
        |    AS touch_r_tight
        |FROM st LEFT JOIN vs USING (file_id) JOIN ac USING (file_id)""".stripMargin)

  // q317 (round-14): file REBALANCE plan — bin-pack/split maintenance
  // decided from manifest arithmetic alone (the rewrite_data_files
  // planner): oversized files split into ceil(n/target) pieces, runs
  // of key-CONSECUTIVE small files coalesce via the islands trick
  // (rank − small-rank constant within a run — merging across an
  // interleaved big file would worsen q304's clustering depth, so
  // runs must break there), each run subdivided by prefix sum so no
  // merged output exceeds the target. The fixture manifests the same
  // table under two widths (30 ~1000-row files, then 3 ~10000-row
  // files), so all three actions fire. The oracle replays ranks,
  // islands, prefix sums, and piece counts exactly.
  private def rebalanceDecl: Decl =
    decl("q317_rebalance_plan",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey").cast("long").as("k"))
        val fid = when(col("k") < 7500L, expr("k div 250"))
          .otherwise(lit(1000L) + expr("k div 2500"))
        val man = Snapshot.manifestEntriesBy(li, fid, col("k"), version = 1L)
        Layout.rebalancePlan(man, targetRows = 4000L)
      },
      """WITH k AS (SELECT l_orderkey::BIGINT AS k FROM lineitem),
        |man AS (SELECT CASE WHEN k < 7500 THEN k // 250
        |               ELSE 1000 + k // 2500 END AS file_id,
        |        COUNT(*)::BIGINT AS n_rows, MIN(k) AS min_key,
        |        MAX(k) AS max_key FROM k GROUP BY 1),
        |b AS (SELECT *, row_number()
        |        OVER (ORDER BY min_key, file_id)::BIGINT AS rk,
        |      (n_rows * 2 < 4000) AS small FROM man),
        |s AS (SELECT *, row_number()
        |        OVER (ORDER BY min_key, file_id)::BIGINT AS srk
        |      FROM b WHERE small),
        |s2 AS (SELECT *, rk - srk AS run,
        |       COALESCE(SUM(n_rows) OVER (PARTITION BY rk - srk
        |         ORDER BY min_key, file_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         0)::BIGINT AS bef FROM s),
        |sm AS (SELECT file_id, 'merge' AS action, 1::BIGINT AS pieces,
        |       (run * 1000 + bef // 4000)::BIGINT AS merge_group FROM s2),
        |rst AS (SELECT file_id,
        |        CASE WHEN n_rows > 8000 THEN 'split' ELSE 'keep' END
        |          AS action,
        |        (CASE WHEN n_rows > 8000 THEN (n_rows + 3999) // 4000
        |         ELSE 1 END)::BIGINT AS pieces,
        |        (-1)::BIGINT AS merge_group FROM b WHERE NOT small)
        |SELECT b.file_id, b.n_rows, b.min_key, b.max_key,
        |  u.action, u.pieces, u.merge_group
        |FROM b JOIN (SELECT * FROM sm UNION ALL SELECT * FROM rst) u
        |USING (file_id)""".stripMargin)

  // q318 (round-15): COMPOSED TABLE-MAINTENANCE ADVISOR — the
  // schedule-maintenance runbook as ONE oracle-gated cycle over the
  // metadata-only planner family: MEASURE (q304 clustering-depth sweep
  // finds a full-span hash straggler riding on a clustered layout →
  // max overlap depth 2), DECIDE (depth > 1 → full equi-depth rewrite,
  // the q315 planner, 8 files), PREDICT (the plan manifest's depth
  // profile and per-file stats — pure manifest arithmetic, no data
  // read), EXECUTE (regroup the actual rows by the plan's boundary
  // rule, write them as REAL files, read the layout back — the q269
  // pre-deleted deterministic path pattern), RE-MEASURE (manifest +
  // depth from what was physically written). The gate hashes predicted
  // AND achieved side by side plus an achieved_as_predicted boolean:
  // the oracle computes the predicted arithmetic once and asserts the
  // two arms equal, so any executor drift — lost rows, mixed
  // partitions, boundary off-by-one between plan and write path —
  // lands as a hash mismatch. Composition gates have caught real
  // interaction bugs every round they shipped (q109/q130/q223/q288).
  private def maintenanceAdvisorDecl: Decl =
    decl("q318_maintenance_advisor",
      (s, d) => {
        val li = t(s, d, "lineitem").select(col("l_orderkey").cast("long").as("k"))
        // mixed layout: two clustered widths + one full-span hash straggler
        val fid0 = when(pmod(col("k"), lit(97L)) === 0L, lit(2000L))
          .when(col("k") < 7500L, expr("k div 250"))
          .otherwise(lit(1000L) + expr("k div 2500"))
        val m0 = Snapshot.manifestEntriesBy(li, fid0, col("k"), version = 1L)
        val before = broadcast(Layout.clusteringDepth(m0)
          .agg(max(col("depth")).as("depth_before_max")))
        val beforeFiles = broadcast(m0.agg(count(lit(1)).as("files_before")))
        // advisor: overlap (max depth > 1) → full equi-depth rewrite
        val plan = Layout.equiDepthPlan(li, col("k"), files = 8, version = 2L)
        val predDepth = broadcast(Layout.clusteringDepth(plan)
          .agg(max(col("depth")).as("predicted_depth_max")))
        // execute the plan on the rows, as real files on disk
        val root = "/tmp/graft_q318_exec_" + Q.scratchTag(d)
        val fsH = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fsH.delete(new org.apache.hadoop.fs.Path(root), true)
        Layout.equiDepthAssign(li, col("k"), 8)
          .write.partitionBy("fid").parquet(root)
        val back = s.read.parquet(root)
          .select(col("fid").cast("long").as("file_id"),
            col("k").cast("long").as("k"))
        val m1 = back.groupBy("file_id")
          .agg(count(lit(1)).as("achieved_rows"),
            min("k").as("achieved_min"), max("k").as("achieved_max"))
        val achDepth = broadcast(Layout.clusteringDepth(
            m1.select(col("file_id"), col("achieved_min").as("min_key"),
              col("achieved_max").as("max_key")))
          .agg(max(col("depth")).as("achieved_depth_max")))
        plan.select(col("file_id"), col("n_rows").as("predicted_rows"),
            col("min_key").as("predicted_min"),
            col("max_key").as("predicted_max"))
          .join(m1, Seq("file_id"), "full_outer")
          .crossJoin(beforeFiles).crossJoin(before)
          .crossJoin(predDepth).crossJoin(achDepth)
          .select(col("file_id"), col("predicted_rows"), col("achieved_rows"),
            col("predicted_min"), col("achieved_min"),
            col("predicted_max"), col("achieved_max"),
            (col("predicted_rows") <=> col("achieved_rows")
              && col("predicted_min") <=> col("achieved_min")
              && col("predicted_max") <=> col("achieved_max"))
              .as("achieved_as_predicted"),
            col("files_before"), col("depth_before_max"),
            col("predicted_depth_max"), col("achieved_depth_max"))
      },
      """WITH k AS (SELECT l_orderkey::BIGINT AS k FROM lineitem),
        |man0 AS (SELECT CASE WHEN k % 97 = 0 THEN 2000
        |                WHEN k < 7500 THEN k // 250
        |                ELSE 1000 + k // 2500 END AS file_id,
        |         MIN(k) AS min_key, MAX(k) AS max_key FROM k GROUP BY 1),
        |b0 AS (SELECT k, SUM(d)::BIGINT AS d FROM (
        |  SELECT min_key AS k, 1 AS d FROM man0
        |  UNION ALL SELECT max_key + 1, -1 FROM man0) GROUP BY 1),
        |sw0 AS (SELECT SUM(d) OVER (ORDER BY k)::BIGINT AS depth,
        |        lead(k) OVER (ORDER BY k) AS nk FROM b0),
        |dep0 AS (SELECT MAX(depth)::BIGINT AS depth_before_max FROM sw0
        |         WHERE nk IS NOT NULL AND depth > 0),
        |nf0 AS (SELECT COUNT(*)::BIGINT AS files_before FROM man0),
        |h AS (SELECT k AS v, COUNT(*)::BIGINT AS cnt FROM k GROUP BY 1),
        |n AS (SELECT SUM(cnt)::BIGINT AS n FROM h),
        |c AS (SELECT v, cnt, SUM(cnt) OVER (ORDER BY v)::BIGINT AS cum FROM h),
        |q AS (SELECT unnest(generate_series(1, 7)) AS i),
        |bnd AS (SELECT q.i, c.v FROM c, n, q
        |      WHERE cum >= (n * i + 7) // 8
        |        AND cum - cnt < (n * i + 7) // 8),
        |asg AS (SELECT k.k,
        |  (SELECT COUNT(*) FROM bnd WHERE k.k > bnd.v)::BIGINT AS file_id
        |  FROM k),
        |plan AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows,
        |  MIN(k)::BIGINT AS min_key, MAX(k)::BIGINT AS max_key
        |  FROM asg GROUP BY 1),
        |bP AS (SELECT k, SUM(d)::BIGINT AS d FROM (
        |  SELECT min_key AS k, 1 AS d FROM plan
        |  UNION ALL SELECT max_key + 1, -1 FROM plan) GROUP BY 1),
        |swP AS (SELECT SUM(d) OVER (ORDER BY k)::BIGINT AS depth,
        |        lead(k) OVER (ORDER BY k) AS nk FROM bP),
        |depP AS (SELECT MAX(depth)::BIGINT AS predicted_depth_max FROM swP
        |         WHERE nk IS NOT NULL AND depth > 0)
        |SELECT p.file_id, p.n_rows AS predicted_rows,
        |  p.n_rows AS achieved_rows,
        |  p.min_key AS predicted_min, p.min_key AS achieved_min,
        |  p.max_key AS predicted_max, p.max_key AS achieved_max,
        |  TRUE AS achieved_as_predicted,
        |  nf0.files_before, dep0.depth_before_max,
        |  depP.predicted_depth_max,
        |  depP.predicted_depth_max AS achieved_depth_max
        |FROM plan p, nf0, dep0, depP""".stripMargin)

  // q323 (round-15): EXECUTE the q317 rebalance plan — the INCREMENTAL
  // maintenance path's executor beside q318's full-rewrite executor:
  // every row is labeled with its post-maintenance file (keep → same
  // file; merge → its run subgroup, one output file per merge_group;
  // split → piece = (rank-within-file − 1) div ceil(n/pieces), ranks by
  // key), and the executed layout's per-file stats are gated against
  // what the plan PREDICTED. The prediction honors the metadata-only
  // contract: cardinalities are exact for every action (keep/merge from
  // manifest sums, split pieces from ceil arithmetic), and envelopes
  // are exact for keep/merge — but a split's intra-file piece bounds
  // need the data (an order statistic inside the file), so the plan
  // predicts NULL bounds there and the envelope gate degrades to the
  // bound a metadata-only plan CAN promise: containment in the source
  // file's envelope (kept never-NULL — a nullable boolean is
  // unportable through the hash gate). The oracle replays plan,
  // prediction, and the
  // achieved arm (piece bounds as per-file order statistics over the
  // key histogram — rank-deterministic even though duplicate keys
  // straddle piece boundaries); row conservation and the executed
  // depth sweep ride in every row.
  private def rebalanceExecDecl: Decl =
    decl("q323_rebalance_execute",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val li = t(s, d, "lineitem").select(col("l_orderkey").cast("long").as("k"))
        val fid0 = when(col("k") < 7500L, expr("k div 250"))
          .otherwise(lit(1000L) + expr("k div 2500"))
        val m0 = Snapshot.manifestEntriesBy(li, fid0, col("k"), version = 1L)
        val plan = Layout.rebalancePlan(m0, targetRows = 4000L)
        // execute on the rows: label, regroup, re-measure
        val exec = li.select(col("k"), fid0.as("file_id"))
          .join(broadcast(plan), "file_id")
          .withColumn("_rn", row_number().over(
            Window.partitionBy("file_id").orderBy("k")).cast("long"))
          .withColumn("_per", expr("(n_rows + pieces - 1) div pieces"))
          .withColumn("new_file",
            when(col("action") === "merge",
              concat(lit("m"), col("merge_group").cast("string")))
              .when(col("action") === "split",
                concat(lit("s"), col("file_id").cast("string"), lit("_"),
                  expr("(_rn - 1) div _per").cast("string")))
              .otherwise(concat(lit("k"), col("file_id").cast("string"))))
        val m1 = exec.groupBy("new_file")
          .agg(count(lit(1)).as("achieved_rows"),
            min("k").as("achieved_min"), max("k").as("achieved_max"))
        // predicted per output file, from plan arithmetic alone
        val predKeep = plan.where(col("action") === "keep")
          .select(concat(lit("k"), col("file_id").cast("string")).as("new_file"),
            col("n_rows").as("predicted_rows"),
            col("min_key").as("predicted_min"),
            col("max_key").as("predicted_max"),
            col("min_key").as("_smin"), col("max_key").as("_smax"))
        val predMerge = plan.where(col("action") === "merge")
          .groupBy(col("merge_group"))
          .agg(sum(col("n_rows")).as("predicted_rows"),
            min(col("min_key")).as("predicted_min"),
            max(col("max_key")).as("predicted_max"))
          .select(concat(lit("m"), col("merge_group").cast("string")).as("new_file"),
            col("predicted_rows"), col("predicted_min"), col("predicted_max"),
            col("predicted_min").as("_smin"), col("predicted_max").as("_smax"))
        val predSplit = plan.where(col("action") === "split")
          .withColumn("_per", expr("(n_rows + pieces - 1) div pieces"))
          .select(col("file_id"), col("n_rows"), col("_per"),
            col("min_key"), col("max_key"),
            explode(sequence(lit(0L), col("pieces") - 1L)).as("p"))
          .select(concat(lit("s"), col("file_id").cast("string"), lit("_"),
              col("p").cast("string")).as("new_file"),
            (least((col("p") + 1L) * col("_per"), col("n_rows"))
              - col("p") * col("_per")).as("predicted_rows"),
            lit(null).cast("long").as("predicted_min"),
            lit(null).cast("long").as("predicted_max"),
            col("min_key").as("_smin"), col("max_key").as("_smax"))
        val pred = predKeep.unionByName(predMerge).unionByName(predSplit)
        val totals = broadcast(li.agg(count(lit(1)).as("rows_before")))
        val after = broadcast(m1.agg(sum(col("achieved_rows")).as("rows_after")))
        val achDepth = broadcast(Layout.clusteringDepth(
            m1.select(col("achieved_min").as("min_key"),
              col("achieved_max").as("max_key")))
          .agg(max(col("depth")).as("achieved_depth_max")))
        pred.join(m1, Seq("new_file"), "full_outer")
          .crossJoin(totals).crossJoin(after).crossJoin(achDepth)
          .select(col("new_file"),
            col("predicted_rows"), col("achieved_rows"),
            col("predicted_min"), col("achieved_min"),
            col("predicted_max"), col("achieved_max"),
            (col("predicted_rows") <=> col("achieved_rows")).as("rows_as_predicted"),
            // exact-envelope check where the plan predicts one;
            // CONTAINMENT in the source file's envelope for split
            // pieces (the bound a metadata-only plan CAN promise) —
            // never NULL, so the gate's boolean column stays portable
            coalesce(
              when(col("predicted_min").isNotNull,
                col("predicted_min") <=> col("achieved_min")
                  && col("predicted_max") <=> col("achieved_max"))
                .otherwise(col("achieved_min") >= col("_smin")
                  && col("achieved_max") <= col("_smax")),
              lit(false)).as("envelope_as_predicted"),
            col("rows_before"), col("rows_after"), col("achieved_depth_max"))
      },
      """WITH k AS (SELECT l_orderkey::BIGINT AS k FROM lineitem),
        |asg AS (SELECT k, CASE WHEN k < 7500 THEN k // 250
        |               ELSE 1000 + k // 2500 END AS file_id FROM k),
        |man AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows,
        |        MIN(k) AS min_key, MAX(k) AS max_key FROM asg GROUP BY 1),
        |b AS (SELECT *, row_number()
        |        OVER (ORDER BY min_key, file_id)::BIGINT AS rk,
        |      (n_rows * 2 < 4000) AS small FROM man),
        |s AS (SELECT *, row_number()
        |        OVER (ORDER BY min_key, file_id)::BIGINT AS srk
        |      FROM b WHERE small),
        |s2 AS (SELECT *, rk - srk AS run,
        |       COALESCE(SUM(n_rows) OVER (PARTITION BY rk - srk
        |         ORDER BY min_key, file_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |         0)::BIGINT AS bef FROM s),
        |plan AS (
        |  SELECT file_id, n_rows, min_key, max_key, 'merge' AS action,
        |    1::BIGINT AS pieces, (run * 1000 + bef // 4000)::BIGINT AS mg
        |  FROM s2
        |  UNION ALL
        |  SELECT file_id, n_rows, min_key, max_key,
        |    CASE WHEN n_rows > 8000 THEN 'split' ELSE 'keep' END,
        |    (CASE WHEN n_rows > 8000 THEN (n_rows + 3999) // 4000
        |     ELSE 1 END)::BIGINT, (-1)::BIGINT
        |  FROM b WHERE NOT small),
        |predk AS (SELECT 'k' || file_id::VARCHAR AS new_file,
        |  n_rows AS predicted_rows, min_key AS predicted_min,
        |  max_key AS predicted_max, min_key AS smin, max_key AS smax
        |  FROM plan WHERE action = 'keep'),
        |predm AS (SELECT 'm' || mg::VARCHAR, SUM(n_rows)::BIGINT,
        |  MIN(min_key), MAX(max_key), MIN(min_key), MAX(max_key)
        |  FROM plan WHERE action = 'merge' GROUP BY mg),
        |spl AS (SELECT file_id, n_rows, pieces, min_key, max_key,
        |  (n_rows + pieces - 1) // pieces AS per
        |  FROM plan WHERE action = 'split'),
        |pcs AS (SELECT file_id, n_rows, per, min_key, max_key,
        |  unnest(generate_series(0, pieces - 1)) AS p FROM spl),
        |preds AS (SELECT 's' || file_id::VARCHAR || '_' || p::VARCHAR,
        |  (LEAST((p + 1) * per, n_rows) - p * per)::BIGINT,
        |  NULL::BIGINT, NULL::BIGINT, min_key, max_key FROM pcs),
        |pred AS (SELECT * FROM predk UNION ALL SELECT * FROM predm
        |         UNION ALL SELECT * FROM preds),
        |fh AS (SELECT file_id, k, COUNT(*)::BIGINT AS cnt
        |       FROM asg GROUP BY 1, 2),
        |fc AS (SELECT file_id, k, cnt,
        |  SUM(cnt) OVER (PARTITION BY file_id ORDER BY k)::BIGINT AS cum
        |  FROM fh),
        |-- achieved arm: keep/merge from exact group stats; split piece
        |-- bounds as per-file order statistics at ranks p·per+1 and
        |-- min((p+1)·per, n) — rank-deterministic under duplicate keys
        |achks AS (SELECT 'k' || file_id::VARCHAR AS new_file,
        |  n_rows AS achieved_rows, min_key AS achieved_min,
        |  max_key AS achieved_max FROM plan WHERE action = 'keep'),
        |achm AS (SELECT 'm' || mg::VARCHAR, SUM(n_rows)::BIGINT,
        |  MIN(min_key), MAX(max_key) FROM plan WHERE action = 'merge'
        |  GROUP BY mg),
        |achs AS (SELECT 's' || pcs.file_id::VARCHAR || '_' || p::VARCHAR,
        |  (LEAST((p + 1) * per, n_rows) - p * per)::BIGINT,
        |  (SELECT MIN(k) FROM fc WHERE fc.file_id = pcs.file_id
        |    AND cum >= p * per + 1 AND cum - cnt < p * per + 1),
        |  (SELECT MIN(k) FROM fc WHERE fc.file_id = pcs.file_id
        |    AND cum >= LEAST((p + 1) * per, n_rows)
        |    AND cum - cnt < LEAST((p + 1) * per, n_rows))
        |  FROM pcs),
        |ach AS (SELECT * FROM achks UNION ALL SELECT * FROM achm
        |        UNION ALL SELECT * FROM achs),
        |tot AS (SELECT COUNT(*)::BIGINT AS rows_before FROM k),
        |aft AS (SELECT SUM(achieved_rows)::BIGINT AS rows_after FROM ach),
        |bd AS (SELECT k, SUM(d)::BIGINT AS d FROM (
        |  SELECT achieved_min AS k, 1 AS d FROM ach
        |  UNION ALL SELECT achieved_max + 1, -1 FROM ach) GROUP BY 1),
        |sw AS (SELECT SUM(d) OVER (ORDER BY k)::BIGINT AS depth,
        |       lead(k) OVER (ORDER BY k) AS nk FROM bd),
        |dep AS (SELECT MAX(depth)::BIGINT AS achieved_depth_max FROM sw
        |        WHERE nk IS NOT NULL AND depth > 0)
        |SELECT pred.new_file, pred.predicted_rows, ach.achieved_rows,
        |  pred.predicted_min, ach.achieved_min,
        |  pred.predicted_max, ach.achieved_max,
        |  (pred.predicted_rows = ach.achieved_rows) AS rows_as_predicted,
        |  COALESCE(CASE WHEN pred.predicted_min IS NOT NULL
        |       THEN pred.predicted_min = ach.achieved_min
        |        AND pred.predicted_max = ach.achieved_max
        |       ELSE ach.achieved_min >= pred.smin
        |        AND ach.achieved_max <= pred.smax
        |       END, FALSE) AS envelope_as_predicted,
        |  tot.rows_before, aft.rows_after, dep.achieved_depth_max
        |FROM pred JOIN ach USING (new_file), tot, aft, dep""".stripMargin)

  // q325 (round-15): PER-COLUMN INDEX ADVISOR — which equality-pruning
  // index should each column carry? Decided from the column's per-file
  // stats ALONE (Layout.adviseColumnIndex): every file's distinct set
  // under the cap → the exact value-set index (q316's zero-FP/zero-FN
  // contract, a few bytes per file); any overflow → the bloom bitset
  // arm (q202's no-FN/bounded-FP contract). The fixture drives both
  // decisions through one table: l_returnflag (ndv 3 → value_set) and
  // l_suppkey (per-file ndv ≫ 16 → bloom). The gate then EXECUTES the
  // decided index for each column and verifies its pruning promise
  // against recomputed truth per file: the value-set arm must show
  // zero false positives AND zero false negatives, the bloom arm zero
  // false negatives — with the decision, per-file touch flags, and the
  // promise counters all in the hashed row. The oracle replays stats,
  // decision arithmetic, bitset fold, k-of-k probes, and the actuals.
  private def indexAdvisorDecl: Decl = {
    val m = 4096; val k = 3
    def armSql(n: String, vexpr: String, pred: String): String = {
      val ph = (0 until k).map(j =>
        s"SELECT file_id, ${sqlHash60(s"('idx$n$j|' || v)")} % $m AS p " +
          s"FROM li_$n").mkString("\n  UNION ALL ")
      val pr = (0 until k).map(j =>
        s"SELECT $j AS j, ${sqlHash60(s"('idx$n$j|' || '$pred')")} % $m AS p")
        .mkString("\n  UNION ALL ")
      s"""li_$n AS (SELECT l_orderkey // 2000 AS file_id, $vexpr AS v
         |  FROM lineitem),
         |dv_$n AS (SELECT DISTINCT file_id, v FROM li_$n WHERE v IS NOT NULL),
         |vs_$n AS (SELECT file_id, COUNT(*)::BIGINT AS ndv,
         |  string_agg(v, ',' ORDER BY v) AS vals FROM dv_$n GROUP BY 1),
         |dec_$n AS (SELECT COUNT(*)::BIGINT AS n_files,
         |  SUM(CASE WHEN ndv > 16 THEN 1 ELSE 0 END)::BIGINT AS n_over,
         |  CASE WHEN SUM(CASE WHEN ndv > 16 THEN 1 ELSE 0 END) = 0
         |       THEN 'value_set' ELSE 'bloom' END AS decision FROM vs_$n),
         |ph_$n AS ($ph),
         |fb_$n AS (SELECT file_id, p // 32 AS w,
         |  bit_or(1::BIGINT << (p % 32)) AS bits FROM ph_$n GROUP BY 1, 2),
         |pr_$n AS ($pr),
         |hit_$n AS (SELECT fb.file_id, COUNT(DISTINCT pr.j) AS h
         |  FROM pr_$n pr JOIN fb_$n fb ON pr.p // 32 = fb.w
         |  WHERE (fb.bits & (1::BIGINT << (pr.p % 32))) != 0 GROUP BY 1),
         |cand_$n AS (SELECT file_id FROM hit_$n WHERE h = $k),
         |act_$n AS (SELECT file_id,
         |  (MAX(CASE WHEN v = '$pred' THEN 1 ELSE 0 END) = 1)
         |    AS actually_contains FROM li_$n GROUP BY 1),
         |base_$n AS (SELECT '$n' AS column_name, dec.decision, vs.file_id,
         |  CASE WHEN dec.decision = 'value_set'
         |       THEN (vs.ndv > 16
         |             OR (',' || COALESCE(vs.vals, '') || ',') LIKE '%,$pred,%')
         |       ELSE (cand.file_id IS NOT NULL) END AS would_touch,
         |  act.actually_contains
         |  FROM vs_$n vs JOIN act_$n act USING (file_id)
         |  LEFT JOIN cand_$n cand USING (file_id), dec_$n dec),
         |cnt_$n AS (SELECT
         |  SUM(CASE WHEN would_touch THEN 1 ELSE 0 END)::BIGINT
         |    AS n_would_touch,
         |  SUM(CASE WHEN actually_contains THEN 1 ELSE 0 END)::BIGINT
         |    AS n_actual,
         |  SUM(CASE WHEN would_touch AND NOT actually_contains
         |      THEN 1 ELSE 0 END)::BIGINT AS n_false_pos,
         |  SUM(CASE WHEN actually_contains AND NOT would_touch
         |      THEN 1 ELSE 0 END)::BIGINT AS n_false_neg FROM base_$n),
         |sel_$n AS (SELECT b.column_name, b.decision, b.file_id,
         |  b.would_touch, b.actually_contains, c.n_would_touch,
         |  c.n_actual, c.n_false_pos, c.n_false_neg
         |  FROM base_$n b, cnt_$n c)""".stripMargin
    }
    decl("q325_index_advisor",
      (s, d) => {
        import s.implicits._
        import graft.operators.Bloom
        val li = t(s, d, "lineitem")
          .select(expr("l_orderkey div 2000").as("file_id"),
            col("l_returnflag").as("rf"),
            // high-cardinality arm: the order key itself — files hold
            // DISJOINT key ranges, so a point predicate prunes to one
            // true file and the bloom's FP behavior becomes visible
            col("l_orderkey").cast("long").cast("string").as("sk"))
        def arm(name: String, v: String, pred: String) = {
          val rows = li.select(col("file_id"), col(v).as("value"))
          val stats = Layout.columnStats(rows, col("file_id"), col("value"), 16)
          val dec = broadcast(Layout.adviseColumnIndex(stats)
            .select(col("decision")))
          val bits = Bloom.buildFileBits(rows, col("file_id"), col("value"),
            m, k, s"idx$name")
          val cand = Bloom.candidateFiles(Seq(pred).toDF("key"), col("key"),
              bits, m, k, s"idx$name")
            .withColumn("_bc", lit(true))
          val actual = rows.groupBy("file_id")
            .agg((max(when(col("value") === pred, 1L).otherwise(0L)) === 1L)
              .as("actually_contains"))
          val base = stats.select(col("file_id"), col("vals"))
            .join(cand, Seq("file_id"), "left")
            .join(actual, "file_id")
            .crossJoin(dec)
            .select(lit(name).as("column_name"), col("decision"),
              col("file_id"),
              when(col("decision") === "value_set",
                col("vals").isNull
                  || array_contains(split(col("vals"), ","), pred))
                .otherwise(coalesce(col("_bc"), lit(false)))
                .as("would_touch"),
              col("actually_contains"))
          val counts = broadcast(base.agg(
            sum(when(col("would_touch"), 1L).otherwise(0L)).as("n_would_touch"),
            sum(when(col("actually_contains"), 1L).otherwise(0L)).as("n_actual"),
            sum(when(col("would_touch") && !col("actually_contains"), 1L)
              .otherwise(0L)).as("n_false_pos"),
            sum(when(col("actually_contains") && !col("would_touch"), 1L)
              .otherwise(0L)).as("n_false_neg")))
          base.crossJoin(counts)
        }
        arm("rf", "rf", "R").unionByName(arm("sk", "sk", "4242"))
      },
      s"""WITH ${armSql("rf", "l_returnflag", "R")},
         |${armSql("sk", "l_orderkey::VARCHAR", "4242")}
         |SELECT * FROM sel_rf UNION ALL SELECT * FROM sel_sk""".stripMargin)
  }

  // q326 (round-15): MAINTENANCE ROUTER — the dispatch step above the
  // plan operators: from the manifest alone, a table routes to REWRITE
  // (overlapping envelopes — only q315's equi-depth rewrite restores
  // depth-1 probes), REBALANCE (disjoint but mis-sized files — q317's
  // incremental plan, which cannot worsen depth), or NONE. One query
  // drives all three branches through three layouts of the same rows
  // (q318's mixed overlap, q317's two-width, an equi-width healthy
  // one), so the routing arithmetic — depth sweep, small/oversized
  // census, the decision precedence — is hash-gated on every arm, not
  // just the one a production table happens to be in.
  private def maintenanceRouterDecl: Decl = {
    def armSql(tag: String, fid: String): String =
      s"""man_$tag AS (SELECT $fid AS file_id, COUNT(*)::BIGINT AS n_rows,
         |  MIN(k) AS min_key, MAX(k) AS max_key FROM k GROUP BY 1),
         |b_$tag AS (SELECT k, SUM(d)::BIGINT AS d FROM (
         |  SELECT min_key AS k, 1 AS d FROM man_$tag
         |  UNION ALL SELECT max_key + 1, -1 FROM man_$tag) GROUP BY 1),
         |sw_$tag AS (SELECT SUM(d) OVER (ORDER BY k)::BIGINT AS depth,
         |  lead(k) OVER (ORDER BY k) AS nk FROM b_$tag),
         |dep_$tag AS (SELECT COALESCE(MAX(depth), 0)::BIGINT AS max_depth
         |  FROM sw_$tag WHERE nk IS NOT NULL AND depth > 0),
         |agg_$tag AS (SELECT COUNT(*)::BIGINT AS n_files,
         |  SUM(CASE WHEN n_rows * 2 < 4000 THEN 1 ELSE 0 END)::BIGINT
         |    AS n_small,
         |  SUM(CASE WHEN n_rows > 8000 THEN 1 ELSE 0 END)::BIGINT
         |    AS n_oversized FROM man_$tag),
         |sel_$tag AS (SELECT '$tag' AS layout, a.n_files, d.max_depth,
         |  a.n_small, a.n_oversized,
         |  CASE WHEN d.max_depth > 1 THEN 'rewrite'
         |       WHEN a.n_small + a.n_oversized > 0 THEN 'rebalance'
         |       ELSE 'none' END AS decision
         |  FROM agg_$tag a, dep_$tag d)""".stripMargin
    decl("q326_maintenance_router",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey").cast("long").as("k"))
        def route(tag: String, fid: org.apache.spark.sql.Column) =
          Layout.adviseMaintenance(
              Snapshot.manifestEntriesBy(li, fid, col("k"), version = 1L),
              targetRows = 4000L)
            .select(lit(tag).as("layout"), col("n_files"), col("max_depth"),
              col("n_small"), col("n_oversized"), col("decision"))
        route("mixed",
            when(pmod(col("k"), lit(97L)) === 0L, lit(2000L))
              .when(col("k") < 7500L, expr("k div 250"))
              .otherwise(lit(1000L) + expr("k div 2500")))
          .unionByName(route("twowidth",
            when(col("k") < 7500L, expr("k div 250"))
              .otherwise(lit(1000L) + expr("k div 2500"))))
          .unionByName(route("healthy", expr("k div 1000")))
      },
      s"""WITH k AS (SELECT l_orderkey::BIGINT AS k FROM lineitem),
         |${armSql("mixed",
          "CASE WHEN k % 97 = 0 THEN 2000 WHEN k < 7500 THEN k // 250 " +
            "ELSE 1000 + k // 2500 END")},
         |${armSql("twowidth",
          "CASE WHEN k < 7500 THEN k // 250 ELSE 1000 + k // 2500 END")},
         |${armSql("healthy", "k // 1000")}
         |SELECT * FROM sel_mixed UNION ALL SELECT * FROM sel_twowidth
         |UNION ALL SELECT * FROM sel_healthy""".stripMargin)
  }

  // q332 (round-16): STALE-CLAIM LEASE through a REAL maintenance
  // flow — round 15 shipped claimVersionWithLease spec-only; here the
  // takeover runs end to end through the store: a compactor claimed
  // v2 and crashed before writing (orphaned marker, the exact wedge
  // the lease exists for), a later maintenance pass finds the claim
  // stale past the 15-min publish lease, takes it over through the
  // rename-aside arbiter, and lands the 16→4-file compaction commit
  // as v2 (pointer advanced, data round-trips). The guard rail is
  // gated in the same row: a FRESH claim (a live writer on v3) must
  // block — the lease never evicts a live writer, the conflict
  // surfaces as a counted refusal. Clock simulation uses the
  // operator's explicit nowMillis seam (no mtime mutation), so the
  // flow is deterministic; FS-outcome flags ride as literals against
  // oracle constants (the q281 pattern) while rows/sums/files come
  // from reading the store back.
  private def leaseMaintenanceDecl: Decl =
    decl("q332_lease_maintenance",
      (s, d) => {
        import graft.operators.Snapshot
        val ev = Q.events(s, d).select(col("event_id").as("k"),
          round(col("value") * 100).cast("long").as("v"))
        def mani(df: org.apache.spark.sql.DataFrame,
            fid: org.apache.spark.sql.Column) =
          Snapshot.manifestEntriesBy(df, fid, col("k"), version = 0L)
        val root = "/tmp/graft_q332_lm_" + Q.scratchTag(d)
        val fsH = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fsH.delete(new org.apache.hadoop.fs.Path(root), true)
        Snapshot.commit(s, root, 1L, ev,
          mani(ev, pmod(col("k"), lit(16L))), commitMillis = 1000L)
        // the compactor that died mid-window: claim v2, no data
        require(Snapshot.claimVersion(s, root, 2L),
          "q332 fixture: the orphaned claim must be plantable")
        val now = System.currentTimeMillis()
        // maintenance pass: the claim is STALE past the lease → takeover
        val takeover = Snapshot.claimVersionWithLease(s, root, 2L,
          Snapshot.PublishLeaseMillis,
          nowMillis = now + Snapshot.PublishLeaseMillis + 60000L)
        val committed =
          if (takeover) {
            Snapshot.commit(s, root, 2L, ev,
              mani(ev, expr("pmod(k, 16) div 4")), commitMillis = 2000L)
            1L
          } else 0L
        // a LIVE writer holds v3: the next pass must refuse, loudly
        require(Snapshot.claimVersion(s, root, 3L),
          "q332 fixture: the live claim must be plantable")
        val freshBlocked =
          if (!Snapshot.claimVersionWithLease(s, root, 3L,
            Snapshot.PublishLeaseMillis, nowMillis = now + 60000L)) 1L
          else 0L
        val curV = Snapshot.currentVersion(s, root).drop(1).toLong
        val filesAfter = broadcast(s.read.parquet(s"$root/manifest/v2")
          .agg(count(lit(1)).as("files_after")))
        Snapshot.readCurrent(s, root)
          .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_cents"))
          .crossJoin(filesAfter)
          .select(lit(if (takeover) 1L else 0L).as("stale_takeover"),
            lit(committed).as("maintenance_committed"),
            lit(freshBlocked).as("fresh_claim_blocked"),
            lit(curV).as("current_version"),
            col("files_after"), col("n_rows"), col("sum_cents"))
      },
      """WITH ev AS (SELECT event_id AS k, round(value * 100)::BIGINT AS v
        |           FROM events)
        |SELECT 1::BIGINT AS stale_takeover,
        |  1::BIGINT AS maintenance_committed,
        |  1::BIGINT AS fresh_claim_blocked,
        |  2::BIGINT AS current_version,
        |  COUNT(DISTINCT (k % 16) // 4)::BIGINT AS files_after,
        |  COUNT(*)::BIGINT AS n_rows, SUM(v)::BIGINT AS sum_cents
        |FROM ev""".stripMargin)

  // q328 (round-16): the CLOSED maintenance-dispatch LOOP — the
  // schedule-maintenance runbook composed end to end: ROUTE (q326's
  // adviseMaintenance picks rewrite/rebalance/none from the manifest
  // alone), EXECUTE the ROUTED plan on the rows (not a fixed one —
  // the router's decision string drives which executor runs: the
  // q318 equi-depth rewrite or the q323 rebalance regrouping), then
  // RE-ROUTE the achieved manifest and assert the FIXED POINT: after
  // executing what the router chose, the router must say `none`.
  // Two differently-broken layouts of the same rows drive both
  // branches — an equi-depth-16-with-full-span-straggler manifest
  // (overlap depth 2 → rewrite) and the pure equi-depth-16 layout
  // (disjoint, every file under target/2 → rebalance). targetRows is
  // ceil(n/3), so the loop's health bands are scale-free: the 4-file
  // rewrite lands files at n/4 (inside [target/2, 2·target]) and the
  // rebalance's merged thirds at ~0.31–0.38·n, at EVERY sf. The
  // hashed row carries (decision_before, executed_action,
  // decision_after, loop_closed) plus both censuses and row
  // conservation; the oracle replays routing arithmetic, both
  // executors, and the re-route from first principles.
  private def maintenanceLoopDecl: Decl =
    decl("q328_maintenance_loop",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val li = t(s, d, "lineitem")
          .select(col("l_orderkey").cast("long").as("k"))
        val n = li.count()
        val tgt = (n + 2) / 3 // ceil(n/3)
        // Query-scoped cached (round-17, guide §2.4): this exact-
        // order-statistics assign over the corpus is referenced by BOTH
        // loops' route → execute → re-route chains and by each loop's
        // 1-row dispatch head() — without the cache the quantile
        // subtree re-evaluates per branch and per action (measured
        // ~16.5 s in-suite at sf0.1; the assign is the only
        // corpus-sized work in the query). Released by the harness
        // boundary sweep (SparkEntry.sweepQueryState).
        val eq16 = graft.operators.QueryScoped.cached(
          Layout.equiDepthAssign(li, col("k"), 16)
            .select(col("k"), col("fid").as("file_id")))
        val frag = eq16
        val over = eq16.select(col("k"),
          when(pmod(col("k"), lit(97L)) === 0L, lit(9999L))
            .otherwise(col("file_id")).as("file_id"))
        def manifestOf(rows: org.apache.spark.sql.DataFrame) =
          rows.groupBy("file_id")
            .agg(count(lit(1)).as("n_rows"), min("k").as("min_key"),
              max("k").as("max_key"))
        def loop(tag: String, rows: org.apache.spark.sql.DataFrame) = {
          val m0 = manifestOf(rows)
          val before = Layout.adviseMaintenance(m0, tgt)
          // the DISPATCH: a 1-row driver read of the router's decision
          // (the cosineTopKAnnAuto routing pattern) picks the executor
          val decision = before.select("decision").head().getString(0)
          val executed = decision match {
            case "rewrite" =>
              Layout.equiDepthAssign(rows, col("k"), 4)
                .select(col("k"),
                  concat(lit("r"), col("fid").cast("string")).as("new_file"))
            case "rebalance" =>
              val plan = Layout.rebalancePlan(m0, tgt)
              rows.join(broadcast(plan.select(col("file_id"), col("action"),
                  col("pieces"), col("merge_group"), col("n_rows"))), "file_id")
                .withColumn("_rn", row_number().over(
                  Window.partitionBy("file_id").orderBy("k")).cast("long"))
                .withColumn("_per", expr("(n_rows + pieces - 1) div pieces"))
                .withColumn("new_file",
                  when(col("action") === "merge",
                    concat(lit("m"), col("merge_group").cast("string")))
                    .when(col("action") === "split",
                      concat(lit("s"), col("file_id").cast("string"), lit("_"),
                        expr("(_rn - 1) div _per").cast("string")))
                    .otherwise(concat(lit("k"), col("file_id").cast("string"))))
                .select(col("k"), col("new_file"))
            case _ =>
              rows.select(col("k"),
                concat(lit("k"), col("file_id").cast("string")).as("new_file"))
          }
          val m1 = executed.groupBy("new_file")
            .agg(count(lit(1)).as("n_rows"), min("k").as("min_key"),
              max("k").as("max_key"))
          val after = Layout.adviseMaintenance(
            m1.withColumnRenamed("new_file", "file_id"), tgt)
          val rowsAfter = broadcast(m1.agg(sum(col("n_rows")).as("rows_after")))
          broadcast(before.select(lit(tag).as("layout"),
              col("n_files").as("files_before"),
              col("max_depth").as("depth_before"),
              col("n_small").as("n_small_before"),
              col("n_oversized").as("n_oversized_before"),
              col("decision").as("decision_before")))
            .crossJoin(broadcast(after.select(
              col("n_files").as("files_after"),
              col("max_depth").as("depth_after"),
              col("n_small").as("n_small_after"),
              col("n_oversized").as("n_oversized_after"),
              col("decision").as("decision_after"))))
            .crossJoin(rowsAfter)
            .select(col("layout"), col("files_before"), col("depth_before"),
              col("n_small_before"), col("n_oversized_before"),
              col("decision_before"), lit(decision).as("executed_action"),
              col("files_after"), col("depth_after"), col("n_small_after"),
              col("n_oversized_after"), col("decision_after"),
              (col("decision_after") === "none").as("loop_closed"),
              lit(n).as("rows_before"), col("rows_after"))
        }
        loop("overlapping", over).unionByName(loop("fragmented", frag))
      },
      q328OracleSql)

  /** q328's oracle: dynamic-n equi-depth boundaries (the q318 order-
    * statistic replay generalized to 16 and 4 files), both routing
    * censuses with targetRows = ceil(n/3), the rebalance merge-run
    * packing replay (islands + start-offset subgrouping, keep arm
    * included for drift symmetry; the fixture admits no splits —
    * every file sits at ~n/16 ≪ 2·target), and the re-route. */
  private lazy val q328OracleSql: String = {
    def census(tag: String, man: String): String =
      s"""b_$tag AS (SELECT kk, SUM(dd)::BIGINT AS d FROM (
         |  SELECT min_key AS kk, 1 AS dd FROM $man
         |  UNION ALL SELECT max_key + 1, -1 FROM $man) GROUP BY 1),
         |sw_$tag AS (SELECT SUM(d) OVER (ORDER BY kk)::BIGINT AS depth,
         |  lead(kk) OVER (ORDER BY kk) AS nk FROM b_$tag),
         |dep_$tag AS (SELECT COALESCE(MAX(depth), 0)::BIGINT AS max_depth
         |  FROM sw_$tag WHERE nk IS NOT NULL AND depth > 0),
         |sel_$tag AS (SELECT a.n_files, d.max_depth, a.n_small,
         |  a.n_oversized,
         |  CASE WHEN d.max_depth > 1 THEN 'rewrite'
         |       WHEN a.n_small + a.n_oversized > 0 THEN 'rebalance'
         |       ELSE 'none' END AS decision
         |  FROM (SELECT COUNT(*)::BIGINT AS n_files,
         |    SUM(CASE WHEN m.n_rows * 2 < nn.tgt THEN 1 ELSE 0 END)::BIGINT
         |      AS n_small,
         |    SUM(CASE WHEN m.n_rows > 2 * nn.tgt THEN 1 ELSE 0 END)::BIGINT
         |      AS n_oversized FROM $man m, nn) a, dep_$tag d)""".stripMargin
    s"""WITH k AS (SELECT l_orderkey::BIGINT AS k FROM lineitem),
       |nn AS (SELECT COUNT(*)::BIGINT AS n,
       |       ((COUNT(*) + 2) // 3)::BIGINT AS tgt FROM k),
       |h AS (SELECT k AS v, COUNT(*)::BIGINT AS cnt FROM k GROUP BY 1),
       |c AS (SELECT v, cnt, SUM(cnt) OVER (ORDER BY v)::BIGINT AS cum FROM h),
       |q16 AS (SELECT unnest(generate_series(1, 15)) AS gx),
       |b16 AS (SELECT q16.gx, c.v FROM c, nn, q16
       |  WHERE cum >= (nn.n * gx + 15) // 16
       |    AND cum - cnt < (nn.n * gx + 15) // 16),
       |asg16 AS (SELECT k.k,
       |  (SELECT COUNT(*) FROM b16 WHERE k.k > b16.v)::BIGINT AS file_id
       |  FROM k),
       |man_f AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows,
       |  MIN(k)::BIGINT AS min_key, MAX(k)::BIGINT AS max_key
       |  FROM asg16 GROUP BY 1),
       |man_o AS (SELECT CASE WHEN k % 97 = 0 THEN 9999::BIGINT
       |    ELSE file_id END AS file_id, COUNT(*)::BIGINT AS n_rows,
       |  MIN(k)::BIGINT AS min_key, MAX(k)::BIGINT AS max_key
       |  FROM asg16 GROUP BY 1),
       |${census("o0", "man_o")},
       |${census("f0", "man_f")},
       |q4 AS (SELECT unnest(generate_series(1, 3)) AS gx),
       |b4 AS (SELECT q4.gx, c.v FROM c, nn, q4
       |  WHERE cum >= (nn.n * gx + 3) // 4
       |    AND cum - cnt < (nn.n * gx + 3) // 4),
       |man_oa AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows,
       |  MIN(k)::BIGINT AS min_key, MAX(k)::BIGINT AS max_key FROM (
       |  SELECT k.k,
       |    (SELECT COUNT(*) FROM b4 WHERE k.k > b4.v)::BIGINT AS file_id
       |  FROM k) GROUP BY 1),
       |rb AS (SELECT m.*, nn.tgt,
       |  row_number() OVER (ORDER BY min_key, file_id)::BIGINT AS rk,
       |  (m.n_rows * 2 < nn.tgt) AS small FROM man_f m, nn),
       |rs AS (SELECT *, row_number()
       |  OVER (ORDER BY min_key, file_id)::BIGINT AS srk FROM rb WHERE small),
       |rs2 AS (SELECT *, rk - srk AS run,
       |  COALESCE(SUM(n_rows) OVER (PARTITION BY rk - srk
       |    ORDER BY min_key, file_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
       |    AS bef FROM rs),
       |man_fa AS (
       |  SELECT SUM(n_rows)::BIGINT AS n_rows, MIN(min_key)::BIGINT AS min_key,
       |    MAX(max_key)::BIGINT AS max_key
       |  FROM rs2 GROUP BY (run * 1000 + bef // tgt)
       |  UNION ALL
       |  SELECT n_rows, min_key, max_key FROM rb WHERE NOT small),
       |${census("oa", "man_oa")},
       |${census("fa", "man_fa")},
       |ra_o AS (SELECT SUM(n_rows)::BIGINT AS rows_after FROM man_oa),
       |ra_f AS (SELECT SUM(n_rows)::BIGINT AS rows_after FROM man_fa)
       |SELECT 'overlapping' AS layout, sel_o0.n_files AS files_before,
       |  sel_o0.max_depth AS depth_before, sel_o0.n_small AS n_small_before,
       |  sel_o0.n_oversized AS n_oversized_before,
       |  sel_o0.decision AS decision_before,
       |  sel_o0.decision AS executed_action,
       |  sel_oa.n_files AS files_after, sel_oa.max_depth AS depth_after,
       |  sel_oa.n_small AS n_small_after,
       |  sel_oa.n_oversized AS n_oversized_after,
       |  sel_oa.decision AS decision_after,
       |  (sel_oa.decision = 'none') AS loop_closed,
       |  nn.n AS rows_before, ra_o.rows_after
       |FROM sel_o0, sel_oa, nn, ra_o
       |UNION ALL
       |SELECT 'fragmented', sel_f0.n_files, sel_f0.max_depth,
       |  sel_f0.n_small, sel_f0.n_oversized, sel_f0.decision,
       |  sel_f0.decision, sel_fa.n_files, sel_fa.max_depth,
       |  sel_fa.n_small, sel_fa.n_oversized, sel_fa.decision,
       |  (sel_fa.decision = 'none'), nn.n, ra_f.rows_after
       |FROM sel_f0, sel_fa, nn, ra_f""".stripMargin
  }

  /** The full-recompute oracle for the post-merge per-group view —
    * shared by q199 (batch IVM) and q200 (streaming IVM): both
    * maintenance paths must converge to this recomputed state. */
  private[queries] def ivmViewOracle: String =
    mergeFixtureCtes + """,
       |rows2 AS (SELECT tg.key, CASE WHEN s.op = 'U' THEN s.sv ELSE tg.qty END AS qty
       |          FROM tgt tg LEFT JOIN src s ON tg.key = s.key
       |          WHERE s.op IS NULL OR s.op = 'U'
       |          UNION ALL
       |          SELECT s.key, s.sv FROM src s LEFT JOIN tgt tg ON s.key = tg.key
       |          WHERE s.op = 'U' AND tg.key IS NULL)
       |SELECT key // 1024 AS grp,
       |  CAST(SUM(CAST(qty AS DECIMAL(30,12))) AS DOUBLE) AS sum_qty,
       |  COUNT(*)::BIGINT AS n
       |FROM rows2 GROUP BY 1""".stripMargin
}
