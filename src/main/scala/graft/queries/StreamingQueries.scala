package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import Q._
import PipelineQueries.sqlHash60

/** q112: Structured Streaming under the SAME correctness gate as the
  * batch operators — the stream/batch parity promise made concrete.
  *
  * The orders table is consumed through the file-source as a stream
  * (`readStream.parquet`), aggregated statefully per calendar month,
  * and run to completion with `Trigger.AvailableNow`; the final state
  * of the memory sink is the query result, which must hash-match the
  * batch answer DuckDB computes over the same file. Totals are summed
  * as exact integer cents — a double sum's partial-order differences
  * across engines would make the last ulp nondeterministic.
  *
  * The memory sink is the harness: a real deployment writes each
  * micro-batch through `foreachBatch` into the statement store (see
  * streaming/StatementStream.scala); the aggregation state and
  * trigger semantics exercised here are the same.
  */
object StreamingQueries {

  val decls: Seq[Decl] = Seq(
    decl("q112_streaming_monthly_orders",
      (s, d) => {
        // the file source streams a DIRECTORY of drops — stage the
        // orders file into a scratch landing dir (the deployment shape:
        // a crawler lands files, the stream picks them up)
        val landing = new org.apache.hadoop.fs.Path(
          "/tmp/graft_q112_landing_" + Q.scratchTag(d))
        val fs = landing.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(landing, true)
        fs.mkdirs(landing)
        org.apache.hadoop.fs.FileUtil.copy(
          fs, new org.apache.hadoop.fs.Path(s"$d/orders.parquet"),
          fs, new org.apache.hadoop.fs.Path(landing, "orders.parquet"),
          false, s.sparkContext.hadoopConfiguration)
        val schema = s.read.parquet(s"$d/orders.parquet").schema
        val stream = s.readStream.schema(schema).parquet(landing.toString)
        val agg = stream
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("total_cents"))
        val qname = "q112_mem_" + java.lang.Math.abs(d.hashCode.toLong).toString
        // a rerun in the same session must not collide with a leftover
        // active query of the same name
        s.streams.active.filter(q => q.name == qname).foreach(_.stop())
        Q.withStreamStatePartitions(s, landing.toString) {
          val q = agg.writeStream.format("memory").queryName(qname)
            .outputMode("complete").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        s.table(qname).select(col("month"), col("n_orders"), col("total_cents"))
      },
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
        |  SUM(round(o_totalprice * 100)::BIGINT)::BIGINT AS total_cents
        |FROM orders GROUP BY 1""".stripMargin),

    // q114: the STREAMING statement store — the T4/T5 batch invariants
    // (id dedupe first-wins + TimeStampIndex first_seen preservation,
    // zavod/zavod/runtime/timestamps.py:26-65, tools/util.py:39-62)
    // held continuously across two statement drops:
    //   drop 1: one 'status' statement per order (run time T1);
    //   drop 2: the k%3==0 statements REPEAT byte-identically but carry
    //     an EARLIER firstSeen (a late backfill — the streaming-only
    //     case: dedupe keeps the first ARRIVAL, the timestamp index
    //     still folds in the earlier timestamp); k%3==1 orders emit a
    //     NEW statement (different value ⇒ different id).
    // Two stateful queries ride the landing dir, each restarted from
    // its checkpoint between drops (state survives the restart):
    //  - dropDuplicatesWithinWatermark (P6) appends first-arrival rows
    //    to the store via foreachBatch;
    //  - firstSeenIndex (mapGroupsWithState) appends (id, first_seen)
    //    state emissions, versioned by micro-batch id.
    // The result joins the store against the LATEST index emission per
    // id; DuckDB recomputes both statefully-maintained artifacts as
    // batch SQL over the reconstructed drops.
    decl("q114_streaming_statement_store",
      (s, d) => {
        import graft.streaming.StatementStream
        import graft.model.Statement
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q114_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        val storeDir = s"$base/store"
        val idxDir = s"$base/idx"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))

        val T0 = "2025-12-01 00:00:00"
        val T1 = "2026-01-01 00:00:00"
        val T2 = "2026-02-01 00:00:00"
        def stmts(rows: org.apache.spark.sql.DataFrame, value: org.apache.spark.sql.Column,
            first: String, last: String) = {
          val eid = concat(lit("o"), col("o_orderkey").cast("string"))
          rows.select(
            md5(concat_ws("|", eid, lit("status"), value)).as("id"),
            eid.as("entityId"), eid.as("canonicalId"),
            lit("status").as("prop"), lit("Thing").as("schema"),
            value.as("value"), lit("stream").as("dataset"),
            lit("en").as("lang"), lit("crawl").as("origin"),
            value.as("originalValue"),
            lit(first).cast("timestamp").as("firstSeen"),
            lit(last).cast("timestamp").as("lastSeen"),
            lit(false).as("external"))
            .select(Statement.sparkSchema.map(f => col(f.name).cast(f.dataType)): _*)
        }
        val o = t(s, d, "orders")
        val k = col("o_orderkey")
        val drop1 = stmts(o, col("o_orderstatus"), T1, T1)
        val drop2 = stmts(o.filter(k % 3 === 0), col("o_orderstatus"), T0, T2)
          .unionByName(stmts(o.filter(k % 3 === 1), col("o_orderpriority"), T2, T2))

        // one pass over whatever has landed: both stateful queries run
        // to completion (AvailableNow), then stop — restarted per drop
        def processAvailable(): Unit = {
          val stream = StatementStream.readStatements(s, landing)
          val avail = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow()
            : org.apache.spark.sql.streaming.Trigger)
          val qStore = StatementStream.foreachBatchSink(
            StatementStream.dedupedStatements(stream, delay = "90 days"),
            s"$base/ck_store", trigger = avail) { (batch, _) =>
            batch.write.mode("append").parquet(storeDir)
          }
          val qIdx = StatementStream.foreachBatchSink(
            StatementStream.firstSeenIndex(stream),
            s"$base/ck_idx", outputMode = "update", trigger = avail) { (batch, bid) =>
            batch.withColumn("batch_seq", lit(bid))
              .write.mode("append").parquet(idxDir)
          }
          qStore.awaitTermination(); qIdx.awaitTermination()
        }
        drop1.write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          drop2.write.mode("append").parquet(landing)
          processAvailable()
        }

        // store = first-arrival rows; index = latest state emission per
        // id (min firstSeen ever observed)
        val store = s.read.parquet(storeDir)
        val idxW = org.apache.spark.sql.expressions.Window
          .partitionBy("id").orderBy(col("batch_seq").desc)
        val idx = s.read.parquet(idxDir)
          .withColumn("rn", row_number().over(idxW))
          .filter(col("rn") === 1)
          .select(col("id"), col("first_seen"))
        store.join(idx, "id")
          .select(col("id"), col("entityId").as("entity_id"), col("prop"),
            col("value"),
            date_format(col("first_seen"), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
            date_format(col("lastSeen"), "yyyy-MM-dd HH:mm:ss").as("last_seen"))
      },
      """WITH d1 AS (
        |  SELECT md5('o' || o_orderkey::VARCHAR || '|status|' || o_orderstatus) AS id,
        |    'o' || o_orderkey::VARCHAR AS entity_id, 'status' AS prop,
        |    o_orderstatus AS value,
        |    TIMESTAMP '2026-01-01 00:00:00' AS first_seen,
        |    TIMESTAMP '2026-01-01 00:00:00' AS last_seen, 1 AS seq
        |  FROM orders),
        |d2 AS (
        |  SELECT md5('o' || o_orderkey::VARCHAR || '|status|' || o_orderstatus) AS id,
        |    'o' || o_orderkey::VARCHAR, 'status', o_orderstatus,
        |    TIMESTAMP '2025-12-01 00:00:00', TIMESTAMP '2026-02-01 00:00:00', 2
        |  FROM orders WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT md5('o' || o_orderkey::VARCHAR || '|status|' || o_orderpriority) AS id,
        |    'o' || o_orderkey::VARCHAR, 'status', o_orderpriority,
        |    TIMESTAMP '2026-02-01 00:00:00', TIMESTAMP '2026-02-01 00:00:00', 2
        |  FROM orders WHERE o_orderkey % 3 = 1),
        |drops AS (SELECT * FROM d1 UNION ALL SELECT * FROM d2),
        |firstwins AS (
        |  SELECT * FROM drops
        |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY seq) = 1),
        |idx AS (SELECT id, MIN(first_seen) AS min_first FROM drops GROUP BY id)
        |SELECT fw.id, fw.entity_id, fw.prop, fw.value,
        |  strftime(idx.min_first, '%Y-%m-%d %H:%M:%S') AS first_seen,
        |  strftime(fw.last_seen, '%Y-%m-%d %H:%M:%S') AS last_seen
        |FROM firstwins fw JOIN idx USING (id)""".stripMargin),

    // q123: watermarked windowed aggregation with LATE-DATA DROP under
    // the oracle gate (A9's windowed crawl-stats semantics on the
    // events stream). Drop 1 carries the first 20 days; the run's
    // no-data batch finalizes every 1-day window whose end is at or
    // below watermark = max(event time) - 1h, appending it EXACTLY
    // once. Drop 2 carries the remaining days PLUS re-injected copies
    // of day 5 — far below the checkpointed watermark, so the restarted
    // query provably discards them (day 5's count stays at its base
    // value; a doubled count would mean the late rows leaked in). The
    // final day's window never finalizes and must be absent. DuckDB
    // recomputes the emitted-window set and counts from the non-late
    // rows alone.
    decl("q123_streaming_window_watermark",
      (s, d) => {
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q123_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"; val out = s"$base/out"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val ev = Q.events(s, d).select(col("event_id"), col("ts"))
        val cut = lit("2024-01-21 00:00:00").cast("timestamp")
        def runPass(): Unit = {
          val schema = ev.schema
          // one batch per drop: every landed file in a single trigger,
          // so the watermark only advances BETWEEN drops (deterministic
          // late-row judgement against the previous drop's watermark)
          val st = s.readStream.schema(schema)
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val agg = st.withWatermark("ts", "1 hour")
            .groupBy(window(col("ts"), "1 day").as("w"))
            .agg(count(lit(1)).as("n"))
            .select(col("w.start").as("window_start"), col("n"))
          val q = agg.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", s"$base/ck")
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        ev.filter(col("ts") < cut)
          .write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          runPass()
          val late = ev
            .filter(col("ts") >= lit("2024-01-05").cast("timestamp") &&
              col("ts") < lit("2024-01-06").cast("timestamp"))
            .withColumn("event_id", col("event_id") + 1000000L)
          ev.filter(col("ts") >= cut).unionByName(late)
            .write.mode("append").parquet(landing)
          runPass()
        }
        s.read.parquet(out).select(
          date_format(col("window_start"), "yyyy-MM-dd").as("day"), col("n"))
      },
      """WITH ev AS (SELECT epoch_ns(ts) AS tns,
        |    strftime(date_trunc('day', ts), '%Y-%m-%d') AS day FROM events),
        |-- Spark tracks event-time watermarks at MILLISECOND granularity:
        |-- floor the max event time to ms before subtracting the delay,
        |-- or a sub-ms residue could flip a window that lands exactly on
        |-- the boundary
        |wm AS (SELECT (MAX(tns) // 1000000) * 1000 - 3600000000 AS w FROM ev)
        |SELECT day, COUNT(*)::BIGINT AS n FROM ev
        |GROUP BY day
        |HAVING (epoch_ns((day || ' 00:00:00')::TIMESTAMP) // 1000
        |        + 86400000000) <= (SELECT w FROM wm)""".stripMargin),

    // q248 (round-12): STREAMING sessionization — the native
    // session_window state operator under a watermark, held across two
    // event drops with a checkpoint restart between them (q246's batch
    // twin, the q123 watermark-replay pattern). Drops split at a global
    // ts cut; the watermark delay (1 h) exceeds the session gap
    // (30 min), so a session finalized in pass 1 can never be reopened
    // by a pass-2 event — the structural condition that makes
    // append-mode session output exactly-once here. Sessions still
    // open at end-of-stream (within delay of the corpus max ts) are
    // correctly ABSENT; the oracle rebuilds the same cutoff from the
    // ms-floored max event time (Spark tracks watermarks in ms). The
    // session merge itself needs no row order, so multi-file drops are
    // deterministic. Value mass summed in DECIMAL (the seed-B rule).
    decl("q248_streaming_sessions",
      (s, d) => {
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q248_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"; val out = s"$base/out"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val ev = Q.events(s, d).select(col("event_id"), col("ts"),
          col("user_id"), col("value"))
        val cut = lit("2024-01-21 00:00:00").cast("timestamp")
        def runPass(): Unit = {
          val st = s.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val agg = st.withWatermark("ts", "1 hour")
            .groupBy(col("user_id"),
              session_window(col("ts"), "30 minutes").as("sw"))
            .agg(count(lit(1)).as("n_events"),
              sum(col("value").cast("decimal(18,2)")).as("dv"))
            .select(col("user_id"),
              date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss")
                .as("session_start"),
              col("n_events"), col("dv").cast("double").as("total_value"))
          val q = agg.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", s"$base/ck")
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        ev.filter(col("ts") < cut).write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          runPass()
          ev.filter(col("ts") >= cut).write.mode("append").parquet(landing)
          runPass()
        }
        s.read.parquet(out)
      },
      """WITH x AS (
        |  SELECT user_id, event_id, ts, value, epoch_ns(ts) AS tns,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, event_id, ts, value, tns,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |-- Spark tracks the event-time watermark at ms granularity
        |wm AS (SELECT (MAX(tns) // 1000000) * 1000 - 3600000000 AS w
        |       FROM s),
        |sess AS (
        |  SELECT user_id,
        |    strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |    COUNT(*)::BIGINT AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
        |    MAX(tns) // 1000 AS last_us
        |  FROM s GROUP BY user_id, sid)
        |SELECT user_id, session_start, n_events, total_value
        |FROM sess
        |WHERE last_us + 1800 * 1000000 <= (SELECT w FROM wm)""".stripMargin),

    // q282 (round-13): STREAMING OHLC bars — q262's downsample shape as
    // a watermarked tumbling-window stream. open/close need
    // ordered-within-window picks, which streaming expresses as
    // min_by/max_by on the (ts, event_id) struct key (declarative
    // aggregates — mergeable partial state, no sort, no row_number);
    // two drops with a checkpoint restart, append mode emitting only
    // watermark-finalized hours. The oracle runs q262's batch
    // window-rank form RESTRICTED to the finalized cutoff — so the
    // gate checks min_by/max_by ≡ rank-1 picks AND the tumbling-window
    // finalization rule (window end ≤ ms-floored watermark) at once.
    decl("q282_streaming_ohlc",
      (s, d) => {
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q282_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"; val out = s"$base/out"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val ev = Q.events(s, d).select(col("event_id"), col("ts"),
          col("user_id"), col("value"))
        val cut = lit("2024-01-21 00:00:00").cast("timestamp")
        def runPass(): Unit = {
          val st = s.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val agg = st.withWatermark("ts", "1 hour")
            .groupBy(col("user_id"), window(col("ts"), "1 hour").as("w"))
            .agg(
              min_by(col("value"), struct(col("ts"), col("event_id")))
                .as("open"),
              max(col("value")).as("high"), min(col("value")).as("low"),
              max_by(col("value"), struct(col("ts"), col("event_id")))
                .as("close"),
              count(lit(1)).as("n_trades"))
            .select(col("user_id"),
              date_format(col("w.start"), "yyyy-MM-dd HH:00").as("hour"),
              col("open"), col("high"), col("low"), col("close"),
              col("n_trades"))
          val q = agg.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", s"$base/ck")
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        ev.filter(col("ts") < cut).write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          runPass()
          ev.filter(col("ts") >= cut).write.mode("append").parquet(landing)
          runPass()
        }
        s.read.parquet(out)
      },
      """WITH x AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr, value,
        |    epoch_ns(ts) AS tns,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM events),
        |wm AS (SELECT (MAX(tns) // 1000000) * 1000 - 3600000000 AS w FROM x),
        |bars AS (
        |  SELECT user_id, hr,
        |    MAX(CASE WHEN rn = 1 THEN value END) AS open,
        |    MAX(value) AS high, MIN(value) AS low,
        |    MAX(CASE WHEN rd = 1 THEN value END) AS close,
        |    COUNT(*)::BIGINT AS n_trades
        |  FROM x GROUP BY 1, 2)
        |SELECT user_id, strftime(hr, '%Y-%m-%d %H:00') AS hour,
        |  open, high, low, close, n_trades
        |FROM bars, wm
        |WHERE epoch_us(hr + INTERVAL 1 HOUR) <= wm.w""".stripMargin),

    // q249 (round-12): STREAM–STREAM interval join — the one
    // Structured Streaming operator family the suite lacked. View
    // events join purchase events of the same user within one hour
    // (click-attribution, the canonical shape), BOTH sides watermarked
    // so Spark can evict join state, held across two drops with a
    // checkpoint restart. Completeness argument (why append-mode inner
    // join output equals the batch join here): a view's state is
    // evicted only once the watermark passes view_ts + join window;
    // every pass-2 purchase is ≥ the cut while pass 1's watermark is
    // max(drop1) − 1 h < cut, so any view that could still pair
    // (view_ts ≥ purchase_ts − 1 h ≥ cut − 1 h) is strictly above the
    // eviction line when the restart happens — no pair can be lost.
    // The delay is emitted in integer micros (exact on any engine).
    decl("q249_streaming_interval_join",
      (s, d) => {
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q249_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"; val out = s"$base/out"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val ev = Q.events(s, d).select(col("event_id"), col("ts"),
          col("user_id"), col("event_type"))
        val cut = lit("2024-01-21 00:00:00").cast("timestamp")
        def runPass(): Unit = {
          def side(tpe: String, idAs: String, tsAs: String) =
            s.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "10000").parquet(landing)
              .filter(col("event_type") === tpe)
              .select(col("event_id").as(idAs), col("ts").as(tsAs),
                col("user_id"))
              .withWatermark(tsAs, "1 hour")
          val views = side("view", "view_id", "t_view")
          val buys = side("purchase", "buy_id", "t_buy")
          val joined = views.join(buys,
            views("user_id") === buys("user_id") &&
              col("t_buy") >= col("t_view") &&
              col("t_buy") <= col("t_view") + expr("INTERVAL 1 HOUR"))
            .select(views("user_id"), col("view_id"), col("buy_id"),
              (unix_micros(col("t_buy")) - unix_micros(col("t_view")))
                .as("delay_us"))
          val q = joined.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", s"$base/ck")
            .outputMode("append").trigger(Trigger.AvailableNow()).start()
          q.awaitTermination()
        }
        ev.filter(col("ts") < cut).write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          runPass()
          ev.filter(col("ts") >= cut).write.mode("append").parquet(landing)
          runPass()
        }
        s.read.parquet(out)
      },
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS buy_id,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS delay_us
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        |  AND v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND p.ts >= v.ts
        |  AND epoch_us(p.ts) <= epoch_us(v.ts) + 3600::BIGINT * 1000000""".stripMargin),

    // q259 (round-12): the NEW arbitrary-state operator —
    // transformWithState (Spark 4's StatefulProcessor, the successor
    // of the mapGroupsWithState that runs firstSeenIndex) exercised
    // end-to-end: per-user ValueState cumulative event counts + an
    // invocation sequence, held across two drops with a checkpoint
    // restart on the RocksDB state store the operator requires (conf
    // scoped to this query and restored). handleInputRows fires once
    // per key per micro-batch and only for keys WITH input, so the
    // oracle re-derives every (key, seq, cum) row from the drop split:
    // a user seen in drop 1 gets (0, c1); a user seen in drop 2 gets
    // (1 if seen in drop 1 else 0, c1+c2).
    decl("q259_streaming_transform_state",
      (s, d) => {
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q259_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"; val out = s"$base/out"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val ev = Q.events(s, d).select(col("event_id"), col("ts"), col("user_id"))
        val cut = lit("2024-01-21 00:00:00").cast("timestamp")
        val provKey = "spark.sql.streaming.stateStore.providerClass"
        val provWas = s.conf.getOption(provKey)
        s.conf.set(provKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          def runPass(): Unit = {
            import s.implicits._
            val st = s.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "10000").parquet(landing)
            val counted = st.select(col("user_id").as[Long](org.apache.spark.sql.Encoders.scalaLong))
              .groupByKey(identity)
              .transformWithState(new graft.streaming.CumulativeCountProcessor,
                org.apache.spark.sql.streaming.TimeMode.None(),
                org.apache.spark.sql.streaming.OutputMode.Append())
            val q = counted.toDF().writeStream.format("parquet")
              .option("path", out)
              .option("checkpointLocation", s"$base/ck")
              .outputMode("append")
              .trigger(Trigger.AvailableNow()).start()
            q.awaitTermination()
          }
          ev.filter(col("ts") < cut).write.mode("append").parquet(landing)
          Q.withStreamStatePartitions(s, landing) {
            runPass()
            ev.filter(col("ts") >= cut).write.mode("append").parquet(landing)
            runPass()
          }
        } finally {
          provWas match {
            case Some(v) => s.conf.set(provKey, v)
            case None => s.conf.unset(provKey)
          }
        }
        s.read.parquet(out)
      },
      """WITH c1 AS (SELECT user_id, COUNT(*)::BIGINT AS n FROM events
        |  WHERE ts < TIMESTAMP '2024-01-21 00:00:00' GROUP BY 1),
        |c2 AS (SELECT user_id, COUNT(*)::BIGINT AS n FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-21 00:00:00' GROUP BY 1)
        |SELECT user_id, 0::BIGINT AS batch_seq, n AS cum_events FROM c1
        |UNION ALL
        |SELECT c2.user_id,
        |  (CASE WHEN c1.user_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS batch_seq,
        |  (COALESCE(c1.n, 0) + c2.n)::BIGINT AS cum_events
        |FROM c2 LEFT JOIN c1 USING (user_id)""".stripMargin),

    // q260 (round-12): STATE BOOTSTRAP — the batch→streaming cutover.
    // A warehouse holds per-user historical event counts; the
    // streaming job takes over WITHOUT reprocessing history:
    // StatefulProcessorWithInitialState seeds each key's ValueState
    // from the batch frame before the first input row, then two
    // stream drops accumulate on top across a checkpoint restart.
    // The restart leg is the honest part: initial state must apply
    // exactly once — if the engine (or a naive reimplementation)
    // re-seeded on restart, every cum count would double history and
    // the oracle (which adds history once) would fail the hash.
    decl("q260_streaming_state_bootstrap",
      (s, d) => {
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q260_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"; val out = s"$base/out"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val ev = Q.events(s, d).select(col("event_id"), col("ts"), col("user_id"))
        val cut = lit("2024-01-21 00:00:00").cast("timestamp")
        val cut2 = lit("2024-01-26 00:00:00").cast("timestamp")
        val provKey = "spark.sql.streaming.stateStore.providerClass"
        val provWas = s.conf.getOption(provKey)
        s.conf.set(provKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          import s.implicits._
          val histKv = ev.filter(col("ts") < cut)
            .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
            .as[(Long, Long)].groupByKey(_._1).mapValues(_._2)
          def runPass(): Unit = {
            val st = s.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "10000").parquet(landing)
            val counted = st.select(col("user_id").as[Long])
              .groupByKey(identity)
              .transformWithState(new graft.streaming.BootstrappedCountProcessor,
                org.apache.spark.sql.streaming.TimeMode.None(),
                org.apache.spark.sql.streaming.OutputMode.Append(),
                histKv)
            val q = counted.toDF().writeStream.format("parquet")
              .option("path", out)
              .option("checkpointLocation", s"$base/ck")
              .outputMode("append")
              .trigger(Trigger.AvailableNow()).start()
            q.awaitTermination()
          }
          ev.filter(col("ts") >= cut && col("ts") < cut2)
            .write.mode("append").parquet(landing)
          Q.withStreamStatePartitions(s, landing) {
            runPass()
            ev.filter(col("ts") >= cut2).write.mode("append").parquet(landing)
            runPass()
          }
        } finally {
          provWas match {
            case Some(v) => s.conf.set(provKey, v)
            case None => s.conf.unset(provKey)
          }
        }
        s.read.parquet(out)
      },
      """WITH h AS (SELECT user_id, COUNT(*)::BIGINT AS n FROM events
        |  WHERE ts < TIMESTAMP '2024-01-21 00:00:00' GROUP BY 1),
        |s1 AS (SELECT user_id, COUNT(*)::BIGINT AS n FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-21 00:00:00'
        |    AND ts < TIMESTAMP '2024-01-26 00:00:00' GROUP BY 1),
        |s2 AS (SELECT user_id, COUNT(*)::BIGINT AS n FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-26 00:00:00' GROUP BY 1)
        |SELECT s1.user_id, 0::BIGINT AS batch_seq,
        |  (COALESCE(h.n, 0) + s1.n)::BIGINT AS cum_events
        |FROM s1 LEFT JOIN h USING (user_id)
        |UNION ALL
        |SELECT s2.user_id,
        |  (CASE WHEN s1.user_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS batch_seq,
        |  (COALESCE(h.n, 0) + COALESCE(s1.n, 0) + s2.n)::BIGINT AS cum_events
        |FROM s2 LEFT JOIN s1 USING (user_id) LEFT JOIN h USING (user_id)""".stripMargin),

    // q139: STREAMING content dedup for a crawl pipeline — the
    // LLM-pipeline exact-dedup operator (q40) held continuously across
    // two crawl drops with a checkpoint restart between them:
    //   drop 1: the corpus, pre-deduped per drop (min doc_id per
    //     content hash — each drop lands hash-unique, the realistic
    //     per-crawl local dedup, and what keeps within-batch keeper
    //     choice deterministic);
    //   drop 2: doc_id%5==0 pages re-crawled UNCHANGED (same hash —
    //     must be dropped by dedup STATE surviving the restart) and
    //     doc_id%5==1 pages re-crawled with changed content (new hash —
    //     must append with batch_seq 1).
    // Plain dropDuplicates keys the state on the content hash alone —
    // unbounded by design here (the corpus IS the keyspace); a
    // time-bounded crawl would use dropDuplicatesWithinWatermark like
    // q114. DuckDB recomputes the two-drop first-wins as batch SQL.
    decl("q139_streaming_content_dedup",
      (s, d) => {
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q139_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        val store = s"$base/store"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val docs = t(s, d, "documents")
        def dropFrame(df: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id"), md5(col("text")).as("content_md5"))
          .groupBy("content_md5").agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), col("content_md5"))
        val drop1 = dropFrame(docs)
        val drop2 = dropFrame(
          docs.where(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
            .unionByName(docs.where(col("doc_id") % 5 === 1)
              .select((col("doc_id") + 1000000L).as("doc_id"),
                concat(col("text"), lit(" updated")).as("text"))))
        def processAvailable(): Unit = {
          val stream = s.readStream
            .schema("doc_id LONG, content_md5 STRING").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream.dropDuplicates("content_md5"), s"$base/ck",
            trigger = Some(Trigger.AvailableNow())) { (batch, bid) =>
            batch.withColumn("batch_seq", lit(bid))
              .write.mode("append").parquet(store)
          }
          q.awaitTermination()
        }
        drop1.write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          drop2.write.mode("append").parquet(landing)
          processAvailable()
        }
        s.read.parquet(store).select("doc_id", "content_md5", "batch_seq")
      },
      """WITH k1 AS (SELECT md5(text) AS h, MIN(doc_id) AS doc_id, 1 AS seq
        |           FROM documents GROUP BY 1),
        |d2 AS (SELECT md5(text) AS h, doc_id + 1000000 AS doc_id
        |       FROM documents WHERE doc_id % 5 = 0
        |       UNION ALL
        |       SELECT md5(text || ' updated') AS h, doc_id + 1000000 AS doc_id
        |       FROM documents WHERE doc_id % 5 = 1),
        |k2 AS (SELECT h, MIN(doc_id) AS doc_id, 2 AS seq FROM d2 GROUP BY 1),
        |drops AS (SELECT * FROM k1 UNION ALL SELECT * FROM k2)
        |SELECT doc_id, h AS content_md5, (seq - 1)::BIGINT AS batch_seq
        |FROM drops
        |QUALIFY row_number() OVER (PARTITION BY h ORDER BY seq) = 1""".stripMargin),

    // q143: STREAMING version delta — the T4/J6 batch diff
    // (Delta.entityHash/diff) held continuously: each landed drop is a
    // full version snapshot; foreachBatch hashes the version's entities,
    // diffs against the PREVIOUS version's persisted hash table, and
    // emits (version, id, ADD/MOD/DEL) — zavod's delta exporter
    // semantics, but incremental: no drop ever re-reads prior drops'
    // statements, and the carried state is one (id, hash) row per live
    // entity. Drop 2 exercises all three ops: k%7==0 orders change
    // their status value (MOD), k%7==1 orders vanish (DEL), k%7==2
    // orders spawn a fresh satellite entity (ADD), everything else is
    // byte-identical and must emit NOTHING. The checkpoint restart
    // between drops proves version continuity (batch ids continue).
    // DuckDB reconstructs both snapshots and diffs them as batch SQL by
    // comparing sorted (prop=value) lists — hash equality on the Spark
    // side must agree exactly with list equality on the oracle side.
    decl("q143_streaming_version_delta",
      (s, d) => {
        import graft.streaming.StatementStream
        import graft.model.Statement
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q143_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val T1 = "2026-01-01 00:00:00"
        def stmts(rows: org.apache.spark.sql.DataFrame, eid: org.apache.spark.sql.Column,
            prop: String, value: org.apache.spark.sql.Column) =
          rows.select(
            md5(concat_ws("|", eid, lit(prop), value)).as("id"),
            eid.as("entityId"), eid.as("canonicalId"),
            lit(prop).as("prop"), lit("Thing").as("schema"),
            value.as("value"), lit("stream").as("dataset"),
            lit("en").as("lang"), lit("crawl").as("origin"),
            value.as("originalValue"),
            lit(T1).cast("timestamp").as("firstSeen"),
            lit(T1).cast("timestamp").as("lastSeen"),
            lit(false).as("external"))
            .select(Statement.sparkSchema.map(f => col(f.name).cast(f.dataType)): _*)
        val o = t(s, d, "orders")
        val k = col("o_orderkey")
        val oid = concat(lit("o"), k.cast("string"))
        val nid = concat(lit("n"), k.cast("string"))
        val drop1 = stmts(o, oid, "status", col("o_orderstatus"))
          .unionByName(stmts(o, oid, "priority", col("o_orderpriority")))
        val o2 = o.filter(k % 7 =!= 1)
        val drop2 = stmts(o2, oid, "status",
            when(k % 7 === 0, concat(col("o_orderstatus"), lit("_x")))
              .otherwise(col("o_orderstatus")))
          .unionByName(stmts(o2, oid, "priority", col("o_orderpriority")))
          .unionByName(stmts(o.filter(k % 7 === 2), nid, "status", lit("NEW")))
        def processAvailable(): Unit = {
          val stream = s.readStream.schema(Statement.sparkSchema)
            // one batch per drop: the whole drop in a single trigger, so
            // each micro-batch is exactly one version snapshot
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = StatementStream.foreachBatchSink(stream, s"$base/ck",
            trigger = Some(Trigger.AvailableNow())) { (batch, bid) =>
            StatementStream.versionDeltaBatch(batch, bid,
              s"$base/hashes", s"$base/ops")
          }
          q.awaitTermination()
        }
        drop1.write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          drop2.write.mode("append").parquet(landing)
          processAvailable()
        }
        s.read.parquet(s"$base/ops/v*").select("version", "id", "op")
      },
      """WITH v0 AS (
        |  SELECT 'o' || o_orderkey::VARCHAR AS id, 'status' AS prop,
        |    o_orderstatus AS value FROM orders
        |  UNION ALL
        |  SELECT 'o' || o_orderkey::VARCHAR, 'priority', o_orderpriority FROM orders),
        |v1 AS (
        |  SELECT 'o' || o_orderkey::VARCHAR AS id, 'status' AS prop,
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_orderstatus || '_x'
        |         ELSE o_orderstatus END AS value
        |  FROM orders WHERE o_orderkey % 7 != 1
        |  UNION ALL
        |  SELECT 'o' || o_orderkey::VARCHAR, 'priority', o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 != 1
        |  UNION ALL
        |  SELECT 'n' || o_orderkey::VARCHAR, 'status', 'NEW'
        |  FROM orders WHERE o_orderkey % 7 = 2),
        |h0 AS (SELECT id, list_sort(list(prop || '=' || value)) AS pairs
        |       FROM v0 GROUP BY id),
        |h1 AS (SELECT id, list_sort(list(prop || '=' || value)) AS pairs
        |       FROM v1 GROUP BY id)
        |SELECT 0::BIGINT AS version, id, 'ADD' AS op FROM h0
        |UNION ALL
        |SELECT 1::BIGINT, h0.id, 'DEL' FROM h0 LEFT JOIN h1 ON h0.id = h1.id
        |WHERE h1.id IS NULL
        |UNION ALL
        |SELECT 1::BIGINT, h1.id, 'ADD' FROM h1 LEFT JOIN h0 ON h1.id = h0.id
        |WHERE h0.id IS NULL
        |UNION ALL
        |SELECT 1::BIGINT, h1.id, 'MOD' FROM h1 JOIN h0 ON h1.id = h0.id
        |WHERE h1.pairs != h0.pairs""".stripMargin),

    // q167: the KMV sketch AS STREAMING STATE — per event type, the
    // running distinct-user estimate held across two event drops with a
    // checkpoint restart between them. The carried state is the sketch
    // itself (<= k rows per group), updated by the sketch's defining
    // merge law: k-smallest(state ∪ batch) = sketch of the whole stream
    // so far — bounded state with a PROVABLE relationship to the full
    // history, which is exactly why sketches exist in streaming
    // engines. Per-batch state and report versions are overwritten
    // keyed on the batch id (at-least-once safe, the q143 idempotency
    // contract). The oracle replays both cumulative sketches (drop 1,
    // drop 1 ∪ drop 2) by ranking distinct hashes in SQL.
    // q176: BLOOM-GATED streaming dedup — the runtime filter composed
    // into the stream. The carried state is (a) the exact seen-key set
    // and (b) a bloom bitset over it, rebuilt incrementally per batch
    // by the bitset's own merge law (bit_or of word frames). Each batch
    // probes the bloom FIRST: rows the bloom rejects are provably
    // unseen (no false negatives) and skip the exact anti-join
    // entirely; only maybe-seen rows pay it. The bloom changes COST,
    // never semantics — so the oracle is the plain two-drop first-wins
    // dedup, and the hash match proves the optimization is invisible.
    // Emitted rows also carry the per-batch probe accounting
    // (n_bloom_maybe vs n_in), making the saved exact-join volume
    // visible in the oracle-checked output.
    // q194: STREAMING semantic dedup against the PERSISTED ANN index —
    // the online-serving twin of the batch semanticDedupIvf (q189),
    // composing q193's frozen-quantizer store with the q139/q176
    // foreachBatch state protocol. The index trains ONCE on the base
    // embeddings; each arriving micro-batch is assigned to its frozen
    // top-1 cell and dropped iff θ-close (0.8) to an already-accepted
    // vector in that cell or to a smaller-id batch peer there (the
    // relational within-batch rule — AnnIndex.dedupBatch's contract);
    // kept vectors join the accepted set for every later batch.
    //   drop 1 (batch 0): near-copies of every 50th base vector (+1e6,
    //     ±0.002 — must drop against the INDEX) + synthetic axis
    //     vectors for every 25th id (+3e6 — novel, must be kept);
    //   drop 2 (batch 1, after a checkpoint restart): near-copies of
    //     drop 1's novel vectors (+4e6 — must drop against STREAMING
    //     STATE accepted in batch 0, proving state survives the
    //     restart) + q189-style +2e6 copies of every 100th base (must
    //     drop against the index) + fresh axis vectors on a different
    //     axis map for every 60th id (+5e6 — kept).
    // Per-batch state is the versioned accepted/v<bid> store (prev ∪
    // kept, overwrite-per-batch — idempotent under re-delivery, the
    // q176 protocol); decisions land in out/v<bid>. The oracle replays
    // the whole lifecycle: quantizer trained on the base, both drops
    // assigned to the frozen cells, both decision rounds and the state
    // carry computed as batch SQL.
    decl("q194_streaming_semantic_dedup",
      (s, d) => {
        import graft.operators.{AnnIndex, Snapshot}
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q194_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val root = s"$base/index"
        AnnIndex.build(s, root, emb, dim = 64, commitMillis = 1000L)
        val idx = Snapshot.readCurrent(s, root)
        val cents = idx.filter(col("kind") === "c")
          .select(col("centroid_id"), col("vec").as("cvec"))
          .localCheckpoint() // broadcast-sized; pin before streaming reuse
        val members = idx.filter(col("kind") === "m")
          .select(col("id"), col("vec"), col("centroid_id"))
        // synthetic novel vectors: one dominant axis per id + small
        // deterministic wiggle — replayed verbatim by the oracle
        def axisVec(mult: Int, shift: Int) =
          transform(sequence(lit(0L), lit(63L)), dc =>
            when(dc === pmod(col("vec_id") * mult + shift, lit(64L)), lit(1.0))
              .otherwise(lit(0.01) * pmod(col("vec_id") + dc, lit(5L))))
        def nearCopy(vec: org.apache.spark.sql.Column) =
          transform(vec, (x, i) =>
            x + when(i % 2 === 0, lit(0.002)).otherwise(lit(-0.002)))
        val drop1 = emb.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            nearCopy(col("embedding")).cast("array<double>").as("vec"))
          .unionByName(emb.filter(col("vec_id") % 25 === 0)
            .select((col("vec_id") + 3000000L).as("vec_id"),
              axisVec(7, 0).as("vec")))
        val drop2 = emb.filter(col("vec_id") % 25 === 0)
          .select((col("vec_id") + 4000000L).as("vec_id"),
            nearCopy(axisVec(7, 0)).as("vec"))
          .unionByName(emb.filter(col("vec_id") % 100 === 0)
            .select((col("vec_id") + 2000000L).as("vec_id"),
              transform(col("embedding"), (x, i) =>
                x + when(i % 3 === 0, lit(0.003)).otherwise(lit(-0.001)))
                .cast("array<double>").as("vec")))
          .unionByName(emb.filter(col("vec_id") % 60 === 0)
            .select((col("vec_id") + 5000000L).as("vec_id"),
              axisVec(11, 3).as("vec")))
        def processAvailable(): Unit = {
          val stream = s.readStream.schema("vec_id LONG, vec ARRAY<DOUBLE>")
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream, s"$base/ck",
            trigger = Some(Trigger.AvailableNow())) { (batch, bid) =>
            val sp = batch.sparkSession
            val prevPath = new org.apache.hadoop.fs.Path(s"$base/accepted/v${bid - 1}")
            val accepted =
              if (bid > 0 && fs.exists(prevPath))
                sp.read.parquet(prevPath.toString)
                  .select("id", "vec", "centroid_id")
              else members
            val decisions = AnnIndex.dedupBatch(cents, accepted,
                batch.select(col("vec_id"), col("vec")), theta = 0.8)
              .localCheckpoint() // decide once; both writes reuse it
            decisions
              .select(col("id").as("vec_id"), lit(bid).as("batch_seq"),
                col("status"), col("matched_id"))
              .write.mode("overwrite").parquet(s"$base/out/v$bid")
            accepted
              .unionByName(decisions.filter(col("status") === "kept")
                .select(col("id"), col("vec"), col("centroid_id")))
              .write.mode("overwrite").parquet(s"$base/accepted/v$bid")
          }
          q.awaitTermination()
        }
        drop1.write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          drop2.write.mode("append").parquet(landing)
          processAvailable()
        }
        s.read.parquet(s"$base/out/v*")
          .select("vec_id", "batch_seq", "status", "matched_id")
      },
      s"""WITH eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |hs AS (SELECT vec_id, v, ${sqlHash60("vec_id::VARCHAR")} AS h FROM eb),
        |c0 AS (SELECT centroid_id, cvec FROM (
        |  SELECT row_number() OVER (ORDER BY h, vec_id)::BIGINT - 1 AS centroid_id,
        |         v AS cvec FROM hs)
        |  WHERE centroid_id < ${graft.operators.Similarity.kFor(500L)}),
        |a1 AS (
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT eb.vec_id AS id, eb.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY eb.vec_id
        |        ORDER BY list_cosine_similarity(eb.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM eb CROSS JOIN c0 c)
        |  WHERE crank = 1),
        |c1 AS (
        |  SELECT centroid_id,
        |    list_transform(generate_series(1, 64),
        |      d -> list_reduce(list_transform(vs, x -> x[d]),
        |             (acc, x) -> acc + x) / len(vs)) AS cvec
        |  FROM (SELECT centroid_id, list(vec ORDER BY id) AS vs
        |        FROM a1 GROUP BY centroid_id)),
        |a2 AS (
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT eb.vec_id AS id, eb.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY eb.vec_id
        |        ORDER BY list_cosine_similarity(eb.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM eb CROSS JOIN c1 c)
        |  WHERE crank = 1),
        |c2 AS (
        |  SELECT centroid_id,
        |    list_transform(generate_series(1, 64),
        |      d -> list_reduce(list_transform(vs, x -> x[d]),
        |             (acc, x) -> acc + x) / len(vs)) AS cvec
        |  FROM (SELECT centroid_id, list(vec ORDER BY id) AS vs
        |        FROM a2 GROUP BY centroid_id)),
        |mv AS (
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT eb.vec_id AS id, eb.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY eb.vec_id
        |        ORDER BY list_cosine_similarity(eb.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM eb CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |ax1 AS (SELECT vec_id + 3000000 AS vec_id, v FROM (
        |  SELECT vec_id,
        |    list_transform(generate_series(0, 63),
        |      d -> CASE WHEN d = (vec_id * 7) % 64 THEN 1.0::DOUBLE
        |           ELSE 0.01::DOUBLE * ((vec_id + d) % 5) END) AS v
        |  FROM eb WHERE vec_id % 25 = 0)),
        |d1 AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 2 = 0
        |                   THEN 0.002::DOUBLE ELSE -0.002::DOUBLE END)) AS v
        |  FROM eb WHERE vec_id % 50 = 0
        |  UNION ALL SELECT vec_id, v FROM ax1),
        |ad1 AS (
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT d1.vec_id AS id, d1.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY d1.vec_id
        |        ORDER BY list_cosine_similarity(d1.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM d1 CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |m1 AS (
        |  SELECT b.id, MIN(m.id) AS matched_id
        |  FROM ad1 b JOIN mv m USING (centroid_id)
        |  WHERE list_cosine_similarity(b.vec, m.vec) >= 0.8 GROUP BY 1
        |  UNION ALL
        |  SELECT b.id, MIN(p.id) AS matched_id
        |  FROM ad1 b JOIN ad1 p USING (centroid_id)
        |  WHERE p.id < b.id
        |    AND list_cosine_similarity(b.vec, p.vec) >= 0.8 GROUP BY 1),
        |dec1 AS (
        |  SELECT b.id, MIN(m1.matched_id) AS matched_id
        |  FROM ad1 b LEFT JOIN m1 ON b.id = m1.id GROUP BY 1),
        |acc1 AS (SELECT id, vec, centroid_id FROM mv
        |  UNION ALL
        |  SELECT b.id, b.vec, b.centroid_id FROM ad1 b
        |  JOIN dec1 ON b.id = dec1.id WHERE dec1.matched_id IS NULL),
        |d2 AS (
        |  SELECT vec_id - 3000000 + 4000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 2 = 0
        |                   THEN 0.002::DOUBLE ELSE -0.002::DOUBLE END)) AS v
        |  FROM ax1
        |  UNION ALL
        |  SELECT vec_id + 2000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 3 = 0
        |                   THEN 0.003::DOUBLE ELSE -0.001::DOUBLE END)) AS v
        |  FROM eb WHERE vec_id % 100 = 0
        |  UNION ALL
        |  SELECT vec_id + 5000000 AS vec_id, v FROM (
        |    SELECT vec_id,
        |      list_transform(generate_series(0, 63),
        |        d -> CASE WHEN d = (vec_id * 11 + 3) % 64 THEN 1.0::DOUBLE
        |             ELSE 0.01::DOUBLE * ((vec_id + d) % 5) END) AS v
        |    FROM eb WHERE vec_id % 60 = 0)),
        |ad2 AS (
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT d2.vec_id AS id, d2.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY d2.vec_id
        |        ORDER BY list_cosine_similarity(d2.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM d2 CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |m2 AS (
        |  SELECT b.id, MIN(m.id) AS matched_id
        |  FROM ad2 b JOIN acc1 m USING (centroid_id)
        |  WHERE list_cosine_similarity(b.vec, m.vec) >= 0.8 GROUP BY 1
        |  UNION ALL
        |  SELECT b.id, MIN(p.id) AS matched_id
        |  FROM ad2 b JOIN ad2 p USING (centroid_id)
        |  WHERE p.id < b.id
        |    AND list_cosine_similarity(b.vec, p.vec) >= 0.8 GROUP BY 1),
        |dec2 AS (
        |  SELECT b.id, MIN(m2.matched_id) AS matched_id
        |  FROM ad2 b LEFT JOIN m2 ON b.id = m2.id GROUP BY 1)
        |SELECT id AS vec_id, 0::BIGINT AS batch_seq,
        |  CASE WHEN matched_id IS NULL THEN 'kept' ELSE 'dropped' END AS status,
        |  matched_id
        |FROM dec1
        |UNION ALL
        |SELECT id AS vec_id, 1::BIGINT AS batch_seq,
        |  CASE WHEN matched_id IS NULL THEN 'kept' ELSE 'dropped' END AS status,
        |  matched_id
        |FROM dec2""".stripMargin),

    decl("q176_streaming_bloom_dedup",
      (s, d) => {
        import graft.operators.{Bloom, Dedup}
        val m = 1 << 16; val kk = 3
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q176_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val docs = t(s, d, "documents")
        def dropFrame(df: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id"), md5(col("text")).as("content_md5"))
          .groupBy("content_md5").agg(min(col("doc_id")).as("doc_id"))
          .select(col("doc_id"), col("content_md5"))
        val drop1 = dropFrame(docs)
        // drop 2: doc_id%5==0 unchanged re-crawls (must dedup against
        // STATE through the bloom), %5==1 changed content (must pass)
        val drop2 = dropFrame(
          docs.where(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
            .unionByName(docs.where(col("doc_id") % 5 === 1)
              .select((col("doc_id") + 1000000L).as("doc_id"),
                concat(col("text"), lit(" fresh")).as("text"))))
        def processAvailable(): Unit = {
          val stream = s.readStream.schema("doc_id LONG, content_md5 STRING")
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream, s"$base/ck",
            trigger = Some(Trigger.AvailableNow())) { (batch, bid) =>
            val sp = batch.sparkSession
            val seenPath = new org.apache.hadoop.fs.Path(s"$base/seen/v${bid - 1}")
            val havePrev = bid > 0 && fs.exists(seenPath)
            val seen =
              if (havePrev) sp.read.parquet(seenPath.toString)
              else batch.select(col("content_md5")).limit(0)
            val in = batch.withColumn("h",
              Dedup.hash60(concat(lit("sbf|"), col("content_md5"))))
            val bits = Bloom.buildBits(
              seen.withColumn("h",
                Dedup.hash60(concat(lit("sbf|"), col("content_md5"))))
                .select(col("h")),
              col("h"), m, kk, "sbf")
            val probed = Bloom.mightContain(in, col("h"), bits, m, kk, "sbf")
              .localCheckpoint() // probe once; reused for stats + both branches
            // coalesce: sum over an empty re-delivered batch is null
            val counts = probed.agg(count(lit(1)).as("n_in"),
              coalesce(sum(when(col("bloom_pass"), 1L).otherwise(0L)), lit(0L))
                .as("n_maybe"))
              .head()
            // bloom-rejected rows are PROVABLY unseen; only maybe-seen
            // rows pay the exact anti-join against the state table
            val fresh = probed.where(!col("bloom_pass"))
              .unionByName(probed.where(col("bloom_pass"))
                .join(seen, Seq("content_md5"), "left_anti"))
              .select(col("doc_id"), col("content_md5"))
              // within-batch keeper (drops are pre-deduped; keep min id
              // for determinism under re-delivery)
              .groupBy("content_md5").agg(min("doc_id").as("doc_id"))
              // both the out/ and seen/ writes read this frame — the
              // barrier keeps the exact-join from running twice
              .localCheckpoint()
            fresh
              .withColumn("batch_seq", lit(bid))
              .withColumn("n_in", lit(counts.getLong(0)))
              .withColumn("n_bloom_maybe", lit(counts.getLong(1)))
              .write.mode("overwrite").parquet(s"$base/out/v$bid")
            seen.select("content_md5")
              .unionByName(fresh.select("content_md5")).distinct()
              .write.mode("overwrite").parquet(s"$base/seen/v$bid")
          }
          q.awaitTermination()
        }
        drop1.write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          drop2.write.mode("append").parquet(landing)
          processAvailable()
        }
        s.read.parquet(s"$base/out/v*")
          .select("batch_seq", "doc_id", "content_md5", "n_in", "n_bloom_maybe")
      },
      s"""WITH k1 AS (SELECT md5(text) AS h, MIN(doc_id) AS doc_id
         |           FROM documents GROUP BY 1),
         |d2 AS (SELECT md5(text) AS h, doc_id + 1000000 AS doc_id
         |       FROM documents WHERE doc_id % 5 = 0
         |       UNION ALL
         |       SELECT md5(text || ' fresh') AS h, doc_id + 1000000 AS doc_id
         |       FROM documents WHERE doc_id % 5 = 1),
         |k2 AS (SELECT h, MIN(doc_id) AS doc_id FROM d2 GROUP BY 1),
         |f2 AS (SELECT k2.h, k2.doc_id FROM k2 LEFT JOIN k1 ON k2.h = k1.h
         |       WHERE k1.h IS NULL),
         |-- the bloom accounting: batch-2 probes drop-2's keys against a
         |-- bitset built from drop-1's keys with the same hash arithmetic
         |pos1 AS (${(0 until 3).map(j =>
             s"SELECT ${sqlHash60(s"('sbf$j|' || ${sqlHash60("('sbf|' || h)")}::VARCHAR)")} % 65536 AS p FROM k1")
             .mkString("\n  UNION ALL ")}),
         |wrd AS (SELECT p // 32 AS w, bit_or(1::BIGINT << (p % 32)) AS bits
         |        FROM pos1 GROUP BY 1),
         |pr AS (SELECT k2.h, ${sqlHash60("('sbf|' || h)")} AS hh FROM k2),
         |fl AS (SELECT pr.h,
         |  ${(0 until 3).map(j =>
             s"COALESCE((w$j.bits & (1::BIGINT << (p$j % 32))) != 0, FALSE)")
             .mkString(" AND ")} AS pass
         |  FROM (SELECT h, hh, ${(0 until 3).map(j =>
             s"${sqlHash60(s"('sbf$j|' || hh::VARCHAR)")} % 65536 AS p$j")
             .mkString(", ")} FROM pr) pr
         |  ${(0 until 3).map(j =>
             s"LEFT JOIN wrd w$j ON p$j // 32 = w$j.w").mkString("\n  ")}),
         |acc AS (SELECT (SELECT COUNT(*) FROM k2)::BIGINT AS n_in2,
         |        (SELECT SUM(CASE WHEN pass THEN 1 ELSE 0 END) FROM fl)::BIGINT AS n_maybe2,
         |        (SELECT COUNT(*) FROM k1)::BIGINT AS n_in1)
         |SELECT 0::BIGINT AS batch_seq, doc_id, h AS content_md5,
         |  acc.n_in1 AS n_in, 0::BIGINT AS n_bloom_maybe FROM k1, acc
         |UNION ALL
         |SELECT 1::BIGINT, doc_id, h, acc.n_in2, acc.n_maybe2 FROM f2, acc""".stripMargin),

    decl("q167_streaming_kmv",
      (s, d) => {
        import graft.operators.Dedup
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q167_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val ev = t(s, d, "events").select(col("event_id"), col("event_type"),
          Dedup.hash60(concat(lit("skmv|"), col("user_id").cast("string"))).as("h"))
        val drop1 = ev.where(col("event_id") % 2 === 0).select("event_type", "h")
        val drop2 = ev.where(col("event_id") % 2 === 1).select("event_type", "h")
        def processAvailable(): Unit = {
          val stream = s.readStream.schema("event_type STRING, h LONG")
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream, s"$base/ck",
            trigger = Some(Trigger.AvailableNow())) { (batch, bid) =>
            val sp = batch.sparkSession
            val prevPath = new org.apache.hadoop.fs.Path(s"$base/state/v${bid - 1}")
            val prev =
              if (bid > 0 && fs.exists(prevPath))
                sp.read.parquet(prevPath.toString)
              else batch.select(col("event_type"), col("h")).limit(0)
            // merge law: the k smallest distinct of (state ∪ batch) IS
            // the sketch of everything either side has ever seen
            val kept = prev.unionByName(batch.select("event_type", "h"))
              .distinct()
              .withColumn("rk", row_number().over(
                org.apache.spark.sql.expressions.Window
                  .partitionBy("event_type").orderBy("h")))
              .where(col("rk") <= 64).select("event_type", "h")
            kept.write.mode("overwrite").parquet(s"$base/state/v$bid")
            sp.read.parquet(s"$base/state/v$bid")
              .groupBy("event_type")
              .agg(graft.functions.Sketches.kmvDistinct(col("h"), 64).as("s"))
              .select(lit(bid).as("batch_seq"), col("event_type"),
                col("s.est_distinct").as("est_distinct"),
                col("s.kth_hash").as("kth_hash"), col("s.n_kept").as("n_kept"))
              .write.mode("overwrite").parquet(s"$base/reports/v$bid")
          }
          q.awaitTermination()
        }
        drop1.write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          drop2.write.mode("append").parquet(landing)
          processAvailable()
        }
        s.read.parquet(s"$base/reports/v*")
          .select("batch_seq", "event_type", "est_distinct", "kth_hash", "n_kept")
      },
      s"""WITH e1 AS (SELECT DISTINCT event_type,
         |  ${PipelineQueries.sqlHash60("('skmv|' || user_id::VARCHAR)")} AS h
         |  FROM events WHERE event_id % 2 = 0),
         |e12 AS (SELECT DISTINCT event_type,
         |  ${PipelineQueries.sqlHash60("('skmv|' || user_id::VARCHAR)")} AS h
         |  FROM events),
         |r1 AS (SELECT event_type, h,
         |       row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk FROM e1),
         |r2 AS (SELECT event_type, h,
         |       row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk FROM e12),
         |k1 AS (SELECT event_type, MAX(CASE WHEN rk <= 64 THEN h END) AS kth_hash,
         |       LEAST(COUNT(*), 64)::INT AS n_kept FROM r1 GROUP BY 1),
         |k2 AS (SELECT event_type, MAX(CASE WHEN rk <= 64 THEN h END) AS kth_hash,
         |       LEAST(COUNT(*), 64)::INT AS n_kept FROM r2 GROUP BY 1),
         |u AS (SELECT 0::BIGINT AS batch_seq, * FROM k1
         |      UNION ALL SELECT 1::BIGINT, * FROM k2)
         |SELECT batch_seq, event_type,
         |  CASE WHEN n_kept < 64 THEN n_kept::BIGINT
         |       ELSE CAST((63::HUGEINT * ${1L << 60}::HUGEINT) // kth_hash AS BIGINT)
         |  END AS est_distinct,
         |  kth_hash, n_kept
         |FROM u""".stripMargin),

    // q200: STREAMING incremental view maintenance — the CDC-consumer
    // side of the q196→q199 family. Micro-batches ARE change feeds
    // (drop 1: the initial load as inserts; drop 2: mergeCow's
    // writer-side feed), and foreachBatch folds each into a versioned
    // view store: view/v<bid> = applySumCountDelta(view/v<bid-1>,
    // batch). Overwrite-per-batch keyed on bid (the q176 protocol) —
    // idempotent under at-least-once re-delivery; the stream RESTARTS
    // from its checkpoint between drops. The oracle is the same full
    // recompute that gates the batch path (q199), so stream and batch
    // maintenance are hash-proven to converge to the same state.
    // Scale shape: per batch, one change-sized shuffle + a view-sized
    // merge — the table itself is never rescanned by the stream.
    decl("q200_streaming_ivm",
      (s, d) => {
        import graft.operators.{Ivm, Snapshot}
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q200_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val (target, source, m1) = LayoutQueries.mergeFixture(t(s, d, "lineitem"))
        val drop1 = target.select(col("key"),
          lit("insert").as("change_type"),
          lit(null).cast("double").as("value_before"),
          col("qty").as("value_after"))
        val (_, _, changes) = Snapshot.mergeCow(target, source, m1,
          valCol = "qty", version = 2L, insertFiles = 2)
        val drop2 = changes
          .select(col("key"), col("change_type"),
            col("value_before"), col("value_after"))
        def processAvailable(): Unit = {
          val stream = s.readStream.schema(
            "key LONG, change_type STRING, value_before DOUBLE, value_after DOUBLE")
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream, s"$base/ck",
            trigger = Some(Trigger.AvailableNow())) { (batch, bid) =>
            val sp = batch.sparkSession
            val prevPath = new org.apache.hadoop.fs.Path(s"$base/view/v${bid - 1}")
            val prev =
              if (bid > 0 && fs.exists(prevPath))
                sp.read.parquet(prevPath.toString)
              else sp.range(0).select(col("id").as("group"),
                lit(0).cast("decimal(30,12)").as("sum_val"), lit(0L).as("n"))
            Ivm.applySumCountDelta(prev, batch, expr("key div 1024"))
              .write.mode("overwrite").parquet(s"$base/view/v$bid")
          }
          q.awaitTermination()
        }
        drop1.write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          drop2.write.mode("append").parquet(landing)
          processAvailable()
        }
        s.read.parquet(s"$base/view/v1")
          .select(col("group").as("grp"),
            col("sum_val").cast("double").as("sum_qty"), col("n"))
      },
      LayoutQueries.ivmViewOracle),

    // q205: STREAMING CDC ingestion into the versioned store ITSELF —
    // the Debezium→lakehouse pattern that closes the loop (q200
    // maintains a downstream VIEW; this maintains the TABLE). Each
    // micro-batch of keyed ops applies through mergeCow against the
    // CURRENT snapshot and publishes via commitCas as version bid+1;
    // re-delivery is absorbed by the forward-only rule (a batch whose
    // version is already behind CURRENT is skipped — the q176
    // idempotency protocol restated for CAS), and the stream RESTARTS
    // from its checkpoint between drops. The two drops split the merge
    // source by key parity — disjoint op sets, so the composed final
    // state must equal ONE merge of the whole source: the oracle is
    // the same full recompute that gates q199/q200, now also proving
    // sequential COW merges compose. Scale shape per batch: touch-set
    // semi-join + banded rewrite + O(manifest) publish — never a table
    // rewrite.
    decl("q205_streaming_cdc_merge",
      (s, d) => {
        import graft.operators.Snapshot
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q205_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val root = s"$base/store"
        val (target, source, m1) = LayoutQueries.mergeFixture(t(s, d, "lineitem"))
        Snapshot.commitCas(s, root, expected = -1L, target,
          m1.withColumn("version", lit(0L)))
        val drop1 = source.filter(pmod(col("key"), lit(2L)) === 0)
        val drop2 = source.filter(pmod(col("key"), lit(2L)) === 1)
        def processAvailable(): Unit = {
          val stream = s.readStream.schema("key LONG, op STRING, qty DOUBLE")
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream, s"$base/ck",
            trigger = Some(Trigger.AvailableNow())) { (batch, bid) =>
            val sp = batch.sparkSession
            val curV = Snapshot.currentVersion(sp, root).drop(1).toLong
            // forward-only idempotency: a re-delivered batch whose
            // version already published is a no-op
            if (curV < bid + 1) {
              val cur = Snapshot.readCurrent(sp, root)
              val man = sp.read.parquet(s"$root/manifest/v$curV")
              val (m2, rows2, _) = Snapshot.mergeCow(cur, batch, man,
                valCol = "qty", version = curV + 1, insertFiles = 2)
              Snapshot.commitCas(sp, root, curV, rows2, m2)
            }
          }
          q.awaitTermination()
        }
        drop1.write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          drop2.write.mode("append").parquet(landing)
          processAvailable()
        }
        val fin = Snapshot.currentVersion(s, root).drop(1).toLong
        Snapshot.readCurrent(s, root)
          .groupBy(expr("key div 1024").as("grp"))
          .agg(sum(col("qty").cast("decimal(30,12)")).cast("double").as("sum_qty"),
            count(lit(1)).as("n"))
          .withColumn("version", lit(fin))
      },
      LayoutQueries.ivmViewOracle.replace(
          "SELECT key // 1024 AS grp,",
          "SELECT 2::BIGINT AS version, key // 1024 AS grp,")
        .replace("FROM rows2 GROUP BY 1", "FROM rows2 GROUP BY 2")),

    q268Decl,

    // q274 (round-13): STREAMING write–audit–publish — the q269 branch
    // protocol as the per-micro-batch ingestion QA gate (the pattern a
    // production lakehouse runs: every arriving batch is STAGED to a
    // branch, audited against the published state, and fast-forwarded
    // into main only if it passes; a poisoned batch costs ZERO main-line
    // churn — main's pointer never moves, readers never see it).
    // Audit rule: reject a batch if >20% of its rows exceed 3× the
    // CURRENT PUBLISHED mean — so the threshold evolves with the
    // published state and the oracle must replay the batches in order,
    // carrying each batch's accept/reject into the next threshold.
    // Batch 1 is poisoned (values ×10 → ~85% violations → rejected);
    // batches 0 and 2 are clean (~5% → published). Re-delivery is
    // absorbed by a per-batch delivery claim (claimVersion CAS on a
    // side namespace — production folds the claim into the publish
    // commit itself; the checkpoint already makes AvailableNow
    // exactly-once, the claim is the crash-replay belt). Final state
    // sums ride the integer-cents gate.
    decl("q274_streaming_wap",
      (s, d) => {
        import graft.operators.Snapshot
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q274_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val root = s"$base/store"
        val ev = Q.events(s, d).select(col("event_id"), col("value"))
        def mani(df: org.apache.spark.sql.DataFrame, v: Long) =
          Snapshot.manifestEntriesBy(df, pmod(col("event_id"), lit(8)),
            col("event_id"), version = v)
        val init = ev.filter(expr("event_id % 4 = 3"))
        Snapshot.commitCas(s, root, expected = -1L, init, mani(init, 0L),
          commitMillis = 1000L)
        def processAvailable(): Unit = {
          val stream = s.readStream.schema("event_id LONG, value DOUBLE")
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream, s"$base/ck",
            trigger = Some(Trigger.AvailableNow())) { (batch, bid) =>
            val sp = batch.sparkSession
            if (Snapshot.claimVersion(sp, s"$base/delivery", bid)) {
              val br = s"wap_b$bid"
              Snapshot.createBranch(sp, root, br)
              val cur = Snapshot.readCurrent(sp, root)
              val staged = cur.unionByName(batch)
              Snapshot.commitToBranch(sp, root, br, staged,
                mani(staged, bid + 1), commitMillis = 1000L * (bid + 2))
              val thr = cur.agg((lit(3.0) *
                  (sum(col("value").cast("decimal(30,12)")).cast("double")
                    / count(lit(1)))).as("hi"))
                .collect()(0).getDouble(0)
              val nb = batch.count()
              val viol = batch.filter(col("value") > thr).count()
              val publish = viol * 5 <= nb
              if (publish) Snapshot.publishBranch(sp, root, br)
              import sp.implicits._
              Seq((bid, nb, viol, if (publish) 1L else 0L))
                .toDF("bid", "batch_rows", "violations", "published")
                .coalesce(1).write.mode("append").parquet(s"$base/audit")
            }
          }
          q.awaitTermination()
        }
        val b0 = ev.filter(expr("event_id % 4 = 0"))
        val b1 = ev.filter(expr("event_id % 4 = 1"))
          .select(col("event_id"), (col("value") * lit(10.0)).as("value"))
        val b2 = ev.filter(expr("event_id % 4 = 2"))
        b0.write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          b1.write.mode("append").parquet(landing); processAvailable()
          b2.write.mode("append").parquet(landing); processAvailable()
        }
        val fin = Snapshot.currentVersion(s, root).drop(1).toLong
        val audits = s.read.parquet(s"$base/audit")
          .select(concat(lit("batch_"), col("bid")).as("phase"),
            col("batch_rows").as("a"), col("violations").as("b"),
            col("published").as("c"))
        val state = Snapshot.readCurrent(s, root)
          .agg(count(lit(1)).as("a"),
            (sum(col("value").cast("decimal(14,2)").cast("decimal(30,12)"))
              * lit(100)).cast("long").as("b"))
          .select(lit("final").as("phase"), col("a"), col("b"),
            lit(fin).as("c"))
        audits.unionByName(state)
      },
      """WITH ev AS (SELECT event_id, value FROM events),
        |init AS (SELECT * FROM ev WHERE event_id % 4 = 3),
        |b0 AS (SELECT * FROM ev WHERE event_id % 4 = 0),
        |b1 AS (SELECT event_id, value * 10.0 AS value FROM ev
        |       WHERE event_id % 4 = 1),
        |b2 AS (SELECT * FROM ev WHERE event_id % 4 = 2),
        |t0 AS (SELECT 3.0 * (CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE)
        |       / COUNT(*)) AS hi FROM init),
        |a0 AS (SELECT (SELECT COUNT(*) FROM b0)::BIGINT AS nb,
        |       (SELECT COUNT(*) FROM b0, t0 WHERE value > hi)::BIGINT AS viol),
        |p0 AS (SELECT nb, viol, (viol * 5 <= nb) AS pub FROM a0),
        |s1 AS (SELECT * FROM init UNION ALL
        |       SELECT b0.* FROM b0, p0 WHERE p0.pub),
        |t1 AS (SELECT 3.0 * (CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE)
        |       / COUNT(*)) AS hi FROM s1),
        |a1 AS (SELECT (SELECT COUNT(*) FROM b1)::BIGINT AS nb,
        |       (SELECT COUNT(*) FROM b1, t1 WHERE value > hi)::BIGINT AS viol),
        |p1 AS (SELECT nb, viol, (viol * 5 <= nb) AS pub FROM a1),
        |s2 AS (SELECT * FROM s1 UNION ALL
        |       SELECT b1.* FROM b1, p1 WHERE p1.pub),
        |t2 AS (SELECT 3.0 * (CAST(SUM(CAST(value AS DECIMAL(30,12))) AS DOUBLE)
        |       / COUNT(*)) AS hi FROM s2),
        |a2 AS (SELECT (SELECT COUNT(*) FROM b2)::BIGINT AS nb,
        |       (SELECT COUNT(*) FROM b2, t2 WHERE value > hi)::BIGINT AS viol),
        |p2 AS (SELECT nb, viol, (viol * 5 <= nb) AS pub FROM a2),
        |s3 AS (SELECT * FROM s2 UNION ALL
        |       SELECT b2.* FROM b2, p2 WHERE p2.pub),
        |ver AS (SELECT CASE WHEN p2.pub THEN 3
        |               WHEN p1.pub THEN 2
        |               WHEN p0.pub THEN 1 ELSE 0 END::BIGINT AS v
        |        FROM p0, p1, p2)
        |SELECT 'batch_0' AS phase, nb AS a, viol AS b,
        |  CASE WHEN pub THEN 1 ELSE 0 END::BIGINT AS c FROM p0
        |UNION ALL
        |SELECT 'batch_1', nb, viol, CASE WHEN pub THEN 1 ELSE 0 END::BIGINT FROM p1
        |UNION ALL
        |SELECT 'batch_2', nb, viol, CASE WHEN pub THEN 1 ELSE 0 END::BIGINT FROM p2
        |UNION ALL
        |SELECT 'final', COUNT(*)::BIGINT,
        |  (SUM(CAST(value::DECIMAL(14,2) AS DECIMAL(30,12))) * 100)::BIGINT,
        |  (SELECT v FROM ver)
        |FROM s3""".stripMargin),

    // q289 (round-14): STREAMING HLL — the per-group distinct sketch
    // (q286) maintained as the stream's persisted state: each
    // micro-batch's registers max-merge into a versioned register
    // table (overwrite-per-batch keyed on bid — the q176/q200
    // idempotency protocol), the stream RESTARTS from its checkpoint
    // between two drops, and the final report off the MAINTAINED state
    // must hash-equal the one-pass batch sketch the q286 oracle
    // replays — merge-associativity proven through checkpoint
    // restart, not just in a spec. State is O(groups·m) regardless of
    // stream length — the property that makes a distinct-users-per-
    // type dashboard maintainable forever at 100 TB/day.
    decl("q289_streaming_hll",
      (s, d) => {
        import graft.operators.Hll
        val p = 8
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q289_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val ev = Q.events(s, d).select(col("event_type"), col("user_id"))
        def processAvailable(): Unit = {
          val stream = s.readStream
            .schema("event_type STRING, user_id LONG")
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream, s"$base/ck",
            trigger = Some(Trigger.AvailableNow())) { (batch, bid) =>
            val sp = batch.sparkSession
            val prevPath = new org.apache.hadoop.fs.Path(s"$base/sk/v${bid - 1}")
            val prev =
              if (bid > 0 && fs.exists(prevPath))
                sp.read.parquet(prevPath.toString)
              else sp.range(0).select(col("id").cast("string").as("grp"),
                col("id").as("reg"), col("id").as("mreg"))
            Hll.merge(prev,
                Hll.registers(batch, col("event_type"), col("user_id"), p))
              .write.mode("overwrite").parquet(s"$base/sk/v$bid")
          }
          q.awaitTermination()
        }
        ev.filter(col("user_id") % 2 === 0).write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          ev.filter(col("user_id") % 2 =!= 0).write.mode("append").parquet(landing)
          processAvailable()
        }
        Hll.report(s.read.parquet(s"$base/sk/v1"), p)
          .select(col("grp").as("event_type"), col("n_registers_set"),
            col("register_sum"), col("harmonic_num"), col("est_distinct"))
      },
      s"""WITH ev AS (SELECT event_type, user_id FROM events),
         |h AS (SELECT event_type, ${sqlHash60("user_id::VARCHAR")} AS h FROM ev),
         |r AS (SELECT event_type, h % 256 AS reg, h // 256 AS s FROM h),
         |rho AS (SELECT event_type, reg,
         |        CASE WHEN s = 0 THEN 53
         |             ELSE bit_count((s & -s) - 1) + 1 END AS rho FROM r),
         |mreg AS (SELECT event_type, reg, MAX(rho)::BIGINT AS mr
         |         FROM rho GROUP BY 1, 2),
         |agg AS (SELECT event_type, COUNT(*)::BIGINT AS n_registers_set,
         |        SUM(mr)::BIGINT AS register_sum,
         |        SUM(1::BIGINT << (53 - mr)::INT)::BIGINT AS setnum
         |        FROM mreg GROUP BY 1)
         |SELECT agg.event_type, agg.n_registers_set, agg.register_sum,
         |  (agg.setnum + (256 - agg.n_registers_set)
         |     * (1::BIGINT << 53))::BIGINT AS harmonic_num,
         |  ${PipelineQueries.sqlHllEstCase(256L, 53,
              "agg.n_registers_set", "agg.setnum")} AS est_distinct
         |FROM agg""".stripMargin)
  )

  // ---- q268 oracle building blocks (the ADC replay, reused per batch)

  /** Per-(query, sub, code) ADC lookup table of a (id, vec) batch CTE
    * against the frozen cb2 codebooks — ip = ⟨qsub, code⟩ and
    * cn2 = |code|², the two terms the decode sums. */
  private def q268Lut(name: String, batch: String): String =
    s"""$name AS (SELECT q.id AS query_id, c.sub, c.code,
    list_reduce(list_transform(generate_series(1, 8),
      j -> q.svec[j] * c.cvec[j]), (a, b) -> a + b) AS ip,
    list_reduce(list_transform(generate_series(1, 8),
      j -> c.cvec[j] * c.cvec[j]), (a, b) -> a + b) AS cn2
  FROM (SELECT id, x.sub AS sub, x.svec AS svec FROM (
    SELECT id, unnest(list_transform(generate_series(0, 7), s ->
      {'sub': s, 'svec': list_transform(generate_series(1, 8),
                           j -> vec[s * 8 + j])})) AS x
    FROM $batch)) q
  JOIN cb2 c USING (sub))"""

  /** ADC scores of a batch CTE's queries against the accepted members'
    * packed codes in the query's top-1 cell — exact DECIMAL partial
    * sums, 4-bit decode (pq_code >> 4s) & 15, the queryPqFrame
    * arithmetic. */
  private def q268Adc(name: String, batch: String, members: String,
      codes: String, lut: String): String =
    s"""$name AS (SELECT d.query_id, d.mid,
    SUM(l.ip::DECIMAL(30,12)) AS ddot, SUM(l.cn2::DECIMAL(30,12)) AS dn2
  FROM (SELECT b.id AS query_id, m.id AS mid,
          unnest(generate_series(0, 7)) AS sub, pk.pq_code
        FROM $batch b JOIN $members m USING (centroid_id)
        JOIN $codes pk ON m.id = pk.id) d
  JOIN $lut l ON d.query_id = l.query_id AND d.sub = l.sub
    AND ((d.pq_code >> (4 * d.sub)) & 15) = l.code
  GROUP BY 1, 2)"""

  /** ADC top-r candidates per query (score desc, id tie-break). */
  private def q268Rank(name: String, scored: String, r: Int): String =
    s"""$name AS (SELECT query_id, mid FROM (
  SELECT query_id, mid, row_number() OVER (PARTITION BY query_id
    ORDER BY (ddot::DOUBLE / sqrt(dn2::DOUBLE)) DESC, mid) AS arank
  FROM $scored) WHERE arank <= $r)"""

  /** Packed PQ codes of a kept (id, vec) CTE against the FROZEN cb2
    * codebooks — the appendPq encode step. */
  private def q268Encode(name: String, kept: String): String =
    s"""$name AS (SELECT id,
    SUM(code * (1::BIGINT << (4 * sub)))::BIGINT AS pq_code FROM (
  SELECT s.id, s.sub, c.code,
    row_number() OVER (PARTITION BY s.id, s.sub ORDER BY
      (2.0 * list_reduce(list_transform(generate_series(1, 8),
         j -> s.svec[j] * c.cvec[j]), (a, b) -> a + b)
       - list_reduce(list_transform(generate_series(1, 8),
         j -> c.cvec[j] * c.cvec[j]), (a, b) -> a + b)) DESC,
      c.code) AS rk
  FROM (SELECT id, x.sub AS sub, x.svec AS svec FROM (
    SELECT id, unnest(list_transform(generate_series(0, 7), s ->
      {'sub': s, 'svec': list_transform(generate_series(1, 8),
                           j -> vec[s * 8 + j])})) AS x
    FROM $kept)) s
  JOIN cb2 c USING (sub)) WHERE rk = 1 GROUP BY id)"""

  // q268: STREAMING semantic dedup where the accepted state IS the
  // persisted IVFPQ INDEX — the round-12 verdict's composition ask.
  // q194 proved the streaming protocol against the FULL-VECTOR index
  // (every accepted member costs ~520 B on the probe's scoring path);
  // here the same two-drop/checkpoint-restart lifecycle runs against
  // buildPq/appendPq: each micro-batch is decided by the q235 ADC +
  // exact-re-rank path (AnnIndex.dedupBatchPq — accepted members cost
  // ~8 B of packed code until the top-r fetch), and KEPT vectors
  // re-enter the index itself through appendPq (codes composed against
  // the frozen codebooks), so batch 1 dedups against batch 0's
  // survivors via their CODES — state lives in the versioned index
  // store, not a side table. r = 8 on ~23-member cells so the ADC
  // ranking genuinely gates the candidate pool (r = 50 would cover
  // whole cells at this fixture scale and degenerate to q194).
  // At-least-once: batch bid publishes index version bid+2; a
  // re-delivered batch sees currentVersion >= bid+2 and no-ops (the
  // q205 forward-only idempotency rule). The oracle replays the ENTIRE
  // lifecycle in SQL: both quantizer trainings (pqTrainCtes), both
  // drops' synthetic vectors, per-batch LUT → ADC → top-r → exact
  // θ-test → min-id decision, the within-batch peer rule, and the
  // frozen-codebook encode of batch 0's survivors feeding batch 1.
  private def q268Decl: Decl =
    decl("q268_streaming_dedup_ivfpq",
      (s, d) => {
        import graft.operators.{AnnIndex, Snapshot}
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q268_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val emb = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val root = s"$base/index"
        AnnIndex.buildPq(s, root, emb, dim = 64, m = 8, pqK = 16,
          commitMillis = 1000L)
        def axisVec(mult: Int, shift: Int) =
          transform(sequence(lit(0L), lit(63L)), dc =>
            when(dc === pmod(col("vec_id") * mult + shift, lit(64L)), lit(1.0))
              .otherwise(lit(0.01) * pmod(col("vec_id") + dc, lit(5L))))
        def nearCopy(vec: org.apache.spark.sql.Column) =
          transform(vec, (x, i) =>
            x + when(i % 2 === 0, lit(0.002)).otherwise(lit(-0.002)))
        val drop1 = emb.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            nearCopy(col("embedding")).cast("array<double>").as("vec"))
          .unionByName(emb.filter(col("vec_id") % 25 === 0)
            .select((col("vec_id") + 3000000L).as("vec_id"),
              axisVec(7, 0).as("vec")))
        val drop2 = emb.filter(col("vec_id") % 25 === 0)
          .select((col("vec_id") + 4000000L).as("vec_id"),
            nearCopy(axisVec(7, 0)).as("vec"))
          .unionByName(emb.filter(col("vec_id") % 100 === 0)
            .select((col("vec_id") + 2000000L).as("vec_id"),
              transform(col("embedding"), (x, i) =>
                x + when(i % 3 === 0, lit(0.003)).otherwise(lit(-0.001)))
                .cast("array<double>").as("vec")))
          .unionByName(emb.filter(col("vec_id") % 60 === 0)
            .select((col("vec_id") + 5000000L).as("vec_id"),
              axisVec(11, 3).as("vec")))
        def processAvailable(): Unit = {
          val stream = s.readStream.schema("vec_id LONG, vec ARRAY<DOUBLE>")
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream, s"$base/ck",
            trigger = Some(Trigger.AvailableNow())) { (batch, bid) =>
            val sp = batch.sparkSession
            val curV = Snapshot.currentVersion(sp, root).drop(1).toLong
            // forward-only idempotency: batch bid publishes v(bid+2)
            if (curV < bid + 2) {
              val idx = Snapshot.readCurrent(sp, root)
              val decisions = AnnIndex.dedupBatchPq(idx,
                  batch.select(col("vec_id"), col("vec")), theta = 0.8,
                  dim = 64, m = 8, pqK = 16, r = 8)
                .localCheckpoint() // decide once; both writes reuse it
              decisions
                .select(col("id").as("vec_id"), lit(bid).as("batch_seq"),
                  col("status"), col("matched_id"))
                .write.mode("overwrite").parquet(s"$base/out/v$bid")
              AnnIndex.appendPq(sp, root,
                decisions.filter(col("status") === "kept")
                  .select(col("id"), col("vec")),
                dim = 64, m = 8, pqK = 16, commitMillis = 2000L + bid)
            }
          }
          q.awaitTermination()
        }
        drop1.write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          drop2.write.mode("append").parquet(landing)
          processAvailable()
        }
        s.read.parquet(s"$base/out/v*")
          .select("vec_id", "batch_seq", "status", "matched_id")
      },
      PipelineQueries.pqTrainCtes(16) + s""",
        |ax1 AS (SELECT vec_id + 3000000 AS vec_id, v FROM (
        |  SELECT vec_id,
        |    list_transform(generate_series(0, 63),
        |      d -> CASE WHEN d = (vec_id * 7) % 64 THEN 1.0::DOUBLE
        |           ELSE 0.01::DOUBLE * ((vec_id + d) % 5) END) AS v
        |  FROM eb WHERE vec_id % 25 = 0)),
        |d1 AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 2 = 0
        |                   THEN 0.002::DOUBLE ELSE -0.002::DOUBLE END)) AS v
        |  FROM eb WHERE vec_id % 50 = 0
        |  UNION ALL SELECT vec_id, v FROM ax1),
        |ad1 AS (
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT d1.vec_id AS id, d1.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY d1.vec_id
        |        ORDER BY list_cosine_similarity(d1.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM d1 CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |${q268Lut("lut1", "ad1")},
        |${q268Adc("sc1", "ad1", "mv", "packed", "lut1")},
        |${q268Rank("r1", "sc1", 8)},
        |m1 AS (
        |  SELECT b.id, MIN(r1.mid) AS matched_id
        |  FROM ad1 b JOIN r1 ON b.id = r1.query_id
        |  JOIN mv m ON r1.mid = m.id
        |  WHERE list_cosine_similarity(b.vec, m.vec) >= 0.8 GROUP BY 1
        |  UNION ALL
        |  SELECT b.id, MIN(p.id) AS matched_id
        |  FROM ad1 b JOIN ad1 p USING (centroid_id)
        |  WHERE p.id < b.id
        |    AND list_cosine_similarity(b.vec, p.vec) >= 0.8 GROUP BY 1),
        |dec1 AS (
        |  SELECT b.id, MIN(m1.matched_id) AS matched_id
        |  FROM ad1 b LEFT JOIN m1 ON b.id = m1.id GROUP BY 1),
        |k1 AS (SELECT b.id, b.vec, b.centroid_id FROM ad1 b
        |       JOIN dec1 ON b.id = dec1.id WHERE dec1.matched_id IS NULL),
        |${q268Encode("pk1", "k1")},
        |acc1 AS (SELECT id, vec, centroid_id FROM mv
        |  UNION ALL
        |  SELECT id, vec, centroid_id FROM k1),
        |apk1 AS (SELECT id, pq_code FROM packed
        |  UNION ALL
        |  SELECT id, pq_code FROM pk1),
        |d2 AS (
        |  SELECT vec_id - 3000000 + 4000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 2 = 0
        |                   THEN 0.002::DOUBLE ELSE -0.002::DOUBLE END)) AS v
        |  FROM ax1
        |  UNION ALL
        |  SELECT vec_id + 2000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 3 = 0
        |                   THEN 0.003::DOUBLE ELSE -0.001::DOUBLE END)) AS v
        |  FROM eb WHERE vec_id % 100 = 0
        |  UNION ALL
        |  SELECT vec_id + 5000000 AS vec_id, v FROM (
        |    SELECT vec_id,
        |      list_transform(generate_series(0, 63),
        |        d -> CASE WHEN d = (vec_id * 11 + 3) % 64 THEN 1.0::DOUBLE
        |             ELSE 0.01::DOUBLE * ((vec_id + d) % 5) END) AS v
        |    FROM eb WHERE vec_id % 60 = 0)),
        |ad2 AS (
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT d2.vec_id AS id, d2.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY d2.vec_id
        |        ORDER BY list_cosine_similarity(d2.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM d2 CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |${q268Lut("lut2", "ad2")},
        |${q268Adc("sc2", "ad2", "acc1", "apk1", "lut2")},
        |${q268Rank("r2", "sc2", 8)},
        |m2 AS (
        |  SELECT b.id, MIN(r2.mid) AS matched_id
        |  FROM ad2 b JOIN r2 ON b.id = r2.query_id
        |  JOIN acc1 m ON r2.mid = m.id
        |  WHERE list_cosine_similarity(b.vec, m.vec) >= 0.8 GROUP BY 1
        |  UNION ALL
        |  SELECT b.id, MIN(p.id) AS matched_id
        |  FROM ad2 b JOIN ad2 p USING (centroid_id)
        |  WHERE p.id < b.id
        |    AND list_cosine_similarity(b.vec, p.vec) >= 0.8 GROUP BY 1),
        |dec2 AS (
        |  SELECT b.id, MIN(m2.matched_id) AS matched_id
        |  FROM ad2 b LEFT JOIN m2 ON b.id = m2.id GROUP BY 1)
        |SELECT id AS vec_id, 0::BIGINT AS batch_seq,
        |  CASE WHEN matched_id IS NULL THEN 'kept' ELSE 'dropped' END AS status,
        |  matched_id
        |FROM dec1
        |UNION ALL
        |SELECT id AS vec_id, 1::BIGINT AS batch_seq,
        |  CASE WHEN matched_id IS NULL THEN 'kept' ELSE 'dropped' END AS status,
        |  matched_id
        |FROM dec2""".stripMargin)
}
