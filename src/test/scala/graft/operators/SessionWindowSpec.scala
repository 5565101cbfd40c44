package graft.operators

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the semantics q246/q247 rely on:
  *
  *  - Spark's session_window merges on TOUCH — an event arriving
  *    exactly `gap` after the previous one extends the SAME session
  *    (measured here, not assumed), so the DuckDB oracle's
  *    new-session test must be `delta > gap` (not `>=`);
  *  - the native session_window aggregation is row-for-row equivalent
  *    to the portable lag/cumsum gaps-and-islands form;
  *  - cacheEvictOldest removes exactly the n oldest rows under the
  *    prefix (deterministic under timestamp ties via the url
  *    tie-break) and nothing else.
  */
class SessionWindowSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long)]) = {
    // (user_id, offset_seconds) -> events-like frame
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, off), i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + off * 1000L), u)
    }.toDF("event_id", "ts", "user_id")
  }

  test("exact-gap event extends the session; gap+1s starts a new one") {
    val gap = 1800L // 30 min in seconds
    val df = ev(Seq((1L, 0L), (1L, gap), (1L, gap + gap + 1L), (2L, 0L)))
    // user 1: e1 exactly 30:00 after e0 -> SAME session (touch merges);
    // e2 30:01 after e1 -> new session. The oracle rule is `> gap`.
    val sessions = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions(1L) === 2L,
      "touch must merge and strictly-past-gap must split (DuckDB oracle uses > gap)")
    assert(sessions(2L) === 1L)
  }

  test("native session_window equals the lag/cumsum gaps-and-islands form") {
    // pseudo-random offsets spanning many gap boundaries, several users
    val rows = (0 until 400).map { i =>
      val u = (i * 2654435761L % 7L).abs
      val off = (i * 1103515245L + 12345L) % 100000L
      (u, off.abs)
    }
    val df = ev(rows)
    val native = df
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_event"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("last_event"), col("n_events"))
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val manual = df
      .withColumn("prev", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - col("prev") > 1800L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("new_sess")).over(
        Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("last_event"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start"), col("last_event"), col("n_events"))
    assert(native.exceptAll(manual).isEmpty && manual.exceptAll(native).isEmpty,
      "session_window must agree with the portable lag/cumsum sessionization")
  }

  test("cacheEvictOldest evicts exactly the n oldest under the prefix") {
    import spark.implicits._
    val cache = Seq(
      ("https://externals.example.org/a", "2024-01-01"),
      ("https://externals.example.org/b", "2024-01-02"),
      ("https://externals.example.org/c", "2024-01-02"), // tie with b
      ("https://externals.example.org/d", "2024-01-03"),
      ("https://data.example.org/old", "2020-01-01") // older but wrong prefix
    ).toDF("url", "fetched_at")
      .withColumn("fetched_at", to_date(col("fetched_at")))
    val out = Sources.cacheEvictOldest(cache, "https://externals.example.org/", 2)
      .select("url").as[String].collect().sorted.toSeq
    // victims: a (oldest) then b (tie on date broken by url) — c,d survive
    assert(out === Seq("https://data.example.org/old",
      "https://externals.example.org/c", "https://externals.example.org/d"))
  }
}
