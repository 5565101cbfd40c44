package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast for ITERATION-STATE frames — guide §3.1 ("pick
  * the join strategy deliberately") + §2.4 ("remove shuffles outright")
  * applied to the engine's iterative operators.
  *
  * Every iterative operator here cuts lineage per round with
  * `localCheckpoint`, so round state reaches Catalyst as an RDD-backed
  * leaf with NO size statistics: the planner prices it at
  * `defaultSizeInBytes` (effectively infinite) and picks a sort-merge
  * join every time. The persisted edge frame is then re-shuffled and
  * re-sorted EVERY round against a state frame that is often a few
  * thousand rows (a 30-seed BFS frontier, a per-round label frame, a
  * rank vector). The operator — unlike the planner — knows the state is
  * materialized, so counting it costs one metadata-cheap job; with the
  * count in hand it makes the broadcast decision itself, which is
  * exactly the manual join-strategy rule the optimization guide
  * prescribes when statistics cannot reach the planner.
  *
  * The gate is ROW-COUNTED, never guessed:
  *  - `rowsCap` defaults to 2,000,000 rows (~64 MB at 32 B of long-keyed
  *    state per row — the same order as the session's 64 MB
  *    autoBroadcastJoinThreshold);
  *  - `spark.graft.iterBroadcastRows` overrides it per session (a
  *    cluster with small executors lowers it; 0 disables the hint
  *    entirely and restores the pre-round-16 all-shuffle plans);
  *  - the decision re-evaluates EVERY round, so a growing frontier
  *    falls back to the shuffle plan the moment it outgrows the cap —
  *    scale behaviour is graceful, not cliff-edged.
  *
  * Only sides that are legal build sides for the join type in question
  * are ever wrapped (inner: either; left outer / left anti: right side).
  */
object IterState {
  val ConfKey = "spark.graft.iterBroadcastRows"
  val DefaultCap = 2000000L

  def cap(df: DataFrame): Long =
    df.sparkSession.conf.getOption(ConfKey).map(_.toLong).getOrElse(DefaultCap)

  /** Count-gated broadcast hint. `df` must be cheap to count — i.e.
    * checkpointed/persisted, or a narrow projection/filter of such a
    * frame; the count is the price of the decision. */
  def bcastIfSmall(df: DataFrame): DataFrame = {
    val c = cap(df)
    if (c > 0 && df.count() <= c) broadcast(df) else df
  }

  /** Broadcast hint gated on a row bound the CALLER already holds (an
    * agg/probe output bounded by a frame counted earlier) — spends no
    * extra job. */
  def bcastIf(df: DataFrame, knownRowsBound: Long): DataFrame =
    if ({ val c = cap(df); c > 0 && knownRowsBound <= c }) broadcast(df) else df
}
