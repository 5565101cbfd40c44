package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance over the snapshot store's change feed —
  * the consumer that makes [[Snapshot.mergeCow]]'s CDF worth emitting.
  *
  * A downstream aggregate (per-group sum/count — the canonical
  * self-maintainable view) is kept current by applying the row-level
  * change feed instead of rescanning the table: classic delta rules
  * (insert → +v/+1, delete → −v/−1, update → (after−before)/0),
  * aggregated per group and outer-merged into the stored view.
  *
  * Scale shape — the whole point at 100 TB: maintenance cost is
  * O(|changes| + |groups touched|), never O(|table|). The change feed
  * shuffles once on group (it is change-sized); the stored view is
  * group-cardinality-sized, so the merge join moves view rows, not
  * table rows. A full recompute after a point update rescans 100 TB;
  * this applies a kilobyte.
  *
  * Float discipline (the q150/q198 idiom): the view's running sum is
  * carried as DECIMAL(30,12) — exact and order-independent across
  * partitions, executors, and engines — so incremental and recomputed
  * views are bit-identical, not approximately equal. The caller
  * presents it as double at the edge.
  *
  * Reference analog: the statistics exporter recomputes facet counts
  * from scratch every crawl (`zavod/zavod/exporters/statistics.py`);
  * at warehouse scale the same numbers fall out of the delta stream.
  */
object Ivm {

  private val Dec = "decimal(30,12)"

  /** Build the materialized (group, sum_val, n) view from scratch —
    * the initial state and the recompute arm the spec checks against.
    * `groupOf` is evaluated over `rows`. */
  def buildSumCount(rows: DataFrame, groupOf: Column, valueCol: String): DataFrame =
    rows.groupBy(groupOf.as("group"))
      .agg(sum(col(valueCol).cast(Dec)).as("sum_val"),
        count(lit(1)).as("n"))

  /** Apply a change feed (key, change_type ∈ insert|update|delete,
    * value_before, value_after — [[Snapshot.mergeCow]]'s writer feed or
    * the q197 reader diff) to a stored view. `groupOf` is evaluated
    * over the CHANGE row (derive the group from the key). Groups whose
    * count reaches zero leave the view; unseen groups enter it. */
  def applySumCountDelta(view: DataFrame, changes: DataFrame,
      groupOf: Column): DataFrame = {
    val d = changes.select(groupOf.as("group"),
        (coalesce(col("value_after").cast(Dec), lit(0).cast(Dec)) -
          coalesce(col("value_before").cast(Dec), lit(0).cast(Dec))).as("_dv"),
        when(col("change_type") === "insert", 1L)
          .when(col("change_type") === "delete", -1L)
          .otherwise(0L).as("_dn"))
      .groupBy("group")
      .agg(sum(col("_dv")).as("_dsum"), sum(col("_dn")).as("_dn"))
    view.join(d, Seq("group"), "full_outer")
      .select(col("group"),
        (coalesce(col("sum_val"), lit(0).cast(Dec)) +
          coalesce(col("_dsum"), lit(0).cast(Dec))).cast(Dec).as("sum_val"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"))
      .filter(col("n") > 0L)
  }

  /** Build the (group, min_val, max_val, n) view from scratch. */
  def buildMinMax(rows: DataFrame, groupOf: Column, valueCol: String): DataFrame =
    rows.groupBy(groupOf.as("group"))
      .agg(min(col(valueCol)).as("min_val"), max(col(valueCol)).as("max_val"),
        count(lit(1)).as("n"))

  /** MIN/MAX maintenance — the honest IVM case: min/max are NOT
    * self-maintainable under deletes (removing the extremum needs the
    * runner-up, which the view doesn't hold). The classic split:
    *
    *  - GROWTH absorbs free: inserts and update-afters fold in as
    *    `least/greatest` against the stored extrema;
    *  - SHRINKAGE dirties: a delete or update whose `value_before`
    *    TOUCHES the group's stored min or max (equality is the exact
    *    rule — removing a non-extremal value cannot move an extremum,
    *    and duplicates only make the recompute a no-op) marks the
    *    group DIRTY, as does any group unseen by the view;
    *  - dirty groups take a TARGETED recompute: `currentRows`
    *    semi-joined to the dirty-group set — O(rows of touched
    *    groups), never O(table).
    *
    * Returns (group, min_val, max_val, n, recomputed) — the flag is
    * the audit trail of which rule fired; callers (and the q204
    * oracle) can count recomputes to bound maintenance cost. Groups
    * whose count reaches zero leave the view. */
  def applyMinMaxDelta(view: DataFrame, changes: DataFrame,
      groupOfChange: Column, currentRows: DataFrame,
      groupOfRows: Column, valueCol: String): DataFrame = {
    val d = changes.select(groupOfChange.as("group"), col("change_type"),
      col("value_before"), col("value_after"))
    val agg = d.groupBy("group").agg(
      min(col("value_after")).as("_in_min"),
      max(col("value_after")).as("_in_max"),
      sum(when(col("change_type") === "insert", 1L)
        .when(col("change_type") === "delete", -1L).otherwise(0L)).as("_dn"),
      max(when(col("change_type").isin("delete", "update"), col("value_before")))
        .as("_rm_max"),
      min(when(col("change_type").isin("delete", "update"), col("value_before")))
        .as("_rm_min"))
    val merged = view.join(agg, Seq("group"), "full_outer")
      .select(col("group"),
        col("min_val"), col("max_val"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"),
        col("_in_min"), col("_in_max"),
        // coalesce each removal test: a group with NO removals yields
        // NULL comparisons, and a null dirty flag would drop the row
        // from BOTH branches
        (col("min_val").isNull ||
          coalesce(col("_rm_min") <= col("min_val"), lit(false)) ||
          coalesce(col("_rm_max") >= col("max_val"), lit(false)))
          .as("_dirty"))
      .filter(col("n") > 0L)
    val clean = merged.filter(!col("_dirty"))
      .select(col("group"),
        least(col("min_val"), coalesce(col("_in_min"), col("min_val"))).as("min_val"),
        greatest(col("max_val"), coalesce(col("_in_max"), col("max_val"))).as("max_val"),
        col("n"), lit(false).as("recomputed"))
    val dirtyGroups = merged.filter(col("_dirty")).select("group")
    val recomputed = currentRows
      .join(broadcast(dirtyGroups.withColumnRenamed("group", "_dg")),
        groupOfRows === col("_dg"), "left_semi")
      .groupBy(groupOfRows.as("group"))
      .agg(min(col(valueCol)).as("min_val"), max(col(valueCol)).as("max_val"),
        count(lit(1)).as("n"))
      .withColumn("recomputed", lit(true))
    clean.unionByName(recomputed)
  }

  /** JOIN-VIEW maintenance — the view is an aggregate over a
    * fact ⋈ dimension join (`SELECT d.attr, SUM(f.val), COUNT(*) FROM
    * fact JOIN dim GROUP BY d.attr`), kept current under BOTH delta
    * kinds a star schema sees, without ever rescanning the fact table:
    *
    *  - FACT INSERTS (`factDelta`): classic delta-join rule — join the
    *    delta (alone) against the post-change dimension and fold the
    *    per-group (+val, +1) deltas in. O(|ΔF|).
    *  - DIMENSION REASSIGNMENTS (`dimChanges`: key, attr_old,
    *    attr_new): the subtle arm. A dim row changing its attribute
    *    MOVES every joined fact row between groups, so the rule needs
    *    the per-changed-key fact totals — obtained by semi-join-scoping
    *    the CURRENT fact table to the changed keys (broadcast — the
    *    change set is metadata-sized) and aggregating ONLY those rows:
    *    O(facts of changed keys), never O(|fact|). Each changed key
    *    emits (attr_old, −t, −n) and (attr_new, +t, +n).
    *
    * Order contract: `factCurrent` is the fact state the view was
    * built from (pre-delta) and `dimNew` the post-change dimension —
    * i.e. the dim change applies first, then the fact inserts land
    * against the updated dim. Sums ride DECIMAL(30,12) throughout, so
    * the maintained view is bit-identical to a recompute over
    * (factCurrent ∪ factDelta) ⋈ dimNew — the q270 gate. Groups whose
    * count reaches zero leave the view; newly seen groups enter. */
  def applyJoinViewDelta(view: DataFrame,
      factDelta: DataFrame, deltaKey: Column, deltaVal: String,
      dimNew: DataFrame, dimNewKey: Column, dimNewAttr: Column,
      dimChanges: DataFrame,
      factCurrent: DataFrame, curKey: Column, curVal: String): DataFrame = {
    val ch = broadcast(dimChanges
      .select(col("key").as("_dkey"), col("attr_old").as("_ao"),
        col("attr_new").as("_an")))
    val touched = factCurrent.join(ch, curKey === col("_dkey"))
      .groupBy(col("_dkey"), col("_ao"), col("_an"))
      .agg(sum(col(curVal).cast(Dec)).as("_t"), count(lit(1)).as("_tn"))
    val dimArm = touched
      .select(col("_ao").as("group"), (-col("_t")).cast(Dec).as("_dv"),
        (-col("_tn")).as("_dn"))
      .unionByName(touched.select(col("_an").as("group"),
        col("_t").cast(Dec).as("_dv"), col("_tn").as("_dn")))
    val factArm = factDelta.join(dimNew, deltaKey === dimNewKey)
      .select(dimNewAttr.as("group"), col(deltaVal).cast(Dec).as("_dv"),
        lit(1L).as("_dn"))
    val d = dimArm.unionByName(factArm).groupBy("group")
      .agg(sum(col("_dv")).as("_dsum"), sum(col("_dn")).as("_dn"))
    view.join(d, Seq("group"), "full_outer")
      .select(col("group"),
        (coalesce(col("sum_val"), lit(0).cast(Dec)) +
          coalesce(col("_dsum"), lit(0).cast(Dec))).cast(Dec).as("sum_val"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n"))
      .filter(col("n") > 0L)
  }
}
