package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling covers sort-merge
  * joins at runtime; aggregations over power-law keys (one token/entity
  * carrying a large share of all rows — exactly what name tokens and
  * mega-entities do in sanctions data) still funnel one key into one
  * reducer. Salting splits a hot key across `buckets` reducers with a
  * deterministic hash-derived salt, partially aggregates, then merges —
  * two small shuffles instead of one straggler.
  */
object Skew {

  /** Two-phase salted count per key: count rows per `key` with the hot
    * keys spread over `buckets` partial counts. Result: (key, cnt). */
  def saltedCount(df: DataFrame, key: Column, buckets: Int = 16): DataFrame =
    df.select(key.as("key"),
        (xxhash64(monotonically_increasing_id()) % buckets).as("_salt"))
      .groupBy(col("key"), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("cnt"))

  /** Two-phase salted sum: (key, total) of `value` per `key`. */
  def saltedSum(df: DataFrame, key: Column, value: Column, buckets: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("_v"),
        (xxhash64(monotonically_increasing_id()) % buckets).as("_salt"))
      .groupBy(col("key"), col("_salt"))
      .agg(sum(col("_v")).as("_partial"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("total"))

  /** Salted collect_set: exact distinct values per key without one
    * reducer holding a hot key's whole set during the merge. */
  def saltedCollectSet(df: DataFrame, key: Column, value: Column,
      buckets: Int = 16): DataFrame =
    df.select(key.as("key"), value.as("_v"),
        (xxhash64(value) % buckets).as("_salt"))
      .groupBy(col("key"), col("_salt"))
      .agg(collect_set(col("_v")).as("_partial"))
      .groupBy(col("key"))
      .agg(array_sort(array_distinct(flatten(collect_list(col("_partial")))))
        .as("values"))

  /** Two-phase salted multi-aggregate rollup with SET semantics: each
    * (name, partialAgg) must produce an array per (key, salt) group;
    * the merge phase unions the partials per key with array_distinct.
    * This is the skew armor for the exporter adjacency rollups
    * (simple.csv / nested / senzing): a hub entity referenced by
    * millions of edge rows is spread over `buckets` phase-1 reducers
    * (salted by `saltBy`, normally the adjacent id) instead of
    * funnelling into one. Exact: result equals the unsalted
    * groupBy(key).agg(...) up to array order, which every consumer
    * sorts or distincts anyway.
    *
    * ADAPTIVE (r6): unconditional salting taxed every skew-free rollup
    * with a second shuffle and the nested-array merge (2.5× on four
    * exporter walls at local scale). A map-side-combined count probe
    * first finds keys at or above `hotThreshold` rows; with NO hot key
    * the rollup is the plain single-shuffle aggregation (plus the
    * probe, whose shuffle is bytes-per-key tiny), and with hot keys
    * only THOSE salt across buckets — cold keys ride salt 0 so phase 1
    * groups match the unsalted layout and phase 2 shuffles ≈ the
    * result size. `hotThreshold = 0` forces the always-salt form.
    *
    * EAGER PROBE: the hot-key probe runs a Spark job AT CALL TIME —
    * this is a transformation-shaped API with one plan-time action
    * inside, and the salt/no-salt decision is frozen into the returned
    * plan. Re-executing that plan later over changed source data keeps
    * the original decision (still exact either way — salting only
    * changes the shuffle layout); callers on streaming or re-executed
    * lineages who need the probe deferred (or skipped) should pass
    * `hotThreshold = 0` to force the static always-salt form. */
  def saltedArrayRollup(
      df: DataFrame, keyCol: String, saltBy: Column,
      aggs: Seq[(String, Column)], buckets: Int = 16,
      hotThreshold: Long = 10000L): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate required")
    def twoPhase(in: DataFrame, salt: Column): DataFrame = {
      val partial = in
        .withColumn("_salt", salt)
        .groupBy(col(keyCol), col("_salt"))
        .agg(aggs.head._2.as(aggs.head._1),
          aggs.tail.map { case (n, c) => c.as(n) }: _*)
      def merge(n: String): Column =
        array_distinct(flatten(collect_list(col(n)))).as(n)
      partial.groupBy(col(keyCol))
        .agg(merge(aggs.head._1), aggs.tail.map { case (n, _) => merge(n) }: _*)
    }
    if (hotThreshold <= 0)
      return twoPhase(df, pmod(xxhash64(saltBy), lit(buckets)))
    // Probe contract: this re-evaluates `df` once, column-pruned to the
    // key (a count per key, map-side combined — its shuffle is bytes-
    // per-key tiny). Callers should hand in a frame whose expensive
    // lineage is cached — every exporter call site derives the edge
    // frame from the persisted entities frame, so the probe pays one
    // narrow self-join, not a full re-assembly.
    val hotKeys = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= hotThreshold)
      .select(col(keyCol), lit(true).as("_hot"))
    if (hotKeys.isEmpty) {
      // no skew: ONE shuffle, normalized like the merge phase so both
      // paths are value-identical after the consumers' sort/distinct
      df.groupBy(col(keyCol))
        .agg(array_distinct(aggs.head._2).as(aggs.head._1),
          aggs.tail.map { case (n, c) => array_distinct(c).as(n) }: _*)
    } else {
      twoPhase(df.join(broadcast(hotKeys), Seq(keyCol), "left"),
        when(col("_hot"), pmod(xxhash64(saltBy), lit(buckets)))
          .otherwise(lit(0L)))
    }
  }
}
