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
    * sorts or distincts anyway. */
  def saltedArrayRollup(
      df: DataFrame, keyCol: String, saltBy: Column,
      aggs: Seq[(String, Column)], buckets: Int = 16): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate required")
    val partial = df
      .withColumn("_salt", pmod(xxhash64(saltBy), lit(buckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    def merge(n: String): Column =
      array_distinct(flatten(collect_list(col(n)))).as(n)
    partial.groupBy(col(keyCol))
      .agg(merge(aggs.head._1), aggs.tail.map { case (n, _) => merge(n) }: _*)
  }
}
