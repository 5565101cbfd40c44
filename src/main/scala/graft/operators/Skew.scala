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
}
