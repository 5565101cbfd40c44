package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Versioned delta computation (A4 + J6/T4): order-insensitive entity
  * hashing and the full-outer diff between two run versions, producing
  * ADD / MOD / DEL operations per entity
  * (zavod/zavod/runtime/delta.py:17-106, exporters/delta.py:11-55).
  */
object Delta {

  val OpAdd = "ADD"
  val OpMod = "MOD"
  val OpDel = "DEL"

  /** A4: deterministic, order-insensitive hash over an entity's sorted
    * (prop, value) pairs (delta.py:46-63). `pairs` is an array<string> of
    * pre-joined "prop=value" strings; sorting makes the hash independent
    * of partitioning and arrival order. */
  def entityHash(id: Column, schema: Column, pairs: Column): Column =
    md5(concat_ws("|", id, schema, concat_ws("|", sort_array(pairs))))

  /** J6: diff two (id, hash) frames into (id, op) with op ∈ ADD/MOD/DEL.
    * A full shuffle join on id — at scale both sides are hash-partitioned
    * on the same key so AQE can plan a sort-merge join with no extra
    * exchange when the inputs are bucketed by id. */
  def diff(prev: DataFrame, curr: DataFrame): DataFrame = {
    val p = prev.toDF("id", "hash").withColumnRenamed("hash", "prev_hash")
    val c = curr.toDF("id", "hash").withColumnRenamed("hash", "curr_hash")
    p.join(c, Seq("id"), "full_outer")
      .withColumn("op",
        when(col("prev_hash").isNull, OpAdd)
          .when(col("curr_hash").isNull, OpDel)
          .when(col("prev_hash") =!= col("curr_hash"), OpMod))
      .filter(col("op").isNotNull)
      .select(col("id"), col("op"))
  }

  /** J5/T5: first_seen preservation — new statements inherit first_seen
    * from the previous run by statement id, else the current run time
    * (zavod/zavod/runtime/timestamps.py:26-65). */
  def preserveFirstSeen(curr: DataFrame, prev: DataFrame, runTime: Column): DataFrame = {
    val prevSeen = prev.select(col("id"), col("firstSeen").as("_prev_first_seen"))
    curr.join(prevSeen, Seq("id"), "left")
      .withColumn("firstSeen", coalesce(col("_prev_first_seen"), runTime))
      .drop("_prev_first_seen")
  }
}
