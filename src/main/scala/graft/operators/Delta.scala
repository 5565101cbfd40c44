package graft.operators

import graft.model.Statement
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
    * of partitioning and arrival order. Each pair is hashed BEFORE
    * joining so a value containing the separator cannot make two
    * distinct entities collide (["a|b"] vs ["a","b"]); null id/schema
    * would silently vanish under concat_ws, so they hash as an explicit
    * sentinel instead. */
  def entityHash(id: Column, schema: Column, pairs: Column): Column =
    md5(concat_ws("|",
      coalesce(id, lit("\u0000null")),
      coalesce(schema, lit("\u0000null")),
      concat_ws("|", sort_array(transform(pairs, p => md5(p))))))

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

  /** [[entityHash]] computed DIRECTLY from statements — bit-identical
    * to hashing [[EntityAssembler.assembleColumnar]]'s output (same
    * distinct non-Base (prop, value) pair set, same narrowed schema),
    * without materializing the properties map, the dataset/referent
    * sets, or the seen-range aggregates only to throw them away. Two
    * shuffles either way ((key, prop[, value]) then key), but the
    * payload here is 16-byte pair hashes instead of per-entity value
    * arrays + a map — the q265 compare-packs wall was dominated by
    * exactly that wasted assembly (round-13 brief #5). Returns
    * (entity_id, hash). */
  def entityHashes(statements: DataFrame,
      trustCanonicalId: Boolean = false): DataFrame = {
    val key =
      if (trustCanonicalId) col("canonicalId")
      else when(col("canonicalId").isNotNull && length(col("canonicalId")) > 0,
        col("canonicalId")).otherwise(col("entityId"))
    statements
      .withColumn("_key", key)
      // distinct-pair granularity: collect_set(value) in the assemble
      // dedups per prop; grouping on (key, prop, value) dedups the
      // same pairs while keeping the aggregate mergeable
      .groupBy(col("_key"), col("prop"), col("value"))
      .agg(collect_set(col("schema")).as("schemas"))
      .groupBy(col("_key"))
      .agg(
        // collect_list skips nulls: Base rows and null values carry
        // schema/existence but no pair — same rule as the assemble
        sort_array(collect_list(
          when(col("prop") =!= lit(Statement.Base) && col("value").isNotNull,
            md5(concat(col("prop"), lit("="), col("value"))))))
          .as("_pair_hashes"),
        EntityAssembler.narrowSchemasCol(
          array_distinct(flatten(collect_list(col("schemas"))))).as("_schema"))
      .select(col("_key").as("entity_id"),
        md5(concat_ws("|",
          coalesce(col("_key"), lit("\u0000null")),
          coalesce(col("_schema"), lit("\u0000null")),
          concat_ws("|", col("_pair_hashes")))).as("hash"))
  }

  /** Two-pack entity-level compare — the contrib QA runbook that diffs
    * two statement exports of the SAME dataset at ASSEMBLED-entity
    * granularity (contrib/compare_pack.py:22-133: build a store from
    * each pack, then four dict.items() set differences). Each pack is
    * assembled twice — the INTERNAL view (external = false statements
    * only) and the EXTERNAL view (all statements), the script's
    * `default_view(external=...)` pair — and the sides diff on
    * (id, content hash), exactly items() semantics: an id present in
    * both packs with DIFFERENT content appears in BOTH directions, an
    * id on one side only appears once.
    *
    * Content identity is (schema, properties) via [[entityHash]] —
    * the pack-invariant payload; run timestamps are deliberately NOT
    * part of identity (two crawls of identical content would otherwise
    * diff on every entity, which is the opposite of what the runbook
    * answers: "what CHANGED between these two exports").
    *
    * Returns (view, side, entity_id) with view ∈ internal|external,
    * side ∈ in_a_not_b|in_b_not_a.
    *
    * Scale shape: two [[entityHashes]] aggregations per pack (hash-
    * only — no properties map ever materializes) and ONE full-outer
    * join per view on entity id carrying only 32-byte hashes; at
    * 100 TB the packs diff without any entity's properties crossing
    * the wire at all. */
  def comparePacks(packA: DataFrame, packB: DataFrame): DataFrame = {
    def assembled(pack: DataFrame, tag: String): DataFrame = {
      def view(name: String, df: DataFrame) =
        entityHashes(df)
          .select(lit(name).as("view"), col("entity_id"),
            col("hash").as(s"_h$tag"))
      view("internal", pack.filter(!col("external")))
        .unionByName(view("external", pack))
    }
    assembled(packA, "a")
      .join(assembled(packB, "b"), Seq("view", "entity_id"), "full_outer")
      .select(col("view"), col("entity_id"),
        explode(array(
          when(col("_ha").isNotNull && !(col("_hb") <=> col("_ha")),
            lit("in_a_not_b")),
          when(col("_hb").isNotNull && !(col("_ha") <=> col("_hb")),
            lit("in_b_not_a")))).as("side"))
      .filter(col("side").isNotNull)
      .select(col("view"), col("side"), col("entity_id"))
  }

  /** SCD type-2 dimension build from a change log (round-11): collapse
    * consecutive duplicate values per key, then emit one row per value
    * RUN with its validity interval — the warehouse-standard
    * slowly-changing-dimension shape the first/last_seen columns (T5)
    * are the degenerate case of.
    *
    * `seq` must be strictly unique per key (a change-sequence number,
    * e.g. epoch-derived + a unique id in the low digits) — it orders
    * the log deterministically and serves as the interval bound.
    * Value comparison is null-safe (a null value is a legal state).
    *
    * Scale shape: one shuffle on the key, two window passes over each
    * key's (small) change history — never a self-join, never a global
    * order. Returns (key, value, valid_from, valid_to, is_current)
    * with valid_to null on the open interval. */
  def scd2(changes: DataFrame, key: Column, seq: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("key").orderBy("seq")
    val cp = changes.select(key.as("key"), seq.as("seq"), value.as("value"))
      .withColumn("pv", lag(col("value"), 1).over(w))
      .withColumn("first", row_number().over(w) === 1)
      .where(col("first") || !(col("pv") <=> col("value")))
    cp.withColumn("valid_to", lead(col("seq"), 1).over(w))
      .select(col("key"), col("value"), col("seq").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
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
