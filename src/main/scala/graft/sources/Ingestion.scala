package graft.sources

import graft.functions.{Ids, ValueClean}
import graft.model.Statement
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ingestion façade — the engine's `Context.emit` analog
  * (zavod/zavod/context.py:622-666): source rows become cleaned,
  * deterministically-identified statements.
  *
  * One source row fans out to one statement per mapped property:
  *  - entity_id   = slug from the dataset prefix + source key
  *    (context.py:504-517);
  *  - the value passes the per-type value_clean dispatch (F1) —
  *    rejected values keep a row with a null value and the warning tag,
  *    so the issue log sees them (cleaning.py:166-191);
  *  - statement id = sha1 over (dataset, entity, prop, value) — the
  *    content-hash dedup key (context.py:655-656, tools/util.py:33-35);
  *  - first_seen is inherited from the previous run by statement id
  *    (J5 — runtime/timestamps.py:26-65) via
  *    [[graft.operators.Delta.preserveFirstSeen]].
  *
  * Everything is a column expression — ingestion of a billion rows is
  * one codegen'd projection + explode, no driver loop.
  */
object Ingestion {

  /** One mapped property: source column expression → FtM (schema, prop)
    * with its cleaning type. */
  final case class PropMapping(
      prop: String,
      ptype: String, // value_clean dispatch key: name|date|identifier|...
      value: Column,
      idFormat: String = null,
      lang: String = null)

  /** Emit statements for one entity family in the source frame.
    *
    * @param rows     source rows (one entity per row)
    * @param dataset  dataset name (slug prefix + provenance column)
    * @param schema   FtM schema column (may depend on the row)
    * @param keyParts columns forming the stable entity key
    * @param props    property mappings
    * @param runTime  this run's timestamp
    */
  def emit(
      rows: DataFrame,
      dataset: String,
      schema: Column,
      keyParts: Seq[Column],
      props: Seq[PropMapping],
      runTime: Column): DataFrame = {
    val entityId = Ids.makeSlug(dataset, keyParts: _*)
    val propStructs = props.map { p =>
      // plan-time dispatch: the mapping's type/format are static, so
      // only the relevant cleaning branch enters the plan (codegen'd)
      val cleaned = ValueClean.cleanStatic(p.ptype, p.value, Option(p.idFormat))
      struct(
        lit(p.prop).as("prop"),
        cleaned.getField("clean").as("value"),
        p.value.cast("string").as("original_value"),
        coalesce(cleaned.getField("origin"), lit("crawl")).as("origin"),
        cleaned.getField("warning").as("warning"),
        lit(p.lang).cast("string").as("lang"))
    }
    rows
      .select(entityId.as("entityId"), schema.as("schema"),
        explode(array(propStructs: _*)).as("st"))
      .filter(col("entityId").isNotNull && col("st.original_value").isNotNull)
      .select(
        Ids.makeId("st", lit(dataset), col("entityId"), col("st.prop"),
          coalesce(col("st.value"), lit(""))).as("id"),
        col("entityId"),
        col("entityId").as("canonicalId"),
        col("st.prop").as("prop"),
        col("schema"),
        col("st.value").as("value"),
        lit(dataset).as("dataset"),
        col("st.lang").as("lang"),
        col("st.origin").as("origin"),
        col("st.original_value").as("originalValue"),
        runTime.cast("timestamp").as("firstSeen"),
        runTime.cast("timestamp").as("lastSeen"),
        lit(false).as("external"),
        col("st.warning").as("warning"))
  }

  /** Drop the warning side-channel and conform to the Statement schema
    * (warnings go to the issue log — Validators.issueCounts). */
  def toStatements(emitted: DataFrame): DataFrame =
    emitted.filter(col("value").isNotNull)
      .select(Statement.sparkSchema.map(f => col(f.name)): _*)

  /** A9: crawl stats — entities / statements / warnings per dataset
    * (zavod/zavod/runtime/stats.py, context.py:638-666). */
  def crawlStats(emitted: DataFrame): DataFrame =
    emitted.groupBy(col("dataset"))
      .agg(countDistinct(col("entityId")).as("entities"),
        count(when(col("value").isNotNull, 1)).as("statements"),
        count(col("warning")).as("warnings"))
}
