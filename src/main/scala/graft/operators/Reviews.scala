package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Human/LLM review workflow as state-table set operations
  * (zavod/zavod/stateful/review.py:354-479 `review_extraction`,
  * :481-506 `assert_all_accepted`): automated extractions upsert into a
  * review state keyed by a stable source key; reviewers accept/reject
  * and may edit the extracted data; subsequent crawls refresh or reset
  * rows under the reference's exact precedence rules. The reference
  * runs this row-at-a-time against Postgres; here one crawl's worth of
  * extractions is a frame and the upsert is ONE full-outer equi-join on
  * the key — state and incoming both hash-partition on `key`, so the
  * update scales out and, bucketed by key, replans with no Exchange.
  *
  * Determinism note: the reference stamps wall-clock `modified_at`; this
  * engine records the run version instead (`modified_version`) so state
  * transitions reproduce bit-for-bit — the audit content is the same.
  *
  * State schema: (key, source_value, original_extraction,
  * extracted_data, accepted, crawler_version, origin,
  * last_seen_version, modified_version, modified_by).
  */
object Reviews {

  val ModifiedByCrawler = "crawler"

  /** One crawl's upsert (`review_extraction` applied set-wise).
    * `incoming`: (key, source_value, original_extraction,
    * crawler_version, origin) — one row per extraction this crawl.
    * Precedence per key, exactly the reference's:
    *  - new key → fresh row, extracted := original, accepted :=
    *    `defaultAccepted`;
    *  - crawler_version bumped, OR source AND original both changed →
    *    full reset as if new (drops any acceptance);
    *  - not accepted and original changed → refresh original AND
    *    extracted (unaccepted reviewer edits are overwritten — prompt
    *    improvements outrank unaccepted edits, review.py:455-467);
    *  - otherwise untouched (accepted rows keep reviewer data);
    *  - every matched key gets last_seen_version := `runVersion`;
    *    keys absent from the crawl keep their old last_seen (stale
    *    rows are detectable, never deleted — review.py's soft model).
    */
  def reviewExtraction(state: DataFrame, incoming: DataFrame,
      runVersion: String, defaultAccepted: Boolean = false): DataFrame = {
    // explicit presence markers: deciding row existence off a nullable
    // data column (source_value) would misroute legitimately-NULL
    // values — a state row with NULL source would reset every crawl,
    // and a NULL-source incoming row would skip the last_seen bump and
    // fall out of the unaccepted() export gate
    val st = state.columns.foldLeft(state)((d, c) => d.withColumnRenamed(c, s"s_$c"))
      .withColumnRenamed("s_key", "key")
      .withColumn("s_present", lit(true))
    val in = incoming.columns.foldLeft(incoming)((d, c) => d.withColumnRenamed(c, s"i_$c"))
      .withColumnRenamed("i_key", "key")
      .withColumn("i_present", lit(true))
    val joined = st.join(in, Seq("key"), "full_outer")
    val isNew = col("s_present").isNull
    val stale = col("i_present").isNull
    val reset = col("i_crawler_version") > col("s_crawler_version") ||
      (col("i_source_value") =!= col("s_source_value") &&
        col("i_original_extraction") =!= col("s_original_extraction"))
    val freshUnaccepted = !col("s_accepted") &&
      col("i_original_extraction") =!= col("s_original_extraction")
    def pick(takeIncoming: org.apache.spark.sql.Column,
        i: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column) =
      when(takeIncoming, i).otherwise(s)
    joined.select(
      col("key"),
      // the unaccepted-refresh branch does NOT touch source_value
      // (review.py:455-467 updates extraction fields only)
      pick(isNew || reset,
        col("i_source_value"), col("s_source_value")).as("source_value"),
      pick(isNew || reset || freshUnaccepted && !stale,
        col("i_original_extraction"), col("s_original_extraction"))
        .as("original_extraction"),
      pick(isNew || reset || freshUnaccepted && !stale,
        col("i_original_extraction"), col("s_extracted_data")).as("extracted_data"),
      when(isNew || reset, lit(defaultAccepted))
        .otherwise(col("s_accepted")).as("accepted"),
      pick(isNew || reset, col("i_crawler_version"), col("s_crawler_version"))
        .as("crawler_version"),
      pick(isNew || reset || freshUnaccepted && !stale,
        col("i_origin"), col("s_origin")).as("origin"),
      when(stale, col("s_last_seen_version")).otherwise(lit(runVersion))
        .as("last_seen_version"),
      when(isNew || reset || freshUnaccepted && !stale, lit(runVersion))
        .otherwise(col("s_modified_version")).as("modified_version"),
      when(isNew || reset || freshUnaccepted && !stale, lit(ModifiedByCrawler))
        .otherwise(col("s_modified_by")).as("modified_by"))
  }

  /** Reviewer decisions applied to the state: `decisions` is
    * (key, accepted, extracted_edit, reviewed_by) — `extracted_edit`
    * null keeps the current extracted_data. A left join: undecided keys
    * pass through untouched. */
  def applyReviews(state: DataFrame, decisions: DataFrame,
      runVersion: String): DataFrame = {
    val d = decisions.select(col("key"), col("accepted").as("d_accepted"),
      col("extracted_edit"), col("reviewed_by"))
    state.join(d, Seq("key"), "left")
      .withColumn("accepted", coalesce(col("d_accepted"), col("accepted")))
      .withColumn("extracted_data",
        coalesce(col("extracted_edit"), col("extracted_data")))
      .withColumn("modified_version",
        when(col("d_accepted").isNotNull, lit(runVersion))
          .otherwise(col("modified_version")))
      .withColumn("modified_by",
        coalesce(col("reviewed_by"), col("modified_by")))
      .drop("d_accepted", "extracted_edit", "reviewed_by")
  }

  /** The `assert_all_accepted` gate: unaccepted, live (seen this
    * version) review rows. A non-empty result blocks export in the
    * reference (review.py:481-506); callers count or fail on it. */
  def unaccepted(state: DataFrame, version: String): DataFrame =
    state.filter(col("last_seen_version") === version && !col("accepted"))

  /** The entity-emission side (`link_entity`): only accepted rows feed
    * the pipeline, with the reviewer-edited data taking precedence. */
  def acceptedExtractions(state: DataFrame): DataFrame =
    state.filter(col("accepted"))
      .select(col("key"), col("extracted_data"), col("origin"))
}
