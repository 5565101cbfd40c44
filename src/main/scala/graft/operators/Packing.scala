package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-level sequence packing — the GPT-style pretraining layout:
  * documents are concatenated in a canonical order (with a separator
  * token each) and the stream is chopped into fixed-length training
  * sequences. The manifest maps every document to its global token
  * offset and the range of sequences it spans.
  *
  * The global token offset is a prefix sum. The naive form — one
  * window ordered over the whole corpus — serializes 100 TB through a
  * single partition, so this runs the classic two-phase shape instead:
  * a running sum WITHIN each doc-id bucket (shuffles by bucket, sorts
  * locally), plus a bucket-prefix offset computed on the tiny
  * per-bucket totals frame (rows = corpus/bucketSize — the only
  * single-partition window, and it sees one row per thousand docs).
  * The same decomposition is how array prefix-scan runs on any
  * parallel machine.
  */
object Packing {

  /** The shared two-phase prefix-sum core (every packing layout and the
    * epoch planner's partial-epoch fill use it): `__run` = running sum
    * of `valueCol` INCLUDING the current row within (groupCols,
    * bucketCol) ordered by `orderCols`; `__bprefix` = total mass of all
    * EARLIER buckets in the global layout order. With `partitioned`
    * the cross-bucket cumsum restarts per groupCols (independent
    * per-group offsets, e.g. one partial epoch per tier); without it
    * the groupCols LEAD the global bucket order (e.g. curriculum
    * stages laid out sequentially). The cross-bucket window runs over
    * the tiny per-bucket frame, never over rows — the decomposition
    * the q132/q148/q153 oracles prove exact against a plain global
    * cumsum. */
  private[operators] def twoPhaseRunning(df: DataFrame,
      groupCols: Seq[String], bucketCol: String, orderCols: Seq[String],
      valueCol: String, partitioned: Boolean = false): DataFrame = {
    val grp = (groupCols :+ bucketCol).map(col)
    val inBucket = Window.partitionBy(grp: _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val run = df.withColumn("__run", sum(col(valueCol)).over(inBucket))
    val bucketOrder =
      if (partitioned)
        Window.partitionBy(groupCols.map(col): _*).orderBy(col(bucketCol))
      else
        Window.orderBy(grp: _*)
    val acrossBuckets = bucketOrder
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = df.groupBy(grp: _*)
      .agg(sum(col(valueCol)).as("__btotal"))
      .withColumn("__bprefix",
        sum(col("__btotal")).over(acrossBuckets) - col("__btotal"))
      .drop("__btotal")
    run.join(broadcast(offsets), groupCols :+ bucketCol)
  }

  /** Manifest columns from a two-phase frame: global start offset and
    * first/last sequence index at `seqLen`. */
  private def manifestCols(seqLen: Long): Seq[org.apache.spark.sql.Column] = Seq(
    (col("__bprefix") + col("__run") - col("n_tokens")).as("off_start"),
    floor((col("__bprefix") + col("__run") - col("n_tokens")) / lit(seqLen))
      .cast("long").as("seq_first"),
    floor((col("__bprefix") + col("__run") - 1) / lit(seqLen))
      .cast("long").as("seq_last"))

  /** Per-document packing manifest: token count (incl. one separator),
    * global start offset, and first/last sequence index at `seqLen`
    * tokens per training sequence. Documents are packed in ascending
    * `id` order. Counts here are the whitespace estimate; a trained
    * tokenizer's real counts enter via `packManifestFromCounts`. */
  def packManifest(docs: DataFrame, id: Column, text: Column,
      seqLen: Long, bucketSize: Long = 1000L): DataFrame =
    packManifestFromCounts(
      docs.select(id.as("doc_id"),
        (TextAnalysis.tokenCount(text) + 1L).as("n_tokens")),
      seqLen, bucketSize)

  /** Deterministically SHUFFLED packing manifest: documents pack in
    * salted-hash order instead of id order — the pre-pack shuffle every
    * real pretraining pipeline runs (id-ordered packing puts a crawl's
    * temporal/source locality into adjacent training sequences). The
    * permutation is pure hash arithmetic, so it is reproducible
    * bit-for-bit, stable under re-runs, and needs no materialized
    * shuffle table.
    *
    * Scale shape is the id-ordered manifest's, generalized: the bucket
    * is the hash's TOP `bucketBits` bits, so ascending bucket ids ARE
    * ascending hash ranges and the two-phase prefix sum (in-bucket
    * running window + tiny bucket-offset frame) reconstructs the exact
    * global cumsum over (hash, doc_id) order — still no corpus-wide
    * ordered window. Buckets are hash-uniform, so no bucket skew.
    *
    * `toks` is (doc_id, n_tokens). Returns (doc_id, n_tokens,
    * off_start, seq_first, seq_last) under the shuffled order. */
  def shuffledPackManifest(toks: DataFrame, salt: String,
      seqLen: Long, bucketBits: Int = 10): DataFrame = {
    val h = Dedup.hash60(concat_ws("|", lit(salt), col("doc_id").cast("string")))
    val hashed = toks.withColumn("h", h)
      .withColumn("bucket", (col("h") / lit(1L << (60 - bucketBits))).cast("long"))
    twoPhaseRunning(hashed, Seq.empty, "bucket", Seq("h", "doc_id"), "n_tokens")
      .select(col("doc_id") +: col("n_tokens") +: manifestCols(seqLen): _*)
  }

  /** Manifest over precomputed per-document token counts — the entry
    * point for REAL tokenizer output (e.g. `TextAnalysis.bpeEncode`'s
    * n_tokens, +1 separator added by the caller or already included in
    * `n_tokens`). `toks` is (doc_id, n_tokens). Same two-phase prefix
    * sum as above. */
  def packManifestFromCounts(toks: DataFrame,
      seqLen: Long, bucketSize: Long = 1000L): DataFrame = {
    val bucketed = toks.withColumn("bucket",
      floor(col("doc_id") / lit(bucketSize)).cast("long"))
    twoPhaseRunning(bucketed, Seq.empty, "bucket", Seq("doc_id"), "n_tokens")
      .select(col("doc_id") +: col("n_tokens") +: manifestCols(seqLen): _*)
  }

  /** Curriculum packing: lay out the corpus stage-by-stage (stage 0
    * first — e.g. quality tiers from a trained classifier), documents
    * ordered by id within a stage — the staged-training layout where
    * early optimizer steps see the chosen tier. Same two-phase prefix
    * sum as [[packManifestFromCounts]], with the stage as the leading
    * bucket component: the in-bucket window is per (stage, id-range)
    * partition and the cross-bucket offsets ride the tiny per-bucket
    * frame (global ORDER BY over bucket count, never over documents).
    *
    * @param toks (doc_id: long, n_tokens: long, stage: int) — one row
    *   per document
    * @return (doc_id, stage, n_tokens, off_start, seq_first, seq_last) */
  def curriculumPackManifest(toks: DataFrame,
      seqLen: Long, bucketSize: Long = 1000L): DataFrame = {
    val bucketed = toks.withColumn("bucket",
      floor(col("doc_id") / lit(bucketSize)).cast("long"))
    // stage LEADS the global bucket order (partitioned = false):
    // stage 0's buckets lay out before stage 1's
    twoPhaseRunning(bucketed, Seq("stage"), "bucket", Seq("doc_id"), "n_tokens")
      .select(col("doc_id") +: col("stage") +: col("n_tokens") +:
        manifestCols(seqLen): _*)
  }
}
