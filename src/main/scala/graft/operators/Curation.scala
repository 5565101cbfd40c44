package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-level (host-level) corpus curation — the FineWeb/CCNet step
  * between URL-level dedup (functions/Urls) and document-level quality
  * filtering (TextAnalysis): web corpora are curated per *site*, because
  * boilerplate farms and mirror hosts poison every document they emit.
  *
  * Scale shape: one explode-free projection per document (fingerprint,
  * token count, distinct-word ratio are array expressions inside
  * codegen), one corpus-wide fingerprint aggregation (exact-dup groups,
  * same shape as Dedup.exact), and one groupBy(host) rollup. Nothing is
  * collected; the host table is output, bounded by the number of sites.
  */
object Curation {

  /** Per-host curation report: for every host aggregate document count,
    * token volume, the exact-duplicate fraction (documents whose
    * corpus-wide content fingerprint is shared — the mirror-site
    * signal), and mean lexical diversity (distinct-word ratio — the
    * boilerplate signal); then decide `blocklist` when the host's
    * duplicate fraction reaches `dupMax` or its mean diversity falls
    * below `qualityMin`, else `keep`.
    *
    * Fractions round-trip DECIMAL(9,6) (engine-independent bytes); the
    * per-document ratio is rounded BEFORE the host mean, and the mean
    * itself is rounded again — both steps mirrored in the oracle.
    *
    * @return (host, n_docs, n_tokens, n_dup_docs, dup_frac,
    *          mean_word_ratio, decision) */
  def hostReport(
      docs: DataFrame, id: Column, url: Column, text: Column,
      dupMax: Double = 0.5, qualityMin: Double = 0.4): DataFrame = {
    def r6(c: Column): Column = c.cast("decimal(9,6)").cast("double")
    val w = split(text, " ")
    val base = docs.select(
      id.as("doc_id"),
      graft.functions.Urls.host(url).as("host"),
      TextAnalysis.fingerprint(text).as("fp"),
      TextAnalysis.tokenCount(text).as("n_tok"),
      r6(size(array_distinct(w)).cast("double") /
        when(size(w) =!= 0, size(w)).cast("double")).as("word_ratio"))
    val dupGroups = base.groupBy("fp")
      .agg(count(lit(1)).as("fp_n"))
    val flagged = base.join(dupGroups, "fp")
      .withColumn("is_dup", col("fp_n") > 1)
    flagged.groupBy("host")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_docs"),
        // order-independent mean: word_ratio is already 6-dp quantized,
        // so the decimal sum is EXACT and partition-order-free — a
        // plain double avg() flipped the 6-dp rounding boundary on the
        // second-seed sweep (the TextAnalysis.dsum lesson)
        r6((sum(col("word_ratio").cast("decimal(20,6)")).cast("double") /
          count(lit(1)).cast("double"))).as("mean_word_ratio"))
      .withColumn("dup_frac",
        r6(col("n_dup_docs").cast("double") / col("n_docs").cast("double")))
      .select(col("host"), col("n_docs"), col("n_tokens"),
        col("n_dup_docs"), col("dup_frac"), col("mean_word_ratio"),
        when(col("dup_frac") >= dupMax || col("mean_word_ratio") < qualityMin,
          lit("blocklist")).otherwise(lit("keep")).as("decision"))
  }
}
