package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: which held-out (eval) documents
  * share verbatim word n-grams with the training corpus? The standard
  * pre-training hygiene check (eval answers leaking into training data
  * inflate benchmark scores), run here as exact shingle overlap.
  *
  * Scale shape: both sides explode into word `k`-gram shingles; the
  * train side reduces to a distinct shingle set (one shuffle), the
  * eval side to distinct (doc, shingle) pairs; overlap is a hash
  * equi-join on the shingle string followed by a per-doc count. Never
  * a doc×doc comparison — cost is linear in corpus shingle volume, and
  * the shingle join key distributes well (high-cardinality strings).
  * On a real cluster the train set would be written bucketed by
  * shingle and reused across eval sweeps.
  */
object Contamination {

  /** Per-eval-doc overlap report: distinct shingle count, shingles
    * shared with ANY train doc, the shared fraction, and a flag at
    * `flagMinShared` (a phrase of `k+flagMinShared-1` words fully
    * contained in both sides trips it). Docs shorter than `k` words
    * carry zero shingles and report 0/0.0/false — output is null-free
    * so engine compares stay byte-stable. */
  /** Distinct (doc_id, shingle) word `k`-gram pairs per document —
    * the building block both overlap directions share (eval-vs-train
    * contamination reporting here; train-vs-eval decontamination in
    * the composed curation pipeline). Documents under `k` words
    * contribute no rows. */
  def shingleSet(docs: DataFrame, id: Column, text: Column,
      k: Int = 8): DataFrame = {
    val base = docs.select(id.as("doc_id"), split(text, " ").as("w"))
    base.select(col("doc_id"),
      explode(when(size(col("w")) >= k,
        transform(sequence(lit(1), size(col("w")) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(j => element_at(col("w"), i + j)): _*)))
        .otherwise(array().cast("array<string>"))).as("shingle"))
      .distinct()
  }

  def report(docs: DataFrame, id: Column, text: Column, splitCol: Column,
      k: Int = 8, flagMinShared: Long = 5L): DataFrame = {
    val base = docs.select(id.as("doc_id"), splitCol.as("split"),
      split(text, " ").as("w"))
    val train = shingleSet(docs.filter(splitCol === "train"), id, text, k)
      .select("shingle").distinct()
    val eval = shingleSet(docs.filter(splitCol === "eval"), id, text, k)
    val totals = eval.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val shared = eval.join(train, Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val frac = (col("n_shared").cast("double") /
      when(col("n_shingles") =!= 0, col("n_shingles")).cast("double"))
      .cast("decimal(9,6)").cast("double")
    base.filter(col("split") === "eval").select("doc_id")
      .join(totals, Seq("doc_id"), "left")
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(frac, lit(0.0)).as("contam_frac"),
        (coalesce(col("n_shared"), lit(0L)) >= flagMinShared).as("contaminated"))
  }

  /** Pairwise source-overlap matrix — [[report]] generalized from one
    * train/eval split to EVERY pair of sources (the audit a multi-source
    * corpus runs before mixing: which feeds are verbatim-copying each
    * other?). For each unordered source pair (a < b): the count of
    * distinct shingles present in both, plus each side's distinct
    * total and the containment fraction shared / min(total_a, total_b).
    *
    * Scale shape: distinct (source, shingle) is one shuffle; the pair
    * join is a self equi-join on the shingle, whose fan-out per
    * shingle is bounded by the NUMBER OF SOURCES (tiny), not document
    * count — cost stays linear in corpus shingle volume. Source pairs
    * that share nothing are emitted with 0 via the cross of per-source
    * totals (sources are few; the cross is a driver-free tiny join).
    *
    * Returns (source_a, source_b, shared, total_a, total_b,
    * containment). */
  def sourceOverlapMatrix(docs: DataFrame, text: Column,
      source: Column, k: Int = 8): DataFrame = {
    // shingleSet keyed by source instead of doc id; cached once
    // because it feeds the totals aggregate AND both sides of the
    // self-join. Swept query-scoped cache, not a bare .cache(): the
    // lazy return means the operator can never unpersist, and the
    // shingle frame is the LARGEST intermediate in the suite (every
    // k-gram of every document) — leaking one per call starved
    // execution memory for the rest of the session.
    val ss = QueryScoped.cached(
      shingleSet(docs, source, text, k).toDF("src", "shingle"))
    // the source universe comes from the DOCS, not from the shingle
    // frame: a source whose documents are all shorter than k words has
    // no shingles but must still appear in the matrix with 0s
    val universe = docs.select(source.as("src")).distinct()
    val totals = universe
      .join(ss.groupBy("src").agg(count(lit(1)).as("total")), Seq("src"), "left")
      .select(col("src"), coalesce(col("total"), lit(0L)).as("total"))
    val sharedCounts = ss.toDF("src_a", "shingle")
      .join(ss.toDF("src_b", "shingle"), "shingle")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("shared"))
    val allPairs = totals.toDF("src_a", "total_a")
      .crossJoin(totals.toDF("src_b", "total_b"))
      .filter(col("src_a") < col("src_b"))
    allPairs.join(sharedCounts, Seq("src_a", "src_b"), "left")
      .select(col("src_a").as("source_a"), col("src_b").as("source_b"),
        coalesce(col("shared"), lit(0L)).as("shared"),
        col("total_a"), col("total_b"),
        // min-total 0 guard: a shingle-less source must report 0.0, not
        // divide by zero
        coalesce(when(least(col("total_a"), col("total_b")) > 0,
          (col("shared").cast("double") /
            least(col("total_a"), col("total_b")).cast("double"))
            .cast("decimal(9,6)").cast("double")), lit(0.0)).as("containment"))
  }
}
