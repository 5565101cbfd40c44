package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-dataset matching (xref/enrichment) as a query: token-blocked
  * candidate generation, similarity scoring, and per-subject top-k
  * pruning with score-ratio and cutoff
  * (zavod/zavod/integration/dedupe.py:42-90,
  * zavod/zavod/runner/local_enricher.py:33-121).
  *
  * The reference uses a DuckDB-backed inverted index on one node; here
  * the inverted index IS a DataFrame keyed by token, so candidate
  * generation is an equi-join that scales out. The document-frequency
  * cap bounds the worst-case join fan-out (a token shared by f docs
  * contributes f² pairs — capping f caps the shuffle).
  */
object Blocking {

  /** Inverted-index frame: (id, token) with tokens above `maxDf` document
    * frequency dropped. `name` must be tokenizable by single spaces. */
  def tokenIndex(df: DataFrame, id: Column, name: Column, maxDf: Long): DataFrame = {
    val tok = df.select(id.as("id"),
        explode(split(Consolidate.nameKey(name), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
    val freq = tok.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    tok.join(freq, "token").select(col("id"), col("token"))
  }

  /** J9: blocked candidate pairs between subjects and targets with a
    * token-overlap Jaccard score. Returns (subject_id, target_id, score). */
  def candidates(
      subjects: DataFrame, targets: DataFrame,
      subjectId: Column, subjectName: Column,
      targetId: Column, targetName: Column,
      maxDf: Long = 1000): DataFrame = {
    val si = tokenIndex(subjects, subjectId, subjectName, maxDf).toDF("subject_id", "token")
    val ti = tokenIndex(targets, targetId, targetName, maxDf).toDF("target_id", "token")
    val sSz = si.groupBy("subject_id").agg(count(lit(1)).as("s_sz"))
    val tSz = ti.groupBy("target_id").agg(count(lit(1)).as("t_sz"))
    si.join(ti, "token")
      .groupBy("subject_id", "target_id").agg(count(lit(1)).as("inter"))
      .join(sSz, "subject_id").join(tSz, "target_id")
      .withColumn("score",
        col("inter").cast("double") /
          (col("s_sz") + col("t_sz") - col("inter")).cast("double"))
      .select(col("subject_id"), col("target_id"), col("score"))
  }

  /** O2/O3: per-subject pruning — keep candidates above `cutoff`, within
    * `minScoreRatio` of the subject's best score, top `k` by score with
    * deterministic tie-break on target id
    * (local_enricher.py:36-53,104-121). */
  def topK(
      cands: DataFrame, k: Int = 10,
      cutoff: Double = 0.5, minScoreRatio: Double = 0.1): DataFrame = {
    val w = Window.partitionBy("subject_id")
    val rankW = w.orderBy(col("score").desc, col("target_id").asc)
    cands
      .withColumn("best", max(col("score")).over(w))
      .filter(col("score") >= cutoff && col("score") >= col("best") * minScoreRatio)
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("subject_id"), col("target_id"), col("score"), col("rank"))
  }
}
