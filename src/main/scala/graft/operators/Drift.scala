package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift reporting between two corpus slices — the
  * dataset-shift monitor a training-data pipeline runs between crawls
  * (and the reference's statistics exporter is the static half of:
  * what changed, not just what is).
  *
  * PSI (population stability index, the standard industry drift score):
  * Σ_b (p_b − q_b)·ln(p_b / q_b) over feature buckets, add-one
  * smoothed. Features are hashed token buckets (the DSIR feature
  * space), so both distributions collapse to `buckets` rows regardless
  * of corpus size — the whole report is one explode + bucket aggregate
  * + broadcast-sized arithmetic. PSI < 0.1 is conventionally stable,
  * 0.1–0.25 moderate, > 0.25 action.
  *
  * Determinism: bucket counts are exact integers on any engine; each
  * per-bucket contribution is IEEE arithmetic on those integers rounded
  * through DECIMAL(12,6); the total is an exact decimal sum of the
  * ROUNDED contributions, so any engine reproduces every byte.
  */
object Drift {

  /** Per-bucket PSI report between the `isRef` slice and the rest.
    * Returns (bucket, n_ref, n_cur, p_ref, p_cur, contrib, psi_total)
    * — one row per occupied bucket, psi_total repeated (the exact sum
    * of rounded contributions). */
  def psiTokenDrift(
      df: DataFrame, text: Column, isRef: Column,
      buckets: Int = 64): DataFrame = {
    val r6 = (c: Column) => c.cast("decimal(12,6)").cast("double")
    val toks = df.select(isRef.as("is_ref"),
        explode(filter(split(text, " "), t => length(t) > 0)).as("tok"))
      .withColumn("bucket", pmod(Dedup.hash60(col("tok")), lit(buckets.toLong)))
      .groupBy("bucket")
      .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_cur"))
    val tot = toks.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    val k = lit(buckets.toDouble)
    val p = (col("n_ref") + lit(1.0)) / (col("t_ref") + k)
    val q = (col("n_cur") + lit(1.0)) / (col("t_cur") + k)
    val contrib = toks.crossJoin(broadcast(tot))
      .withColumn("p_ref", r6(p))
      .withColumn("p_cur", r6(q))
      .withColumn("contrib", r6((p - q) * log(p / q)))
    val total = contrib.agg(
      sum(col("contrib").cast("decimal(30,12)")).cast("double").as("psi_total"))
    contrib.crossJoin(broadcast(total))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        col("p_ref"), col("p_cur"), col("contrib"), col("psi_total"))
  }
}
