package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier evaluation for the curation pipeline: the quality
  * classifier (q150's trainer slot) gates what a 100 TB corpus keeps,
  * so its AUC and operating-point metrics are production numbers, not
  * notebook numbers — they must come out of the engine, deterministic
  * and at scale.
  *
  * AUC is computed exactly via the Mann-Whitney rank statistic in pure
  * integer arithmetic: group rows by distinct score, accumulate
  * negatives-below via prefix sum, and sum `pos_at * (2·neg_below +
  * neg_at)` — twice the U statistic, so score TIES contribute the
  * conventional half-credit without ever leaving integers. The only
  * ordered traversal runs as the shared two-phase prefix sum over
  * equi-width score buckets ([[Packing.twoPhaseRunning]]) — no global
  * ordered window over the score distribution.
  */
object Eval {

  private def r6(c: Column): Column = c.cast("decimal(10,6)").cast("double")

  /** One-row evaluation frame: (n_pos, n_neg, u2, tp, fp, fn, tn, auc,
    * prec, rec, f1). `label` must be boolean; metrics at `score >
    * thresh`. Degenerate inputs (no positives / no negatives) yield
    * null metrics rather than failing. */
  def binaryEval(scored: DataFrame, score: Column, label: Column,
      thresh: Double = 0.0): DataFrame = {
    val base = scored.select(score.cast("double").as("s"), label.as("yy"))
    val gp = base.groupBy("s").agg(
      sum(when(col("yy"), 1L).otherwise(0L)).as("pos_at"),
      sum(when(col("yy"), 0L).otherwise(1L)).as("neg_at"))
    val bounds = gp.agg(min("s").as("__lo"), max("s").as("__hi"))
    val bucketed = gp.crossJoin(broadcast(bounds))
      .withColumn("bucket", when(col("__hi") === col("__lo"), lit(0L))
        .otherwise(least(lit(4095L),
          floor((col("s") - col("__lo")) * lit(4096.0) /
            (col("__hi") - col("__lo"))).cast("long"))))
    val run = Packing.twoPhaseRunning(bucketed, Seq.empty, "bucket",
        Seq("s"), "neg_at")
      .withColumn("negcum", col("__bprefix") + col("__run"))
    run.agg(
        sum("pos_at").as("n_pos"), sum("neg_at").as("n_neg"),
        sum(col("pos_at") *
          (lit(2L) * (col("negcum") - col("neg_at")) + col("neg_at"))).as("u2"),
        sum(when(col("s") > thresh, col("pos_at")).otherwise(0L)).as("tp"),
        sum(when(col("s") > thresh, col("neg_at")).otherwise(0L)).as("fp"),
        sum(when(col("s") <= thresh, col("pos_at")).otherwise(0L)).as("fn"),
        sum(when(col("s") <= thresh, col("neg_at")).otherwise(0L)).as("tn"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        col("tp"), col("fp"), col("fn"), col("tn"),
        r6(col("u2").cast("double") /
          (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"),
        r6(col("tp").cast("double") / (col("tp") + col("fp"))).as("prec"),
        r6(col("tp").cast("double") / (col("tp") + col("fn"))).as("rec"),
        r6((lit(2.0) * col("tp")) /
          (lit(2.0) * col("tp") + col("fp") + col("fn"))).as("f1"))
  }

  /** ROC/PR operating points from a two-class equi-width score
    * histogram: threshold at each bucket's lower edge, predicting
    * positive for scores in bucket >= b. Counts are integers off a
    * `buckets`-row frame (the histogram is a plain groupBy — mergeable,
    * deterministic, O(buckets) state at any corpus size); rates are
    * single divisions of exact integers. Buckets with no mass still
    * appear implicitly in the cumulative counts of later thresholds.
    *
    * @return (bucket, thr, tp, fp, tpr, fpr, prec) one row per
    *         non-empty bucket, descending-threshold semantics */
  def rocPoints(scored: DataFrame, score: Column, label: Column,
      buckets: Int = 32): DataFrame = {
    val base = scored.select(score.cast("double").as("s"), label.as("yy"))
    val bounds = base.agg(min("s").as("__lo"), max("s").as("__hi"))
    val hist = base.crossJoin(broadcast(bounds))
      .withColumn("b", when(col("__hi") === col("__lo"), lit(0L))
        .otherwise(least(lit((buckets - 1).toLong),
          floor((col("s") - col("__lo")) * lit(buckets.toDouble) /
            (col("__hi") - col("__lo"))).cast("long"))))
      .groupBy("b").agg(
        sum(when(col("yy"), 1L).otherwise(0L)).as("pos_at"),
        sum(when(col("yy"), 0L).otherwise(1L)).as("neg_at"))
    val totals = hist.agg(sum("pos_at").as("__p"), sum("neg_at").as("__n"))
    // reverse cumulative: tp at threshold b = positives in buckets >= b
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("b").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    hist
      .withColumn("tp", sum("pos_at").over(w))
      .withColumn("fp", sum("neg_at").over(w))
      .crossJoin(broadcast(totals)).crossJoin(broadcast(bounds))
      .select(col("b").as("bucket"),
        // thr = lo + b·(hi−lo)/2^k over 4-dp bounds is a ≤9-dp-exact
        // rational; rounding it at 6 dp would land exactly on half
        // boundaries (x.xxxxxx5) where engines' double→decimal paths
        // disagree (second-seed sweep finding) — 9 dp represents the
        // value exactly, so no rounding decision ever happens
        (col("__lo") + col("b").cast("double") *
          (col("__hi") - col("__lo")) / lit(buckets.toDouble))
          .cast("decimal(16,9)").cast("double").as("thr"),
        col("tp"), col("fp"),
        r6(col("tp").cast("double") / col("__p")).as("tpr"),
        r6(col("fp").cast("double") / col("__n")).as("fpr"),
        when(col("tp") + col("fp") === 0, lit(0.0))
          .otherwise(r6(col("tp").cast("double") / (col("tp") + col("fp"))))
          .as("prec"))
  }

  /** Clustering-agreement report — the entity-resolution QA readout:
    * how well a PREDICTED clustering (id → p) matches a REFERENCE one
    * (id → t), as pairwise precision/recall and B-cubed. Everything
    * reduces to the (p, t) CONTINGENCY counts n_ij plus the marginals,
    * so cost is three aggregates on cluster keys — never pair
    * enumeration (pairs enter only as the closed form n(n−1)/2, which
    * is what makes the metric computable when one cluster holds 10⁷
    * members). Pairwise counts are exact integers; B-cubed per-cell
    * terms (n_ij²/marginal — one IEEE division of exact integers) are
    * quantized to DECIMAL(30,12) and summed exactly (the dsum
    * discipline), so the result is partition-order-free.
    *
    * @param pred  (id, p) predicted cluster labels, labels non-null
    * @param truth (id, t) reference cluster labels — the id domain must
    *              EQUAL pred's; a one-sided id raises at execution time
    *              rather than silently shrinking n_items
    * @return one row: (n_items, pred_clusters, true_clusters,
    *         pred_pairs, true_pairs, tp_pairs, bcubed_prec, bcubed_rec) */
  def clusterAgreement(pred: DataFrame, truth: DataFrame): DataFrame = {
    // Same-id-domain contract, enforced LOUDLY: a full-outer join with
    // a per-row raise_error on a one-sided id costs the same shuffle as
    // the inner join but turns a partial labeling into an error instead
    // of a silently shrunken n_items (round-13 advisory). Zero extra
    // Spark actions — the guard rides the rows the metric reads anyway.
    def only(c: Column, side: String) =
      when(c.isNull, raise_error(format_string(
        s"clusterAgreement: id %s present only in $side — pred and " +
          "truth must share the same id domain", col("id").cast("string"))))
        .otherwise(c)
    val j = pred.select(col("id"), col("p"))
      .join(truth.select(col("id"), col("t")), Seq("id"), "full_outer")
      .select(col("id"), only(col("p"), "truth").as("p"),
        only(col("t"), "pred").as("t"))
    val cell = j.groupBy("p", "t").agg(count(lit(1)).as("nij"))
    val pm = j.groupBy("p").agg(count(lit(1)).as("np"))
    val tm = j.groupBy("t").agg(count(lit(1)).as("nt"))
    val nItems = j.agg(count(lit(1)).as("n_items"))
    val tp = cell.agg(
      coalesce(sum(expr("(nij * (nij - 1)) div 2")), lit(0L)).as("tp_pairs"))
    val pp = pm.agg(count(lit(1)).as("pred_clusters"),
      coalesce(sum(expr("(np * (np - 1)) div 2")), lit(0L)).as("pred_pairs"))
    val tt = tm.agg(count(lit(1)).as("true_clusters"),
      coalesce(sum(expr("(nt * (nt - 1)) div 2")), lit(0L)).as("true_pairs"))
    val bp = cell.join(pm, "p")
      .agg(coalesce(sum((col("nij") * col("nij")).cast("double")
        .divide(col("np").cast("double")).cast("decimal(30,12)")), lit(0)
        .cast("decimal(30,12)")).as("bp_sum"))
    val br = cell.join(tm, "t")
      .agg(coalesce(sum((col("nij") * col("nij")).cast("double")
        .divide(col("nt").cast("double")).cast("decimal(30,12)")), lit(0)
        .cast("decimal(30,12)")).as("br_sum"))
    nItems.crossJoin(broadcast(pp)).crossJoin(broadcast(tt))
      .crossJoin(broadcast(tp))
      .crossJoin(broadcast(bp)).crossJoin(broadcast(br))
      .select(col("n_items"), col("pred_clusters"), col("true_clusters"),
        col("pred_pairs"), col("true_pairs"), col("tp_pairs"),
        // empty inputs: n_items = 0 must yield NULL, not a 0/0 NaN row
        when(col("n_items") > 0,
          r6(col("bp_sum").cast("double") / col("n_items").cast("double")))
          .as("bcubed_prec"),
        when(col("n_items") > 0,
          r6(col("br_sum").cast("double") / col("n_items").cast("double")))
          .as("bcubed_rec"))
  }

  /** ADJUSTED RAND INDEX beside [[clusterAgreement]]'s B-cubed — the
    * chance-corrected pairwise agreement (Hubert & Arabie 1985), from
    * the SAME contingency counts the pairwise metrics already pay for:
    * with index = Σ C(n_ij, 2), pp = Σ C(n_p, 2), tt = Σ C(n_t, 2),
    * N = C(n, 2),
    *
    *   ARI = (index − pp·tt/N) / ((pp + tt)/2 − pp·tt/N)
    *
    * Every count is a closed-form exact integer (the clusterAgreement
    * sums); only the final division is rational — evaluated as one
    * fixed IEEE expression tree (identical term order in the oracle),
    * rounded to 6 dp like the B-cubed columns. NULL when undefined:
    * n < 2 (no pairs) or a zero denominator (both partitions
    * all-singletons or both one-cluster — agreement is vacuous and
    * chance correction divides by zero). Shares clusterAgreement's
    * same-id-domain raise. Returns its row plus (total_pairs, ari). */
  def adjustedRand(pred: DataFrame, truth: DataFrame): DataFrame = {
    val base = clusterAgreement(pred, truth)
      .withColumn("total_pairs", expr("(n_items * (n_items - 1)) div 2"))
    val exp = col("pred_pairs").cast("double") *
      col("true_pairs").cast("double") / col("total_pairs").cast("double")
    val den = (col("pred_pairs") + col("true_pairs")).cast("double") /
      lit(2.0) - exp
    base.withColumn("ari",
      when(col("total_pairs") > 0L && den =!= lit(0.0),
        r6((col("tp_pairs").cast("double") - exp) / den)))
  }

  /** Optimal single-feature GATE calibration — the 1R/decision-stump
    * argmax in exact integers: find the integral threshold t whose
    * rule "value ≤ t" best AGREES with a reference boolean label,
    * trying both orientations (≤ t predicts positive, or predicts
    * negative). Agreement (classification accuracy numerator) is a
    * pure integer — unlike Gini/entropy it needs no per-threshold
    * denominator, so the argmax is engine-portable with no rational
    * comparison anywhere. This is how a curation pipeline CALIBRATES
    * its cheap gates (length, punctuation ratio, token count) against
    * an expensive reference label on a sample: candidates are the
    * DISTINCT values (cumulative counts from the value histogram —
    * the [[Quantiles.histMedian]] frame discipline: windows over the
    * value domain, never the rows), the argmax is one max_by.
    * Ties break toward the SMALLEST threshold, then toward the
    * "≤ predicts positive" orientation (lexicographically via the
    * packed tie-break tuple).
    *
    * @return one row: (threshold, le_predicts_positive, n, n_pos,
    *         agree, base_agree) — base_agree = majority-class count,
    *         the accuracy a thresholdless gate already achieves */
  def bestThresholdGate(df: DataFrame, value: Column,
      label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL values/labels drop at entry: Spark's ordered window sorts
    // NULLS FIRST, DuckDB's NULLS LAST, so a surviving NULL would
    // shift cumulative counts per engine and could itself surface as
    // the chosen threshold (round-14 advisory); a NULL label carries
    // no agreement signal either way
    val hist = df.select(value.cast("long").as("v"),
        label.cast("boolean").as("y"))
      .where(col("v").isNotNull && col("y").isNotNull)
      .groupBy("v")
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("pos_at"),
        sum(when(col("y"), 0L).otherwise(1L)).as("neg_at"))
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("pos_le", sum(col("pos_at")).over(w))
      .withColumn("neg_le", sum(col("neg_at")).over(w))
    val tot = broadcast(hist.agg(sum(col("pos_at")).as("n_pos"),
      sum(col("neg_at")).as("n_neg")))
    val scored = cum.crossJoin(tot)
      .select(col("v"), col("n_pos"), col("n_neg"),
        (col("pos_le") + col("n_neg") - col("neg_le")).as("agree_pos"),
        (col("neg_le") + col("n_pos") - col("pos_le")).as("agree_neg"))
      .select(col("v"), col("n_pos"), col("n_neg"),
        greatest(col("agree_pos"), col("agree_neg")).as("agree"),
        (col("agree_pos") >= col("agree_neg")).as("le_pos"))
    // argmax agree, ties -> smallest v, then le_pos=true first:
    // max_by on (agree, -v, le_pos) — one mergeable aggregate
    scored
      .agg(max_by(struct(col("v"), col("le_pos"), col("agree")),
        struct(col("agree"), (-col("v")).as("nv"),
          col("le_pos"))).as("best"),
        first(col("n_pos") + col("n_neg")).as("n"),
        first(col("n_pos")).as("n_pos"),
        max(greatest(col("n_pos"), col("n_neg"))).as("base_agree"))
      .select(col("best.v").as("threshold"),
        col("best.le_pos").as("le_predicts_positive"),
        col("n"), col("n_pos"), col("best.agree").as("agree"),
        col("base_agree"))
  }
}
