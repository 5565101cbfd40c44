package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage: the Fellegi–Sunter model (Fellegi &
  * Sunter 1969; the public Splink engine is the reference
  * implementation of this shape at scale) trained in-engine by EM.
  *
  * The reference resolves entities with stored human judgements plus
  * deterministic auto-merge rules (zavod/zavod/integration/dedupe.py,
  * AutoMerge); Fellegi–Sunter is the standard UNSUPERVISED complement —
  * it turns the same comparison vectors the blocking join already
  * produces into calibrated match probabilities with no labels.
  *
  * Model: each candidate pair carries K boolean agreement fields
  * γ = (γ₁..γ_K). Latent match share λ; per-field
  * m_k = P(γ_k = 1 | match), u_k = P(γ_k = 1 | non-match), fields
  * conditionally independent given the class (the naive-Bayes FS
  * assumption). EM alternates:
  *  - E-step: w(γ) = λ·Π p_mk / (λ·Π p_mk + (1−λ)·Π p_uk), where
  *    p_mk = m_k if γ_k else 1−m_k (resp. u);
  *  - M-step: λ = Σ w·n / N, m_k = Σ w·n·γ_k / Σ w·n,
  *    u_k = Σ (1−w)·n·γ_k / Σ (1−w)·n.
  *
  * Scale contract (the Splink trick): γ takes at most 2^K distinct
  * values, so the pairs frame is aggregated ONCE into the comparison-
  * vector value-count table (one map-side-combinable groupBy), and
  * every EM round runs over those ≤ 2^K rows — the corpus is never
  * rescanned, and per-round cost is independent of pair count. At
  * 100 TB the whole training loop after the one aggregate is
  * metadata-sized.
  *
  * Determinism contract (what lets a DuckDB oracle replay training
  * bit-for-bit): per-pattern weights w round-trip DECIMAL(14,12)
  * before any sum; sums are exact decimal (the dsum pattern); each
  * new parameter is a double ratio of two exact decimals rounded
  * through DECIMAL(12,9). Same barriers as the q129/q150 precedent —
  * IEEE products in fixed order agree across engines, and the dp
  * barrier absorbs final-ulp drift. Fixed `rounds`, fixed seeds-free
  * initialisation → identical bytes on any engine, executor count, or
  * retry.
  */
object Linkage {

  private def r12(c: Column): Column = c.cast("decimal(14,12)").cast("double")
  private def r9(c: Column): Column = c.cast("decimal(12,9)").cast("double")
  private def dsum(c: Column): Column = sum(c.cast("decimal(30,12)")).cast("double")

  /** Aggregate candidate pairs to the comparison-vector value counts:
    * one row per observed γ pattern with its pair count `n`. */
  def comparisonVectorCounts(pairs: DataFrame, gammas: Seq[String]): DataFrame =
    pairs.groupBy(gammas.map(g => col(g).cast("boolean").as(g)): _*)
      .agg(count(lit(1)).as("n"))

  /** One E-step weight column over a value-count row, given a 1-row
    * params frame joined in with columns lambda, m_<g>, u_<g>. */
  private def eWeight(gammas: Seq[String]): Column = {
    val pm = gammas.map(g =>
      when(col(g), col(s"m_$g")).otherwise(lit(1.0) - col(s"m_$g")))
      .foldLeft(col("lambda"))(_ * _)
    val pu = gammas.map(g =>
      when(col(g), col(s"u_$g")).otherwise(lit(1.0) - col(s"u_$g")))
      .foldLeft(lit(1.0) - col("lambda"))(_ * _)
    r12(pm / (pm + pu))
  }

  /** EM-train the FS params over pre-aggregated value counts `vc`
    * (from [[comparisonVectorCounts]]). Returns the 1-row params frame
    * (lambda, m_<g>…, u_<g>…), every value a 9-dp double. */
  def fellegiSunterEm(
      vc: DataFrame,
      gammas: Seq[String],
      rounds: Int = 3,
      lambda0: Double = 0.1,
      m0: Double = 0.9,
      u0: Double = 0.1): DataFrame = {
    val spark = vc.sparkSession
    val init = Seq(lit(lambda0).as("lambda")) ++
      gammas.map(g => lit(m0).as(s"m_$g")) ++
      gammas.map(g => lit(u0).as(s"u_$g"))
    var params = spark.range(1).select(init: _*)
    val vcp = vc.localCheckpoint() // ≤ 2^K rows; freeze the aggregate
    (1 to rounds).foreach { _ =>
      val weighted = vcp.crossJoin(broadcast(params))
        .withColumn("w", eWeight(gammas))
      // one aggregate over ≤ 2^K rows yields every sum the M-step needs
      val aggs = Seq(
        dsum(col("w") * col("n")).as("swn"),
        dsum((lit(1.0) - col("w")) * col("n")).as("svn"),
        sum(col("n")).cast("double").as("nn")) ++
        gammas.map(g => dsum(when(col(g), col("w") * col("n"))
          .otherwise(lit(0.0))).as(s"swg_$g")) ++
        gammas.map(g => dsum(when(col(g), (lit(1.0) - col("w")) * col("n"))
          .otherwise(lit(0.0))).as(s"svg_$g"))
      val sums = weighted.agg(aggs.head, aggs.tail: _*)
      val upd = Seq(r9(col("swn") / col("nn")).as("lambda")) ++
        gammas.map(g => r9(col(s"swg_$g") / col("swn")).as(s"m_$g")) ++
        gammas.map(g => r9(col(s"svg_$g") / col("svn")).as(s"u_$g"))
      params = sums.select(upd: _*)
        .localCheckpoint() // 1 row; stops round-over-round lineage growth
    }
    params
  }

  /** Score: posterior match probability (12 dp) and the FS match
    * weight Σ log2(p_mk / p_uk) + log2(λ/(1−λ)) (4 dp — log2 goes
    * through libm, so it gets the coarser barrier) for every observed
    * pattern under trained `params`. Joining this ≤ 2^K-row table back
    * to the pairs frame is a broadcast — scoring a trillion pairs is
    * one codegen'd projection. */
  def fsScorePatterns(vc: DataFrame, gammas: Seq[String], params: DataFrame): DataFrame = {
    val bayes = gammas.map { g =>
      val pm = when(col(g), col(s"m_$g")).otherwise(lit(1.0) - col(s"m_$g"))
      val pu = when(col(g), col(s"u_$g")).otherwise(lit(1.0) - col(s"u_$g"))
      log2(pm / pu)
    }.foldLeft(log2(col("lambda") / (lit(1.0) - col("lambda"))))(_ + _)
    vc.crossJoin(broadcast(params))
      .select((gammas.map(col) :+ col("n") :+
        eWeight(gammas).as("match_probability") :+
        bayes.cast("decimal(12,4)").cast("double").as("match_weight")): _*)
  }
}
