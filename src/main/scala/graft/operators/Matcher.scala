package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-feature match scoring — the matcher stage the reference plugs
  * in behind candidate generation (runner/local_enricher.py:73-78
  * instantiates a pluggable nomenklatura matching algorithm; every
  * blocked candidate pair is scored, then gated on `cutoff` /
  * `min_score_ratio` — local_enricher.py:40-48). The Spark form
  * compares per-pair property SETS feature by feature, entirely with
  * set-based column expressions (no UDFs, fully codegen-friendly):
  *
  *  - name_jaccard:  token-set Jaccard over all names of the pair
  *  - phonetic_eq:   1 when the sides share a phonetic name
  *                   fingerprint ([[Blocking.phoneticFingerprint]]) —
  *                   recalls spelling variants the token Jaccard misses
  *  - country_match: 1 shared country; −1 when BOTH sides declare
  *                   countries but none overlap (an active mismatch is
  *                   negative evidence); 0 when either side is silent
  *  - year_match:    same discipline over birth/registration years
  *  - ident_match:   1 on any shared identifier (decisive evidence)
  *
  * score = clamp(Σ wᵢ·fᵢ, 0, 1) — a linear scorer with fixed public
  * weights, chosen over a logistic link because exp() risks last-ulp
  * divergence across engines while the weighted sum of small rationals
  * is bit-reproducible. With the default weights an identifier hit
  * alone clears the reference's default 0.5 cutoff, as does an exact
  * name (Jaccard 1 implies fingerprint equality); a phonetic-only hit
  * needs corroboration from country or year — mirroring the evidence
  * hierarchy of the reference's algorithms.
  *
  * Scale: one hash join per side keyed on the pair ids; every feature
  * is an array intersection over the pair's own (small) property sets —
  * no per-token shuffle, no window.
  */
object Matcher {

  case class Weights(
      name: Double = 0.4, phonetic: Double = 0.2, country: Double = 0.15,
      year: Double = 0.1, ident: Double = 0.6)

  private def toks(n: Column): Column =
    filter(split(Consolidate.nameKey(n), " "), t => length(t) > 0)

  /** @param pairs    (subject_id, target_id) candidate pairs
    * @param subjects (id, names, countries, years, idents) — array
    *   columns of strings; empty arrays mean "side is silent"
    * @param targets  same shape
    * @return pairs + feature columns (name_jaccard, phonetic_eq,
    *   country_match, year_match, ident_match) + score */
  def score(
      pairs: DataFrame, subjects: DataFrame, targets: DataFrame,
      w: Weights = Weights()): DataFrame = {
    def prep(df: DataFrame, prefix: String) =
      df.toDF("id", "names", "countries", "years", "idents").select(
        col("id").as(s"${prefix}_id"),
        array_distinct(flatten(transform(col("names"), n => toks(n))))
          .as(s"${prefix}_toks"),
        array_distinct(transform(col("names"),
          n => Blocking.phoneticFingerprint(n))).as(s"${prefix}_fps"),
        col("countries").as(s"${prefix}_cty"),
        col("years").as(s"${prefix}_yr"),
        col("idents").as(s"${prefix}_idn"))
    def jacc(a: Column, b: Column): Column = {
      val i = size(array_intersect(a, b))
      when(size(a) + size(b) - i === 0, 0.0)
        .otherwise(i.cast("double") / (size(a) + size(b) - i).cast("double"))
    }
    def evid(a: Column, b: Column): Column =
      when(size(array_intersect(a, b)) > 0, 1.0)
        .when(size(a) > 0 && size(b) > 0, -1.0)
        .otherwise(0.0)
    val joined = pairs
      .join(prep(subjects, "s"), col("subject_id") === col("s_id"))
      .join(prep(targets, "t"), col("target_id") === col("t_id"))
    val scored = joined
      .withColumn("name_jaccard", jacc(col("s_toks"), col("t_toks")))
      .withColumn("phonetic_eq",
        when(size(array_intersect(col("s_fps"), col("t_fps"))) > 0, 1.0)
          .otherwise(0.0))
      .withColumn("country_match", evid(col("s_cty"), col("t_cty")))
      .withColumn("year_match", evid(col("s_yr"), col("t_yr")))
      .withColumn("ident_match",
        when(size(array_intersect(col("s_idn"), col("t_idn"))) > 0, 1.0)
          .otherwise(0.0))
    scored.withColumn("score",
        least(greatest(
          col("name_jaccard") * w.name + col("phonetic_eq") * w.phonetic +
            col("country_match") * w.country + col("year_match") * w.year +
            col("ident_match") * w.ident, lit(0.0)), lit(1.0)))
      .select(col("subject_id"), col("target_id"), col("name_jaccard"),
        col("phonetic_eq"), col("country_match"), col("year_match"),
        col("ident_match"), col("score"))
  }
}
