package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Enrichment match flow (J10/J12/P5) and occupancy status (A11) —
  * zavod/zavod/runner/local_enricher.py:86-199,
  * helpers/positions.py:132-248.
  */
object Enricher {

  /** J10: the same-id short-circuit — subjects whose id exists verbatim
    * on the target side match with score 1.0 before any blocking
    * (local_enricher.py:96-103). Union with blocked candidates. */
  def withSameIdMatches(
      cands: DataFrame, subjects: DataFrame, targets: DataFrame,
      subjectId: Column, targetId: Column): DataFrame = {
    val same = subjects.select(subjectId.as("subject_id"))
      .join(targets.select(targetId.as("target_id")),
        col("subject_id") === col("target_id"), "left_semi")
      .select(col("subject_id"), col("subject_id").as("target_id"),
        lit(1.0).as("score"))
    cands.select(col("subject_id"), col("target_id"), col("score"))
      .unionByName(same).distinct()
  }

  /** J10 judgement gate (local_enricher.py:161-199): POSITIVE matches
    * become internal statements, NEGATIVE matches are dropped, and
    * unjudged matches are emitted as external=true candidates.
    * `decisions` is (subject_id, target_id, judgement). Returns matches
    * with a `route` column ('internal' | 'external').
    *
    * Identical ids short-circuit to POSITIVE/internal BEFORE the
    * decision lookup — nomenklatura's resolver.get_judgement returns
    * POSITIVE for identical (canonical) ids unconditionally
    * (local_enricher.py:174), so a same-id match routes internal even
    * against a recorded NEGATIVE. Callers that resolve ids into
    * clusters must pass CANONICAL ids on both sides (see the
    * enrichment stage of [[graft.etl.Etl.run]]): the same-id test then
    * covers "members of the same merged cluster" exactly like the
    * reference's cluster-aware lookup. */
  def judgementGate(matches: DataFrame, decisions: DataFrame): DataFrame =
    matches.join(decisions, Seq("subject_id", "target_id"), "left")
      .withColumn("route",
        when(col("subject_id") === col("target_id"), "internal")
          .when(col("judgement") === "POSITIVE", "internal")
          .when(col("judgement") === "NEGATIVE", lit(null).cast("string"))
          .otherwise("external"))
      .filter(col("route").isNotNull)
      .drop("judgement")

  /** P5: person cutoff — drop dead or too-old persons from enrichment
    * (local_enricher.py:184, runner/enrich.py:40). Dates are partial-ISO
    * strings; comparison is on the inclusive upper bound. */
  def personAlive(deathDate: Column, birthDate: Column, asOf: Column,
      maxAgeYears: Int = 110): Column = {
    val dead = deathDate.isNotNull && length(deathDate) > 0 &&
      to_date(Consolidate.partialDateUpper(deathDate)) <= asOf.cast("date")
    val tooOld = birthDate.isNotNull && length(birthDate) > 0 &&
      to_date(Consolidate.partialDateUpper(birthDate)) <=
        add_months(asOf.cast("date"), -12 * maxAgeYears)
    !(dead || tooOld)
  }

  /** A11: occupancy status (helpers/positions.py:132-248, simplified to
    * the core state machine): ENDED when the occupancy ended or the
    * holder died before `asOf`; CURRENT when it started and has not
    * ended; UNKNOWN otherwise (no dates to judge by). */
  def occupancyStatus(
      startDate: Column, endDate: Column, deathDate: Column, asOf: Column): Column = {
    val ended = (endDate.isNotNull && length(endDate) > 0 &&
      to_date(Consolidate.partialDateUpper(endDate)) < asOf.cast("date")) ||
      (deathDate.isNotNull && length(deathDate) > 0 &&
        to_date(Consolidate.partialDateUpper(deathDate)) < asOf.cast("date"))
    val current = startDate.isNotNull && length(startDate) > 0 &&
      to_date(Consolidate.partialDateLower(startDate)) <= asOf.cast("date") &&
      (endDate.isNull || length(endDate) === 0 ||
        to_date(Consolidate.partialDateUpper(endDate)) >= asOf.cast("date"))
    when(ended, "ended").when(current, "current").otherwise("unknown")
  }
}
