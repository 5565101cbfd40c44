package graft.sources

import graft.functions.Ids
import graft.operators.{Consolidate, Enricher}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Satellite-entity row factories — the DataFrame form of the
  * reference's `make_sanction` / `make_identification` /
  * `make_occupancy` helpers (zavod/zavod/helpers/sanctions.py:22-113,
  * helpers/identification.py:9-60, helpers/positions.py:132-248): one
  * linked entity row per source row, with the deterministic hash id
  * (entity id + kind + key sentinels), the back-reference property,
  * and the derived status columns.
  *
  * Output rows are (id, schema, properties) — directly unionable into
  * an entity frame or meltable into statements.
  */
object Satellites {

  private val EmptyArr = array().cast("array<string>")

  private def m(pairs: (String, Column)*): Column =
    map_filter(
      map(pairs.flatMap { case (k, v) => Seq(lit(k), v) }: _*),
      (_, v) => size(v) > 0).as("properties")

  private def arr(v: Column): Column =
    when(v.isNotNull && length(v) > 0, array(v)).otherwise(EmptyArr)

  /** make_sanction: id = 'sanction-' + hash(entity, key); status derives
    * from the date range at construction time (sanctions.py:37-41,
    * is_active semantics — active iff the range covers `asOf`). */
  def makeSanction(
      rows: DataFrame,
      entityId: Column,
      key: Column,
      program: Column,
      programKey: Column,
      startDate: Column,
      endDate: Column,
      asOf: Column): DataFrame = {
    val active = Consolidate.intervalsOverlap(
      startDate, endDate,
      date_format(asOf.cast("date"), "yyyy-MM-dd"),
      date_format(asOf.cast("date"), "yyyy-MM-dd"))
    rows.select(
      Ids.makeId("sanction", entityId, coalesce(key, lit(""))).as("id"),
      lit("Sanction").as("schema"),
      m(
        "entity" -> array(entityId),
        "program" -> arr(program),
        "programId" -> arr(programKey),
        "startDate" -> arr(startDate),
        "endDate" -> arr(endDate),
        "status" -> array(when(active, "active").otherwise("inactive"))))
  }

  /** make_identification: id = 'id-' + hash(holder, number, key);
    * `passport=true` upgrades the schema (identification.py:20-60). */
  def makeIdentification(
      rows: DataFrame,
      holderId: Column,
      number: Column,
      docType: Column = lit(null),
      country: Column = lit(null),
      key: Column = lit(null),
      passport: Boolean = false): DataFrame =
    rows.filter(number.isNotNull && length(number) > 0).select(
      Ids.makeId("id", holderId, number, coalesce(key, lit(""))).as("id"),
      lit(if (passport) "Passport" else "Identification").as("schema"),
      m(
        "holder" -> array(holderId),
        "number" -> array(number),
        "type" -> arr(docType),
        "country" -> arr(country)))

  /** make_occupancy: id = 'occupancy-' + hash(person, position, dates);
    * status from the A11 state machine; `noEndImpliesCurrent` mirrors
    * the PEP convention for open-ended mandates (positions.py:132-200). */
  def makeOccupancy(
      rows: DataFrame,
      personId: Column,
      positionId: Column,
      startDate: Column,
      endDate: Column,
      deathDate: Column,
      asOf: Column,
      noEndImpliesCurrent: Boolean = true): DataFrame = {
    val status =
      if (noEndImpliesCurrent)
        Enricher.occupancyStatus(startDate, endDate, deathDate, asOf)
      else // unknown when open-ended and not provably current
        when(endDate.isNull || length(endDate) === 0, "unknown")
          .otherwise(Enricher.occupancyStatus(startDate, endDate, deathDate, asOf))
    rows.select(
      Ids.makeId("occupancy", personId, positionId,
        coalesce(startDate, lit("")), coalesce(endDate, lit(""))).as("id"),
      lit("Occupancy").as("schema"),
      m(
        "holder" -> array(personId),
        "post" -> array(positionId),
        "startDate" -> arr(startDate),
        "endDate" -> arr(endDate),
        "status" -> array(status)))
  }
}
