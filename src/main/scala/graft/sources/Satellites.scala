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

  /** make_article (helpers/articles.py:6-31): one Article entity per
    * published URL, keyed by the URL (+ optional extra). */
  def makeArticle(
      rows: DataFrame,
      url: Column,
      keyExtra: Column = lit(null),
      title: Column = lit(null),
      publishedAt: Column = lit(null)): DataFrame =
    rows.select(
      Ids.makeId("article", url, coalesce(keyExtra, lit(""))).as("id"),
      lit("Article").as("schema"),
      m(
        "sourceUrl" -> array(url),
        "title" -> arr(title),
        "publishedAt" -> arr(publishedAt)))

  /** make_documentation (helpers/articles.py:34-70): the Documentation
    * edge linking an entity to an article it was mentioned in; pass the
    * article's publishedAt as `date` to mirror the reference's
    * fallback. */
  def makeDocumentation(
      rows: DataFrame,
      entityId: Column,
      articleId: Column,
      keyExtra: Column = lit(null),
      date: Column = lit(null)): DataFrame =
    rows.select(
      Ids.makeId("documentation", entityId, articleId,
        coalesce(keyExtra, lit(""))).as("id"),
      lit("Documentation").as("schema"),
      m(
        "entity" -> array(entityId),
        "document" -> array(articleId),
        "date" -> arr(date)))

  /** The IMO portion of an entity id (helpers/vessels.py:5-19): a valid
    * IMO reduces to its canonical 7 digits; a present-but-invalid one
    * falls back to a slug of the raw value so a faulty source IMO still
    * yields a stable key. Null/empty → null. */
  def imoIdKey(value: Column): Column = {
    val digits = regexp_replace(upper(trim(value)), "[^0-9]", "")
    when(value.isNull || length(trim(value)) === 0, lit(null).cast("string"))
      .when(graft.functions.Identifiers.imoValid(value), digits)
      .otherwise(Ids.slugify(value))
  }

  /** make_vessel_imo_id (helpers/vessels.py:22-33). */
  def makeVesselImoId(value: Column): Column = {
    val k = imoIdKey(value)
    when(k.isNotNull, concat(lit("imo-vsl-"), k))
  }

  /** make_org_imo_id (helpers/vessels.py:36-43) — IMO company numbers. */
  def makeOrgImoId(value: Column): Column = {
    val k = imoIdKey(value)
    when(k.isNotNull, concat(lit("imo-org-"), k))
  }

  /** ISIN country prefixes that are NOT issuer countries
    * (helpers/securities.py:5). */
  val IsinNonCountry: Seq[String] = Seq("XS", "XD", "XC", "XF", "CS", "QS")

  /** make_security (helpers/securities.py:8-17): id = 'isin-' + upper;
    * the 2-letter prefix becomes the country unless it is a non-country
    * code (lowercased — country values are normalized downstream). */
  def makeSecurity(rows: DataFrame, isin: Column): DataFrame = {
    val up = upper(trim(isin))
    val cc = substring(up, 1, 2)
    rows.select(
      concat(lit("isin-"), up).as("id"),
      lit("Security").as("schema"),
      m(
        "isin" -> array(up),
        "country" -> when(!cc.isin(IsinNonCountry: _*), array(lower(cc)))
          .otherwise(EmptyArr)))
  }

  /** make_position (helpers/positions.py:21-130): Position entity keyed
    * by (name, countries, subnational area) under an optional namespace
    * prefix so same-named positions from different contexts don't
    * collide; the LLM name-translation flow is an external concern
    * (S11) and the untranslated name always derives the id. */
  def makePosition(
      rows: DataFrame,
      name: Column,
      country: Column = lit(null),
      topics: Column = lit(null).cast("array<string>"),
      subnationalArea: Column = lit(null),
      inceptionDate: Column = lit(null),
      dissolutionDate: Column = lit(null),
      numberOfSeats: Column = lit(null),
      idHashPrefix: String = "position"): DataFrame =
    rows.filter(name.isNotNull && length(trim(name)) > 0).select(
      Ids.makeId(idHashPrefix, name, coalesce(country, lit("")),
        coalesce(subnationalArea, lit(""))).as("id"),
      lit("Position").as("schema"),
      m(
        "name" -> array(name),
        "country" -> arr(country),
        "topics" -> coalesce(topics, EmptyArr),
        "subnationalArea" -> arr(subnationalArea),
        "inceptionDate" -> arr(inceptionDate),
        "dissolutionDate" -> arr(dissolutionDate),
        "numberOfSeats" -> arr(numberOfSeats)))

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
