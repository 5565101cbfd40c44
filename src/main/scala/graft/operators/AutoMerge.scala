package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Auto-merge heuristics (R2) — the reference's domain rules that turn
  * candidate pairs into automatic POSITIVE/NEGATIVE resolver judgements
  * (zavod/zavod/integration/logic.py:11-148):
  *
  *  - vessels sharing an IMO number AND a (casefolded) name ⇒ POSITIVE;
  *  - securities with non-empty disjoint ISIN sets ⇒ score kill;
  *  - Russian-only legal entities with a perfect INN (persons) or OGRN
  *    (organizations) match ⇒ POSITIVE;
  *  - organizations with a perfect LEI or IMO match ⇒ POSITIVE;
  *  - Pakistani-proscribed persons with disjoint id numbers ⇒ NEGATIVE.
  *
  * Applied as one `when`-chain over a pair frame whose sides carry the
  * relevant property arrays — rule evaluation is embarrassingly
  * parallel and feeds [[ConnectedComponents.runWithNegatives]].
  */
object AutoMerge {

  val Positive = "POSITIVE"
  val Negative = "NEGATIVE"

  /** Perfect identifier match (logic.py:59-66): the intersection covers
    * the LARGER of the two distinct sets (and both are non-empty). */
  def perfectMatch(l: Column, r: Column): Column = {
    val li = array_distinct(l)
    val ri = array_distinct(r)
    val longest = greatest(size(li), size(ri))
    (longest > 0) && (size(array_intersect(li, ri)) === longest)
  }

  private def lowerAll(c: Column): Column = transform(c, x => lower(x))

  /** Decide one pair. Column arguments are the two sides' property
    * arrays (never null — pass empty arrays). Returns a struct
    * (decision, rule); decision null = no automatic judgement, score
    * passes through. */
  def decide(
      commonSchema: Column,
      lImos: Column, rImos: Column,
      lNames: Column, rNames: Column,
      lIsins: Column, rIsins: Column,
      lCountries: Column, rCountries: Column,
      lInns: Column, rInns: Column,
      lOgrns: Column, rOgrns: Column,
      lLeis: Column, rLeis: Column,
      lPkIds: Column, rPkIds: Column): Column = {
    import graft.model.FtmModel
    def isA(parent: String): Column =
      commonSchema.isin(FtmModel.descendants(parent).toSeq.sorted: _*)

    val vesselPos = isA("Vessel") &&
      size(array_intersect(lImos, rImos)) > 0 &&
      size(array_intersect(lowerAll(lNames), lowerAll(rNames))) > 0

    val secNeg = isA("Security") &&
      size(lIsins) > 0 && size(rIsins) > 0 &&
      size(array_intersect(lIsins, rIsins)) === 0

    val ruOnly = array_contains(array_intersect(lCountries, rCountries), "ru") &&
      size(array_distinct(lCountries)) === 1 && size(array_distinct(rCountries)) === 1
    val ruInnPos = isA("Person") && ruOnly && perfectMatch(lInns, rInns)
    val ruOgrnPos = isA("Organization") && ruOnly && perfectMatch(lOgrns, rOgrns)

    val orgIdPos = isA("Organization") &&
      (perfectMatch(lLeis, rLeis) || perfectMatch(lImos, rImos))

    val pkNeg = isA("Person") &&
      size(lPkIds) > 0 && size(rPkIds) > 0 &&
      size(array_intersect(lPkIds, rPkIds)) === 0

    // rule order mirrors logic_decide (logic.py:131-148)
    when(vesselPos, struct(lit(Positive).as("decision"), lit("vessel_imo").as("rule")))
      .when(ruInnPos, struct(lit(Positive).as("decision"), lit("ru_inn").as("rule")))
      .when(ruOgrnPos, struct(lit(Positive).as("decision"), lit("ru_ogrn").as("rule")))
      .when(orgIdPos, struct(lit(Positive).as("decision"), lit("org_identifier").as("rule")))
      .when(pkNeg, struct(lit(Negative).as("decision"), lit("pk_ids").as("rule")))
      .when(secNeg, struct(lit(Negative).as("decision"), lit("security_isin").as("rule")))
      .otherwise(struct(lit(null).cast("string").as("decision"),
        lit(null).cast("string").as("rule")))
  }
}
