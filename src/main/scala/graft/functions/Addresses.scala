package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Address composition (F5) — zavod/zavod/helpers/addresses.py:18-295.
  *
  * `formatAddress` is the country-template single-line formatter
  * (addresses.py:18-84); the engine keeps a compact template table
  * (street-first vs. postcode-first ordering) instead of libpostal's
  * per-country corpus — the semantics exercised by the reference's
  * pipeline (US ZIP+4 trimming, part joining, country suffix) are
  * preserved. `postcodePobox` splits PO-box-only address lines
  * (addresses.py:284-295).
  */
object Addresses {

  private def nonEmpty(c: Column): Column =
    when(c.isNotNull && length(trim(c)) > 0, regexp_replace(trim(c), "\\s+", " "))

  /** Single-line postal address. Countries in `postcodeFirst` render
    * "postcode city", the rest "city, postcode" — the main ordering
    * split among the reference's formats. */
  def formatAddress(
      summary: Column = lit(null),
      poBox: Column = lit(null),
      street: Column = lit(null),
      house: Column = lit(null),
      houseNumber: Column = lit(null),
      postalCode: Column = lit(null),
      city: Column = lit(null),
      state: Column = lit(null),
      country: Column = lit(null),
      countryCode: Column = lit(null),
      postcodeFirst: Seq[String] = Seq("de", "fr", "ru", "ch", "at", "nl")): Column = {
    val cc = lower(trim(coalesce(countryCode, lit(""))))
    // US ZIP+4 → 5-digit ZIP for comparability (addresses.py:62-67)
    val zip = when(cc === "us" && postalCode.rlike("^[0-9]{5}-?[0-9]{4}$"),
      postalCode.substr(lit(1), lit(5))).otherwise(postalCode)
    val houseLine = concat_ws(" ", nonEmpty(houseNumber), nonEmpty(street))
    val cityLine = when(lit(postcodeFirst.mkString(",")) =!= "" && cc.isin(postcodeFirst: _*),
        concat_ws(" ", nonEmpty(zip), nonEmpty(city)))
      .otherwise(concat_ws(" ", nonEmpty(city), nonEmpty(zip)))
    val parts = Seq(
      nonEmpty(summary), nonEmpty(poBox), nonEmpty(house),
      when(length(houseLine) > 0, houseLine),
      when(length(cityLine) > 0, cityLine),
      nonEmpty(state), nonEmpty(country))
    val line = concat_ws(", ", parts: _*)
    when(length(line) > 0, line)
  }

  /** PO-box-only address lines → struct(po_box, remainder-null)
    * (addresses.py:284-295): "P.O. Box 1234" style strings are a mailbox,
    * not a street. */
  def postcodePobox(text: Column): Column = {
    val t = trim(text)
    val isPobox = t.rlike("(?i)^p\\.?o\\.? ?box [\\d-]+$")
    struct(
      when(isPobox, t).as("po_box"),
      when(!isPobox, t).as("remainder"))
  }

  /** addr- entity id: hash of (country, slugified full, key) —
    * addresses.py:86-105 / make_entity_id. */
  def addressId(full: Column, countryCode: Column): Column =
    when(full.isNotNull && length(trim(full)) > 0,
      concat(lit("addr-"), sha1(concat_ws("|",
        lower(coalesce(countryCode, lit(""))), Ids.slugify(full)))))
}
