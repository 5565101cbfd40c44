package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Identifier validation & normalization (F6 + the validating half of F1).
  *
  * The reference validates identifier-typed property values per format
  * (bic, isin, lei, imo, iban, inn, ogrn, npi, uei, qid, uscc —
  * zavod/zavod/runtime/cleaning.py:19-63) via rigour's checksum
  * implementations. Here every validator is a pure Catalyst
  * higher-order-function expression (transform/aggregate over
  * `sequence`), so validation of billions of statements stays inside
  * whole-stage codegen — no UDF, and each formula is independently
  * re-expressible in the DuckDB oracle for correctness checks.
  */
object Identifiers {

  /** Canonical identifier form: uppercase, whitespace/dash-free. */
  def normalizeId(s: Column): Column =
    regexp_replace(upper(trim(s)), "[\\s-]", "")

  /** The characters of `s` as an array<string> (1-char strings). */
  private def chars(s: Column): Column =
    transform(sequence(lit(1), length(s)), i => s.substr(i, lit(1)))

  /** Base-36 value of one character: '0'-'9' → 0-9, 'A'-'Z' → 10-35. */
  private def b36(c: Column): Column =
    when(ascii(c).between(48, 57), ascii(c) - 48)
      .when(ascii(c).between(65, 90), ascii(c) - 55)
      .otherwise(lit(-1))

  /** Expand an alphanumeric string to its decimal-digit string (letters
    * become two digits: A→10 … Z→35) — the ISIN/LEI/IBAN convention. */
  private def digitExpand(s: Column): Column =
    array_join(transform(chars(s), c => b36(c).cast("string")), "")

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Luhn (mod-10) checksum over a digit string, including the trailing
    * check digit: valid iff the doubled-alternate sum ≡ 0 (mod 10).
    * Backed by the native [[graft.functions.expr.LuhnValid]] expression
    * (generated Java loop, whole-stage-codegen friendly); the
    * HOF-composition form it replaced lives on as [[luhnOkHof]] and is
    * cross-checked in the spec. */
  def luhnOk(digits: Column): Column =
    ColumnBridge.column(graft.functions.expr.LuhnValid(
      ColumnBridge.expression(digits)))

  /** The expression-composition Luhn (reference implementation). */
  def luhnOkHof(digits: Column): Column = {
    val rev = reverse(digits)
    val terms = transform(sequence(lit(1), length(rev)), i => {
      val d = ascii(rev.substr(i, lit(1))) - 48
      when(i % 2 === 0, when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    aggregate(terms, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** Mod-97 residue of a (long) digit string — ISO 7064 as used by LEI
    * and IBAN. Native codegen'd loop; HOF form kept as [[mod97Hof]]. */
  private def mod97(digits: Column): Column =
    ColumnBridge.column(graft.functions.expr.Mod97Digits(
      ColumnBridge.expression(digits)))

  /** The expression-composition mod-97 (reference implementation). */
  def mod97Hof(digits: Column): Column =
    aggregate(chars(digits), lit(0),
      (acc, c) => (acc * 10 + (ascii(c) - 48)) % 97)

  /** ISIN: 2 letters + 9 alphanumerics + Luhn check digit over the
    * base-36 expansion (ISO 6166). */
  def isinValid(s: Column): Column = {
    val n = normalizeId(s)
    n.rlike("^[A-Z]{2}[A-Z0-9]{9}[0-9]$") && luhnOk(digitExpand(n))
  }

  /** LEI: 20 alphanumerics, mod-97 of the base-36 expansion ≡ 1
    * (ISO 17442). */
  def leiValid(s: Column): Column = {
    val n = normalizeId(s)
    n.rlike("^[A-Z0-9]{18}[0-9]{2}$") && (mod97(digitExpand(n)) === 1)
  }

  /** IBAN: country + 2 check digits; rotate first 4 chars to the end,
    * base-36-expand, mod 97 ≡ 1 (ISO 13616). */
  def ibanValid(s: Column): Column = {
    val n = normalizeId(s)
    val rotated = concat(n.substr(lit(5), length(n) - 4), n.substr(lit(1), lit(4)))
    n.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}$") &&
      (mod97(digitExpand(rotated)) === 1)
  }

  /** IMO number: 7 digits (an "IMO " prefix is tolerated); check digit =
    * Σ d_i·(8-i) for i=1..6, mod 10. */
  def imoValid(s: Column): Column = {
    val d = regexp_replace(upper(trim(s)), "[^0-9]", "")
    val digit = (i: Int) => ascii(d.substr(lit(i), lit(1))) - 48
    val sum6 = (1 to 6).map(i => digit(i) * (8 - i)).reduce(_ + _)
    (length(d) === 7) && (sum6 % 10 === digit(7))
  }

  private def wsum(d: Column, weights: Seq[Int]): Column =
    weights.zipWithIndex.map { case (w, i) =>
      (ascii(d.substr(lit(i + 1), lit(1))) - 48) * w
    }.reduce(_ + _)

  /** Russian INN: 10-digit (company) or 12-digit (person) with the
    * official weighted mod-11 check digits. */
  def innValid(s: Column): Column = {
    val d = normalizeId(s)
    val dig = (i: Int) => ascii(d.substr(lit(i), lit(1))) - 48
    val ok10 = d.rlike("^[0-9]{10}$") &&
      (wsum(d, Seq(2, 4, 10, 3, 5, 9, 4, 6, 8)) % 11 % 10 === dig(10))
    val ok12 = d.rlike("^[0-9]{12}$") &&
      (wsum(d, Seq(7, 2, 4, 10, 3, 5, 9, 4, 6, 8)) % 11 % 10 === dig(11)) &&
      (wsum(d, Seq(3, 7, 2, 4, 10, 3, 5, 9, 4, 6, 8)) % 11 % 10 === dig(12))
    ok10 || ok12
  }

  /** Russian OGRN: 13 digits; last digit = (first 12 as a number, mod 11)
    * mod 10. The big-number residue uses 10 ≡ -1 (mod 11): alternating
    * digit sum from the right. */
  def ogrnValid(s: Column): Column = {
    val d = normalizeId(s)
    // digits d1..d12, weight (-1)^(12-i) — i.e. +1 for even i, -1 for odd
    val alt = (1 to 12).map { i =>
      val v = ascii(d.substr(lit(i), lit(1))) - 48
      if ((12 - i) % 2 == 0) v else -v
    }.reduce(_ + _)
    val r = ((alt % 11) + 11) % 11
    d.rlike("^[0-9]{13}$") && (r % 10 === (ascii(d.substr(lit(13), lit(1))) - 48))
  }

  /** BIC/SWIFT: structural check, 8 or 11 chars (ISO 9362 has no
    * checksum). */
  def bicValid(s: Column): Column =
    normalizeId(s).rlike("^[A-Z]{6}[A-Z0-9]{2}([A-Z0-9]{3})?$")

  /** Wikidata QID: structural. */
  def qidValid(s: Column): Column =
    trim(s).rlike("^Q[1-9][0-9]*$")

  /** US SAM UEI: 12 alphanumerics excluding I and O, not starting with 0. */
  def ueiValid(s: Column): Column =
    normalizeId(s).rlike("^[1-9A-HJ-NP-Z][A-HJ-NP-Z0-9]{11}$")

  /** US NPI: 10 digits, Luhn over the '80840' health-industry prefix. */
  def npiValid(s: Column): Column = {
    val d = normalizeId(s)
    d.rlike("^[0-9]{10}$") && luhnOk(concat(lit("80840"), d))
  }

  /** Chinese USCC: 18 chars over a 31-char alphabet with mod-31 weighted
    * check (GB 32100-2015). Weights 3^(i-1) mod 31 are precomputed. */
  private val UsccAlphabet = "0123456789ABCDEFGHJKLMNPQRTUWXY"
  private val UsccWeights: Seq[Int] =
    (0 until 17).scanLeft(1) { case (acc, _) => acc * 3 % 31 }.take(17)

  private def usccVal(c: Column): Column =
    UsccAlphabet.zipWithIndex.tail.foldLeft(when(c === UsccAlphabet(0).toString, 0)) {
      case (acc, (ch, i)) => acc.when(c === ch.toString, i)
    }.otherwise(lit(-1))

  def usccValid(s: Column): Column = {
    val n = normalizeId(s)
    val sum = (1 to 17).map { i =>
      usccVal(n.substr(lit(i), lit(1))) * UsccWeights(i - 1)
    }.reduce(_ + _)
    val check = (lit(31) - sum % 31) % 31
    n.rlike("^[0-9A-HJ-NP-RTUWXY]{18}$") &&
      (usccVal(n.substr(lit(18), lit(1))) === check)
  }
}
