package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric value parsing (F7) — zavod/zavod/helpers/numbers.py:12-45:
  * parse a decimal string with configurable separators, canonicalize
  * (integers lose the fraction, others keep 2 decimals), and carry the
  * trailing unit token along.
  */
object Numbers {

  /** Parse the numeric head of `value` (separator-stripped) as double;
    * null when unparseable. `separator` is the thousands separator,
    * `decimal` the decimal mark. */
  def parseNumber(value: Column, decimal: String = ".", separator: String = ","): Column = {
    val noSep = regexp_replace(trim(value), java.util.regex.Pattern.quote(separator), "")
    val normDec =
      if (decimal == ".") noSep
      else regexp_replace(noSep, java.util.regex.Pattern.quote(decimal), ".")
    try_cast(regexp_extract(normDec, "^[+-]?[0-9]*\\.?[0-9]+", 0), "double")
  }

  private def try_cast(c: Column, t: String): Column =
    c.try_cast(t)

  /** Canonical string form: integral → no fraction, else 2 decimals
    * (numbers.py:13-17 _float_str). */
  def canonicalNumber(num: Column): Column =
    when(num.isNotNull,
      when(num === num.cast("long").cast("double"), num.cast("long").cast("string"))
        .otherwise(format_string("%.2f", num)))

  /** The unit token trailing the number, lowercased ('km', 'tons', …). */
  def unitOf(value: Column): Column = {
    val u = lower(trim(regexp_extract(trim(value), "[a-zA-Z%]+$", 0)))
    when(length(u) > 0, u)
  }
}
