package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text cleaning (F8) and crypto-wallet extraction (F9) —
  * zavod/zavod/helpers/text.py:18-117, helpers/crypto.py:10-46.
  */
object TextFns {

  /** multi_split: subdivide on every splitter, trim, drop empties
    * (text.py:46-79). Sequential per-splitter splitting is equivalent to
    * one split on the alternation of all splitters. Returns
    * array<string>. */
  def multiSplit(text: Column, splitters: Seq[String]): Column = {
    val pattern = splitters.sortBy(-_.length)
      .map(java.util.regex.Pattern.quote).mkString("|")
    filter(transform(split(text, pattern), f => trim(f)), f => length(f) > 0)
  }

  /** clean_note: strip the UN-notice prefix and Interpol URLs, squash
    * whitespace; empty → null (text.py:18-43). */
  def cleanNote(text: Column): Column = {
    val step1 = regexp_replace(text,
      "(?i)INTERPOL-UN\\s*Security\\s*Council\\s*Special\\s*Notice\\s*web\\s*link:?", " ")
    val step2 = regexp_replace(step1, "(?i)https?://www\\.interpol\\.int/\\S*(\\s\\d+)?", " ")
    val squashed = regexp_replace(trim(step2), "\\s+", " ")
    when(length(squashed) > 0, squashed)
  }

  /** is_empty (text.py:82-96). */
  def isEmpty(text: Column): Column =
    text.isNull || length(trim(text)) === 0

  /** remove_bracketed: discard "(...)" sub-texts (text.py:99-117). */
  def removeBracketed(text: Column): Column =
    regexp_replace(text, "\\(.*?\\)", " ")

  /** Crypto-wallet regexes (helpers/crypto.py:10-27) — public-pattern
    * address shapes with word boundaries. */
  val CryptoPatterns: Seq[(String, String)] = Seq(
    "ETH" -> "\\b0x[a-fA-F0-9]{40}\\b",
    "BTC" -> "\\b(?:bc1[a-zA-HJ-NP-Z0-9]{11,71}|[13][a-km-zA-HJ-NP-Z1-9]{25,39})\\b",
    "XRP" -> "\\br[1-9A-HJ-NP-Za-km-z]{24,34}\\b",
    "TRON" -> "\\bT[1-9A-HJ-NP-Za-km-z]{33}\\b")

  /** F9: extract all wallet addresses of one currency. */
  def extractCrypto(text: Column, currency: String): Column = {
    val pattern = CryptoPatterns.toMap.apply(currency)
    regexp_extract_all(text, lit(pattern), lit(0))
  }
}
