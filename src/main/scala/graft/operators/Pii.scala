package graft.operators

import graft.functions.Identifiers
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: email,
  * IPv4, phone, and payment-card patterns, with card candidates
  * validated through the native Luhn expression before they count as
  * PII (a 16-digit invoice number is not a card). Detection and
  * redaction are plain `regexp_count`/`regexp_replace` Catalyst
  * expressions, so the scrub runs inside whole-stage codegen over the
  * full corpus — no UDFs, no per-row interpretation.
  *
  * Patterns are deliberately RE2-compatible (no lookarounds, no
  * backreferences) so the same strings drive the DuckDB oracle and any
  * other engine a pipeline cross-checks against.
  */
object Pii {

  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern: String = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"
  val CardPattern: String = "\\b\\d{16}\\b"

  /** Per-document PII counts: emails, IPv4 addresses, phone numbers,
    * card-shaped digit runs, and the subset of card candidates that
    * pass Luhn. All counts are codegen'd `regexp_count` except the
    * Luhn filter, which runs the native [[graft.functions.expr.LuhnValid]]
    * loop over the (bounded, per-document) candidate array. */
  def counts(text: Column): Column = struct(
    regexp_count(text, lit(EmailPattern)).cast("long").as("n_emails"),
    regexp_count(text, lit(Ipv4Pattern)).cast("long").as("n_ips"),
    regexp_count(text, lit(PhonePattern)).cast("long").as("n_phones"),
    regexp_count(text, lit(CardPattern)).cast("long").as("n_cards"),
    size(filter(regexp_extract_all(text, lit(CardPattern), lit(0)),
      d => Identifiers.luhnOk(d))).cast("long").as("n_valid_cards"))

  /** Replace every PII match with a typed placeholder. Emails and cards
    * are scrubbed before phones and IPs so a longer match can never be
    * partially consumed by a shorter pattern (a card's digit run would
    * otherwise feed the IP octet pattern). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailPattern, "[EMAIL]"),
          CardPattern, "[CARD]"),
        PhonePattern, "[PHONE]"),
      Ipv4Pattern, "[IP]")
}
