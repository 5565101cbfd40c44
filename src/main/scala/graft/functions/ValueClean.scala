package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The per-type value_clean dispatch (F1) —
  * zavod/zavod/runtime/cleaning.py:66-191: every ingested property value
  * flows through a type-keyed cleaning pipeline before becoming a
  * statement. The Spark form is a `when`-chain over the property type,
  * fully inside codegen; rejected values become null with a warning
  * side-channel column, so the caller can route them to the issue log
  * instead of silently dropping provenance.
  */
object ValueClean {

  /** Per-type max lengths (cleaning.py:137-146 analog). */
  val MaxLengths: Map[String, Int] = Map(
    "name" -> 384, "address" -> 500, "identifier" -> 64, "date" -> 32,
    "country" -> 64, "topic" -> 64, "phone" -> 32, "email" -> 254,
    "url" -> 2048, "text" -> 65000)

  private def squash(c: Column): Column = regexp_replace(trim(c), "\\s+", " ")

  /** All identifier formats the dynamic dispatch can validate. */
  val AllFormats: Set[String] = Set("imo", "isin", "lei", "iban", "inn", "ogrn")

  private val FormatValidators: Map[String, Column => Column] = Map(
    "imo" -> Identifiers.imoValid,
    "isin" -> Identifiers.isinValid,
    "lei" -> Identifiers.leiValid,
    "iban" -> Identifiers.ibanValid,
    "inn" -> Identifiers.innValid,
    "ogrn" -> Identifiers.ogrnValid)

  /** Dispatch cleaning for one (ptype, value) pair. Returns a struct:
    *  - clean:   the cleaned value, null when rejected
    *  - origin:  null, 'inferred' (topics — cleaning.py:162-163), or the
    *             caller-provided origin
    *  - warning: null or a warning tag ('too_long', 'short_address',
    *             'invalid_identifier', 'invalid_name')
    *
    * Identifier validation uses the per-format registry validators
    * (cleaning.py:19-63); unknown formats normalize only. Dates
    * truncate to day precision (cleaning.py:134-136). Phones and URLs
    * pass through on failed validation (cleaning.py:169-186).
    *
    * `formats` bounds the validator branches compiled into the plan, so
    * a caller that only ingests (say) IMO ids should pass `Set("imo")`.
    * When the format column is static per mapping, prefer the plan-time
    * dispatch in [[graft.sources.Ingestion]].
    *
    * SCALE WARNING: this single-Column form re-inlines `v` / `idValid`
    * / `cleaned` at every reference site (the caller's value expression
    * alone can appear ~36×), which blows the generated method past
    * janino's 64 KB limit on non-trivial inputs and silently disables
    * whole-stage codegen on the cleaning hot path. It is kept for
    * literal-scale composition (tests, tiny lookup frames); every
    * DataFrame-scale caller must use [[cleanInto]], which stages the
    * intermediates behind Project boundaries. */
  def clean(ptype: Column, value: Column, idFormat: Column = lit(null),
      formats: Set[String] = AllFormats): Column = {
    val v = squash(value)

    val idNorm = Identifiers.normalizeId(v)
    val idValid = idValidExpr(v, idFormat, formats)

    val cleaned = cleanedExpr(ptype, v, idValid, idNorm)

    struct(cleaned.as("clean"), originExpr(ptype).as("origin"),
      warningExpr(ptype, idValid, cleaned).as("warning"))
  }

  /** The per-type cleaned value, given pre-bound `v`/`idValid`/`idNorm`. */
  private def cleanedExpr(p: Column, v: Column, idValid: Column,
      idNorm: Column): Column =
    when(p === "date", substring(v, 1, 10))
      .when(p === "identifier", when(idValid, idNorm))
      .when(p === "name", when(length(v) >= 2 && !v.rlike("^[0-9]+$"), v))
      .when(p === "country", lower(v))
      .when(p === "topic", lower(v))
      .when(p === "email", when(v.rlike("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$"), lower(v)))
      .when(p === "url", when(v.rlike("(?i)^https?://"), v).otherwise(v)) // pass through (cleaning.py:175-186)
      .when(p === "phone", v) // pass through broken phones (cleaning.py:169-172)
      .otherwise(v)

  private def idValidExpr(v: Column, idFormat: Column,
      formats: Set[String]): Column =
    formats.toSeq.sorted
      .foldLeft(when(lit(false), lit(true))) { (acc, f) =>
        acc.when(idFormat === f, FormatValidators(f)(v))
      }
      .otherwise(lit(true))

  private def warningExpr(p: Column, idValid: Column, cleaned: Column): Column = {
    val maxLen = MaxLengths.foldLeft(lit(65000)) { case (acc, (t, n)) =>
      when(p === t, lit(n)).otherwise(acc)
    }
    when(p === "identifier" && !idValid, lit("invalid_identifier"))
      .when(p === "name" && cleaned.isNull, lit("invalid_name"))
      .when(cleaned.isNotNull && length(cleaned) > maxLen, lit("too_long"))
      .when(p === "address" && cleaned.isNotNull && length(cleaned) <= 3,
        lit("short_address"))
  }

  private def originExpr(p: Column): Column = when(p === "topic", lit("inferred"))

  /** DataFrame-scale dynamic dispatch: appends `outCol` as the same
    * struct<clean,origin,warning> as [[clean]], with the intermediates
    * (`v`, `idValid`, `cleaned`) each materialized ONCE behind a
    * Project boundary. `CollapseProject` keeps the stages separate
    * (non-cheap aliases referenced more than once are never re-inlined),
    * so each projection's generated method stays far below janino's
    * 64 KB limit and the whole chain runs inside whole-stage codegen —
    * the per-row hot path the reference dispatches in
    * zavod/zavod/runtime/cleaning.py:66-191. */
  def cleanInto(df: DataFrame, outCol: String, ptype: Column, value: Column,
      idFormat: Column = lit(null), formats: Set[String] = AllFormats): DataFrame = {
    val V = "__vc_v"; val P = "__vc_p"; val F = "__vc_fmt"
    val IV = "__vc_idvalid"; val IN = "__vc_idnorm"; val C = "__vc_cleaned"
    val s1 = df
      .withColumn(V, squash(value))
      .withColumn(P, ptype)
      .withColumn(F, idFormat)
    val s2 = s1
      .withColumn(IV, idValidExpr(col(V), col(F), formats))
      .withColumn(IN, Identifiers.normalizeId(col(V)))
    val s3 = s2.withColumn(C, cleanedExpr(col(P), col(V), col(IV), col(IN)))
    s3.withColumn(outCol, struct(
        col(C).as("clean"),
        originExpr(col(P)).as("origin"),
        warningExpr(col(P), col(IV), col(C)).as("warning")))
      .drop(V, P, F, IV, IN, C)
  }

  /** Plan-time dispatch: when the property type and identifier format
    * are known statically (the normal ingestion-mapping case), only the
    * relevant branch is compiled into the plan — identical semantics to
    * [[clean]], a fraction of the expression tree, and codegen-friendly
    * whenever the chosen validator is. */
  def cleanStatic(ptype: String, value: Column, idFormat: Option[String] = None): Column = {
    val v = squash(value)
    val idValid = idFormat.flatMap(FormatValidators.get)
      .map(f => f(v)).getOrElse(lit(true))

    val cleaned = ptype match {
      case "date" => substring(v, 1, 10)
      case "identifier" => when(idValid, Identifiers.normalizeId(v))
      case "name" => when(length(v) >= 2 && !v.rlike("^[0-9]+$"), v)
      case "country" => lower(v)
      case "topic" => lower(v)
      case "email" => when(v.rlike("^[^@\\s]+@[^@\\s]+\\.[^@\\s]+$"), lower(v))
      case _ => v // url/phone/text pass through (cleaning.py:169-186)
    }
    val maxLen = MaxLengths.getOrElse(ptype, 65000)
    val warning = ptype match {
      case "identifier" =>
        when(!idValid, lit("invalid_identifier"))
          .when(length(cleaned) > maxLen, lit("too_long"))
      case "name" =>
        when(cleaned.isNull, lit("invalid_name"))
          .when(length(cleaned) > maxLen, lit("too_long"))
      case "address" =>
        when(length(cleaned) > maxLen, lit("too_long"))
          .when(cleaned.isNotNull && length(cleaned) <= 3, lit("short_address"))
      case _ => when(length(cleaned) > maxLen, lit("too_long"))
    }
    val origin = if (ptype == "topic") lit("inferred") else lit(null).cast("string")
    struct(cleaned.as("clean"), origin.as("origin"), warning.as("warning"))
  }
}
