package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Name construction and normalization (F4) — the Catalyst-expression
  * subset of the reference's names helper
  * (zavod/zavod/helpers/names.py:34-343, part-order 117-182).
  * The LLM-assisted review flow (names.py:578-840) is an external
  * service concern and stays out of the engine core.
  */
object Names {

  def squashSpaces(s: Column): Column =
    regexp_replace(trim(s), "\\s+", " ")

  /** Jaro–Winkler similarity — native codegen'd Catalyst expression
    * (graft.functions.expr.JaroWinkler): the standard string comparator
    * behind probabilistic-linkage agreement fields. Classic Winkler
    * variant (0.7 boost threshold, prefix cap 4, floor'd transposition
    * halves, empty → 0.0) — byte-matched against DuckDB's
    * jaro_winkler_similarity so oracles can replay scores. */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.expr.JaroWinkler(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  private def nonEmpty(c: Column): Column =
    when(c.isNotNull && length(trim(c)) > 0, squashSpaces(c))

  /** make_name (names.py:117-182): prefer the full name when present,
    * else join the parts in the reference's canonical order:
    * prefix, name1, first, given, name2, second, middle, name3,
    * patronymic, matronymic, name4, name5, tail, last, suffix.
    * `concat_ws` skips nulls, matching join_text. */
  def makeName(
      full: Column = lit(null),
      name1: Column = lit(null),
      firstName: Column = lit(null),
      givenName: Column = lit(null),
      name2: Column = lit(null),
      secondName: Column = lit(null),
      middleName: Column = lit(null),
      name3: Column = lit(null),
      patronymic: Column = lit(null),
      matronymic: Column = lit(null),
      name4: Column = lit(null),
      name5: Column = lit(null),
      tailName: Column = lit(null),
      lastName: Column = lit(null),
      prefix: Column = lit(null),
      suffix: Column = lit(null)): Column = {
    val joined = concat_ws(" ",
      Seq(prefix, name1, firstName, givenName, name2, secondName, middleName,
        name3, patronymic, matronymic, name4, name5, tailName, lastName, suffix)
        .map(nonEmpty): _*)
    coalesce(nonEmpty(full), when(length(joined) > 0, joined))
  }

  private def quote(s: String) = java.util.regex.Pattern.quote(s)

  /** strip_name_titles (names.py:48-115): remove configured title
    * prefixes/suffixes at word boundaries. Terms are applied longest-
    * first; a bare-word term must be delimited by whitespace (so "Hon"
    * never truncates "Honorata"), while terms carrying their own
    * punctuation ("Dr.", "(Dr.)") match directly. The reference loops to
    * a fixpoint; chained affixes beyond `passes` rounds stay. */
  def stripNameTitles(
      name: Column,
      prefixes: Seq[String],
      suffixes: Seq[String],
      passes: Int = 2): Column = {
    val pre = prefixes.map(t => t.trim -> t.trim.last.isLetterOrDigit)
      .sortBy(-_._1.length)
    val suf = suffixes.map(t => t.trim -> t.trim.head.isLetterOrDigit)
      .sortBy(-_._1.length)
    val squashed = squashSpaces(name)
    val stripped = (1 to passes).foldLeft(squashed) { (n0, _) =>
      val afterPre = pre.foldLeft(n0) { case (n, (term, bare)) =>
        val pat = if (bare) s"(?i)^${quote(term)}(\\s+|$$)" else s"(?i)^${quote(term)}\\s*"
        trim(regexp_replace(n, pat, ""))
      }
      suf.foldLeft(afterPre) { case (n, (term, bare)) =>
        val pat = if (bare) s"(?i)(^|\\s+)${quote(term)}$$" else s"(?i)\\s*${quote(term)}$$"
        trim(regexp_replace(n, pat, ""))
      }
    }
    // all-title names reduce to empty → null (surfaced, not silently kept)
    when(length(stripped) > 0, stripped)
  }

  /** split_comma_names (names.py:302-343) without the datapatch escape
    * hatch: strip commas before company-type suffixes, drop a trailing
    * comma, then split on ',' only when the string has no and/&/+
    * conjunction and is not a "Last, First" pair. Returns array<string>. */
  def splitCommaNames(text: Column): Column = {
    val cleanComma = regexp_replace(squashSpaces(text),
      "(?i), \\b(LLC|L\\.L\\.C|Inc|Jr|INC|LLLP|L\\.P|LP|Sr|III|II|IV|S\\.A|LTD|USA INC|\\(?A/K/A|\\(?N\\.K\\.A|\\(?N/K/A|\\(?F\\.K\\.A|formerly known as|INCORPORATED)\\b",
      " $1")
    val noTrail = regexp_replace(cleanComma, ",$", "")
    val hasAnd = noTrail.rlike("(?i)(\\band\\b|&|\\+)")
    val lnameFname = noTrail.rlike("(?i)^\\w+, \\w+$")
    when(!hasAnd && !lnameFname,
      filter(transform(split(noTrail, ","), n => trim(n)), n => length(n) > 0))
      .otherwise(array(noTrail))
  }

  /** apply_name (names.py:200-300), full routing parity: every part
    * category maps to its FtM prop exactly as the reference —
    * given/first/name1 → firstName, second/name2 → secondName,
    * middle/name3/name4/name5 → middleName, patronymic → fatherName,
    * matronymic → motherName, last/maiden/tail → lastName — and the
    * full name is synthesized when absent (origin 'inferred' /
    * ORIGIN_INFERRED; prefix and suffix only join into the full name,
    * they are not parts). `alias`/`isWeak` select the name prop (alias
    * / weakAlias); `isWeak` suppresses the part props entirely.
    * Returns an array<struct(prop, value, lang, origin)> ready for the
    * ingestion explode; null/empty parts produce no entry. */
  def applyName(
      full: Column = lit(null),
      name1: Column = lit(null),
      firstName: Column = lit(null),
      givenName: Column = lit(null),
      name2: Column = lit(null),
      secondName: Column = lit(null),
      middleName: Column = lit(null),
      name3: Column = lit(null),
      patronymic: Column = lit(null),
      matronymic: Column = lit(null),
      name4: Column = lit(null),
      name5: Column = lit(null),
      tailName: Column = lit(null),
      lastName: Column = lit(null),
      maidenName: Column = lit(null),
      prefix: Column = lit(null),
      suffix: Column = lit(null),
      alias: Boolean = false,
      nameProp: String = "name",
      isWeak: Boolean = false,
      lang: Column = lit(null).cast("string"),
      origin: String = "crawl"): Column = {
    val made = makeName(full = full, name1 = name1, firstName = firstName,
      givenName = givenName, name2 = name2, secondName = secondName,
      middleName = middleName, name3 = name3, patronymic = patronymic,
      matronymic = matronymic, name4 = name4, name5 = name5,
      tailName = tailName, lastName = lastName, prefix = prefix,
      suffix = suffix)
    val fullProp = if (isWeak) "weakAlias" else if (alias) "alias" else nameProp
    val fullOrigin = when(full.isNotNull && length(trim(full)) > 0, lit(origin))
      .otherwise(lit("inferred"))
    def part(prop: String, v: Column) =
      when(v.isNotNull && length(trim(v)) > 0,
        struct(lit(prop).as("prop"), squashSpaces(v).as("value"),
          lang.as("lang"), lit(origin).as("origin")))
    val parts =
      if (isWeak) Seq.empty[Column]
      else Seq(
        part("firstName", givenName), part("firstName", firstName),
        part("secondName", secondName), part("middleName", middleName),
        part("fatherName", patronymic), part("motherName", matronymic),
        part("lastName", lastName), part("lastName", maidenName),
        part("firstName", name1), part("secondName", name2),
        part("middleName", name3), part("middleName", name4),
        part("middleName", name5), part("lastName", tailName))
    filter(array(parts :+
      when(made.isNotNull,
        struct(lit(fullProp).as("prop"), made.as("value"),
          lang.as("lang"), fullOrigin.as("origin"))): _*),
      e => e.isNotNull)
  }

  /** Suggestion heuristics (names.py:361-400): which property a
    * suspicious name should be DEMOTED to instead of dropped —
    * single-token Person names become weakAlias; short all-uppercase
    * single-token organization names become abbreviation. Returns the
    * suggested property or null (keep as name). `isPerson`/`isOrg` are
    * the schema-lattice flags (precomputed by the caller from
    * FtmModel.descendants). */
  def suggestNameProp(
      name: Column,
      isPerson: Column,
      isOrg: Column,
      abbreviationMaxLen: Int = 8): Column = {
    val n = squashSpaces(name)
    val singleToken = !n.contains(" ")
    val allUpper = n === upper(n) && n.rlike("[A-Z]")
    when(isPerson && singleToken, "weakAlias")
      .when(isOrg && singleToken && allUpper && length(n) < abbreviationMaxLen,
        "abbreviation")
      .otherwise(lit(null).cast("string"))
  }

  /** Name regularity heuristics (names.py:344-439), simplified to the
    * schema-spec checks: reject values containing configured characters
    * or phrases, too-short single tokens, or (for persons) a leading
    * digit. Returns true when the name looks REGULAR. */
  def nameRegular(
      name: Column,
      rejectChars: String = "",
      rejectPhrases: Seq[String] = Nil,
      minLength: Int = 2,
      rejectLeadingDigit: Boolean = true): Column = {
    val n = squashSpaces(name)
    val charsOk =
      if (rejectChars.isEmpty) lit(true)
      else !n.rlike("[" + quote(rejectChars) + "]")
    val phraseOk = rejectPhrases.foldLeft(lit(true)) { (acc, p) =>
      acc && !n.rlike("(?i)\\b" + quote(p) + "\\b")
    }
    val lenOk = length(n) >= minLength
    val digitOk = if (rejectLeadingDigit) !n.rlike("^[0-9]") else lit(true)
    charsOk && phraseOk && lenOk && digitOk
  }
}
