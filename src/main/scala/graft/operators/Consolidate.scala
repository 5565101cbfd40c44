package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Entity consolidation transforms (A6–A8): pure column expressions over
  * multi-valued property arrays, applied per entity before export
  * (zavod/zavod/exporters/consolidate.py:48-170).
  *
  * All functions here are Catalyst higher-order-function compositions —
  * no UDFs — so they stay inside whole-stage codegen.
  */
object Consolidate {

  /** A6: prefix-date simplification — within one entity+prop, drop partial
    * ISO date strings ("1990", "1990-05") that are prefixes of a longer
    * value in the same set (consolidate.py:62-90). Keeps non-prefix
    * partials (a bare year with no fuller date stays).
    */
  def simplifyPrefixDates(values: Column): Column =
    filter(values, x =>
      !exists(values, y =>
        (length(y) > length(x)) && (y.substr(lit(1), length(x)) === x)))

  /** A6 variant: creation-date pick = earliest value; modification-date
    * pick = latest (consolidate.py:71-77). Partial-ISO strings order
    * correctly lexicographically. */
  def minDate(values: Column): Column = array_min(values)
  def maxDate(values: Column): Column = array_max(values)

  /** The FtM date sentinel for "in the distant past, date unknown"
    * (followthemoney DateType.HISTORIC); consolidation strips it
    * (consolidate.py:82-88). */
  val HistoricDate = "historical"

  /** A6 (full): prefix simplification + HISTORIC sentinel removal — the
    * complete per-prop date consolidation step. */
  def simplifyDates(values: Column, historic: String = HistoricDate): Column =
    filter(simplifyPrefixDates(values), v => v =!= historic)

  /** A7: name reduction — drop weak aliases that duplicate a strong name
    * case-insensitively (consolidate.py:123-170). `strong` and `weak` are
    * string arrays; returns the weak values whose lowercase form is not
    * already covered by a strong name. */
  def reduceWeakNames(strong: Column, weak: Column): Column =
    filter(weak, w => !exists(strong, s => lower(s) === lower(w)))

  /** A7: case-variant reduction (consolidate.py:123-170 reduce_names):
    * among names equal under lowercasing, keep the best-cased variant —
    * mixed/lower case beats ALL-CAPS; ties break lexicographically.
    * Pure HOF expression over the name array. */
  def reduceCaseVariants(names: Column): Column = {
    // quality: the name is not shouting (differs from its uppercase form)
    def q(n: Column): Column = n =!= upper(n)
    filter(names, n =>
      !exists(names, o =>
        (lower(o) === lower(n)) && (o =!= n) &&
          ((q(o) && !q(n)) || (q(o) === q(n) && o < n))))
  }

  /** Datasets whose name statements are never removed by
    * [[simplifyNameStatements]] regardless of demotion
    * (consolidate.py:29-46 NEVER_REMOVE_NAMES_DATASETS). */
  val ProtectedNameDatasets: Set[String] = Set(
    "us_ofac_sdn", "us_ofac_cons", "eu_sanctions_map", "gb_fcdo_sanctions",
    "ca_dfatd_sema_sanctions", "au_dfat_sanctions")

  /** A7 (statement level): the full simplify_names flow with the
    * protected-source rule (consolidate.py:123-170). `stmts` is an
    * array<struct<value,dataset>> of name statements for ONE property;
    * `weakAliases` the entity's weakAlias values.
    *
    *  1. weak aliases that are short (<15 chars) or single-word demote
    *     case-insensitively matching names — but only if any strong
    *     name remains (always for the alias prop);
    *  2. the surviving values lose no-letter entries and case variants
    *     ([[reduceCaseVariants]]);
    *  3. statements whose value fell out are removed — UNLESS their
    *     dataset is protected (`protectedDatasets`), which keeps the
    *     statement verbatim. */
  def simplifyNameStatements(
      stmts: Column,
      weakAliases: Column,
      protectedDatasets: Seq[String] = ProtectedNameDatasets.toSeq.sorted,
      aliasProp: Boolean = false): Column = {
    val weak = transform(
      filter(weakAliases, a => length(a) < 15 || !a.contains(" ")),
      a => lower(a))
    val values = array_distinct(transform(stmts, s => s.getField("value")))
    val strong = filter(values, v => !array_contains(weak, lower(v)))
    val demoted =
      if (aliasProp) strong
      else when(size(strong) > 0, strong).otherwise(values)
    val reduced = reduceCaseVariants(filter(demoted, v => v.rlike("\\p{L}")))
    filter(stmts, s =>
      s.getField("dataset").isin(protectedDatasets: _*) ||
        array_contains(reduced, s.getField("value")))
  }

  /** A5/K5: squashed distinct-name key (case-insensitive, whitespace
    * collapsed) used for names.txt dedup (zavod/zavod/exporters/names.py:18-25). */
  def nameKey(name: Column): Column =
    regexp_replace(trim(lower(name)), "\\s+", " ")

  /** A8: undirected-edge endpoint normalization — the (source, target) pair
    * ordered canonically so A→B and B→A bucket together
    * (zavod/zavod/integration/edges.py:109-127). */
  def undirectedKey(source: Column, target: Column): Column =
    concat_ws("|", least(source, target), greatest(source, target))

  /** T7: partial-ISO interval bounds. A partial date "1990-05" covers
    * [1990-05-01, 1990-05-31]; empty/null = unbounded (wildcard).
    * Returns the inclusive lower bound as a full ISO string. */
  def partialDateLower(d: Column): Column =
    when(d.isNull || d === "", lit("0000-01-01"))
      .when(length(d) === 4, concat(d, lit("-01-01")))
      .when(length(d) === 7, concat(d, lit("-01")))
      .otherwise(d)

  /** Inclusive upper bound of a partial ISO date (end of year/month). */
  def partialDateUpper(d: Column): Column =
    when(d.isNull || d === "", lit("9999-12-31"))
      .when(length(d) === 4, concat(d, lit("-12-31")))
      .when(length(d) === 7,
        date_format(last_day(to_date(concat(d, lit("-01")))), "yyyy-MM-dd"))
      .otherwise(d)

  /** T7/J11: two partial-ISO ranges are compatible iff they intersect;
    * empty set = wildcard (edges.py:129-195). */
  def intervalsOverlap(aStart: Column, aEnd: Column, bStart: Column, bEnd: Column): Column =
    (partialDateLower(aStart) <= partialDateUpper(bEnd)) &&
      (partialDateLower(bStart) <= partialDateUpper(aEnd))
}
