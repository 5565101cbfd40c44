package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-scraped corpora — the dedup key a
  * crawl pipeline groups on before any content comparison runs.
  * Rules (the common-crawl normalization core): lowercase scheme and
  * host, strip a leading `www.` and default ports, drop the fragment,
  * drop `utm_*` tracking parameters, sort surviving query parameters,
  * and trim a trailing slash from non-root paths. Path case is
  * preserved (URL paths are case-sensitive; hosts are not).
  *
  * Pure string/regex/array expressions — RE2-compatible patterns so
  * the same strings drive SQL-engine oracles — and no UDFs, so the
  * normalization runs inside codegen across the full crawl.
  */
object Urls {

  /** Lowercased scheme ("" when the value has none). */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z]+)://", 1))

  /** Lowercased host, `www.` prefix and `:80`/`:443` default ports
    * stripped. */
  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)),
      "^www\\.|:443$|:80$", "")

  /** Path with a trailing slash trimmed; bare hosts normalize to "/". */
  def path(url: Column): Column = {
    val p = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    when(p === "" || p === "/", lit("/"))
      .when(substring(p, -1, 1) === "/", p.substr(lit(1), length(p) - 1))
      .otherwise(p)
  }

  /** Query string with empty and `utm_*` params dropped and the rest
    * sorted for order-independence ("" when nothing survives). */
  def query(url: Column): Column =
    array_join(array_sort(filter(
      split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_"))), "&")

  /** The full canonical form. */
  def canonicalUrl(url: Column): Column = {
    val rawPath = regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val cpath = when(rawPath === "" || rawPath === "/", lit("/"))
      .when(substring(rawPath, -1, 1) === "/",
        rawPath.substr(lit(1), length(rawPath) - 1))
      .otherwise(rawPath)
    val cquery = query(url)
    concat(scheme(url), lit("://"), host(url), cpath,
      when(cquery =!= "", concat(lit("?"), cquery)).otherwise(lit("")))
  }
}
