package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic IDs (F10/F11): slugs and hash entity IDs
  * (zavod/zavod/context.py:504-531, zavod/zavod/tools/util.py:34-56,
  * helpers/positions.py:190-205).
  */
object Ids {

  /** Slugify one value: lowercase, non-alphanumeric runs → '-', trimmed. */
  def slugify(s: Column): Column =
    regexp_replace(regexp_replace(lower(trim(s)), "[^a-z0-9]+", "-"), "^-+|-+$", "")

  /** make_slug: join slugified parts with '-', apply the 255-char cap;
    * empty → null (context.py:504-517). */
  def makeSlug(prefix: String, parts: Column*): Column = {
    val joined = concat_ws("-",
      (lit(prefix) +: parts.map(slugify)).map(p => when(length(p) > 0, p)): _*)
    when(length(joined) > length(lit(prefix)) + 1, substring(joined, 1, 255))
  }

  /** make_id: prefixed sha1 over the '|'-joined parts (util.py:34-56) —
    * deterministic across partitions and runs. */
  def makeId(prefix: String, parts: Column*): Column =
    concat(lit(prefix + "-"), sha1(concat_ws("|", parts: _*)))
}
