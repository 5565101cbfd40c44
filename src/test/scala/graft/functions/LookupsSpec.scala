package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LookupsSpec extends SparkSpec {
  import spark.implicits._

  test("datapatch semantics: multi-value explode, retarget, contains, first-match-wins") {
    val lookup = Lookups.lookupFrame(spark, Seq(
      Lookups.Option_("congo", Seq("DR Congo", "Congo Brazzaville")),
      Lookups.Option_("moscou", Seq("Moscow")),
      // contains option AFTER the exact one: exact must win on ties
      Lookups.Option_("mos", Seq("ContainsMatch"), matchType = "contains"),
      Lookups.Option_("junk", Seq(), prop = "notes")))
    val input = Seq(
      (1, "address", "Congo"),        // multi-value explode
      (2, "address", " MOSCOU "),     // squash + case-insensitive exact beats contains
      (3, "address", "in mosul"),     // contains-only match
      (4, "address", "JUNK"),         // empty values keep original, retarget prop
      (5, "address", "Paris")         // no match: pass through
    ).toDF("id", "prop", "value")
    val out = Lookups.applyLookup(input, lookup, "value", "prop")
      .select("id", "prop", "value").as[(Int, String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(out(1) == Set(("address", "DR Congo"), ("address", "Congo Brazzaville")))
    assert(out(2) == Set(("address", "Moscow")))
    assert(out(3) == Set(("address", "ContainsMatch")))
    assert(out(4) == Set(("notes", "JUNK")))
    assert(out(5) == Set(("address", "Paris")))
  }
}
