package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SatellitesSpec extends SparkSpec {
  import spark.implicits._

  test("sanction satellites derive active status from the date range") {
    val rows = Seq(("p1", "2001", "2030"), ("p2", "2001", "2002"))
      .toDF("eid", "s", "e")
    val out = Satellites.makeSanction(rows, $"eid", lit("k"),
        lit("PROG"), lit("ZZ-1"), $"s", $"e", lit("2020-06-15"))
      .select($"id", element_at($"properties", "entity")(0).as("ent"),
        element_at($"properties", "status")(0).as("status"))
      .as[(String, String, String)].collect().map(r => r._2 -> r).toMap
    assert(out("p1")._3 == "active" && out("p2")._3 == "inactive")
    assert(out("p1")._1.startsWith("sanction-"))
    // deterministic: same inputs, same id
    val again = Satellites.makeSanction(rows, $"eid", lit("k"),
      lit("PROG"), lit("ZZ-1"), $"s", $"e", lit("2020-06-15"))
      .select($"id").as[String].collect().toSet
    assert(again == out.values.map(_._1).toSet)
  }

  test("identification satellites skip empty numbers; passport flag upgrades schema") {
    val rows = Seq(("p1", "AB123"), ("p2", null), ("p3", "")).toDF("eid", "num")
    val ids = Satellites.makeIdentification(rows, $"eid", $"num",
      country = lit("de"))
    assert(ids.count() == 1)
    assert(ids.select($"schema").as[String].collect()(0) == "Identification")
    val pass = Satellites.makeIdentification(rows, $"eid", $"num", passport = true)
    assert(pass.select($"schema").as[String].collect()(0) == "Passport")
  }

  test("article + documentation factories link mentions deterministically") {
    val rows = Seq(("http://ex.org/a1", "e1", "Big Story", "2024-05-01"))
      .toDF("url", "eid", "title", "pub")
    val art = Satellites.makeArticle(rows, $"url", title = $"title",
      publishedAt = $"pub")
    val a = art.select($"id", $"schema",
      element_at($"properties", "title")(0),
      element_at($"properties", "publishedAt")(0)).as[(String, String, String, String)]
      .collect()(0)
    assert(a._1.startsWith("article-") && a._2 == "Article")
    assert(a._3 == "Big Story" && a._4 == "2024-05-01")
    // same url => same id (stable key)
    assert(Satellites.makeArticle(rows, $"url").select($"id")
      .as[String].collect()(0) == a._1)
    val doc = Satellites.makeDocumentation(rows, $"eid", lit(a._1), date = $"pub")
      .select($"schema", element_at($"properties", "entity")(0),
        element_at($"properties", "document")(0),
        element_at($"properties", "date")(0))
      .as[(String, String, String, String)].collect()(0)
    assert(doc == ("Documentation", "e1", a._1, "2024-05-01"))
  }

  test("position factory keys by name+country+area and skips blank names") {
    val rows = Seq(("Minister of X", "de", "Bavaria"), ("", "fr", null))
      .toDF("nm", "cc", "area")
    val out = Satellites.makePosition(rows, $"nm", country = $"cc",
      topics = array(lit("gov.national")), subnationalArea = $"area")
    val collected = out.select($"id", $"schema",
      element_at($"properties", "subnationalArea")(0),
      element_at($"properties", "topics")(0))
      .as[(String, String, String, String)].collect()
    assert(collected.length == 1) // blank name row dropped
    assert(collected(0)._1.startsWith("position-"))
    assert(collected(0)._2 == "Position")
    assert(collected(0)._3 == "Bavaria" && collected(0)._4 == "gov.national")
  }

  test("security factory: non-country ISIN prefixes carry no country") {
    val rows = Seq(("de000A1B2C3d"), ("XS9999999999")).toDF("isin")
    val out = Satellites.makeSecurity(rows, $"isin")
      .select($"id", coalesce(element_at($"properties", "country")(0), lit("")))
      .as[(String, String)].collect().toMap
    assert(out("isin-DE000A1B2C3D") == "de")
    assert(out("isin-XS9999999999") == "")
  }

  test("occupancy satellites route open-ended mandates per convention") {
    val rows = Seq(("p1", "pos1", "2010", "")).toDF("pid", "pos", "s", "e")
    def status(noEnd: Boolean): String =
      Satellites.makeOccupancy(rows, $"pid", $"pos", $"s", $"e",
          lit(null).cast("string"), lit("2020-06-15"),
          noEndImpliesCurrent = noEnd)
        .select(element_at($"properties", "status")(0)).as[String].collect()(0)
    assert(status(true) == "current")
    assert(status(false) == "unknown")
  }
}
