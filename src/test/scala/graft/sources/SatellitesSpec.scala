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
