package graft.operators

import graft.SparkSpec
import graft.functions.Names
import org.apache.spark.sql.functions._

class JsonProductsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val entities = Seq(
    ("p1", "Person", Map("name" -> Seq("Alice"), "gender" -> Seq("female"),
      "innCode" -> Seq("INN9"))),
    ("s1", "Sanction", Map("entity" -> Seq("p1"), "program" -> Seq("P")))
  ).toDF("id", "schema", "properties")

  test("nested json inlines depth-1 adjacents deterministically") {
    val out = Exporters.nestedJsonLines(entities)
      .as[(String, String)].collect().toMap
    assert(out("p1") ==
      """{"entity":{"id":"p1","schema":"Person","properties":{"gender":["female"],"innCode":["INN9"],"name":["Alice"]}},"adjacent":[{"id":"s1","schema":"Sanction"}]}""")
    assert(out("s1").endsWith(""""adjacent":[{"id":"p1","schema":"Person"}]}"""))
  }

  test("senzing json record carries type, gender and identifiers") {
    val out = Exporters.senzingJsonLines(entities, "OPEN_SANCTIONS")
      .as[(String, String)].collect().toMap
    assert(out("p1") ==
      """{"DATA_SOURCE":"OPEN_SANCTIONS","RECORD_ID":"p1","RECORD_TYPE":"PERSON","GENDER":"F","IDENTIFIERS":["INN9"]}""")
    assert(!out.contains("s1")) // non-matchable schema skipped
  }

  test("apply_name routes parts and infers the full name") {
    val routed = Seq(1).toDF("x")
      .select(explode(Names.applyName(
        firstName = lit("John"), lastName = lit("Doe"), prefix = lit("Dr"))).as("s"))
      .select($"s.prop", $"s.value", $"s.origin")
      .as[(String, String, String)].collect().toSet
    assert(routed == Set(
      ("name", "Dr John Doe", "inferred"), // synthesized -> inferred origin
      ("firstName", "John", "crawl"),
      ("lastName", "Doe", "crawl"),
      ("title", "Dr", "crawl")))

    val withFull = Seq(1).toDF("x")
      .select(explode(Names.applyName(full = lit("Jane Roe"),
        firstName = lit("Jane"))).as("s"))
      .select($"s.prop", $"s.origin").as[(String, String)].collect().toSet
    assert(withFull.contains(("name", "crawl"))) // source-provided full name
  }
}
