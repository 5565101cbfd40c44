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

  test("senzing json record carries type, names, gender and identifiers") {
    val out = Exporters.senzingJsonLines(entities, "OPEN_SANCTIONS")
      .as[(String, String)].collect().toMap
    assert(out("p1") ==
      """{"DATA_SOURCE":"OPEN_SANCTIONS","RECORD_ID":"p1","RECORD_TYPE":"PERSON","NAMES":[{"NAME_TYPE":"PRIMARY","NAME_FULL":"Alice"}],"GENDER":"F","IDENTIFIERS":[{"OTHER_ID_TYPE":"OPEN_SANCTIONS","OTHER_ID_NUMBER":"p1"},{"TAX_ID_NUMBER":"INN9"}]}""")
    assert(!out.contains("s1")) // non-matchable schema skipped
  }

  test("senzing record families: adjacent address w/ BUSINESS type, edge relationships") {
    val ents = Seq(
      ("o1", "Company", Map("name" -> Seq("Acme"), "country" -> Seq("us"),
        "addressEntity" -> Seq("a1"))),
      ("p9", "Person", Map("name" -> Seq("Boss"), "alias" -> Seq("BOSS", "El Jefe"))),
      ("a1", "Address", Map("full" -> Seq("2 Side St"))),
      ("d1", "Directorship", Map("director" -> Seq("p9"),
        "organization" -> Seq("o1"), "role" -> Seq("CEO")))
    ).toDF("id", "schema", "properties")
    val shaped = Exporters.senzing(ents)
      .select($"record_id", $"names_json", $"addresses", $"countries", $"relationships")
      .as[(String, String, String, String, String)].collect()
      .map(r => r._1 -> r).toMap
    // case-variant alias deduped against caption; distinct alias kept
    assert(shaped("p9")._2 ==
      """[{"NAME_TYPE":"PRIMARY","NAME_FULL":"Boss"},{"NAME_TYPE":"ALIAS","NAME_FULL":"El Jefe"}]""")
    assert(shaped("o1")._3 == "ADDR_FULL=2 Side St")
    assert(shaped("o1")._4 == "COUNTRY_OF_ASSOCIATION=us")
    assert(shaped("p9")._5 == "POINTER|CEO|o1") // director side points
    assert(shaped("o1")._5 == "ANCHOR|o1")      // organization side anchors
    val json = Exporters.senzingJsonLines(ents, "OS_T")
      .as[(String, String)].collect().toMap
    assert(json("o1").contains(""""ADDRESSES":[{"ADDR_FULL":"2 Side St","ADDR_TYPE":"BUSINESS"}]"""))
    assert(json("p9").contains(""""RELATIONSHIPS":[{"REL_POINTER_ROLE":"CEO","REL_POINTER_DOMAIN":"OPEN_SANCTIONS","REL_POINTER_KEY":"o1"}]"""))
  }

  test("delta json lines carry the right entity version per op") {
    val prev = Seq(("e1", "Person", Map("name" -> Seq("Old"))),
      ("e2", "Person", Map("name" -> Seq("Gone"))))
      .toDF("id", "schema", "properties")
    val curr = Seq(("e1", "Person", Map("name" -> Seq("New"))),
      ("e3", "Person", Map("name" -> Seq("Born"))))
      .toDF("id", "schema", "properties")
    val diff = Seq(("e1", "MOD"), ("e2", "DEL"), ("e3", "ADD")).toDF("id", "op")
    val out = Exporters.deltaJsonLines(diff, curr, prev)
      .select($"id", $"json").as[(String, String)].collect().toMap
    assert(out("e1").contains("\"op\":\"MOD\"") && out("e1").contains("New"))
    assert(out("e2").contains("\"op\":\"DEL\"") && out("e2").contains("Gone"))
    assert(out("e3").contains("\"op\":\"ADD\"") && out("e3").contains("Born"))
  }

  test("publish copies a version to latest with a marker") {
    import graft.model.Statement
    val root = java.nio.file.Files.createTempDirectory("graft-pub").toString
    val stmts = Seq(Statement("s1", "e1", "e1", "name", "Person", "v", "ds",
      "en", "crawl", "v", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), external = false)).toDS()
    graft.sources.StatementIO.write(stmts, root, "v7")
    graft.sources.StatementIO.publishLatest(spark, root, "v7")
    val back = graft.sources.StatementIO.scanVersion(spark, root, "latest")
      .map(_.id).collect().toSeq
    assert(back == Seq("s1"))
    val marker = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/latest/_VERSION")), "UTF-8")
    assert(marker == "v7")
  }

  test("apply_name routes parts and infers the full name") {
    val routed = Seq(1).toDF("x")
      .select(explode(Names.applyName(
        firstName = lit("John"), lastName = lit("Doe"), prefix = lit("Dr"))).as("s"))
      .select($"s.prop", $"s.value", $"s.origin")
      .as[(String, String, String)].collect().toSet
    // prefix joins the full name but is NOT a part (names.py:256-273)
    assert(routed == Set(
      ("name", "Dr John Doe", "inferred"), // synthesized -> inferred origin
      ("firstName", "John", "crawl"),
      ("lastName", "Doe", "crawl")))

    val withFull = Seq(1).toDF("x")
      .select(explode(Names.applyName(full = lit("Jane Roe"),
        firstName = lit("Jane"))).as("s"))
      .select($"s.prop", $"s.origin").as[(String, String)].collect().toSet
    assert(withFull.contains(("name", "crawl"))) // source-provided full name
  }

  test("apply_name full routing: given/maiden/tail/matronymic, weak and alias modes") {
    val routed = Seq(1).toDF("x")
      .select(explode(Names.applyName(
        givenName = lit("Ana"), maidenName = lit("Silva"),
        tailName = lit("Costa"), matronymic = lit("Marques"),
        name2 = lit("Bea"), lang = lit("por"))).as("s"))
      .select($"s.prop", $"s.value", $"s.lang")
      .as[(String, String, String)].collect().toSet
    assert(routed == Set(
      ("firstName", "Ana", "por"),
      ("lastName", "Silva", "por"),
      ("lastName", "Costa", "por"),
      ("motherName", "Marques", "por"),
      ("secondName", "Bea", "por"),
      // join order: given, name2(second), matronymic, tail, last(maiden? no:
      // maiden maps to lastName part but make_name has no maiden slot)
      ("name", "Ana Bea Marques Costa", "por")))

    val weak = Seq(1).toDF("x")
      .select(explode(Names.applyName(full = lit("El Jefe"), isWeak = true,
        firstName = lit("X"))).as("s"))
      .select($"s.prop").as[String].collect().toSet
    assert(weak == Set("weakAlias")) // weak: no part props at all

    val al = Seq(1).toDF("x")
      .select(explode(Names.applyName(full = lit("Acme Intl"), alias = true)).as("s"))
      .select($"s.prop").as[String].collect().toSet
    assert(al == Set("alias"))
  }

  test("senzing record parity with the reference testdataset1 expectations") {
    // mirrors zavod/zavod/tests/exporters/test_senzing.py: an
    // Umbrella-Corp-style company and a Hans-Gruber-style person with
    // the documented family attributes
    val ents = Seq(
      ("osv-umbrella-corp", "Company", Map(
        "name" -> Seq("Umbrella Corporation"),
        "alias" -> Seq("Umbrella Pharmaceuticals, Inc.", "UMBRELLA CORPORATION"),
        "incorporationDate" -> Seq("1980"),
        "jurisdiction" -> Seq("us"),
        "registrationNumber" -> Seq("8723-BX"))),
      ("osv-hans-gruber", "Person", Map(
        "name" -> Seq("Hans Gruber"),
        "alias" -> Seq("Bill Clay"),
        "address" -> Seq("Lauensteiner Str. 49, 01277 Dresden"),
        "birthDate" -> Seq("1978-09-25"),
        "nationality" -> Seq("dd")))
    ).toDF("id", "schema", "properties")
    val json = Exporters.senzingJsonLines(ents, "OS_TESTDATASET1")
      .as[(String, String)].collect().toMap

    val company = json("osv-umbrella-corp")
    // record envelope key-for-key (senzing.py:223-228)
    assert(company.startsWith(
      """{"DATA_SOURCE":"OS_TESTDATASET1","RECORD_ID":"osv-umbrella-corp","RECORD_TYPE":"ORGANIZATION""""))
    // NAME_ORG for orgs; PRIMARY first, ALIAS after; case-variant alias
    // deduped against the caption by the normalised name hash
    // (senzing.py:117-124)
    assert(company.contains(
      """"NAMES":[{"NAME_TYPE":"PRIMARY","NAME_ORG":"Umbrella Corporation"},{"NAME_TYPE":"ALIAS","NAME_ORG":"Umbrella Pharmaceuticals, Inc."}]"""))
    assert(!company.contains("UMBRELLA CORPORATION"))
    assert(company.contains(""""DATES":[{"REGISTRATION_DATE":"1980"}]"""))
    assert(company.contains(""""COUNTRIES":[{"REGISTRATION_COUNTRY":"us"}]"""))
    assert(company.contains("""{"NATIONAL_ID_NUMBER":"8723-BX"}"""))

    val person = json("osv-hans-gruber")
    assert(person.startsWith(
      """{"DATA_SOURCE":"OS_TESTDATASET1","RECORD_ID":"osv-hans-gruber","RECORD_TYPE":"PERSON""""))
    assert(person.contains(
      """"NAMES":[{"NAME_TYPE":"PRIMARY","NAME_FULL":"Hans Gruber"},{"NAME_TYPE":"ALIAS","NAME_FULL":"Bill Clay"}]"""))
    assert(person.contains(""""ADDRESSES":[{"ADDR_FULL":"Lauensteiner Str. 49, 01277 Dresden"}]"""))
    assert(person.contains(""""DATES":[{"DATE_OF_BIRTH":"1978-09-25"}]"""))
    assert(person.contains(""""COUNTRIES":[{"NATIONALITY":"dd"}]"""))
  }
}
