package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AdjacencyExportersSpec extends SparkSpec {
  import spark.implicits._

  private def ent(id: String, schema: String, props: (String, Seq[String])*) =
    (id, schema, props.toMap)

  private lazy val entities = Seq(
    ent("p1", "Person", "name" -> Seq("Alice"), "topics" -> Seq("poi")),
    ent("p2", "Person", "name" -> Seq("Bob")),
    ent("o1", "Organization", "name" -> Seq("Acme")),
    // Membership is an edge schema: member/organization are refs
    ent("m1", "Membership", "member" -> Seq("p1"), "organization" -> Seq("o1")),
    ent("s1", "Sanction", "entity" -> Seq("p1"), "program" -> Seq("P"),
      "startDate" -> Seq("2001"))
  ).toDF("id", "schema", "properties")

  test("refEdges explodes only entity-typed props") {
    val edges = Adjacency.refEdges(entities)
      .select("src_id", "prop", "dst_id").as[(String, String, String)]
      .collect().toSet
    assert(edges == Set(
      ("m1", "member", "p1"), ("m1", "organization", "o1"),
      ("s1", "entity", "p1")))
  }

  test("adjacent covers both directions") {
    val adj = Adjacency.adjacent(entities)
      .select("id", "direction", "other_id").as[(String, String, String)]
      .collect().toSet
    assert(adj.contains(("m1", "fwd", "p1")))
    assert(adj.contains(("p1", "inv", "m1")))
    assert(adj.contains(("p1", "inv", "s1")))
    assert(!adj.exists(a => a._1 == "p2"))
  }

  test("nested adjacency pulls far endpoints through edge schemata") {
    val nested = Exporters.nestedAdjacency(entities)
      .as[(String, Seq[String])].collect().toMap
    // p1 sees the membership edge AND its far endpoint o1 (edges don't
    // consume depth), plus the sanction
    assert(nested("p1").toSet == Set("m1", "o1", "s1"))
  }

  test("two-hop expansion reaches the organization from the person") {
    val reached = Adjacency.expand(entities, Seq("p1").toDF("id"), hops = 2)
      .as[String].collect().toSet
    assert(reached == Set("p1", "m1", "s1", "o1"))
  }

  test("nested target json inlines full adjacent dicts, edges don't consume depth") {
    val out = Exporters.nestedTargetJsonLines(entities)
      .as[(String, String)].collect().toMap
    assert(out.keySet == Set("p1")) // only the target
    // s1 arrives under its referring prop `entity` as a FULL dict; the
    // membership edge nests o1's full dict under `organization` while
    // the path rule drops p1 itself from `member`'s far endpoints
    assert(out("p1") ==
      """{"id":"p1","schema":"Person","properties":{""" +
      """"entity":[{"id":"s1","schema":"Sanction","properties":{"entity":["p1"],"program":["P"],"startDate":["2001"]}}],""" +
      """"member":[{"id":"m1","schema":"Membership","properties":{"member":["p1"],"organization":[{"id":"o1","schema":"Organization","properties":{"name":["Acme"]}}]}}],""" +
      """"name":["Alice"],"topics":["poi"]}}""")
  }

  test("ftm json line is deterministic with sorted keys and values") {
    val json = entities.filter($"id" === "s1")
      .select(Exporters.ftmJsonLine($"id", $"schema", $"properties"))
      .as[String].collect()(0)
    assert(json ==
      """{"id":"s1","schema":"Sanction","properties":{"entity":["p1"],"program":["P"],"startDate":["2001"]}}""")
  }

  test("ftm json escapes control characters per RFC 8259") {
    val df = Seq(("e\n1", "Person", Map("name" -> Seq("a\tb\nc", "de"))))
      .toDF("id", "schema", "properties")
    val json = df.select(Exporters.ftmJsonLine($"id", $"schema", $"properties"))
      .as[String].collect()(0)
    // embedded newline/tab become \n/\t escapes; other controls stripped;
    // the line itself stays single-line (JSONL framing intact)
    assert(json ==
      """{"id":"e\n1","schema":"Person","properties":{"name":["a\tb\nc","de"]}}""")
    assert(!json.contains('\n') && !json.contains('\t'))
  }

  test("sanction text joins program fields with ' - '") {
    val txt = entities.filter($"id" === "s1")
      .select(Exporters.sanctionText($"properties")).as[String].collect()(0)
    assert(txt == "P - 2001")
  }
}
