package graft.operators

import graft.SparkSpec
import graft.model.Statement
import java.sql.Timestamp

class EntityAssemblerSpec extends SparkSpec {
  import spark.implicits._

  private def st(eid: String, prop: String, value: String, schema: String,
                 dataset: String = "ds1", first: Long = 1000L, last: Long = 2000L,
                 canonical: String = null): Statement =
    Statement(s"$eid-$prop-$value", eid, if (canonical == null) eid else canonical,
      prop, schema, value, dataset, "en", "crawl", value,
      new Timestamp(first), new Timestamp(last), external = false)

  test("assembles multi-valued props, narrows schema, spans seen-window") {
    val stmts = Seq(
      st("e1", "name", "Alice", "LegalEntity", first = 500L),
      st("e1", "name", "Alicia", "Person", last = 9000L),
      st("e1", "birthDate", "1980", "Person", dataset = "ds2"),
      st("e2", "name", "Acme", "Company")
    ).toDS()
    val out = EntityAssembler.assemble(stmts).collect().map(e => e.id -> e).toMap
    val e1 = out("e1")
    assert(e1.schema == "Person") // LegalEntity + Person -> Person
    assert(e1.properties("name") == Seq("Alice", "Alicia"))
    assert(e1.properties("birthDate") == Seq("1980"))
    assert(e1.datasets == Seq("ds1", "ds2"))
    assert(e1.firstSeen.get.getTime == 500L && e1.lastSeen.get.getTime == 9000L)
    assert(out("e2").schema == "Company")
  }

  test("groups by canonical id and collects referents") {
    val stmts = Seq(
      st("a1", "name", "X Corp", "Company", canonical = "canon-1"),
      st("a2", "name", "X Corporation", "Company", canonical = "canon-1"),
      st("b1", "name", "Other", "Company")
    ).toDS()
    val out = EntityAssembler.assemble(stmts).collect().map(e => e.id -> e).toMap
    assert(out.keySet == Set("canon-1", "b1"))
    assert(out("canon-1").referents == Seq("a1", "a2"))
    assert(out("canon-1").properties("name") == Seq("X Corp", "X Corporation"))
  }

  test("duplicate values collapse to a set; BASE prop is skipped") {
    val stmts = Seq(
      st("e1", "name", "Same", "Thing"),
      st("e1", "name", "Same", "Thing", dataset = "ds2"),
      st("e1", Statement.Base, "e1", "Thing")
    ).toDS()
    val e = EntityAssembler.assemble(stmts).collect().head
    assert(e.properties("name") == Seq("Same"))
    assert(!e.properties.contains(Statement.Base))
  }

  test("columnar plan and typed aggregator agree") {
    val stmts = Seq(
      st("e1", "name", "Alice", "LegalEntity", first = 500L),
      st("e1", "name", "Alicia", "Person", last = 9000L),
      st("e1", "birthDate", "1980", "Person", dataset = "ds2"),
      st("a1", "name", "X", "Company", canonical = "canon-1"),
      st("a2", "name", "Y", "Company", canonical = "canon-1")
    ).toDS()
    val colOut = EntityAssembler.assemble(stmts).collect()
      .map(e => e.id -> e).toMap
    val aggOut = EntityAssembler.assembleAggregator(stmts).collect()
      .map(e => e.id -> e).toMap
    assert(colOut.keySet == aggOut.keySet)
    colOut.keySet.foreach { id =>
      assert(colOut(id) == aggOut(id), s"mismatch for $id")
    }
  }

  test("Delta.entityHashes ≡ entityHash over assembleColumnar output") {
    import org.apache.spark.sql.functions._
    // exercises every divergence hazard: canonical grouping, duplicate
    // values, multi-schema narrowing, the Base existence row, and a
    // value containing the separator
    val stmts = Seq(
      st("e1", "name", "Alice", "LegalEntity", first = 500L),
      st("e1", "name", "Alice", "Person", dataset = "ds2"), // dup value
      st("e1", "note", "a|b", "Person"),                    // separator
      st("e1", Statement.Base, "e1", "Person"),
      st("a1", "name", "X", "Company", canonical = "canon-1"),
      st("a2", "name", "Y", "Company", canonical = "canon-1")
    ).toDS().toDF()
    val viaAssemble = EntityAssembler.assembleColumnar(stmts)
      .select(col("id").as("entity_id"),
        Delta.entityHash(col("id"), col("schema"),
          flatten(transform(map_entries(col("properties")), e =>
            transform(e.getField("value"),
              v => concat(e.getField("key"), lit("="), v))))).as("hash"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val direct = Delta.entityHashes(stmts)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(direct === viaAssemble)
  }

  test("target detection via risk topics") {
    val stmts = Seq(
      st("e1", "topics", "sanction", "Person"),
      st("e2", "topics", "other.topic", "Person")
    ).toDS()
    val out = EntityAssembler.assemble(stmts).collect().map(e => e.id -> e).toMap
    assert(out("e1").isTarget && !out("e2").isTarget)
  }
}
