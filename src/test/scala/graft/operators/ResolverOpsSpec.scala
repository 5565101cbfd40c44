package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ResolverOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dangling refs are surfaced; resolved refs are not") {
    val entities = Seq(
      ("s1", "Sanction", Map("entity" -> Seq("p1", "ghost"))),
      ("p1", "Person", Map("name" -> Seq("A")))
    ).toDF("id", "schema", "properties")
    val dangling = Validators.danglingRefs(entities)
      .as[(String, String, String)].collect().toSet
    assert(dangling == Set(("s1", "entity", "ghost")))
  }

  test("perfect identifier match needs full cover of the larger set") {
    def pm(l: Seq[String], r: Seq[String]): Boolean =
      Seq(1).toDF("x").select(AutoMerge.perfectMatch(
        lit(l.toArray), lit(r.toArray)).as("r")).as[Boolean].collect()(0)
    assert(pm(Seq("a"), Seq("a")))
    assert(!pm(Seq("a", "b"), Seq("a")))   // intersection smaller than larger set
    assert(!pm(Seq(), Seq()))              // both empty: no evidence
    assert(pm(Seq("a", "b"), Seq("b", "a")))
  }

  test("edge dedupe merges overlapping buckets and vetoes role conflicts") {
    val edges = Seq(
      // bucket A: overlapping intervals, same role -> merged to min id
      (1L, "Membership", "p1", "o1", "2001", "2003", Seq("Chair")),
      (2L, "Membership", "p1", "o1", "2002", "2004", Seq("chair!")), // slug-equal
      // bucket A continued: wildcard role joins the group
      (3L, "Membership", "p1", "o1", "2003", "", Seq.empty[String]),
      // bucket B: conflicting roles -> vetoed, keep selves
      (10L, "Membership", "p2", "o1", "2001", "2002", Seq("Chair")),
      (11L, "Membership", "p2", "o1", "2001", "2002", Seq("Treasurer")),
      // bucket C: non-overlapping intervals -> separate singleton groups
      (20L, "Membership", "p3", "o1", "2001", "2001", Seq("X")),
      (21L, "Membership", "p3", "o1", "2005", "2006", Seq("X"))
    ).toDF("edge_id", "schema", "source", "target", "startDate", "endDate", "protected")
    val out = EdgeDedup.mergeGroups(edges, Set("Membership"))
      .as[(Long, Long, Boolean)].collect()
      .map { case (e, c, v) => e -> ((c, v)) }.toMap
    assert(out(1L) == ((1L, false)) && out(2L) == ((1L, false)) && out(3L) == ((1L, false)))
    assert(out(10L) == ((10L, true)) && out(11L) == ((11L, true)))
    assert(out(20L) == ((20L, false)) && out(21L) == ((21L, false)))
  }

  test("edge dedupe: a poisoned bucket of duplicate edges collapses to one rep") {
    // 100k identical copies of one relationship — quadratic pairing
    // would be 5×10⁹ pairs; the rep collapse makes it ONE rep, so this
    // must complete quickly and still merge everything to the min id
    val n = 100000
    val poisoned = spark.range(n).select(
      col("id").as("edge_id"), lit("Membership").as("schema"),
      lit("pX").as("source"), lit("oX").as("target"),
      lit("2001").as("startDate"), lit("2003").as("endDate"),
      lit(Array("Chair")).as("protected"))
    val extra = Seq(
      // same bucket, different-but-overlapping interval: joins the group
      (900000L, "Membership", "pX", "oX", "2002", "2004", Seq("chair!")),
      // unrelated healthy bucket: unchanged semantics
      (900001L, "Membership", "pY", "oY", "2001", "2002", Seq("A")),
      (900002L, "Membership", "pY", "oY", "2001", "2002", Seq("B"))
    ).toDF("edge_id", "schema", "source", "target", "startDate", "endDate", "protected")
    val t0 = System.nanoTime()
    val out = EdgeDedup.mergeGroups(poisoned.unionByName(extra), Set("Membership"))
      .as[(Long, Long, Boolean)].collect()
      .map { case (e, c, v) => e -> ((c, v)) }.toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.size == n + 3)
    assert(out(0L) == ((0L, false)) && out(99999L) == ((0L, false)))
    assert(out(900000L) == ((0L, false)))
    assert(out(900001L) == ((900001L, true)) && out(900002L) == ((900002L, true)))
    // asymptotic guard, not an SLA: the rep collapse makes this O(n);
    // a quadratic regression (5×10⁹ pairs) would run for HOURS. The
    // budget is deliberately contention-safe — round 5 shipped a red
    // suite because a 60 s budget met a loaded driver box at 74.9 s.
    assert(secs < 300.0, s"poisoned bucket took ${secs}s")
  }

  test("occupancy status: ended / current / unknown") {
    def st(s: String, e: String, death: String): String =
      Seq(1).toDF("x").select(Enricher.occupancyStatus(
        lit(s), lit(e), if (death == null) lit(null).cast("string") else lit(death),
        lit("2020-06-15")).as("r")).as[String].collect()(0)
    assert(st("2001", "2010", null) == "ended")
    assert(st("2001", "", null) == "current")
    assert(st("2001", "2025", null) == "current")
    assert(st("2021", "2025", null) == "unknown") // not started yet
    assert(st("2001", "", "2015") == "ended")      // holder died
  }

  test("entity hash does not collide on separator-bearing values") {
    def h(pairs: Seq[String]): String =
      Seq(1).toDF("x").select(Delta.entityHash(
        lit("e1"), lit("Person"), lit(pairs.toArray)).as("r")).as[String].collect()(0)
    assert(h(Seq("a|b")) != h(Seq("a", "b")))
    assert(h(Seq("x", "y")) == h(Seq("y", "x"))) // order-insensitive
  }

  test("schema conflicts are reported, compatible narrowing is not") {
    val stmts = Seq(
      ("e1", "e1", "Person"), ("e1", "e1", "Vessel"),      // no common schema
      ("e2", "e2", "LegalEntity"), ("e2", "e2", "Person")  // narrows fine
    ).toDF("entityId", "canonicalId", "schema")
    val out = Validators.schemaConflicts(stmts)
      .as[(String, String)].collect().toMap
    assert(out.keySet == Set("e1"))
    assert(out("e1") == "Person;Vessel")
  }

  test("person cutoff drops the dead and the implausibly old") {
    def alive(death: String, birth: String): Boolean =
      Seq(1).toDF("x").select(Enricher.personAlive(
        if (death == null) lit(null).cast("string") else lit(death),
        if (birth == null) lit(null).cast("string") else lit(birth),
        lit("2020-01-01")).as("r")).as[Boolean].collect()(0)
    assert(alive(null, "1980"))
    assert(!alive("2001", "1950"))
    assert(!alive(null, "1890"))
  }
}
