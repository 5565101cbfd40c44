package graft.queries

import graft.etl.Etl
import graft.operators.Validators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** q109: the end-to-end `zavod run` analog (zavod/zavod/cli/etl.py:95-154)
  * driven twice — a v1 run, then a v2 run with resolver decisions, an
  * assertion gate, first_seen preservation and a delta against v1 — and
  * verified by digesting the PUBLISHED products (read back from the
  * `datasets/latest/<name>` layout, i.e. after the publish copy).
  *
  * The digest per product is (line count, order-independent sum of a
  * 60-bit md5 prefix per line) — both exactly recomputable in DuckDB
  * from the base tables, so a wrong byte anywhere in any digested
  * product breaks the hash match. CSV products are digested on a
  * canonical '|'-joined projection (byte-level CSV framing is already
  * oracled by q96). ALL TEN published products are digested, the full
  * statistics.json document and the senzing records included.
  *
  * The v2 entity model, mirrored in the oracle:
  *  - customer k → entity c{k}: Person (k%4≠0, birthDate 19XX) or
  *    Company (registrationNumber RNk); name, country, topics=sanction
  *    when k%3=0
  *  - k%50=0 → duplicate entity d{k} (name + alias=UPPER(name)) merged
  *    into c{k} by a POSITIVE resolver decision (J3/R1)
  *  - v1 differs: no d{k}, k%7=0 entities absent (→ ADD), k%11=0 names
  *    carried an ' OLD' suffix (→ MOD), ghost entities x{k} for k%13=0
  *    (→ DEL); unchanged statements keep first_seen = v1's run time
  */
object EtlQueries {

  private val V1Time = "2025-01-01 00:00:00"
  private val V2Time = "2026-01-01 00:00:00"

  /** v2 statements: the full dataset incl. dup entities. */
  private def v2Statements(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("k"), col("c_name"),
        when(col("c_custkey") % 4 === 0, "Company").otherwise("Person").as("sch"),
        lower(col("n_name")).as("country"))
    val k = col("k")
    def stmt(base: DataFrame, eid: org.apache.spark.sql.Column, prop: String,
        value: org.apache.spark.sql.Column, runTime: String): DataFrame =
      base.select(
        md5(concat_ws("|", lit("etl_a"), eid, lit(prop), value)).as("id"),
        eid.as("entityId"), eid.as("canonicalId"),
        lit(prop).as("prop"), col("sch").as("schema"), value.as("value"),
        lit("etl_a").as("dataset"), lit("en").as("lang"),
        lit("crawl").as("origin"), value.as("originalValue"),
        lit(runTime).cast("timestamp").as("firstSeen"),
        lit(runTime).cast("timestamp").as("lastSeen"),
        lit(false).as("external"))
    val cid = concat(lit("c"), k.cast("string"))
    val did = concat(lit("d"), k.cast("string"))
    stmt(cust, cid, "name", col("c_name"), V2Time)
      .unionByName(stmt(cust, cid, "country", col("country"), V2Time))
      .unionByName(stmt(cust.filter(k % 4 =!= 0), cid, "birthDate",
        concat(lit("19"), (lit(50) + k % 50).cast("string")), V2Time))
      .unionByName(stmt(cust.filter(k % 4 === 0), cid, "registrationNumber",
        concat(lit("RN"), k.cast("string")), V2Time))
      .unionByName(stmt(cust.filter(k % 3 === 0), cid, "topics",
        lit("sanction"), V2Time))
      .unionByName(stmt(cust.filter(k % 50 === 0), did, "name",
        col("c_name"), V2Time))
      .unionByName(stmt(cust.filter(k % 50 === 0), did, "alias",
        upper(col("c_name")), V2Time))
  }

  /** v1 statements: k%7=0 absent, k%11=0 names suffixed ' OLD', ghost
    * x{k} rows for k%13=0, no dups. */
  private def v1Statements(s: SparkSession, d: String): DataFrame = {
    val v1name = when(col("k") % 11 === 0, concat(col("c_name"), lit(" OLD")))
      .otherwise(col("c_name"))
    val cust = t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("k"), col("c_name"),
        when(col("c_custkey") % 4 === 0, "Company").otherwise("Person").as("sch"),
        lower(col("n_name")).as("country"))
      .filter(col("k") % 7 =!= 0)
      .withColumn("c_name", v1name)
    val ghosts = t(s, d, "customer")
      .select(col("c_custkey").as("k"))
      .filter(col("k") % 13 === 0)
      .select(col("k"), concat(lit("Ghost "), col("k").cast("string")).as("c_name"),
        lit("Person").as("sch"), lit(null).cast("string").as("country"))
    val k = col("k")
    def stmt(base: DataFrame, eid: org.apache.spark.sql.Column, prop: String,
        value: org.apache.spark.sql.Column): DataFrame =
      base.select(
        md5(concat_ws("|", lit("etl_a"), eid, lit(prop), value)).as("id"),
        eid.as("entityId"), eid.as("canonicalId"),
        lit(prop).as("prop"), col("sch").as("schema"), value.as("value"),
        lit("etl_a").as("dataset"), lit("en").as("lang"),
        lit("crawl").as("origin"), value.as("originalValue"),
        lit(V1Time).cast("timestamp").as("firstSeen"),
        lit(V1Time).cast("timestamp").as("lastSeen"),
        lit(false).as("external"))
    val cid = concat(lit("c"), k.cast("string"))
    val xid = concat(lit("x"), k.cast("string"))
    stmt(cust, cid, "name", col("c_name"))
      .unionByName(stmt(cust, cid, "country", col("country")))
      .unionByName(stmt(cust.filter(k % 4 =!= 0), cid, "birthDate",
        concat(lit("19"), (lit(50) + k % 50).cast("string"))))
      .unionByName(stmt(cust.filter(k % 4 === 0), cid, "registrationNumber",
        concat(lit("RN"), k.cast("string"))))
      .unionByName(stmt(cust.filter(k % 3 === 0), cid, "topics", lit("sanction")))
      .unionByName(stmt(ghosts, xid, "name", col("c_name")))
  }

  /** Run v1 then v2 into a scratch root; return the latest product dir. */
  private def runPipeline(s: SparkSession, d: String): String = {
    import s.implicits._
    val root = "/tmp/graft_etl_q109_" + Q.scratchTag(d)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val noDecisions = Seq.empty[(String, String, String, String, java.sql.Timestamp)]
      .toDF("a", "b", "judgement", "user", "decided_at")
    // v1 exists to seed the versioned statement store (first_seen
    // preservation + delta base); its own products are not digested,
    // so the exporter fan-out is skipped — halves the query's cost
    Etl.run(s, v1Statements(s, d), noDecisions, Etl.Config(
      datasetName = "etl_a", version = "v1", outRoot = root, runTime = V1Time,
      assertions = Seq(Validators.Assertion("entity_count", "gte", "", 1L)),
      exporters = Seq.empty, republishLatest = false))

    val decisions = t(s, d, "customer")
      .filter(col("c_custkey") % 50 === 0)
      .select(concat(lit("c"), col("c_custkey").cast("string")).as("a"),
        concat(lit("d"), col("c_custkey").cast("string")).as("b"),
        lit("POSITIVE").as("judgement"), lit("etl").as("user"),
        lit(V2Time).cast("timestamp").as("decided_at"))
    Etl.run(s, v2Statements(s, d), decisions, Etl.Config(
      datasetName = "etl_a", version = "v2", outRoot = root, runTime = V2Time,
      assertions = Seq(
        Validators.Assertion("entity_count", "gte", "", 1L),
        Validators.Assertion("schema_entities", "gte", "Person", 1L)),
      previousVersion = Some("v1"), republishLatest = true))
    s"$root/datasets/latest/etl_a"
  }

  /** Order-independent digest: 60-bit md5-prefix fold per line, summed.
    * Exactly recomputable in DuckDB (strpos hex fold — see oracle). */
  private def digest(lines: DataFrame, product: String,
      line: org.apache.spark.sql.Column): DataFrame =
    lines.agg(
      count(lit(1)).as("n_lines"),
      sum(conv(substring(md5(line), 1, 15), 16, 10).cast("decimal(38,0)"))
        .cast("decimal(38,0)").cast("string").as("hash_sum"))
      .select(lit(product).as("product"), col("n_lines"), col("hash_sum"))

  // ---- q113: crawl + enrichment composed into ONE Etl.run ----
  // Subjects s{k} (one per customer, name + sanction topic when k%3=0)
  // enrich against an external target store: t{k} for even k carries
  // the SAME name (unique names ⇒ the blocked match set is exactly
  // (s{k}, t{k}) at Jaccard 1.0), plus a t-side entity reusing id s{k}
  // for k%10=0 (the same-id short-circuit, name 'Same {k}' that blocks
  // with nothing). The journal judges (s{k}, t{k}): k%10=0 POSITIVE,
  // k%10=6 NEGATIVE. Expected: POSITIVE targets merge INTO s{k}
  // (internal statements, canonicalId follows the resolver mapping),
  // NEGATIVE targets vanish, everything else lands external=true —
  // present in statements.csv, absent from ftm/names/targets products.

  private val EnrTime = "2026-02-01 00:00:00"

  private def enrStmt(base: DataFrame, ds: String,
      eid: org.apache.spark.sql.Column, prop: String,
      value: org.apache.spark.sql.Column,
      schema: String = "Person"): DataFrame =
    base.select(
      md5(concat_ws("|", lit(ds), eid, lit(prop), value)).as("id"),
      eid.as("entityId"), eid.as("canonicalId"),
      lit(prop).as("prop"), lit(schema).as("schema"), value.as("value"),
      lit(ds).as("dataset"), lit("en").as("lang"),
      lit("crawl").as("origin"), value.as("originalValue"),
      lit(EnrTime).cast("timestamp").as("firstSeen"),
      lit(EnrTime).cast("timestamp").as("lastSeen"),
      lit(false).as("external"))

  private def enrSubjects(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer").select(col("c_custkey").as("k"), col("c_name"))
    val k = col("k")
    val sid = concat(lit("s"), k.cast("string"))
    enrStmt(cust, "enr_a", sid, "name", col("c_name"))
      .unionByName(enrStmt(cust.filter(k % 3 === 0), "enr_a", sid,
        "topics", lit("sanction")))
  }

  private def enrTargets(s: SparkSession, d: String): DataFrame = {
    val cust = t(s, d, "customer").select(col("c_custkey").as("k"), col("c_name"))
    val k = col("k")
    val tid = concat(lit("t"), k.cast("string"))
    val sid = concat(lit("s"), k.cast("string"))
    val even = cust.filter(k % 2 === 0)
    enrStmt(even, "ext_b", tid, "name", col("c_name"))
      .unionByName(enrStmt(even, "ext_b", tid, "registrationNumber",
        concat(lit("X"), k.cast("string"))))
      .unionByName(enrStmt(even.filter(k % 3 === 0), "ext_b", tid,
        "topics", lit("sanction")))
      .unionByName(enrStmt(cust.filter(k % 10 === 0), "ext_b", sid,
        "name", concat(lit("Same "), k.cast("string"))))
  }

  private def enrDecisions(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(col("c_custkey").as("k"))
      .filter(col("k") % 10 === 0 || col("k") % 10 === 6)
      .select(concat(lit("s"), col("k").cast("string")).as("a"),
        concat(lit("t"), col("k").cast("string")).as("b"),
        when(col("k") % 10 === 0, "POSITIVE").otherwise("NEGATIVE").as("judgement"),
        lit("xref").as("user"),
        lit(EnrTime).cast("timestamp").as("decided_at"))

  val decls: Seq[Decl] = Seq(
    decl("q109_etl_run",
      (s, d) => {
        val latest = runPipeline(s, d)
        def text(p: String) = s.read.text(s"$latest/$p")
        def csv(p: String) = s.read.option("header", "true").csv(s"$latest/$p")
        val c = (n: String) => coalesce(col(n), lit(""))

        val ftm = digest(text("entities.ftm.json"), "entities.ftm.json", col("value"))
        val names = digest(text("names.txt"), "names.txt", col("value"))
        val deltaP = digest(text("entities.delta.json"), "entities.delta.json", col("value"))
        val catalogP = digest(text("catalog.json"), "catalog.json", col("value"))
        val indexP = digest(text("index.json"), "index.json", col("value"))
        val statsP = digest(text("statistics.json"), "statistics.json", col("value"))
        // targets with no adjacents nest as their plain FtM dict, so
        // the product is the ftm lines of the k%3=0 targets
        val nestedP = digest(text("targets.nested.json"), "targets.nested.json", col("value"))
        val senzingP = digest(text("senzing.json"), "senzing.json", col("value"))
        val stmtsCsv = digest(csv("statements.csv"), "statements.csv",
          concat_ws("|", col("id"), col("entity_id"), col("canonical_id"),
            col("prop"), col("prop_type"), col("schema"), c("value"),
            c("original_value"), col("dataset"), c("lang"), c("origin"),
            col("external"), substring(col("first_seen"), 1, 10),
            substring(col("last_seen"), 1, 10)))
        val simpleCsvP = digest(csv("targets.simple.csv"), "targets.simple.csv",
          concat_ws("|", col("id"), col("schema"), c("name"), c("aliases"),
            c("birth_date"), c("countries"), c("addresses"), c("identifiers"),
            c("sanctions"), c("phones"), c("emails"), c("program_ids"),
            c("dataset"), c("first_seen"), c("last_seen"), c("last_change")))

        ftm.unionByName(names).unionByName(deltaP).unionByName(catalogP)
          .unionByName(indexP).unionByName(statsP).unionByName(nestedP)
          .unionByName(senzingP).unionByName(stmtsCsv).unionByName(simpleCsvP)
          .sort("product")
      },
      EtlOracle.sql),

    decl("q113_etl_enrich",
      (s, d) => {
        val root = "/tmp/graft_etl_q113_" + Q.scratchTag(d)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        Etl.run(s, enrSubjects(s, d), enrDecisions(s, d), Etl.Config(
          datasetName = "enr_a", version = "v1", outRoot = root,
          runTime = EnrTime,
          exporters = Seq("entities.ftm.json", "names.txt",
            "statements.csv", "targets.simple.csv"),
          republishLatest = false,
          enrichment = Some(Etl.Enrichment(enrTargets(s, d)))))
        val dir = s"$root/datasets/v1/enr_a"
        def text(p: String) = s.read.text(s"$dir/$p")
        def csv(p: String) = s.read.option("header", "true").csv(s"$dir/$p")
        val c = (n: String) => coalesce(col(n), lit(""))
        digest(text("entities.ftm.json"), "entities.ftm.json", col("value"))
          .unionByName(digest(text("names.txt"), "names.txt", col("value")))
          .unionByName(digest(csv("statements.csv"), "statements.csv",
            concat_ws("|", col("id"), col("entity_id"), col("canonical_id"),
              col("prop"), col("prop_type"), col("schema"), c("value"),
              c("original_value"), col("dataset"), c("lang"), c("origin"),
              col("external"), substring(col("first_seen"), 1, 10),
              substring(col("last_seen"), 1, 10))))
          .unionByName(digest(csv("targets.simple.csv"), "targets.simple.csv",
            concat_ws("|", col("id"), col("schema"), c("name"), c("aliases"),
              c("birth_date"), c("countries"), c("addresses"), c("identifiers"),
              c("sanctions"), c("phones"), c("emails"), c("program_ids"),
              c("dataset"), c("first_seen"), c("last_seen"), c("last_change"))))
          .sort("product")
      },
      EtlOracle.enrichSql),

    // The enrichment EXPANSION flow (expand_wrapped, enrich.py:32-48)
    // under the oracle gate: every k%10==0 subject "alpha k" matches its
    // target t_k exactly (unique sorted bigram per k), the POSITIVE
    // decision routes it internal, and two expansion hops pull the
    // Ownership edge entity o_k (hop 1, inbound via asset) and the
    // owner person w_k (hop 2, outbound via owner) into the run —
    // all internal by inheritance, t_k canonicalized into s_k's
    // cluster. DuckDB reconstructs the expanded statement store and
    // names product line-exact.
    decl("q115_etl_enrich_expand",
      (s, d) => {
        val root = "/tmp/graft_etl_q115_" + Q.scratchTag(d)
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val cust = t(s, d, "customer").select(col("c_custkey").as("k"))
        val k = col("k")
        def st(base: DataFrame, ds: String, eid: org.apache.spark.sql.Column,
            prop: String, value: org.apache.spark.sql.Column, schema: String) =
          enrStmt(base, ds, eid, prop, value, schema)
        val sid = concat(lit("s"), k.cast("string"))
        val tid = concat(lit("t"), k.cast("string"))
        val oid = concat(lit("o"), k.cast("string"))
        val wid = concat(lit("w"), k.cast("string"))
        val aname = concat(lit("alpha "), k.cast("string"))
        val subjects = st(cust, "enr_x", sid, "name", aname, "Company")
        val ten = cust.filter(k % 10 === 0)
        val targets = st(ten, "ext_y", tid, "name", aname, "Company")
          .unionByName(st(ten, "ext_y", oid, "asset", tid, "Ownership"))
          .unionByName(st(ten, "ext_y", oid, "owner", wid, "Ownership"))
          .unionByName(st(ten, "ext_y", wid, "name",
            concat(lit("wanda "), k.cast("string")), "Person"))
        val decisions = ten.select(sid.as("a"), tid.as("b"),
          lit("POSITIVE").as("judgement"), lit("xref").as("user"),
          lit(EnrTime).cast("timestamp").as("decided_at"))
        Etl.run(s, subjects, decisions, Etl.Config(
          datasetName = "enr_x", version = "v1", outRoot = root,
          runTime = EnrTime,
          exporters = Seq("names.txt", "statements.csv"),
          republishLatest = false,
          enrichment = Some(Etl.Enrichment(targets, expandHops = 2))))
        val dir = s"$root/datasets/v1/enr_x"
        val c = (n: String) => coalesce(col(n), lit(""))
        digest(s.read.text(s"$dir/names.txt"), "names.txt", col("value"))
          .unionByName(digest(
            s.read.option("header", "true").csv(s"$dir/statements.csv"),
            "statements.csv",
            concat_ws("|", col("id"), col("entity_id"), col("canonical_id"),
              col("prop"), col("prop_type"), col("schema"), c("value"),
              c("original_value"), col("dataset"), c("lang"), c("origin"),
              col("external"), substring(col("first_seen"), 1, 10),
              substring(col("last_seen"), 1, 10))))
          .sort("product")
      },
      EtlOracle.expandSql)
  )
}
