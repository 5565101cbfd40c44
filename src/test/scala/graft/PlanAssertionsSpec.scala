package graft

import graft.model.Statement
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Regression locks on the physical-plan properties the engine's scale
  * story depends on: predicate/projection pushdown at the statement
  * scan, broadcast canonicalization, and codegen coverage of the
  * cleaning path. A refactor that silently loses one of these would
  * still pass value-level tests — these specs pin the plans. */
class PlanAssertionsSpec extends SparkSpec {
  import spark.implicits._

  private def stmt(id: String, ds: String, external: Boolean) =
    Statement(id, "e1", "e1", "name", "Person", "v", ds, "en", "crawl", "v",
      Timestamp.valueOf("2026-01-01 00:00:00"),
      Timestamp.valueOf("2026-01-01 00:00:00"), external)

  test("statement scan pushes the external filter and prunes columns") {
    val root = Files.createTempDirectory("graft-plan").toString
    graft.sources.StatementIO.write(
      Seq(stmt("a", "ds1", external = false), stmt("b", "ds1", external = true)).toDS(),
      root, "v1")
    val scanned = graft.sources.StatementIO
      .scan(spark, root, "v1", Seq("ds1"))
      .select("id", "prop")
    val plan = scanned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("external"),
      plan.take(800))
    // projection pruning reaches the parquet reader: the ReadSchema must
    // not include untouched wide columns like originalValue
    assert(!plan.contains("originalValue"), plan.take(800))
  }

  test("canonicalization against a small linker table is a broadcast join") {
    val stmts = (1 to 1000).map(i => (s"e$i", s"stmt$i")).toDF("entityId", "id")
    val linker = Seq(("e1", "canon1"), ("e2", "canon1")).toDF("entityId", "canonicalId")
    val joined = stmts.join(broadcast(linker), Seq("entityId"), "left")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("the static cleaning dispatch stays inside whole-stage codegen") {
    // a local relation would constant-fold into a LocalTableScan; a
    // parquet scan forces a real projection stage
    val dir = Files.createTempDirectory("graft-clean-plan").toString
    Seq("IMO 9074729", "IMO 1234568").toDF("v").write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
      .select(graft.functions.ValueClean.cleanStatic("identifier", col("v"),
        Some("imo")).as("r"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"),
      plan.take(500))
  }

  test("the dynamic cleaning dispatch stays codegen'd under the 64 KB method limit") {
    import org.apache.spark.sql.execution.debug._
    import graft.functions.ValueClean
    // replicate the q69 shape — a when-chain value expression feeding the
    // dynamic dispatch — with the FULL validator set (worst case). The
    // single-Column form re-inlined this into a >64 KB method and fell
    // back to interpreted eval; cleanInto must stay inside codegen.
    val dir = Files.createTempDirectory("graft-dynclean").toString
    (1 to 64).map(i => (i.toLong, s"pri $i", s"2024-01-0${i % 9 + 1}"))
      .toDF("k", "pri", "dt").write.parquet(s"$dir/t")
    val o = spark.read.parquet(s"$dir/t")
    val k = col("k")
    val ptype = when(k % 6 === 0, "date").when(k % 6 === 1, "identifier")
      .when(k % 6 === 2, "name").when(k % 6 === 3, "topic")
      .when(k % 6 === 4, "address").otherwise("phone")
    val value = when(k % 6 === 0, concat(col("dt"), lit("T12:34:56")))
      .when(k % 6 === 1, concat(lit("IMO "),
        lpad((k * 37 % 10000000L).cast("string"), 7, "0")))
      .when(k % 6 === 2, when(k % 2 === 0, lit("7")).otherwise(col("pri")))
      .when(k % 6 === 3, lit("Sanction"))
      .when(k % 6 === 4, when(k % 2 === 0, lit("NY")).otherwise(lit("Long Street 1")))
      .otherwise(concat(lit("+1-"), k.cast("string")))
    val base = o.select(k, ptype.as("ptype"), value.as("value"))
    val res = ValueClean.cleanInto(base, "res", col("ptype"), col("value"),
      idFormat = when(col("ptype") === "identifier", "imo"),
      formats = ValueClean.AllFormats)
    val out = res.select(col("k"), col("res.clean").as("clean"),
      col("res.origin").as("origin"), col("res.warning").as("warning"))
    val plan = out.queryExecution.executedPlan
    val planStr = plan.toString
    assert(planStr.contains("*("), planStr.take(800))
    // every projection fuses into whole-stage codegen (the "*(n)" prefix)
    // EXCEPT the isolated idValid stage: higher-order-function validators
    // are CodegenFallback, so that one Project runs as a standalone
    // UnsafeProjection — which is the point of staging it.
    val bareProjects = planStr.linesIterator
      .filter(l => l.contains("Project [") && !l.contains("*("))
      .toSeq
    assert(bareProjects.forall(_.contains("__vc_idvalid")),
      bareProjects.mkString("\n"))
    // compile every generated subtree: all methods must stay far below
    // the 64 KB JVM ceiling (janino refuses at 65535; JIT bails at 8 KB)
    val stats = codegenStringSeq(plan)
    assert(stats.nonEmpty)
    stats.foreach { case (subtree, _, bc) =>
      assert(bc.maxMethodCodeSize < 65535, s"method too large in:\n$subtree")
    }
  }

  test("exporter adjacency rollups are salted two-phase and stay exact") {
    import graft.operators.Skew
    // hub dataset: one entity adjacent to 50k rows, a handful of normal ones
    val hub = (1 to 50000).map(i => ("hub", s"o$i")) ++
      (1 to 10).map(i => (s"e$i", s"o$i"))
    val df = hub.toDF("id", "other_id")
    val rolled = Skew.saltedArrayRollup(df, "id", col("other_id"),
      Seq("vals" -> collect_set(col("other_id"))), buckets = 16)
    // exactness: equals the unsalted rollup up to array order
    val direct = df.groupBy(col("id"))
      .agg(array_sort(collect_set(col("other_id"))).as("vals"))
      .as[(String, Seq[String])].collect().toMap
    val salted = rolled.select(col("id"), array_sort(col("vals")))
      .as[(String, Seq[String])].collect().toMap
    assert(salted == direct)
    assert(salted("hub").size == 50000)
    // the plan really is two-phase: a shuffle keyed by (id, _salt)
    // precedes the final shuffle keyed by id alone
    val plan = rolled.queryExecution.executedPlan.toString
    assert(plan.contains("_salt#"), plan.take(1200))
    assert("hashpartitioning\\(id#\\d+, _salt#".r.findFirstIn(plan).isDefined,
      plan.take(1200))

    // ADAPTIVE: a skew-free frame must take the single-shuffle path —
    // no salt column, no second aggregation — and still agree exactly
    val cold = (1 to 2000).map(i => (s"e${i % 200}", s"o$i")).toDF("id", "other_id")
    val coldRolled = Skew.saltedArrayRollup(cold, "id", col("other_id"),
      Seq("vals" -> collect_set(col("other_id"))), buckets = 16)
    val coldPlan = coldRolled.queryExecution.executedPlan.toString
    assert(!coldPlan.contains("_salt#"), coldPlan.take(1200))
    val coldDirect = cold.groupBy(col("id"))
      .agg(array_sort(collect_set(col("other_id"))).as("vals"))
      .as[(String, Seq[String])].collect().toMap
    val coldSalted = coldRolled.select(col("id"), array_sort(col("vals")))
      .as[(String, Seq[String])].collect().toMap
    assert(coldSalted == coldDirect)
  }

  test("IVF corpus assignment is a partial (map-side) aggregate, not a per-id window") {
    import graft.operators.Similarity
    val corpus = (1 to 100)
      .map(i => (i.toLong, Array.tabulate(4)(d => (i * (d + 1)).toDouble)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") % 10 === 0)
    val cents = corpus.filter(col("vec_id") % 20 === 7)
    val cand = Similarity.ivfCandidates(queries, corpus, cents, nprobe = 1)
    val plan = cand.queryExecution.executedPlan.toString
    // the n×k corpus-assignment frame must reduce k→1 map-side: a
    // partial min_by aggregate keyed by neighbor_id...
    assert(plan.contains("partial_min_by"), plan.take(2000))
    // ...and must NOT be shuffled into a per-neighbor window (the probe
    // ranking window over the tiny query side is the only one allowed)
    assert(!"windowspecdefinition\\(neighbor_id".r.findFirstIn(plan).isDefined,
      plan.take(2000))
  }

  test("similarity ranking shuffles never carry the embedding payload") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("graft-simplan").toString
    (1 to 64).map(i => (i.toLong, Array.tabulate(8)(d => (i * (d + 1)).toDouble)))
      .toDF("vec_id", "embedding").write.parquet(s"$dir/e")
    val e = spark.read.parquet(s"$dir/e")
    val qs = e.filter(col("vec_id") % 8 === 0)
    // exact top-k AND the bucketed variant: every shuffle in both plans
    // must move only (ids, cosine) — the scoring projection runs BEFORE
    // the exchange (at corpus scale a vector-laden ranking exchange is
    // the query wall). AQE wraps the plan and hides the exchanges from
    // collect, so plan with it off for the shape check.
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // cosineTopKLshTables joined the list in round 9: its candidate
      // dedupe previously shuffled (qvec, nvec) pair rows; the fused
      // score-at-collision-site form dedupes the bare triple
      for (df <- Seq(
          Similarity.cosineTopK(qs, e, k = 5),
          Similarity.cosineTopKLsh(qs, e, k = 5, dim = 8, planes = 4),
          Similarity.cosineTopKLsh(qs, e, k = 5, dim = 8, planes = 4, multiProbe = true),
          Similarity.cosineTopKLshTables(qs, e, k = 5, dim = 8, planes = 2, tables = 3))) {
        val shuffles = df.queryExecution.executedPlan.collect {
          case s: ShuffleExchangeExec => s.output.map(_.name)
        }
        assert(shuffles.nonEmpty)
        shuffles.foreach { cols =>
          assert(!cols.exists(c => c.contains("vec") && c != "vec_id"),
            s"embedding column in shuffle: $cols")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("manifest-pruned snapshot scan joins are broadcast-only") {
    import graft.operators.{Layout, Snapshot}
    val dir = Files.createTempDirectory("graft-snapplan").toString
    (0L until 2000L).map(i => (i, i * 3)).toDF("id", "k")
      .write.parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t")
    val m = Snapshot.manifestEntriesBy(df, expr("k div 500"), col("k"), 1L)
    val cands = Layout.candidateFiles(m, "key", lit(1000L), lit(2000L))
    val pruned = Layout.skipScan(df, expr("k div 500"), cands,
      col("k") >= 1000L && col("k") <= 2000L)
    val plan = pruned.queryExecution.executedPlan.toString
    // the candidate list is manifest-sized: its join onto the scan must
    // broadcast, never shuffle the table side
    assert(plan.contains("BroadcastHashJoin"), plan.take(600))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(600))
  }

  test("blocking topK prunes with ONE window shuffle; paragraph dedup has no window") {
    import graft.operators.{Blocking, Dedup}
    val cands = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (2L, 10L, 0.7))
      .toDF("subject_id", "target_id", "score")
    val topk = Blocking.topK(cands, k = 5)
    val topkPlan = topk.queryExecution.executedPlan.toString
    // both window functions (best-score + rank) share one partitioning:
    // exactly one exchange keyed by subject_id feeds them
    val exchanges = "Exchange hashpartitioning\\(subject_id".r
      .findAllIn(topkPlan).size
    assert(exchanges == 1, topkPlan.take(1500))

    val docs = Seq((1L, "a b c d e f"), (2L, "a b c x y z")).toDF("doc_id", "text")
    val dedup = Dedup.paragraphDedup(docs, col("doc_id"), col("text"))
    val plan = dedup.queryExecution.executedPlan.toString
    // first-occurrence selection must be an aggregate, never a
    // corpus-wide window (windows serialize per-key on one reducer)
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("as-of join is one exchange — union + running window, no range join") {
    import graft.operators.AsOf
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, 1.0)).toDF("k", "ts", "px")
    val out = AsOf.asOfJoin(left, right, "k", "ts",
      rightTieBreak = Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, plan.take(1500))
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(1500))
  }

  test("contamination and LM scoring join on keys — no nested loops") {
    import graft.operators.{Contamination, TextAnalysis}
    val docs = Seq(
      (1L, "a b c d e f g h i j", "train"),
      (2L, "a b c d e f g h k l", "eval")).toDF("doc_id", "text", "split")
    // the shingle overlap must be a hash equi-join on the shingle string
    val cPlan = Contamination.report(docs, col("doc_id"), col("text"), col("split"))
      .queryExecution.executedPlan.toString
    assert(!cPlan.contains("NestedLoop") && !cPlan.contains("CartesianProduct"),
      cPlan.take(1500))
    // LM scoring: count-table lookups are equi-joins; the only allowed
    // nested-loop is the broadcast of the 1-row vocab scalar
    val lPlan = TextAnalysis.bigramLmReport(docs, col("doc_id"), col("text"), col("split"))
      .queryExecution.executedPlan.toString
    assert(!lPlan.contains("CartesianProduct"), lPlan.take(1500))
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(lPlan).size
    assert(nlj <= 1, lPlan.take(1500))
  }

  test("BPE encode is a broadcast-only projection — no shuffle touches documents") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMergeRounds(docs, col("text"), rounds = 2)
      .select("round", "sym_a", "sym_b")
    val plan = TextAnalysis.bpeEncode(docs, col("doc_id"), col("text"), merges)
      .queryExecution.executedPlan.toString
    // the rules array reaches every partition as ONE broadcast row; the
    // document side must stay a narrow projection — a shuffle here would
    // move the whole corpus to apply a kilobyte of merge rules
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    val docShuffles = "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).size
    assert(docShuffles == 0, plan.take(1500))
  }

  test("incremental near-dedup joins on band buckets — never fresh × base") {
    import graft.operators.Dedup
    val base = (1L to 40L).map(i => (i, s"w$i x$i y$i z$i v$i")).toDF("id", "text")
    val fresh = (1L to 40L).map(i => (i + 100, s"w$i x$i y$i z$i v$i")).toDF("id", "text")
    val plan = Dedup.incrementalNearDup(base, col("id"), col("text"),
        fresh, col("id"), col("text"))
      .queryExecution.executedPlan.toString
    // the cross-corpus candidate join must be the banded equi-join — a
    // nested-loop/cartesian here is the all-pairs plan that dies at scale
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
  }

  test("logistic training keeps the weight table broadcast — features never re-shuffle onto it") {
    import graft.operators.TextAnalysis
    val docs = (0L until 50L).map(i =>
      (i, if (i % 2 == 0) "good fine" else "bad poor")).toDF("id", "text")
    val w = TextAnalysis.logisticWeights(docs, col("id"), col("text"),
      col("id") % 2 === 0, lit(true), buckets = 16, rounds = 1)
    val plan = TextAnalysis.logisticScores(docs, col("id"), col("text"), w, 16)
      .queryExecution.executedPlan.toString
    // scoring = features ⋈ broadcast(weights): a sort-merge join on the
    // bucket key would shuffle the corpus-sized feature frame against a
    // 16-row table
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!"SortMergeJoin.*\\bb\\b".r.findFirstIn(plan).isDefined, plan.take(1500))
  }

  test("streaming semantic dedup never shuffles the accepted store") {
    import graft.operators.AnnIndex
    // the accepted store grows without bound (index members + all kept
    // streaming vectors); every per-batch join must broadcast the
    // micro-batch side — a sort-merge would re-shuffle the store's
    // vector payload on EVERY batch
    val cents = Seq((0L, Seq.fill(8)(1.0)), (1L, Seq.tabulate(8)(_.toDouble)))
      .toDF("centroid_id", "cvec")
    val accepted = (0L until 500L)
      .map(i => (i, Seq.tabulate(8)(d => (i + d).toDouble), i % 2))
      .toDF("id", "vec", "centroid_id")
    val batch = (1000L until 1008L)
      .map(i => (i, Seq.tabulate(8)(d => (i + d).toDouble)))
      .toDF("id", "vec")
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = AnnIndex.dedupBatch(cents, accepted, batch, theta = 0.9)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
      assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("COW merge with a point source never sort-merges the table") {
    import graft.operators.Snapshot
    // a point MERGE's source is tiny; every join it appears in (touch-set
    // discovery, the ops join, insert anti-join) must broadcast the
    // source/touched side — a sort-merge would shuffle the 100 TB table
    // to apply a one-row update
    val target = (0L until 2000L).map(i => (i / 500L, i, i * 1.0))
      .toDF("file_id", "key", "qty")
    val source = Seq((42L, "U", 9.0), (700L, "D", 0.0)).toDF("key", "op", "qty")
    val m1 = Snapshot.manifestEntriesBy(target, col("file_id"), col("key"), 1L)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val (m2, rows2, changes) = Snapshot.mergeCow(target, source, m1, "qty", 2L, 1)
      Seq(m2, rows2, changes).foreach { df =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
          plan.take(1500))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("manifest-bloom candidate probe is broadcast-only over persisted metadata") {
    import graft.operators.Bloom
    val dir = Files.createTempDirectory("graft-bloomidx").toString
    val target = (0L until 2000L).map(i => (i / 500L, i)).toDF("file_id", "key")
    Bloom.buildFileBits(target, col("file_id"), col("key"), 4096, 3, "pbt")
      .write.parquet(s"$dir/fb")
    val fb = spark.read.parquet(s"$dir/fb")
    val keys = Seq(42L, 700L, 9999L).toDF("key")
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = Bloom.candidateFiles(keys, col("key"), fb, 4096, 3, "pbt")
        .queryExecution.executedPlan.toString
      // |keys|·k probe rows against files×words metadata: the probe side
      // broadcasts; the TABLE is nowhere in this plan at all
      assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
      assert(!plan.contains("SortMergeJoin"), plan.take(1500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("incremental components: the big labeling is never shuffled — batch joins broadcast") {
    import graft.operators.ConnectedComponents
    val prev = spark.range(100000).select(col("id"),
      (col("id") - col("id") % 10).as("component"))
    val batch = Seq((5L, 15L), (100020L, 7L)).toDF("src", "dst")
    val newNodes = Seq(100020L).toDF("id")
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    val bcWas = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // auto-broadcast OFF: only the operator's explicit broadcast()
      // hints fire, so a prev-sized join that relied on the 100k-row
      // fixture slipping under the size threshold is exposed here as a
      // SortMergeJoin (the round-11 freshIds anti-join did exactly that)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = ConnectedComponents.incremental(prev, batch, newNodes)
        .queryExecution.executedPlan.toString
      // every join that touches prev is hint-broadcast on its batch-
      // sized side: the touch probe, the remap, and the freshIds
      // anti-join (the ONLY LeftAnti in the operator) — none may
      // sort-merge, because that shuffles the whole corpus labeling
      // (run() on the CONTRACTED batch-sized graph may sort-merge
      // internally — it is the corpus-scale fixpoint and must not
      // broadcast-hint; only the joins that see prev are constrained)
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
      // the freshIds anti-join — the ONLY LeftAnti in the operator, and
      // round 11's prev-scanning regression — must broadcast its
      // batch-sized right side
      assert("SortMergeJoin [^\n]*LeftAnti".r.findFirstIn(plan).isEmpty,
        plan.take(2000))
      assert("BroadcastHashJoin [^\n]*LeftAnti".r.findFirstIn(plan).nonEmpty,
        plan.take(2000))
      // the remap — the only join keyed on `component`, prev's second
      // and last scan — must broadcast the changed-labels side
      assert("SortMergeJoin \\[component#".r.findFirstIn(plan).isEmpty,
        plan.take(2000))
      assert("BroadcastHashJoin \\[component#".r.findFirstIn(plan).nonEmpty,
        plan.take(2000))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcWas)
    }
  }

  test("fuzzy match: trigram stop-list and score joins broadcast; JW stays codegen'd") {
    import graft.operators.Retrieval
    val targets = (0L until 5000L).map(i => (i, f"name$i%06d")).toDF("id", "nm")
    val queries = Seq((7L, "nme000007")).toDF("qid", "qnm")
    val cand = Retrieval.trigramCandidates(targets, col("id"), col("nm"),
      queries, col("qid"), col("qnm"), maxDf = 2500L)
    val scored = cand.join(queries, "qid").join(targets, "id")
      .select(graft.functions.Names.jaroWinkler(col("qnm"), col("nm")).as("jw"))
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("graft_jaro_winkler"), plan.take(1200))
    // the query side is index-sized: its joins broadcast
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
  }

  test("session-window aggregation is one shuffle on the session key") {
    // q246's plan contract: the native session_window groupBy compiles
    // to the dedicated session operator (sessions merged in a sorted
    // pass per user) above EXACTLY ONE hash exchange on user_id — no
    // self-join, no corpus-wide window, which is why it holds at 100 TB.
    val dir = Files.createTempDirectory("graft-sess-plan").toString
    (0L until 1000L).map(i => (i, new Timestamp(1700000000000L + i * 60000L), i % 7))
      .toDF("event_id", "ts", "user_id").write.parquet(s"$dir/ev")
    val df = spark.read.parquet(s"$dir/ev")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(exchanges == 1, plan.take(1500))
    // the dedicated session physical operator, not just the column name:
    // partial HashAggregate -> one Exchange -> Sort -> MergingSessions
    // (UpdatingSessions is the in-memory variant some configs pick)
    assert(plan.contains("MergingSessions") || plan.contains("UpdatingSessions"),
      plan.take(1500))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(1500))
  }

  test("weighted sample is one projection + one per-stratum window shuffle") {
    import graft.operators.Sampling
    val docs = spark.range(10000).select(col("id"),
      (col("id") % 5).cast("string").as("st"), (col("id") % 7 + 1).as("w"))
    val plan = Sampling.weightedSample(docs, col("id"), col("st"), col("w"),
      "pl", m = 10).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning\\(stratum".r.findAllIn(plan).size
    assert(exchanges == 1, plan.take(1500))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      plan.take(1500))
  }

  test("threeWayMerge is two key-hash full-outer joins, nothing pairwise") {
    import graft.operators.Snapshot
    val base = spark.range(10000).select(col("id").as("k"), col("id").as("v"))
    val ours = spark.range(9000).select(col("id").as("k"), (col("id") + 1).as("v"))
    val theirs = spark.range(8000).select(col("id").as("k"), (col("id") + 2).as("v"))
    val plan = Snapshot.threeWayMerge(base, ours, theirs, "k", "v")
      .queryExecution.executedPlan.toString
    assert("FullOuter".r.findAllIn(plan).size == 2, plan.take(1500))
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    // every exchange hashes on the merge key — co-partitioned layouts
    // (bucketed-by-key tables) would eliminate all of them
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1500))
  }

  test("incrementalOptimize decides overlap from broadcast manifest arithmetic") {
    import graft.operators.Layout
    val rows = spark.range(50000).select(
      (col("id") % 64).as("file_id"), col("id").as("k"))
    val manifest = rows.groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"), min("k").as("min_key"),
        max("k").as("max_key"))
      .withColumn("clustered", col("file_id") < 60)
    val plan = Layout.incrementalOptimize(rows, manifest, 1000L, 100000L)
      .queryExecution.executedPlan.toString
    // the zone-envelope overlap join is a broadcast non-equi join over
    // MANIFEST frames — no data row participates in the decision
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("clusterAgreement reduces to aggregates — no pair enumeration anywhere") {
    import graft.operators.Eval
    val pred = spark.range(100000).select(col("id"), (col("id") % 97).as("p"))
    val truth = spark.range(100000).select(col("id"), (col("id") % 89).as("t"))
    val plan = Eval.clusterAgreement(pred, truth)
      .queryExecution.executedPlan.toString
    // the only joins are the id equi-join and broadcast 1-row frames;
    // C(n,2) stays closed-form arithmetic — a pairwise form would show
    // a self-join on cluster keys
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // the id join is a hash equi-join (broadcast at this size, shuffled
    // hash-partitioned at scale) — never a nested loop over pairs
    assert(plan.contains("BroadcastHashJoin [id")
      || "hashpartitioning\\(id".r.findAllIn(plan).nonEmpty, plan.take(1500))
  }

  test("modularityReport: the m frame broadcasts; label joins are equi-joins") {
    import graft.operators.Centrality
    val edges = spark.range(50000).select(
      (col("id") % 1000).as("u"), ((col("id") + 7) % 1000).as("v"))
    val labels = spark.range(1000).select(col("id").as("node"),
      (col("id") % 10).as("label"))
    val plan = Centrality.modularityReport(edges, labels)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
    // the 1-row m frame rides a broadcast, never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin")
      || plan.contains("BroadcastExchange"), plan.take(1500))
  }
}
