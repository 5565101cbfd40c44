package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted ANN index: FS protocol + quantizer composition. The
  * relational arithmetic (training, frozen-append assignment, probe
  * ranking) is oracle-gated by q193; these cases gate what the oracle
  * cannot see — equivalence with the direct IVF path, the centroid
  * freeze across appends, time travel, vacuum survival, and the
  * pruned member scan's plan shape. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: 60 vectors in dim 8, three planted
  // directions with small per-id wiggle so cells are non-trivial
  private def vecs(ids: Range, offset: Long = 0L) = ids.map { i =>
    val base = Array.tabulate(8)(d =>
      if (d % 3 == i % 3) 1.0 else 0.05 * ((i + d) % 5))
    (i.toLong + offset, base.map(x => x + 0.001 * (i % 7)))
  }.toDF("id", "vec")

  test("build -> query matches the direct (unpersisted) IVF path") {
    val root = java.nio.file.Files.createTempDirectory("annidx-eq").toString
    val corpus = vecs(0 until 60)
    assert(AnnIndex.build(spark, root, corpus, dim = 8, commitMillis = 100L) === 1L)
    val queries = corpus.filter(col("id") % 10 === 0)
    val viaIndex = AnnIndex.query(spark, root, queries, k = 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    // direct path: same seed/trainer depth the index build used
    val seed = Similarity.seedCentroids(corpus, Similarity.kFor(60))
    val trained = Similarity.kmeansCentroids(corpus, seed, dim = 8,
      maxIterations = 2, earlyStop = false)
    val direct = Similarity.ivfTopK(queries, corpus, trained, k = 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(viaIndex === direct)
    assert(viaIndex.nonEmpty)
  }

  test("append freezes the quantizer and time travel sees the old corpus") {
    val root = java.nio.file.Files.createTempDirectory("annidx-append").toString
    val base = vecs(0 until 60)
    AnnIndex.build(spark, root, base, dim = 8, commitMillis = 1000L)
    val centsV1 = spark.read.parquet(s"$root/data/v1")
      .filter(col("kind") === "c").select("id", "vec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

    val added = vecs(0 until 12, offset = 1000L)
    assert(AnnIndex.append(spark, root, added, commitMillis = 2000L) === 2L)
    // centroids bit-identical across the append
    val centsV2 = spark.read.parquet(s"$root/data/v2")
      .filter(col("kind") === "c").select("id", "vec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(centsV2 === centsV1)
    // current query can see appended ids; as-of(before append) cannot
    val queries = base.filter(col("id") % 10 === 0)
    val now = AnnIndex.query(spark, root, queries, k = 60, nprobe = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(now.exists(_ >= 1000L))
    val old = AnnIndex.query(spark, root, queries, k = 60, nprobe = 3,
      asOfMillis = Some(1500L))
      .select("neighbor_id").as[Long].collect().toSet
    assert(old.nonEmpty && !old.exists(_ >= 1000L))
    // member rows grew by exactly the batch
    val m1 = spark.read.parquet(s"$root/data/v1").filter(col("kind") === "m").count()
    val m2 = spark.read.parquet(s"$root/data/v2").filter(col("kind") === "m").count()
    assert(m2 === m1 + 12)
  }

  test("vacuum keeps the current version queryable, expired as-of stops resolving") {
    val root = java.nio.file.Files.createTempDirectory("annidx-vacuum").toString
    AnnIndex.build(spark, root, vecs(0 until 30), dim = 8, commitMillis = 1000L)
    AnnIndex.append(spark, root, vecs(0 until 5, 500L), commitMillis = 2000L)
    AnnIndex.append(spark, root, vecs(0 until 5, 600L), commitMillis = 3000L)
    val doomed = Snapshot.vacuum(spark, root, retain = 1)
    assert(doomed.toSet === Set(1L, 2L))
    val queries = vecs(0 until 3)
    assert(AnnIndex.query(spark, root, queries, k = 3).count() > 0)
    intercept[IllegalArgumentException] {
      AnnIndex.query(spark, root, queries, k = 3, asOfMillis = Some(1500L))
    }
  }

  test("maintain: in-distribution appends stay frozen, drifted batches trigger a rebuild") {
    val root = java.nio.file.Files.createTempDirectory("annidx-maintain").toString
    val base = vecs(0 until 60)
    AnnIndex.build(spark, root, base, dim = 8, commitMillis = 1000L)
    // in-distribution batch: same generator, new ids -> frozen append
    val (v2, rebuilt2) = AnnIndex.maintain(spark, root,
      vecs(0 until 10, offset = 1000L), dim = 8,
      appendMillis = 2000L, rebuildMillis = 2001L)
    assert(v2 === 2L && !rebuilt2)
    val centsV2 = spark.read.parquet(s"$root/data/v2")
      .filter(col("kind") === "c").select("id", "vec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // out-of-distribution batch: concentrated on an axis no member
    // uses (d == 7 dominant) -> low assignment cosine -> rebuild fires
    val ood = (0 until 10).map { i =>
      (2000L + i, Array.tabulate(8)(d =>
        if (d == 7) 1.0 else 0.0001 * ((i + d) % 3)))
    }.toDF("id", "vec")
    val (v4, rebuilt4) = AnnIndex.maintain(spark, root, ood, dim = 8,
      appendMillis = 3000L, rebuildMillis = 3001L)
    assert(rebuilt4 && v4 === 4L) // v3 = the append, v4 = the rebuild
    // the rebuilt quantizer differs and every member re-assigned under it
    val centsV4 = spark.read.parquet(s"$root/data/v4")
      .filter(col("kind") === "c").select("id", "vec")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(centsV4 !== centsV2)
    val m4 = spark.read.parquet(s"$root/data/v4").filter(col("kind") === "m")
    assert(m4.count() === 80) // 60 base + 10 in-dist + 10 ood, none lost
    // the ood family now assigns to a cell of its own quantizer: its
    // mean assignment cosine must beat the drifted pre-rebuild one
    val cents = spark.read.parquet(s"$root/data/v4")
      .filter(col("kind") === "c")
      .select(col("centroid_id"), col("vec").as("cvec"))
    def meanCos(ids: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      m4.filter(ids(col("id"))).join(cents, "centroid_id")
        .agg(avg(Similarity.cosine(col("vec"), col("cvec"))))
        .collect()(0).getDouble(0)
    assert(meanCos(id => id >= 2000L) > 0.9)
  }

  test("dedupBatch: drops against accepted AND against smaller-id batch peers") {
    // two cells: axis-0 and axis-4 vectors; the accepted set owns one
    // axis-0 vector, the batch brings a near-copy of it (drop vs
    // accepted), a within-batch near-pair on axis 4 (larger id drops
    // vs the smaller REGARDLESS of the smaller's own fate), and one
    // genuinely novel diagonal vector (kept)
    def v(axis: Int, eps: Double) = Array.tabulate(8)(d =>
      (if (d == axis) 1.0 else 0.0) + eps * (d + 1))
    val cents = Seq((0L, v(0, 0.0).toSeq), (1L, v(4, 0.0).toSeq))
      .toDF("centroid_id", "cvec")
    val accepted = Seq((10L, v(0, 0.001).toSeq, 0L))
      .toDF("id", "vec", "centroid_id")
    val batch = Seq(
      (100L, v(0, 0.002).toSeq),   // ~= accepted 10 -> dropped, matched 10
      (101L, v(4, 0.001).toSeq),   // smaller-id axis-4 peer
      (102L, v(4, 0.002).toSeq),   // ~= 101 -> dropped, matched 101
      (103L, Array.tabulate(8)(d => 0.5 + 0.01 * d).toSeq) // novel -> kept
    ).toDF("id", "vec")
    val out = AnnIndex.dedupBatch(cents, accepted, batch, theta = 0.95)
      .select("id", "status", "matched_id").collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)))).toMap
    assert(out(100L) === ("dropped", Some(10L)))
    assert(out(101L) === ("kept", None))
    assert(out(102L) === ("dropped", Some(101L)))
    assert(out(103L) === ("kept", None))
  }

  test("ivfpq: full-pool queryPq equals the uncompressed cell-exact path") {
    // with r covering every probed-cell member, the ADC cut keeps all
    // candidates and the exact re-rank must reproduce the uncompressed
    // index's ranking EXACTLY — the compression is then invisible, so
    // any divergence is a bug in pack/decode/LUT arithmetic, not an
    // approximation artifact
    val rootPq = java.nio.file.Files.createTempDirectory("annidx-ivfpq").toString
    val rootUc = java.nio.file.Files.createTempDirectory("annidx-uc").toString
    val corpus = vecs(0 until 60)
    assert(AnnIndex.buildPq(spark, rootPq, corpus, dim = 8, m = 4, pqK = 16,
      commitMillis = 100L) === 1L)
    AnnIndex.build(spark, rootUc, corpus, dim = 8, commitMillis = 100L)
    val queries = corpus.filter(col("id") % 10 === 0)
    val viaPq = AnnIndex.queryPq(spark, rootPq, queries, k = 5, dim = 8,
        m = 4, nprobe = 2, r = 60)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val viaUc = AnnIndex.query(spark, rootUc, queries, k = 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(viaPq === viaUc)
    assert(viaPq.nonEmpty)
    // and the uncompressed query path still works against a PQ index
    // (same 'c'/'m' rows; 'b' rows and pq_code are simply unread)
    val ucOnPq = AnnIndex.query(spark, rootPq, queries, k = 5, nprobe = 2)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(ucOnPq === viaUc)
  }

  test("ivfpq: appendPq freezes both quantizers; as-of hides the batch") {
    val root = java.nio.file.Files.createTempDirectory("annidx-pqapp").toString
    val base = vecs(0 until 60)
    AnnIndex.buildPq(spark, root, base, dim = 8, m = 4, commitMillis = 1000L)
    def half(kind: String, v: Long) = spark.read.parquet(s"$root/data/v$v")
      .filter(col("kind") === kind).select("kind", "id", "vec", "centroid_id")
      .collect().map(_.toString).sorted.toSeq
    val added = vecs(0 until 6, offset = 500L)
    assert(AnnIndex.appendPq(spark, root, added, dim = 8, m = 4,
      commitMillis = 2000L) === 2L)
    // BOTH quantizer halves bit-identical across the append
    assert(half("c", 1L) === half("c", 2L))
    assert(half("b", 1L) === half("b", 2L))
    // appended ids are members of v2 with codes, absent from v1
    val v2ids = spark.read.parquet(s"$root/data/v2")
      .filter(col("kind") === "m" && col("id") >= 500L)
    assert(v2ids.count() === 6)
    assert(v2ids.filter(col("pq_code").isNull).count() === 0)
    assert(spark.read.parquet(s"$root/data/v1")
      .filter(col("kind") === "m" && col("id") >= 500L).count() === 0)
    // current probe can return an appended neighbor; as-of(1500) cannot
    val q = base.filter(col("id") === 0L)
    val now = AnnIndex.queryPq(spark, root, q, k = 60, dim = 8, m = 4,
      nprobe = 8, r = 66).filter(col("neighbor_id") >= 500L).count()
    val old = AnnIndex.queryPq(spark, root, q, k = 60, dim = 8, m = 4,
      nprobe = 8, r = 66, asOfMillis = Some(1500L))
      .filter(col("neighbor_id") >= 500L).count()
    assert(now > 0L)
    assert(old === 0L)
  }

  test("ivfpq: packed codes decode back to the array encoding") {
    val corpus = vecs(0 until 60)
    val cb = ProductQuantizer.trainCodebooks(corpus, dim = 8, m = 4, k = 16,
      iterations = 2)
    val arr = ProductQuantizer.encode(corpus, cb, dim = 8, m = 4)
      .as[(Long, Seq[Long])].collect().toMap
    val packed = ProductQuantizer.packedCodes(corpus, cb, dim = 8, m = 4)
      .as[(Long, Long)].collect().toMap
    assert(arr.keySet === packed.keySet)
    arr.foreach { case (id, codes) =>
      val p = packed(id)
      codes.zipWithIndex.foreach { case (c, s) =>
        assert(((p >> (4 * s)) & 15L) === c, s"id=$id sub=$s")
      }
      assert((p >> (4 * codes.length)) === 0L, s"id=$id stray bits")
    }
  }

  test("ivfpq: the ADC member scan reads codes, never the embedding column") {
    val root = java.nio.file.Files.createTempDirectory("annidx-pqscan").toString
    val corpus = vecs(0 until 60)
    AnnIndex.buildPq(spark, root, corpus, dim = 8, m = 4, commitMillis = 100L)
    // the ADC-side projection queryPqFrame builds: kind='m' rows,
    // (id, centroid_id, pq_code) only — column pruning must drop `vec`
    // from the parquet ReadSchema (at 100 TB: ~12 B/member scanned
    // instead of the ~520 B the embedding would add)
    val idx = Snapshot.readCurrent(spark, root)
    val memCodes = idx.filter(col("kind") === "m")
      .select(col("id"), col("centroid_id"), col("pq_code"))
      .filter(col("centroid_id").isin(0L, 1L))
    val plan = memCodes.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(readSchema.contains("pq_code"), plan.take(1500))
    assert(!readSchema.contains("vec"), s"ADC scan reads vec:\n$readSchema")
    // end-to-end still returns results
    val out = AnnIndex.queryPq(spark, root,
      corpus.filter(col("id") === 0L), k = 5, dim = 8, m = 4, nprobe = 2, r = 10)
    assert(out.count() === 5)
  }

  test("probed-cell predicate reaches the member scan as a pushed filter") {
    val root = java.nio.file.Files.createTempDirectory("annidx-plan").toString
    val corpus = vecs(0 until 60)
    AnnIndex.build(spark, root, corpus, dim = 8, commitMillis = 100L)
    val out = AnnIndex.query(spark, root,
      corpus.filter(col("id") === 0L), k = 5, nprobe = 2)
    // queryFrame localCheckpoints the ranked frame, so assert on the
    // scan plan it already executed: re-derive the scoped member scan
    // the way queryFrame builds it and check the IN predicate pushes
    val idx = Snapshot.readCurrent(spark, root)
    val scoped = idx.filter(col("kind") === "m")
      .filter(col("centroid_id").isin(0L, 1L))
    val plan = scoped.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("centroid_id"),
      s"member scan did not push the probed-cell predicate:\n$plan")
    assert(out.count() > 0)
  }
}
