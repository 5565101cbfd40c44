package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different text about spark query engines and shuffle plans here"),
    (4L, "completely different text about spark query engines and shuffle plans here"), // exact dup of 3
    (5L, "unrelated words apple banana cherry date elderberry fig grape honeydew kiwi lemon")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content") {
    val out = Dedup.exact(docs, col("doc_id"), col("text"))
      .as[(String, Long, Long)].collect()
    assert(out.length == 4)
    val dupGroup = out.find(_._3 == 2L).get
    assert(dupGroup._2 == 3L) // keeper = min id
  }

  test("ngram jaccard finds the near-dup pair") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"),
        n = 3, maxDf = 10, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((3L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("minhash LSH recalls high-jaccard pairs") {
    val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
        n = 2, maxDf = 10, bands = 8, rowsPerBand = 2, minEstJaccard = 0.4)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 4L))) // exact dup must always collide
    assert(pairs.contains((1L, 2L))) // high-jaccard near dup
  }

  test("nearDedupManifest: clusters LSH pairs, keeps heaviest, manifests all docs") {
    val weights = Seq((1L, 10L), (2L, 99L), (3L, 5L), (4L, 5L), (5L, 7L))
      .toDF("doc_id", "w")
    val out = Dedup.nearDedupManifest(docs, col("doc_id"), col("text"),
        weights, n = 2, maxDf = 10, bands = 8, rowsPerBand = 2,
        minEstJaccard = 0.4)
      .select("doc_id", "component", "kept_id", "is_kept", "n_members")
      .as[(Long, Long, Long, Boolean, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == 5) // one manifest row per doc, singletons included
    // {1,2}: weight 99 beats 10 → 2 kept; {3,4}: tie 5=5 → lowest id 3
    assert(out(1L)._3 == 2L && !out(1L)._4 && out(1L)._5 == 2L)
    assert(out(2L)._4)
    assert(out(3L)._3 == 3L && out(3L)._4 && out(4L)._5 == 2L)
    // singleton 5 keeps itself
    assert(out(5L)._3 == 5L && out(5L)._4 && out(5L)._5 == 1L)
  }

  test("simhash: identical docs at hamming 0, near-dups close") {
    val sigs = Dedup.simhashSignatures(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(3L) == sigs(4L))
    val h12 = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    val h15 = java.lang.Long.bitCount(sigs(1L) ^ sigs(5L))
    assert(h12 < h15)
  }

  test("cosine top-k ranks the aligned vector first") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 1L)
    val out = Similarity.cosineTopK(q, corpus, k = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(out(2L) == 1) // most aligned
    assert(out(3L) == 2)
  }

  test("LSH bucketing puts identical vectors in the same bucket") {
    val corpus = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (3L, Array(-1.0f, -2.0f, -3.0f, -4.0f))
    ).toDF("id", "vec")
    val buckets = corpus.select(col("id"),
        Similarity.lshBucket(col("vec"), dim = 4, planes = 6).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(buckets(1L) == buckets(2L))
    assert(buckets(1L) != buckets(3L)) // opposite vector flips every sign
  }

  test("native dot/cosine are bit-identical to the HOF reference fold") {
    // the fused-loop expressions replaced the zip_with/aggregate
    // composition on every similarity hot path; they must agree to the
    // last bit, including the degenerate cases (zero norm → NaN, length
    // mismatch → null, empty → NaN)
    val vs = Seq(
      (Seq(1.0, 2.0, -3.5, 0.25), Seq(-1.0, 0.5, 2.0, 8.0)),
      (Seq(1e300, 1e-300, -1e300, 1.0), Seq(1e300, 1e300, 1e300, 1.0)),
      (Seq(0.1, 0.2), Seq(0.3, 0.4, 0.5)), // length mismatch → null
      (Seq.empty[Double], Seq.empty[Double])) // dot 0.0 (cosine below)
      .toDF("a", "b")
    val both = vs.select(
      Similarity.dot(col("a"), col("b")).as("dn"),
      Similarity.dotHof(col("a"), col("b")).as("dh"),
      Similarity.cosine(col("a"), col("b")).as("cn"))
      .collect()
    both.foreach { r =>
      def same(i: Int, j: Int): Boolean =
        (r.isNullAt(i) && r.isNullAt(j)) ||
          (!r.isNullAt(i) && !r.isNullAt(j) &&
            java.lang.Double.compare(r.getDouble(i), r.getDouble(j)) == 0)
      assert(same(0, 1), s"dot mismatch: $r")
    }
    // non-degenerate cosine agrees bit-exactly with the sequential
    // scala fold of the same arithmetic
    val a0 = Seq(1.0, 2.0, -3.5, 0.25); val b0 = Seq(-1.0, 0.5, 2.0, 8.0)
    val expected = a0.zip(b0).foldLeft(0.0) { case (s, (x, y)) => s + x * y } /
      (math.sqrt(a0.foldLeft(0.0)((s, x) => s + x * x)) *
        math.sqrt(b0.foldLeft(0.0)((s, x) => s + x * x)))
    assert(java.lang.Double.compare(both(0).getDouble(2), expected) == 0)
    // the HOF form under ANSI mode THROWS on a zero divisor; the native
    // expression is total: zero-norm (and empty) inputs yield NaN —
    // strictly more useful for ranking pipelines, where NaN-aware
    // ordering decides placement instead of the query aborting
    val degenerate = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),
      (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c")).collect()
    degenerate.foreach(r => assert(r.getDouble(0).isNaN, r.toString))
  }

  test("k-means trainer converges to cluster means and early-stops at the fixpoint") {
    // two well-separated clusters in 4 dims around (1,0,0,0) and (0,0,0,1)
    val pts = Seq(
      (0L, Seq(1.0, 0.1, 0.0, 0.0)), (1L, Seq(0.9, -0.1, 0.1, 0.0)),
      (2L, Seq(1.1, 0.0, -0.1, 0.0)),
      (10L, Seq(0.0, 0.1, 0.0, 1.0)), (11L, Seq(0.1, -0.1, 0.0, 0.9)),
      (12L, Seq(-0.1, 0.0, 0.1, 1.1))
    ).toDF("id", "vec")
    // seeds: one point from each cluster
    val seed = pts.filter(col("id").isin(1L, 11L))
    val trained = Similarity.kmeansCentroids(pts, seed, dim = 4,
      maxIterations = 20, earlyStop = true)
      .as[(Long, Seq[Double])].collect().toMap
    assert(trained.size == 2)
    // each trained centroid is the exact mean of its cluster members
    val c1 = trained(1L)
    val c2 = trained(11L)
    assert(math.abs(c1(0) - 1.0) < 1e-9 && math.abs(c1(3) - 0.0) < 1e-9)
    assert(math.abs(c2(0) - 0.0) < 1e-9 && math.abs(c2(3) - 1.0) < 1e-9)
    // deterministic: a fixed-iteration run from the fixpoint agrees
    val again = Similarity.kmeansCentroids(pts, seed, dim = 4,
      maxIterations = 3, earlyStop = false)
      .as[(Long, Seq[Double])].collect().toMap
    assert(again == trained)
  }

  test("int8 quantization: exact codes, clamp, zero vector, rank fidelity") {
    val corpus = Seq(
      (1L, Seq(1.27f, -1.27f, 0.635f, 0.0f)), // scale=0.01: codes 127,-127,64,0
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),      // zero vector → zero codes
      (3L, Seq(2.54f, 0.02f, 0.0f, 0.0f))     // scale=0.02: 127,1,0,0
    ).toDF("id", "vec")
    val q = Similarity.quantizeInt8(corpus)
      .as[(Long, Double, Seq[Int])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(q(1L)._2 == Seq(127, -127, 64, 0)) // floor(63.5+0.5)=64
    assert(math.abs(q(1L)._1 - 0.01) < 1e-8) // 1.27f widens to 1.2699999809…
    assert(q(2L)._2 == Seq(0, 0, 0, 0) && q(2L)._1 == 0.0)
    assert(q(3L)._2 == Seq(127, 1, 0, 0))
    // ranking on codes agrees with float ranking on well-separated data
    val vecs = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Seq(0.9f, 0.4f, 0.0f, 0.0f)),
      (12L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
      (13L, Seq(-1.0f, 0.0f, 0.1f, 0.0f))
    ).toDF("id", "vec")
    val ranked = Similarity.cosineTopKInt8(
        vecs.filter(col("id") === 10L), vecs, k = 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(ranked == Map(11L -> 1, 12L -> 2, 13L -> 3))
  }

  test("semantic dedup chains near-dups transitively and keeps the heaviest member") {
    // unit vectors at 0°, 18°, 36°: cos(18°)≈0.951 links 1~2 and 2~3,
    // cos(36°)≈0.809 keeps 1~3 BELOW the 0.9 threshold — {1,2,3} is one
    // cluster only via the connected-components closure, not pairwise
    val rad = math.Pi / 180
    def unit(deg: Double) = Seq(
      math.cos(deg * rad).toFloat, math.sin(deg * rad).toFloat, 0.0f, 0.0f)
    val corpus = Seq(
      (1L, unit(0)), (2L, unit(18)), (3L, unit(36)),
      (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("id", "vec")
    // 2 and 3 tie at weight 20 → lowest id (2) wins; 4 has NO weight
    // row and must still survive as its own singleton representative
    val weights = Seq((1L, 10L), (2L, 20L), (3L, 20L)).toDF("id", "weight")
    val out = Similarity.semanticDedup(corpus, weights,
        dim = 4, threshold = 0.9)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 3L), (4L, 4L, 1L)))
    // the auto-sized entry point gives the same clusters on this corpus
    // (tiny n → planesFor clamps to 1 plane, a superset of candidates)
    val auto = Similarity.semanticDedupAuto(corpus, weights,
        dim = 4, threshold = 0.9)
      .as[(Long, Long, Long)].collect().toSet
    assert(auto == out)
  }

  test("semanticDedupIvf chains within cells; auto-recall sizing composes both rules") {
    val rad = math.Pi / 180
    def unit(deg: Double) = Seq(
      math.cos(deg * rad).toFloat, math.sin(deg * rad).toFloat, 0.0f, 0.0f)
    val corpus = Seq(
      (1L, unit(0)), (2L, unit(18)), (3L, unit(36)),
      (4L, Seq(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("id", "vec")
    val weights = Seq((1L, 10L), (2L, 20L), (3L, 20L)).toDF("id", "weight")
    // two trained cells: x-ish vs z — the chain co-assigns, 4 is alone;
    // within-cell closure must match semanticDedup's on this geometry
    val cents = Seq((0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(0.0, 0.0, 1.0, 0.0)))
      .toDF("centroid_id", "cvec")
    val out = Similarity.semanticDedupIvf(corpus, weights, threshold = 0.9, cents)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 2L, 3L), (4L, 4L, 1L)))
    // recall-targeted sizing: cos-0.9 neighbors at 90% recall need 2
    // tables at planes=2; sub-threshold targets escalate toward the
    // clamp (the "wrong tool" signal documented on tablesFor)
    assert(Similarity.tablesFor(Similarity.planesFor(500L, 128), 0.9, 0.9) == 2)
    val ranked = Similarity.cosineTopKLshAutoRecall(
      corpus.filter(col("id") === 1L), corpus, k = 2, dim = 4,
      targetBucketSize = 2, cosTarget = 0.9, recall = 0.9)
    // vector 2 (cos 0.951 to vector 1) must be recalled at rank 1
    val top = ranked.orderBy(col("rank")).as[(Long, Long, Int, Double)].head()
    assert(top._1 == 1L && top._2 == 2L)
  }

  test("semantic dedup mega-cluster defenses: exact collapse, sig collapse, bucket cap") {
    val base = Seq(1.0f, 2.0f, -1.0f, 0.5f)
    // 1000 bit-identical copies of `base` — exact-vector collapse path
    val mega = (0 until 1000).map(j => (100L + j, base))
    // 30 near-identical perturbations (pairwise cos ≈ 1) of a vector
    // with odd-parity integer components, so no hyperplane dot can sit
    // at zero and the full signatures genuinely coincide — the
    // signature-group collapse path (30 > DefaultMaxSigGroup)
    val nearBase = Seq(-3.0f, 1.0f, 2.0f, -1.0f)
    val near = (0 until 30).map(j =>
      (5000L + j, nearBase.zipWithIndex.map { case (x, i) =>
        x + (j + 1) * 1e-6f * (if (i % 2 == 0) 1 else -1) }.toSeq))
    // two zero vectors: cosine undefined (NaN), must stay singletons
    val zeros = Seq((9001L, Seq(0f, 0f, 0f, 0f)), (9002L, Seq(0f, 0f, 0f, 0f)))
    val corpus = ((5L, base) +: (mega ++ near ++ zeros)).toDF("id", "vec")
    val weights = Seq((5L, 1L), (500L, 9L), (5003L, 7L)).toDF("id", "weight")
    val out = Similarity.semanticDedup(corpus, weights, dim = 4,
        threshold = 0.9, planes = 4, tables = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((5L, 500L, 1001L), (5000L, 5003L, 30L),
      (9001L, 9001L, 1L), (9002L, 9002L, 1L)))
    // force the RESIDUAL BUCKET CAP instead (sig collapse disabled via
    // a huge maxSigGroup; 1 plane → 2 fat buckets → cap at 4 reps):
    // near-identical members chain through the rank neighborhood, so
    // the clusters are preserved under the bounded approximation
    val capped = Similarity.semanticDedup(corpus, weights, dim = 4,
        threshold = 0.9, planes = 1, tables = 2,
        maxSigGroup = 1000000, maxBucketReps = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped == out)
  }

  test("sizing rules: planesFor holds occupancy, kFor is sqrt, seeds deterministic") {
    // the measured round-8 stress point: n=10k, target 128 → 7 planes
    assert(Similarity.planesFor(10000L, 128) == 7)
    assert(Similarity.planesFor(100L, 128) == 1)   // corpus below one bucket
    assert(Similarity.planesFor(Long.MaxValue, 1) == 24) // clamp
    assert(Similarity.kFor(10000L) == 100)
    assert(Similarity.kFor(3L) == 2)
    assert(Similarity.kFor(Long.MaxValue, maxK = 65536) == 65536)
    // tablesFor: the recall half of the sizing family. cos=0.9 →
    // p = 1 - acos(0.9)/pi ≈ 0.857; p^4 ≈ 0.539; tables for R=0.9 =
    // ceil(log(0.1)/log(0.461)) = 3. Near-identical pairs need 1 table;
    // low-similarity targets blow past the clamp (the "wrong tool,
    // use IVF" signal).
    assert(Similarity.tablesFor(4, 0.9, 0.9) == 3)
    // cos=0.999 → p ≈ 0.9858, p^8 ≈ 0.892 → 3 tables for R=0.99
    assert(Similarity.tablesFor(8, 0.999, 0.99) == 3)
    assert(Similarity.tablesFor(7, 0.35, 0.9, maxTables = 64) == 64)
    val corpus = (0L until 50L).map(i => (i, Seq(i.toFloat, 1.0f)))
      .toDF("id", "vec")
    val seeds = Similarity.seedCentroids(corpus, k = 5)
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    assert(seeds.map(_._1) == Seq(0, 1, 2, 3, 4))
    // a pure function of the ids: stable under re-partitioning
    val again = Similarity.seedCentroids(corpus.repartition(7), k = 5)
      .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    assert(again == seeds)
    // seeds feed the trainer directly
    val trained = Similarity.kmeansCentroids(
      corpus, Similarity.seedCentroids(corpus, 3), dim = 2, maxIterations = 2,
      earlyStop = false)
    assert(trained.count() == 3)
  }

  test("ANN router: sizing arithmetic, LSH branch under 8 tables, IVF branch beyond") {
    // tablesNeeded is the UNCLAMPED collision-formula count (what the
    // router compares against the LSH-viability bound); tablesFor is
    // its clamped storage-bounded form — they must agree under the clamp
    assert(Similarity.tablesNeeded(7, 0.35, 0.9) == 69)
    assert(Similarity.tablesFor(7, 0.35, 0.9, maxTables = 64) == 64)
    assert(Similarity.tablesFor(4, 0.9, 0.9) ==
      Similarity.tablesNeeded(4, 0.9, 0.9))
    // nprobeFor: small-end floor 32, fraction rule past it, cell clamp
    assert(Similarity.nprobeFor(45, 0.9) == 32)
    assert(Similarity.nprobeFor(224, 0.9) == 32)
    assert(Similarity.nprobeFor(1000, 0.9) == 100)
    assert(Similarity.nprobeFor(10, 0.9) == 10) // degrades to exact
    val corpus = (0L until 64L).map { i =>
      (i, Seq((i % 7 + 1).toFloat, (i % 5 + 1).toFloat,
        (i % 3 + 1).toFloat, (i % 11 + 1).toFloat))
    }.toDF("vec_id", "embedding")
    val qs = corpus.filter(col("vec_id") < 4)
    // high-cos contract at default bucket size: planes=1, tablesNeeded
    // small → LSH branch; result must equal the explicit LSH call
    val lshBranch = Similarity.cosineTopKAnnAuto(qs, corpus, k = 3, dim = 4,
        targetBucketSize = 128, cosTarget = 0.9, recall = 0.9)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val lshDirect = Similarity.cosineTopKLshTables(qs, corpus, k = 3, dim = 4,
        planes = Similarity.planesFor(64, 128),
        tables = Similarity.tablesNeeded(Similarity.planesFor(64, 128), 0.9, 0.9))
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(lshBranch == lshDirect)
    // low-cos contract with tiny buckets: planes=5 → tablesNeeded(5,
    // .35, .9)=26 > 8 → IVF branch; nprobeFor floors at all 8 cells, so
    // every cell is probed and the router must return EXACTLY the
    // brute-force top-k (the graceful small-n degeneration, end-to-end
    // through k-means training + probe + rank)
    assert(Similarity.tablesNeeded(5, 0.35, 0.9) == 26)
    val ivfBranch = Similarity.cosineTopKAnnAuto(qs, corpus, k = 3, dim = 4,
        targetBucketSize = 2, cosTarget = 0.35, recall = 0.9)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val exact = Similarity.cosineTopK(qs, corpus, k = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(ivfBranch == exact)
  }

  test("prefix Jaccard join is complete vs brute force and actually prunes") {
    // 40 docs over a 60-token space: doc i holds tokens [i, i+9] mod 60,
    // so adjacent docs overlap 9/11 and distant docs overlap 0
    val toks = (0 until 40).flatMap(i => (0 until 10).map(j =>
      (i.toLong, s"t${(i + j) % 60}"))).toDF("doc", "tok")
    val got = Dedup.prefixJaccardJoin(toks, num = 3, den = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // brute force the truth
    val sets = (0 until 40).map(i =>
      i.toLong -> (0 until 10).map(j => (i + j) % 60).toSet).toMap
    val want = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L
      inter = (sets(a) & sets(b)).size.toLong
      uni = (sets(a) | sets(b)).size.toLong
      if inter * 5 >= uni * 3
    } yield (a, b, inter, uni)).toSet
    assert(got === want)
    assert(want.nonEmpty) // adjacent docs qualify (9/11 > 0.6)
    // and the prefix equi-join generated far fewer candidates than 40*39/2
    // (structural: each prefix is 10 - ceil(6) + 1 = 5 rarest tokens)
  }

  test("winnowing: shared run >= n+w-1 words is ALWAYS anchored; density is bounded") {
    import org.apache.spark.sql.functions.{col, lit}
    // n=8, w=4 → guarantee threshold 11 words. Plant an 11-word run
    // shared by docs 1 and 2 inside otherwise-unrelated text; doc 3 is
    // unrelated; docs 4/5 share only a 10-word run (below threshold —
    // winnowing MAY miss it, so we don't assert either way).
    val run11 = (1 to 11).map(i => s"shared$i").mkString(" ")
    val run10 = (1 to 10).map(i => s"tenrun$i").mkString(" ")
    def filler(tag: String, k: Int) = (1 to k).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, s"${filler("alpha", 20)} $run11 ${filler("beta", 20)}"),
      (2L, s"${filler("gamma", 17)} $run11 ${filler("delta", 23)}"),
      (3L, filler("omega", 60)),
      (4L, s"${filler("eps", 20)} $run10 ${filler("zeta", 20)}"),
      (5L, s"${filler("eta", 21)} $run10 ${filler("theta", 19)}"))
      .toDF("doc_id", "text")
    val anchors = Dedup.winnowAnchors(docs, col("doc_id"), col("text"), n = 8, w = 4)
    val pairs = Dedup.winnowPairs(anchors, maxDf = 64)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(pairs.contains((1L, 2L)), s"guaranteed pair missing: $pairs")
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) })
    // density: anchors per doc ≈ 2/(w+1) of the n-gram stream, never more
    // than the full-window count
    val perDoc = anchors.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val nWords = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").length }.toMap
    perDoc.foreach { case (id, c) =>
      val windows = nWords(id) - 7 - 3 // full windows of w n-grams
      assert(c <= windows, s"doc $id: $c anchors > $windows windows")
      assert(c.toDouble / windows < 0.8, s"doc $id density ${c.toDouble / windows}")
    }
  }

  test("winnowing: sub-threshold docs emit nothing; hot anchors are capped") {
    import org.apache.spark.sql.functions.col
    val tiny = Seq((1L, "a b c d e f g h i j")) // 10 words → 3 ngrams < w
      .toDF("doc_id", "text")
    assert(Dedup.winnowAnchors(tiny, col("doc_id"), col("text"), 8, 4).count() == 0)
    // 20 docs all sharing one boilerplate run: maxDf=5 kills the anchor
    val run = (1 to 15).map(i => s"boiler$i").mkString(" ")
    val many = (1L to 20L).map(i => (i, s"u${i}a u${i}b u${i}c $run u${i}d"))
      .toDF("doc_id", "text")
    val an = Dedup.winnowAnchors(many, col("doc_id"), col("text"), 8, 4)
    val capped = Dedup.winnowPairs(an, maxDf = 5).count()
    val uncapped = Dedup.winnowPairs(an, maxDf = 64).count()
    assert(uncapped == 190L, s"uncapped=$uncapped") // all C(20,2) pairs
    // The pure-boilerplate anchors (df=20) are dropped by maxDf=5, so
    // the quadratic blow-up collapses. Windows straddling unique filler
    // and boilerplate can still surface low-df shared anchors (the min
    // lands on a boiler n-gram for a few docs) — each contributes at
    // most C(5,2) pairs, so the bound is structural, not exact-zero.
    assert(capped < uncapped / 4, s"capped=$capped uncapped=$uncapped")
  }
}
