package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 ranks the source doc first and prunes stop-terms") {
    // 4 docs sharing the stop word pair; doc 1 uniquely holds the
    // query's rare terms. n=1 unigram terms keep the fixture readable.
    val corpus = Seq(
      (1L, "zebra quark lemma common common filler"),
      (2L, "common filler other words here banana"),
      (3L, "common filler more words banana banana"),
      (4L, "common filler words words quark extra")).toDF("doc_id", "text")
    val qs = Seq((10L, "zebra quark lemma")).toDF("qid", "qt")
    val out = Retrieval.bm25TopK(corpus, col("doc_id"), col("text"),
      qs, col("qid"), col("qt"), n = 1, k = 3)
      .orderBy("rank")
      .select("doc_id", "n_terms_hit", "rank").as[(Long, Long, Long)].collect()
    // "common"/"filler" hit all 4 docs (df > N/2 = 2) and are pruned, so
    // they can never produce a hit; doc 1 hits all 3 rare query terms,
    // doc 4 only "quark".
    assert(out.map(_._1).toSeq == Seq(1L, 4L))
    assert(out.head._2 == 3 && out(1)._2 == 1)
  }

  test("bm25 favors shorter docs at equal tf (length normalization)") {
    // fillers keep df('target') = 2 <= N/2 under the stop-term cap
    val corpus = Seq(
      (1L, "target word pad1 pad2"),
      (2L, "target word pad1 pad2 pad3 pad4 pad5 pad6"),
      (3L, "filler words only here"),
      (4L, "other filler words again")).toDF("doc_id", "text")
    val qs = Seq((1L, "target")).toDF("qid", "qt")
    val out = Retrieval.bm25TopK(corpus, col("doc_id"), col("text"),
      qs, col("qid"), col("qt"), n = 1, k = 2)
      .orderBy("rank").select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L))
  }

  test("dsir weights separate target-marked docs from the rest") {
    // target docs share 'tmark', raw-only docs share 'rmark'; base
    // vocabulary is common. Target-marker docs must score positive,
    // rmark docs negative, and every doc gets exactly one row.
    val docs = (1L to 20L).map { i =>
      val tgt = i % 2 == 0
      val marker = if (tgt) "tmark tmark" else "rmark rmark"
      (i, s"base words shared $marker", tgt)
    }.toDF("doc_id", "text", "tgt")
    val out = Retrieval.dsirWeights(docs, col("doc_id"), col("text"),
      col("tgt"), n = 1, buckets = 32)
      .select("doc_id", "is_target", "weight")
      .as[(Long, Boolean, Double)].collect()
    assert(out.length == 20)
    assert(out.filter(_._2).forall(_._3 > 0.0))
    assert(out.filterNot(_._2).forall(_._3 < 0.0))
  }

  test("exciseRepeatedSpans merges overlaps and keeps clean docs whole") {
    // docs 1 and 2 share words 1..4 (two overlapping 3-gram positions
    // merging into one span [1,4]); doc 3 is clean; doc 4 repeats its
    // own opening trigram at the end (within-doc repeat, two spans).
    val docs = Seq(
      (1L, "a b c d x1 y1 z1"),
      (2L, "a b c d x2 y2 z2"),
      (3L, "p q r s t u v"),
      (4L, "m n o k1 k2 k3 m n o")).toDF("doc_id", "text")
    val out = Dedup.exciseRepeatedSpans(docs, col("doc_id"), col("text"), n = 3)
      .select("doc_id", "n_words", "n_spans", "n_removed_words")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 7L, 1L, 4L)))
    assert(out(1) == ((2L, 7L, 1L, 4L)))
    assert(out(2) == ((3L, 7L, 0L, 0L)))
    assert(out(3) == ((4L, 9L, 2L, 6L)))
    // kept text of doc 1 is exactly the unshared tail
    val k1 = Dedup.exciseRepeatedSpans(docs, col("doc_id"), col("text"), n = 3)
      .where(col("doc_id") === 1).select("kept_md5").as[String].head()
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest("x1 y1 z1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(k1 == exp)
  }

  test("bpeMergeRounds: round 2 counts the round-1 merged corpus") {
    val docs = Seq(Tuple1("a b a b c"), Tuple1("a b c")).toDF("text")
    val out = TextAnalysis.bpeMergeRounds(docs, col("text"), rounds = 2)
      .orderBy("round")
      .select("round", "sym_a", "sym_b", "pair_count", "n_symbols_after")
      .as[(Long, String, String, Long, Long)].collect()
    // r1: (a,b) x3 -> [a_b a_b c], [a_b c] (5 symbols);
    // r2: (a_b,c) x2 beats (a_b,a_b) x1 -> 3 symbols
    assert(out(0) == ((1L, "a", "b", 3L, 5L)))
    assert(out(1) == ((2L, "a_b", "c", 2L, 3L)))
  }

  test("bpeMergeRounds greedy merge never overlaps a run") {
    val docs = Seq(Tuple1("x x x x x")).toDF("text")
    val out = TextAnalysis.bpeMergeRounds(docs, col("text"), rounds = 1)
      .select("pair_count", "n_symbols_after").as[(Long, Long)].head()
    // 4 overlapping (x,x) pairs counted, but the greedy merge yields
    // [x_x, x_x, x] — 3 symbols, not 2
    assert(out == ((4L, 3L)))
  }

  test("bpeMergeRounds: checkpointed long training matches the lazy plan") {
    val docs = Seq(Tuple1("a b c d e f a b c d e f a b c d"),
      Tuple1("b c d e f a b c"), Tuple1("c d e f")).toDF("text")
    // 6 rounds: default checkpointAfter=4 → per-round localCheckpoint;
    // checkpointAfter=100 → pure lazy lineage. Identical merge history
    // proves the barrier changes cost shape only, never results.
    def run(ckptAfter: Int) =
      TextAnalysis.bpeMergeRounds(docs, col("text"), rounds = 6,
          checkpointAfter = ckptAfter)
        .orderBy("round")
        .select("round", "sym_a", "sym_b", "pair_count", "n_symbols_after")
        .as[(Long, String, String, Long, Long)].collect().toSeq
    val ckpt = run(4)
    val lazyPlan = run(100)
    assert(ckpt == lazyPlan)
    assert(ckpt.length == 6)
  }

  test("bpe string encoding equals the greedy fold on pathological symbols") {
    // Round-17: the greedy merge moved from an O(k²) array fold to a
    // linear framed-string replace. The framing must survive EMPTY
    // symbols (consecutive/leading/trailing spaces in text) and symbols
    // containing the 'x' slot prefix or '_' joiner-adjacent shapes —
    // replay the trainer AND the encoder against a literal Scala
    // implementation of the old fold.
    def mergeOnce(syms: Seq[String], a: String, b: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + "_" + b)
        else acc :+ s
      }
    val texts = Seq("a  a  a b a b", " leading", "trailing ",
      "x xa  b x x", "a b  b a", "")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val trained = TextAnalysis.bpeMergeRounds(docs, col("text"), rounds = 3)
    val merges = trained.orderBy("round")
      .select("round", "sym_a", "sym_b", "pair_count", "n_symbols_after")
      .as[(Long, String, String, Long, Long)].collect().toSeq
    var corpus = texts.map(_.split(" ", -1).toSeq)
    merges.foreach { case (r, a, b, cnt, nAfter) =>
      val counts = corpus.flatMap(s => s.zip(s.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ((ra, rb), rc) = counts.toSeq
        .minBy { case ((pa, pb), c) => (-c, pa, pb) }
      assert((a, b, cnt) == ((ra, rb, rc)), s"round $r winner")
      corpus = corpus.map(s => mergeOnce(s, a, b))
      assert(nAfter == corpus.map(_.size).sum.toLong, s"round $r n_after")
    }
    val enc = TextAnalysis.bpeEncodeTokens(docs, col("doc_id"), col("text"),
        trained.select("round", "sym_a", "sym_b"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect().toSeq
    val rules = merges.map(m => (m._2, m._3))
    texts.zipWithIndex.foreach { case (t, i) =>
      val ref = rules.foldLeft(t.split(" ", -1).toSeq) {
        case (s, (a, b)) => mergeOnce(s, a, b)
      }
      assert(enc(i)._2 == ref, s"doc $i: ${enc(i)._2} vs $ref")
    }
  }

  test("bpeEncode applies trained rules in rank order, greedy, on unseen docs") {
    val train = Seq(Tuple1("a b a b c"), Tuple1("a b c")).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val merges = TextAnalysis.bpeMergeRounds(train, col("text"), rounds = 2)
      .select("round", "sym_a", "sym_b")
    // rules: r1 (a,b) → a_b; r2 (a_b,c) → a_b_c
    val docs = Seq((1L, "a b c"), (2L, "a b a b c"), (3L, "c a b"),
      (4L, "q"), (5L, "a a b b")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, col("doc_id"), col("text"), merges)
      .orderBy("doc_id").select("doc_id", "n_tokens")
      .as[(Long, Long)].collect().toSeq
    // 1: [a_b_c]; 2: [a_b_c? ...] — greedy: a b a b c → a_b a_b c → a_b a_b_c (2)
    // 3: c a b → c a_b (2); 4: [q] (1); 5: a a b b → a a_b b (3)
    assert(out == Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L), (5L, 3L)))
    // encoding the training corpus reproduces the trainer's final state:
    // total symbols == n_symbols_after of the last round
    val enc = TextAnalysis.bpeEncode(train, col("doc_id"), col("text"), merges)
      .agg(sum("n_tokens")).as[Long].head()
    val lastRound = TextAnalysis.bpeMergeRounds(train, col("text"), rounds = 2)
      .orderBy(col("round").desc).select("n_symbols_after").as[Long].head()
    assert(enc == lastRound)
  }

  test("systematicResample draws exactly m copies, proportional, zero-safe") {
    val docs = Seq((1L, 10L), (2L, 0L), (3L, 30L), (4L, 60L)).toDF("doc_id", "w0")
    val out = Sampling.systematicResample(docs, col("doc_id"), col("w0"), m = 10L)
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    // T=100, boundaries at C/T = .1, .1, .4, 1.0; u_k = (k+.5)/10
    assert(out == Map(1L -> 1L, 2L -> 0L, 3L -> 3L, 4L -> 6L))
    // sum is exactly m even when weights don't divide evenly
    val skew = Seq((1L, 7L), (2L, 11L), (3L, 13L)).toDF("doc_id", "w0")
    val tot = Sampling.systematicResample(skew, col("doc_id"), col("w0"), m = 9L)
      .agg(sum("n_copies")).as[Long].head()
    assert(tot == 9L)
  }

  test("mixtureSample honors quotas and picks smallest salted hashes") {
    val docs = (1L to 300L).map { i =>
      val lang = if (i <= 200) "aa" else "bb"
      (i, lang, 50L)
    }.toDF("doc_id", "lang", "tok")
    val out = Sampling.mixtureSample(docs, col("doc_id"), col("lang"),
      col("tok"), "s", budget = 30)
    val picked = out.select("stratum", "quota", "pick_rank", "id")
      .as[(String, Long, Long, Long)].collect()
    val byStratum = picked.groupBy(_._1)
    // sqrt(10000)/ (sqrt(10000)+sqrt(5000)) ~ 0.586 -> quota 18; bb -> 12
    assert(byStratum("aa").head._2 == 18L && byStratum("bb").head._2 == 12L)
    assert(byStratum("aa").length == 18 && byStratum("bb").length == 12)
    // picks are exactly the globally smallest salted hashes per stratum
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val expectAa = (1L to 200L).sortBy(i => h60("s|" + i)).take(18).toSet
    assert(byStratum("aa").map(_._4).toSet == expectAa)
    // ranks are 1..quota dense
    assert(byStratum("bb").map(_._3).sorted.toSeq == (1L to 12L))
  }

  test("trigramSets: distinct trigrams, short-name fallback, empty drop") {
    val df = Seq((1L, "abcd"), (2L, "ab"), (3L, ""), (4L, "aaaa"))
      .toDF("id", "nm")
    val out = Retrieval.trigramSets(df, col("id"), col("nm"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("abc", "bcd"))
    assert(out(2L) == Seq("ab"))      // sub-3-char: whole string
    assert(out(3L) == Seq.empty)      // empty name: no trigrams
    assert(out(4L) == Seq("aaa"))     // distinct collapses repeats
  }

  test("postings-served search is row-identical to the array path; merge = rebuild") {
    val rnd = new scala.util.Random(41)
    val targets = (0L until 300L).map(i =>
      (i, f"stem${rnd.nextInt(40)}%02dtail$i%04d")).toDF("id", "nm")
    val queries = (0L until 20L).map(i =>
      (i + 1000L, f"stem${rnd.nextInt(40)}%02dtail${rnd.nextInt(300)}%04d"))
      .toDF("qid", "qnm")
    val direct = Retrieval.trigramTopK(targets, col("id"), col("nm"),
      queries, col("qid"), col("qnm"), k = 3, maxDf = 90L)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    // maintained index: base (id < 200) + appended delta (id >= 200)
    val post = Retrieval.trigramIndex(
        targets.where(col("id") < 200), col("id"), col("nm"))
      .unionByName(Retrieval.trigramIndex(
        targets.where(col("id") >= 200), col("id"), col("nm")))
    val served = Retrieval.trigramTopKFromPostings(post,
      queries, col("qid"), col("qnm"), k = 3, maxDf = 90L)
      .as[(Long, Long, Long, Double, Long)].collect().toSet
    assert(served == direct)
    assert(direct.nonEmpty)
  }

  test("trigramTopK: typo'd query recovers its source at rank 1; stop-trigrams never seed") {
    // 40 distinct names with a shared hot stem "customerx" (df 100% →
    // capped at any maxDf < 40) plus a discriminating digit tail.
    val targets = (0 until 40).map(i => (i.toLong, f"customerx$i%04d"))
      .toDF("id", "nm")
    // typo: drop the 3rd character
    val queries = Seq((7L, "cutomerx0007"), (23L, "cutomerx0023"))
      .toDF("qid", "qnm")
    val out = Retrieval.trigramTopK(targets, col("id"), col("nm"),
      queries, col("qid"), col("qnm"), k = 3, maxDf = 20L)
      .as[(Long, Long, Long, Double, Long)].collect()
    val top1 = out.filter(_._5 == 1L).map(r => r._1 -> r._2).toMap
    assert(top1 == Map(7L -> 7L, 23L -> 23L), s"got ${out.mkString(",")}")
    // a query made ONLY of hot trigrams retrieves nothing
    val hotOnly = Seq((99L, "customerx")).toDF("qid", "qnm")
    val none = Retrieval.trigramTopK(targets, col("id"), col("nm"),
      hotOnly, col("qid"), col("qnm"), k = 3, maxDf = 20L).count()
    assert(none == 0L)
  }
}
