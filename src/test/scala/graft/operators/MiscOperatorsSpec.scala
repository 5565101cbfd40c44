package graft.operators

import graft.SparkSpec
import graft.model.Statement
import graft.sources.StatementIO
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class MiscOperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("delta diff classifies ADD/MOD/DEL") {
    val prev = Seq(("a", "h1"), ("b", "h2"), ("c", "h3")).toDF("id", "hash")
    val curr = Seq(("b", "h2"), ("c", "hX"), ("d", "h4")).toDF("id", "hash")
    val out = Delta.diff(prev, curr).as[(String, String)].collect().toMap
    assert(out == Map("a" -> "DEL", "c" -> "MOD", "d" -> "ADD"))
  }

  test("preserveFirstSeen keeps old timestamps and stamps new rows") {
    val t1 = new Timestamp(1000L); val t9 = new Timestamp(9000L)
    val prev = Seq(("s1", t1)).toDF("id", "firstSeen")
    val curr = Seq(("s1", t9), ("s2", t9)).toDF("id", "firstSeen")
    val out = Delta.preserveFirstSeen(curr, prev, lit(t9))
      .as[(String, Timestamp)].collect().toMap
    assert(out("s1").getTime == 1000L && out("s2").getTime == 9000L)
  }

  test("text analysis: occurrences, tokens, fingerprint") {
    val df = Seq(Tuple1("the cat and the dog and the bird")).toDF("text")
    val (occ, tok) = df.select(
      TextAnalysis.occurrences(concat(lit(" "), col("text"), lit(" ")), " the "),
      TextAnalysis.tokenCount(col("text"))).as[(Long, Long)].head()
    assert(occ == 3 && tok == 8)
    val fp = Seq(Tuple1("  Hello   World  "), Tuple1("hello world")).toDF("text")
      .select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fp(0) == fp(1))
  }

  test("langId argmax picks the best marker language, ties break by code") {
    val df = Seq(Tuple1("the data the data spark")).toDF("text")
    val lang = df.select(TextAnalysis.langId(col("text"), Seq(
      "en" -> Seq("the"), "xx" -> Seq("data"), "zz" -> Seq("spark")))).as[String].head()
    assert(lang == "en") // the:2 data:2 spark:1 -> tie en/xx -> en
  }

  test("blocking candidates + topK honors cutoff, ratio and k") {
    val subjects = Seq((1L, "alpha beta gamma"), (2L, "zeta eta")).toDF("id", "name")
    val targets = Seq((10L, "alpha beta gamma"), (11L, "alpha beta delta"),
      (12L, "omega psi")).toDF("id", "name")
    val cands = Blocking.candidates(subjects, targets,
      col("id"), col("name"), col("id"), col("name"), maxDf = 100)
    val out = Blocking.topK(cands, k = 5, cutoff = 0.4, minScoreRatio = 0.1)
      .select("subject_id", "target_id", "rank").as[(Long, Long, Int)].collect()
    val s1 = out.filter(_._1 == 1L).sortBy(_._3).map(_._2)
    assert(s1.head == 10L)            // exact match ranks first
    assert(s1.toSet == Set(10L, 11L)) // 12 shares nothing; cutoff drops it
    assert(!out.exists(_._1 == 2L))   // no candidates at all for subject 2
  }

  test("blocking recalls word-order variants (sorted bigram keys)") {
    // same token set, different order: Jaccard 1.0 — must be a candidate
    val subjects = Seq((1L, "ivan ivanov")).toDF("id", "name")
    val targets = Seq((10L, "ivanov ivan")).toDF("id", "name")
    val cands = Blocking.candidates(subjects, targets,
      col("id"), col("name"), col("id"), col("name"), maxDf = 100)
      .as[(Long, Long, Double)].collect()
    assert(cands.toSeq == Seq((1L, 10L, 1.0)))
  }

  test("skew-salted blocking join is exact on a hot-token corpus and salts only hot keys") {
    // 200 subjects and 200 targets all sharing the sorted bigram
    // "alpha beta" (the common-surname skew case) plus distinct cold
    // tails; maxDf admits the hot key, so the unsalted join funnels
    // 200×200 pairs through ONE reducer — the salted variant must
    // produce the IDENTICAL candidate set
    val subjects = (1 to 200).map(i => (i.toLong, s"alpha beta s$i")).toDF("id", "name")
    val targets = (1 to 200).map(i => (i.toLong + 1000, s"alpha beta t$i")).toDF("id", "name")
    def run(salt: Int) = Blocking.candidates(subjects, targets,
      col("id"), col("name"), col("id"), col("name"), maxDf = 1000,
      saltBuckets = salt, saltMinPairs = 100L)
      .as[(Long, Long, Double)].collect().toSet
    val plain = run(1)
    val salted = run(8)
    assert(plain.size === 200 * 200)
    assert(salted === plain)
    // the salted plan shuffles the pair join on (bkey, __salt)
    val plan = Blocking.candidates(subjects, targets,
      col("id"), col("name"), col("id"), col("name"), maxDf = 1000,
      saltBuckets = 8, saltMinPairs = 100L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan.take(1500))
  }

  test("match scoring: evidence hierarchy and negative country evidence") {
    def side(rows: Seq[(Long, Seq[String], Seq[String], Seq[String], Seq[String])]) =
      rows.toDF("id", "names", "countries", "years", "idents")
    val subjects = side(Seq(
      (1L, Seq("Jon Smith"), Seq("de"), Seq("1980"), Seq("A1")),
      (2L, Seq("Jon Smith"), Seq("de"), Seq.empty, Seq.empty),
      (3L, Seq("Jon Smith"), Seq("de"), Seq.empty, Seq.empty)))
    val targets = side(Seq(
      (11L, Seq("totally other"), Seq("fr"), Seq("1999"), Seq("A1")), // ident only
      (12L, Seq("Jan Smyth"), Seq("de"), Seq.empty, Seq.empty),       // phonetic + country
      (13L, Seq("Jan Smyth"), Seq("fr"), Seq.empty, Seq.empty)))      // phonetic, country MISMATCH
    val pairs = Seq((1L, 11L), (2L, 12L), (3L, 13L))
      .toDF("subject_id", "target_id")
    val out = Matcher.score(pairs, subjects, targets)
      .select("subject_id", "score").as[(Long, Double)].collect().toMap
    // ident alone (0.6) minus country/year mismatches (-0.25) = 0.35 —
    // decisive but damped by active contradictions
    assert(math.abs(out(1L) - 0.35) < 1e-9)
    // phonetic (0.2) + country (0.15), zero token overlap
    assert(math.abs(out(2L) - 0.35) < 1e-9)
    // same pair with a country contradiction: 0.2 - 0.15
    assert(math.abs(out(3L) - 0.05) < 1e-9)
  }

  test("banded range join equals the naive BETWEEN join and avoids nested loops") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 500).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "pd")
    val ivs = (1 to 40).map { i =>
      val lo = rnd.nextInt(950).toLong
      (1000L + i, lo, lo + rnd.nextInt(60).toLong) // spans 0-59, bands 0-3
    }.toDF("iid", "lo", "hi")
    val banded = RangeJoin.pointInInterval(pts, ivs, "pd", "lo", "hi",
        bandWidth = 25)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = pts.join(ivs, col("pd") >= col("lo") && col("pd") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(banded == naive && naive.nonEmpty)
    val plan = RangeJoin.pointInInterval(pts, ivs, "pd", "lo", "hi", 25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
      plan.take(1500))
  }

  test("hash split is deterministic, salt-sensitive, and covers configured fractions") {
    val ids = (1L to 2000L).toDF("id")
    val s1 = Sampling.assignSplits(ids, col("id"), "saltA",
        Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))
      .as[(Long, String)].collect().toMap
    // deterministic: identical re-run
    val s2 = Sampling.assignSplits(ids, col("id"), "saltA",
        Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))
      .as[(Long, String)].collect().toMap
    assert(s1 == s2)
    // subset-stability: the corpus around a doc cannot move it
    val sub = Sampling.assignSplits(ids.filter(col("id") <= 100), col("id"),
        "saltA", Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))
      .as[(Long, String)].collect().toMap
    assert(sub.forall { case (k, v) => s1(k) == v })
    // fractions roughly honored
    val frac = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(frac("train") - 1600) < 120)
    assert(frac("valid") > 40 && frac("test") > 40)
    // a different salt re-deals
    val s3 = Sampling.assignSplits(ids, col("id"), "saltB",
        Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))
      .as[(Long, String)].collect().toMap
    assert(s3 != s1)
  }

  test("sessionize: gap rule splits sessions, running index per key") {
    val ev = Seq(
      (1L, 100L), (1L, 150L), (1L, 400L), (1L, 420L), (2L, 100L)
    ).toDF("uid", "ts")
    val out = Sampling.sessionize(ev, col("uid"), col("ts"), maxGap = 100L)
      .select("uid", "ts", "session_idx")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 100L, 0L), (1L, 150L, 0L),   // gap 50 <= 100: same session
      (1L, 400L, 1L), (1L, 420L, 1L),   // gap 250 breaks
      (2L, 100L, 0L)))
  }

  test("as-of join: latest at-or-before match per key, tie-inclusive, null when none") {
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"), (2L, 50L, "c"), (3L, 9L, "d")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 15L, 90.0), (1L, 15L, 150.0), (2L, 60L, 600.0)
    ).toDF("k", "ts", "px")
    // duplicate right rows at (1, 15): the tie-break keeps px=150.0
    val out = AsOf.asOfJoin(left, right, "k", "ts",
        rightTieBreak = Seq("px"))
      .select("k", "ts", "tag", "px")
      .as[(Long, Long, String, Option[Double])].collect().toSet
    assert(out == Set(
      (1L, 10L, "a", Some(100.0)),     // tie at ts=10 matches
      (1L, 20L, "b", Some(150.0)),     // latest of the two priors
      (1L, 5L, "early", None),         // before any right row
      (2L, 50L, "c", None),            // right row is later only
      (3L, 9L, "d", None)))            // key absent on the right
  }

  test("phonetic fingerprint blocks spelling variants and respects the df cap") {
    val subjects = Seq(
      (1L, "Jon Smith"), (2L, "Bob Jones"), (3L, "common name"), (4L, "common name")
    ).toDF("id", "nm")
    val targets = Seq(
      (11L, "Smyth Jan"),   // word order + vowels differ; codes match 1
      (12L, "Bob Johnson"), // Jones J520 vs Johnson J525 — no match
      (13L, "camman nama"), (14L, "comman nome")
    ).toDF("id", "nm")
    val pairs = Blocking.candidatesPhonetic(subjects, targets,
        col("id"), col("nm"), col("id"), col("nm"), maxDf = 100)
      .select("subject_id", "target_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 11L), (3L, 13L), (3L, 14L), (4L, 13L), (4L, 14L)))
    // df cap: the duplicated 'common name' fingerprint exceeds cap 1 on
    // the subject side; the unique fingerprints survive
    val capped = Blocking.candidatesPhonetic(subjects, targets,
        col("id"), col("nm"), col("id"), col("nm"), maxDf = 1)
      .select("subject_id", "target_id").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 11L)))
  }

  test("statement IO roundtrip with external filter and dataset pruning") {
    val t0 = new Timestamp(0L)
    val stmts = Seq(
      Statement("i1", "e1", "e1", "name", "Person", "A", "ds1", "en", "c", "A", t0, t0, external = false),
      Statement("i2", "e2", "e2", "name", "Person", "B", "ds1", "en", "c", "B", t0, t0, external = true),
      Statement("i3", "e3", "e3", "name", "Person", "C", "ds2", "en", "c", "C", t0, t0, external = false)
    ).toDS()
    val root = java.nio.file.Files.createTempDirectory("graft-io").toString
    StatementIO.write(stmts, root, "v1")
    val ds1 = StatementIO.scan(spark, root, "v1", Seq("ds1")).collect()
    assert(ds1.map(_.id).toSet == Set("i1")) // external dropped, ds2 pruned
    val all = StatementIO.scan(spark, root, "v1", Seq("ds1", "ds2"), includeExternal = true)
    assert(all.count() == 3)
  }

  test("multimodal feature extraction and frame sampling") {
    val media = Seq(
      (1L, "image", "0123456789".getBytes("UTF-8")),
      (2L, "audio", "abcdef".getBytes("UTF-8")),
      (3L, "video", ("x" * 40).getBytes("UTF-8"))
    ).toDF("media_id", "modality", "content")
      .withColumn("mime", lit("application/octet-stream"))
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))
    val feats = Multimodal.extractFeatures(media)
      .select("media_id", "width", "height", "duration_ms", "n_frames")
      .as[(Long, Int, Int, Long, Int)].collect().map(r => r._1 -> r).toMap
    assert(feats(1L)._2 == 16 + 10 % 128 && feats(1L)._3 == 16 + 70 % 128)
    assert(feats(2L)._4 == 48L)
    assert(feats(3L)._5 == 1 + 40 % 32)
    val frames = Multimodal.sampleFrames(media, stride = 4).collect()
    assert(frames.nonEmpty && frames.forall(_.getLong(0) == 3L))
  }

  test("statistics facets and fill rates") {
    val df = Seq(("A", "x"), ("A", "y"), ("B", "x")).toDF("schema", "country")
    val f = Statistics.facets(df, Seq("schema" -> "schema", "country" -> "country"))
      .as[(String, String, Long)].collect().toSet
    assert(f.contains(("schema", "A", 2L)) && f.contains(("country", "x", 2L)))

    val stmts = Seq(
      ("c1", "Person", "name"), ("c1", "Person", "birthDate"), ("c2", "Person", "name"))
      .toDF("canonicalId", "schema", "prop")
    val fr = Statistics.fillRates(stmts)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._2) -> r._4).toMap
    assert(fr("name") == 1.0 && fr("birthDate") == 0.5)
  }

  test("contamination report flags shared shingles, zero-pads short docs") {
    val leak = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, s"filler words here then $leak", "train"),
      (2L, s"unrelated prefix tokens and $leak trailing", "eval"), // leaked
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota", "eval"), // clean
      (4L, "too short", "eval") // < k words: zero shingles
    ).toDF("doc_id", "text", "split")
    val r = Contamination.report(docs, col("doc_id"), col("text"), col("split"))
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(t => t._1 -> t).toMap
    // the 12-word leak yields exactly 12-8+1=5 shared shingles
    assert(r(2L)._3 == 5L && r(2L)._5)
    assert(r(3L)._3 == 0L && !r(3L)._5)
    assert(r(4L) == ((4L, 0L, 0L, 0.0, false)))
  }

  test("sequence packing: two-phase prefix sum matches the global layout") {
    // tokens (words+1 sep): 4, 3, 5, 2 — offsets 0, 4, 7, 12
    // seqLen=5: docs 1 and 5 straddle sequence boundaries; doc 11
    // lands in bucket 1, exercising the cross-bucket prefix offset
    val docs = Seq((0L, "a b c"), (1L, "d e"), (5L, "f g h i"), (11L, "j"))
      .toDF("doc_id", "text")
    val r = Packing.packManifest(docs, col("doc_id"), col("text"),
      seqLen = 5L, bucketSize = 10L)
      .as[(Long, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(0L) == ((0L, 4L, 0L, 0L, 0L)))
    assert(r(1L) == ((1L, 3L, 4L, 0L, 1L)))
    assert(r(5L) == ((5L, 5L, 7L, 1L, 2L)))
    assert(r(11L) == ((11L, 2L, 12L, 2L, 2L)))
  }

  test("URL canonicalization: case, www, ports, utm, order, slash") {
    import graft.functions.Urls
    val cases = Seq(
      "HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&b=2&a=1#f" -> "https://ex.com/A/b?a=1&b=2",
      "http://ex.com:80/" -> "http://ex.com/",
      "https://ex.com" -> "https://ex.com/",
      "https://ex.com/p?utm_only=1" -> "https://ex.com/p",
      "https://ex.com/CaseKept" -> "https://ex.com/CaseKept")
    val out = cases.map(_._1).toDF("u")
      .select(Urls.canonicalUrl(col("u"))).as[String].collect()
    assert(out.toSeq == cases.map(_._2))
  }

  test("bigram LM scores by hand-checked add-one NLL") {
    // train "a b a b": c2(a,b)=2, c2(b,a)=1; c1(a)=2, c1(b)=1; V=2
    // eval "a b c": nll(a,b)=ln(4)-ln(3), nll(b,c)=ln(3)-ln(1)
    //   avg = ln(4)/2 = ln(2) = 0.6931...
    val docs = Seq(
      (1L, "a b a b", "train"),
      (2L, "a b c", "eval"),
      (3L, "a", "eval") // under two words: zero bigrams
    ).toDF("doc_id", "text", "split")
    val r = TextAnalysis.bigramLmReport(docs, col("doc_id"), col("text"), col("split"))
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r(2L) == ((2L, 2L, 1L, 0.6931)))
    assert(r(3L) == ((3L, 0L, 0L, 0.0)))
  }

  test("C4 line keep rule: punct, length, blocklist, brace") {
    val lines = Seq(
      "a good long sentence here.", // kept
      "no terminal punctuation at all", // dropped: no '.'
      "too short.", // dropped: < 4 words
      "contains lorem ipsum filler text.", // dropped: blocklist
      "code like if (x) { return. ") // dropped: brace (and no terminal '.')
      .toDF("l")
    val kept = lines.filter(TextAnalysis.c4LineKeep(col("l"))).as[String].collect()
    assert(kept.toSeq == Seq("a good long sentence here."))
  }

  test("PII counts gate card candidates through Luhn") {
    val df = Seq(Tuple1(
      "mail a.b@x.co and c@y.org ip 10.0.0.1 call +1-555-123-4567 " +
        "card 4532015112830366 card 4532015112830367")).toDF("text")
    val c = df.select(Pii.counts(col("text")).as("c")).select(
      col("c.n_emails"), col("c.n_ips"), col("c.n_phones"),
      col("c.n_cards"), col("c.n_valid_cards"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(c == ((2L, 1L, 1L, 2L, 1L)))
  }

  test("PII redaction scrubs longer patterns first") {
    val df = Seq(Tuple1(
      "a.b@x.co then 4532015112830366 then +1-555-123-4567 then 10.0.0.1 end"))
      .toDF("text")
    val r = df.select(Pii.redact(col("text"))).as[String].head()
    // the card's 16-digit run must become one [CARD], not IP-octet shreds
    assert(r == "[EMAIL] then [CARD] then [PHONE] then [IP] end")
  }

  test("review state: accepted rows survive extraction drift; gate sees the rest") {
    def crawl(rows: Seq[(String, String, String)], cv: Long) =
      rows.toDF("key", "source_value", "original_extraction")
        .withColumn("crawler_version", lit(cv))
        .withColumn("origin", lit("llm"))
    val c1 = crawl(Seq(("a", "s", "e1"), ("b", "s", "e1")), 1L)
    val state0 = c1.limit(0).select(col("key"), col("source_value"),
      col("original_extraction"), col("original_extraction").as("extracted_data"),
      lit(false).as("accepted"), col("crawler_version"), col("origin"),
      lit("").as("last_seen_version"), lit("").as("modified_version"),
      lit("").as("modified_by"))
    val s1 = Reviews.reviewExtraction(state0, c1, "v1")
    val s1r = Reviews.applyReviews(s1,
      Seq(("a", true, "e1fix", "bob")).toDF("key", "accepted", "extracted_edit", "reviewed_by"),
      "v1")
    // crawl 2: extraction drifts on BOTH keys (source unchanged)
    val s2 = Reviews.reviewExtraction(s1r, crawl(Seq(("a", "s", "e2"), ("b", "s", "e2")), 1L), "v2")
    val byKey = s2.select("key", "accepted", "extracted_data", "modified_by")
      .as[(String, Boolean, String, String)].collect().map(r => r._1 -> r).toMap
    // accepted 'a' keeps the reviewer's edit; unaccepted 'b' refreshes
    assert(byKey("a") == (("a", true, "e1fix", "bob")))
    assert(byKey("b") == (("b", false, "e2", "crawler")))
    assert(Reviews.unaccepted(s2, "v2").select("key").as[String].collect().toSeq == Seq("b"))
    assert(Reviews.acceptedExtractions(s2).select("extracted_data")
      .as[String].collect().toSeq == Seq("e1fix"))
  }

  test("curriculum packing lays stages out sequentially with exact offsets") {
    // stage 1 doc 1 comes AFTER all stage-0 docs despite the lower id
    val toks = Seq((1L, 10L, 1), (2L, 7L, 0), (3L, 5L, 0), (4L, 4L, 1))
      .toDF("doc_id", "n_tokens", "stage")
    val out = Packing.curriculumPackManifest(toks, seqLen = 8L, bucketSize = 2L)
      .select("doc_id", "off_start", "seq_first", "seq_last")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // layout: stage0 [2:0-6, 3:7-11], stage1 [1:12-21, 4:22-25]
    assert(out(2L) == ((2L, 0L, 0L, 0L)))
    assert(out(3L) == ((3L, 7L, 0L, 1L)))
    assert(out(1L) == ((1L, 12L, 1L, 2L)))
    assert(out(4L) == ((4L, 22L, 2L, 3L)))
  }

  test("incremental near-dedup matches copies to base, keeps novel docs") {
    // base doc 1 and its verbatim fresh copy 11; 12 = truncated copy;
    // 13 = unrelated words (no shared shingles)
    val words = (1 to 30).map(i => s"tok$i").mkString(" ")
    val base = Seq((1L, words), (2L, (40 to 70).map(i => s"tok$i").mkString(" ")))
      .toDF("id", "text")
    val fresh = Seq(
      (11L, words),
      (12L, (1 to 28).map(i => s"tok$i").mkString(" ")),
      (13L, (100 to 130).map(i => s"zz$i").mkString(" "))
    ).toDF("id", "text")
    val out = Dedup.incrementalNearDup(base, col("id"), col("text"),
        fresh, col("id"), col("text"))
      .select("id", "status", "matched_base_id")
      .as[(Long, String, Option[Long])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(11L) == (("near_dup_of_base", Some(1L))))
    assert(out(12L) == (("near_dup_of_base", Some(1L))))
    assert(out(13L) == (("kept", None)))
  }

  test("source overlap matrix counts shared shingles per pair, zero-fills strangers") {
    val eight = (1 to 8).map(i => s"w$i").mkString(" ")     // one shared 8-gram
    val docs = Seq(
      (1L, "a", eight + " tail1 tail2"),
      (2L, "b", eight + " other3 other4"),
      (3L, "c", "totally different words one two three four five six")
    ).toDF("id", "src", "text")
    val out = Contamination.sourceOverlapMatrix(docs, col("text"), col("src"))
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._6))).toMap
    assert(out(("a", "b"))._1 == 1L)          // exactly the planted 8-gram
    assert(out(("a", "c")) == ((0L, 0.0)))    // stranger pair present with 0
    assert(out(("b", "c")) == ((0L, 0.0)))
    assert(out(("a", "b"))._2 > 0.3)          // containment = 1/min(3,3)
  }

  test("epoch plan caps the best tier, partial-fills the next, starves the rest") {
    // m0=20 (2×10), m1=50 (5×10), m2=50; budget 105, maxEpochs 2:
    // tier0 takes 2 full epochs (40), tier1 takes 1 epoch (50) + a
    // 15-token partial — exactly ONE 10-token doc fits — tier2 nothing
    val toks = ((1L to 2L).map((_, 10L, 0)) ++ (3L to 7L).map((_, 10L, 1)) ++
      Seq((8L, 50L, 2))).toDF("doc_id", "n_tokens", "tier")
    val out = Sampling.epochPlan(toks, budget = 105L, maxEpochs = 2, salt = "t")
      .as[(Long, Int, Long, Long, Boolean, Long)].collect()
    val byTier = out.groupBy(_._2)
    assert(byTier(0).forall(r => r._4 == 2L && !r._5))
    assert(byTier(1).forall(_._4 == 1L))
    assert(byTier(1).count(_._5) == 1)
    assert(byTier(2).forall(r => r._4 == 0L && !r._5 && r._6 == 0L))
    assert(out.map(_._6).sum == 40L + 50L + 10L)
    // pure function of ids: same plan under a different partitioning
    val again = Sampling.epochPlan(toks.repartition(5), 105L, 2, "t")
      .as[(Long, Int, Long, Long, Boolean, Long)].collect()
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
  }

  test("incremental exact dedup classifies fresh docs against the base") {
    // base has a dup group {1,2}; fresh: 10 copies base (keeper = MIN
    // base id 1), 11+12 share novel text (in-new chain), 13 unique
    val base = Seq((1L, "same text"), (2L, "same text"), (3L, "other text"))
      .toDF("id", "text")
    val fresh = Seq((10L, "same text"), (11L, "novel text"),
      (12L, "novel text"), (13L, "lone text")).toDF("id", "text")
    val out = Dedup.incrementalExact(base, col("id"), col("text"),
        fresh, col("id"), col("text"))
      .select("id", "status", "keeper_id")
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      10L -> (("dup_of_base", 1L)),
      11L -> (("kept", 11L)),
      12L -> (("dup_in_new", 11L)),
      13L -> (("kept", 13L))))
  }

  test("host curation report blocklists duplicate farms and boilerplate hosts") {
    val docs = Seq(
      // mirror.com: 2 of 2 docs share content → dup_frac 1.0 → blocklist
      (1L, "https://mirror.com/a", "alpha beta gamma delta"),
      (2L, "https://www.mirror.com/b", "alpha beta gamma delta"),
      // spam.com: unique content but degenerate diversity → blocklist
      (3L, "https://spam.com/x", "spam spam spam spam spam spam spam zz"),
      // good.com: unique diverse content → keep
      (4L, "https://good.com/y", "one two three four five six seven"),
      (5L, "https://good.com/z", "red green blue cyan magenta yellow")
    ).toDF("id", "url", "text")
    val out = Curation.hostReport(docs, col("id"), col("url"), col("text"))
      .select("host", "n_docs", "n_dup_docs", "decision")
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      "mirror.com" -> ((2L, 2L, "blocklist")),
      "spam.com" -> ((1L, 0L, "blocklist")),
      "good.com" -> ((2L, 0L, "keep"))))
  }

  test("gopher signals and keep rule fire each threshold") {
    val many = (1 to 60).map(i => s"word$i").mkString(" ")
    val docs = Seq(
      // passes every rule: 60+ alpha words, stop words, clean lines
      (1L, many + " the of and with", Seq("a good line.", "another line.")),
      // too short
      (2L, "the of tiny", Seq("x.")),
      // symbol-heavy: ### ratio over 0.1
      (3L, many + " the of ### ## ## #", Seq("ok.")),
      // all-bullet lines
      (4L, many + " the of", Seq("- b1", "- b2", "- b3"))
    ).toDF("id", "text", "lines")
    val out = docs.select(col("id"),
        TextAnalysis.gopherSignals(col("text"), col("lines")).as("g"))
      .select(col("id"), col("g.n_words"), col("g.stop_hits"),
        TextAnalysis.gopherKeep(col("g")).as("keep"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._4 && out(1L)._3 >= 2)
    assert(!out(2L)._4 && out(2L)._2 == 3)
    assert(!out(3L)._4)
    assert(!out(4L)._4)
  }

  test("logistic quality classifier separates planted vocab after two rounds") {
    // positives repeat 'good', negatives repeat 'bad' — linearly
    // separable in the hashed space, so two GD rounds must already
    // classify every training doc correctly
    val docs = (0L until 40L).map { i =>
      val txt = if (i % 2 == 0) "good fine nice good solid good"
      else "bad awful bad poor bad noisy"
      (i, txt)
    }.toDF("id", "text")
    val label = concat(lit(" "), col("text"), lit(" ")).contains(" good ")
    val w = TextAnalysis.logisticWeights(docs, col("id"), col("text"),
      label, trainFilter = col("id") < 30, buckets = 16, rounds = 2, lr = 0.5)
    assert(w.count() == 16) // every bucket present, trained or not
    val scored = TextAnalysis.logisticScores(docs, col("id"), col("text"), w, 16)
      .as[(Long, Double, Boolean)].collect()
    assert(scored.length == 40)
    scored.foreach { case (id, _, pred) => assert(pred == (id % 2 == 0), s"doc $id") }
    // determinism: retraining reproduces identical weights
    val w2 = TextAnalysis.logisticWeights(docs, col("id"), col("text"),
      label, trainFilter = col("id") < 30, buckets = 16, rounds = 2, lr = 0.5)
    assert(w.as[(Long, Double)].collect().toSet == w2.as[(Long, Double)].collect().toSet)
  }

  test("program registry: dup-key assertion, dangling anti-join, facet titles") {
    val reg = Programs.registry(
      Seq(("PRG1", "Alpha Sanctions"), ("PRG2", "Beta Embargo"))
        .toDF("program_key", "title"))
    // duplicate keys fail loudly (the reference's assertion)
    val dup = Seq(("PRG1", "A"), ("PRG1", "B")).toDF("program_key", "title")
    assertThrows[IllegalArgumentException](Programs.registry(dup))
    // dangling = references with no registry key
    val sanc = Seq(("s1", "PRG1"), ("s2", "PRG9"), ("s3", "PRG2"), ("s4", "PRG9"))
      .toDF("sid", "pk")
    val dangling = Programs.danglingPrograms(sanc, col("sid"), col("pk"), reg)
      .as[(String, String)].collect().toSet
    assert(dangling == Set(("s2", "PRG9"), ("s4", "PRG9")))
    // statisticsJson's program facet carries registry titles (null for
    // an unregistered programId) when the registry is wired in
    val ents = Seq(
      ("e1", "Sanction", Map("programId" -> Seq("PRG1"))),
      ("e2", "Sanction", Map("programId" -> Seq("PRG1", "PRG9"))))
      .toDF("id", "schema", "properties")
    val json = Statistics.statisticsJson(ents, programRegistry = Some(reg))
      .as[String].head()
    assert(json.contains(
      "{\"id\":\"PRG1\",\"count\":2,\"title\":\"Alpha Sanctions\"}"))
    assert(json.contains("{\"id\":\"PRG9\",\"count\":1,\"title\":null}"))
    // without a registry the fragment keeps its historic shape (q102)
    val plain = Statistics.statisticsJson(ents).as[String].head()
    assert(plain.contains("{\"id\":\"PRG1\",\"count\":2}"))
  }

  test("doremiReweight: EG step up-weights excess-loss domains, allocation is exact") {
    val ex = Seq(("a", 0.5), ("b", 0.0), ("c", -0.3), ("d", 0.1))
      .toDF("domain", "excess")
    val out = Sampling.doremiReweight(ex, eta = 2.0, smoothing = 0.25,
      budget = 1000L).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Double]("excess"), r.getAs[Double]("weight"),
          r.getAs[Long]("n_alloc"))).toMap
    // negative excess clamps to zero before the exponent
    assert(out("c")._1 === 0.0)
    // ordering follows excess; the budget is conserved exactly
    assert(out("a")._2 > out("d")._2)
    assert(out("d")._2 > out("b")._2)
    assert(out("b")._2 === out("c")._2)
    assert(out.values.map(_._3).sum === 1000L)
    // smoothing floors every domain at c/K of the budget
    assert(out.values.forall(_._3 >= (0.25 / 4 * 1000).toLong - 1))
    // zero excess everywhere → uniform weights, budget split evenly
    val flat = Sampling.doremiReweight(
      Seq(("a", 0.0), ("b", 0.0), ("c", 0.0), ("d", 0.0)).toDF("domain", "excess"),
      eta = 2.0, smoothing = 0.25, budget = 1000L).collect()
    assert(flat.map(_.getAs[Long]("n_alloc")).toSeq.forall(_ === 250L))
  }

  test("psiTokenDrift: identical slices score ~0, disjoint vocabularies score large") {
    val same = (1L to 200L).map(i => (i, "alpha beta gamma delta", i % 2 == 0))
      .toDF("id", "text", "is_ref")
    val psiSame = Drift.psiTokenDrift(same, col("text"), col("is_ref"))
      .select("psi_total").distinct().as[Double].head()
    assert(math.abs(psiSame) < 0.01, s"psi=$psiSame")
    val split = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "aaa bbb ccc" else "xxx yyy zzz", i % 2 == 0))
      .toDF("id", "text", "is_ref")
    val psiSplit = Drift.psiTokenDrift(split, col("text"), col("is_ref"))
      .select("psi_total").distinct().as[Double].head()
    assert(psiSplit > 1.0, s"psi=$psiSplit") // total vocabulary shift
    // contributions sum exactly to the total (decimal sum of rounded terms)
    val rows = Drift.psiTokenDrift(split, col("text"), col("is_ref"))
      .select("contrib", "psi_total").as[(Double, Double)].collect()
    val sum = rows.map(r => BigDecimal(r._1)).sum
    assert((sum - BigDecimal(rows.head._2)).abs < BigDecimal("1e-9"))
  }

  test("joinAdvisor: NDV within KMV error, subset dim fires the runtime filter") {
    val fact = spark.range(5000).toDF("k")
    val dimFull = spark.range(5000).toDF("k")
    val dimTenth = spark.range(500).select((col("id") * 10).as("k"))
    val full = JoinAdvisor.advise(fact, col("k"), dimFull, col("k"), "full",
        k = 128, broadcastNdvLimit = 1000L).head()
    assert(math.abs(full.getAs[Long]("ndv_a") - 5000L) < 700, full.toString)
    assert(full.getAs[String]("strategy") == "shuffle")
    assert(!full.getAs[Boolean]("runtime_filter")) // every fact key joins
    val tenth = JoinAdvisor.advise(fact, col("k"), dimTenth, col("k"), "tenth",
        k = 128, broadcastNdvLimit = 1000L).head()
    assert(tenth.getAs[String]("strategy") == "broadcast")
    assert(tenth.getAs[Boolean]("runtime_filter")) // ~10% of fact keys join
    val est = tenth.getAs[Long]("est_common_keys")
    assert(est > 200 && est < 900, s"est_common=$est (true 500)")
  }

  test("weightedSample: ES keys match a driver-side replay; heavy weights dominate") {
    val rows = (1L to 400L).map(i => (i, "s", if (i <= 40) 100.0 else 1.0))
    val df = rows.toDF("id", "st", "w")
    val out = Sampling.weightedSample(df, col("id"), col("st"), col("w"), "t1", m = 20)
      .select("id", "pick_rank").as[(Long, Long)].collect()
    // exact replay: same hash, same key formula, same ordering
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15), 16)
    val keys = rows.map { case (i, _, w) =>
      val u = (h60(s"t1|$i").toDouble + 1.0) / 1152921504606846976.0
      i -> BigDecimal(-math.log(u) / w).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val want = keys.sortBy { case (i, k) => (k, i) }.take(20).map(_._1)
    assert(out.sortBy(_._2).map(_._1).toSeq == want)
    // the 10% heavy-weight (100×) records should take most of the picks
    val heavy = out.count(_._1 <= 40)
    assert(heavy >= 15, s"heavy picks = $heavy / 20")
    // weight <= 0 rows can never be drawn
    val withZero = (rows :+ ((401L, "s", 0.0))).toDF("id", "st", "w")
    val z = Sampling.weightedSample(withZero, col("id"), col("st"), col("w"), "t1", 400)
      .select("id").as[Long].collect()
    assert(!z.contains(401L))
    // a sub-1e-17 positive weight overflows the DECIMAL(28,9) arrival
    // key to NULL; it must be EXCLUDED (draw probability ~0), never
    // ranked ahead of valid keys the way default nulls-first would
    val withTiny = (rows :+ ((402L, "s", 1e-18))).toDF("id", "st", "w")
    val tiny = Sampling.weightedSample(withTiny, col("id"), col("st"), col("w"), "t1", 5)
      .select("id", "pick_rank").as[(Long, Long)].collect()
    assert(!tiny.map(_._1).contains(402L))
    assert(tiny.sortBy(_._2).map(_._1).toSeq == want.take(5)) // picks unchanged
  }

  test("scd2 collapses runs, emits validity intervals, null-safe values") {
    val log = Seq(
      ("k1", 1L, Some("a")), ("k1", 2L, Some("a")), ("k1", 3L, Some("b")),
      ("k1", 4L, None), ("k1", 5L, None), ("k1", 6L, Some("a")),
      ("k2", 1L, Some("x")))
      .toDF("k", "seq", "v")
    val out = Delta.scd2(log, col("k"), col("seq"), col("v"))
      .as[(String, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet
    assert(out == Set(
      ("k1", Some("a"), 1L, Some(3L), false),
      ("k1", Some("b"), 3L, Some(4L), false),
      ("k1", None, 4L, Some(6L), false),     // null is a legal state
      ("k1", Some("a"), 6L, None, true),     // value may recur
      ("k2", Some("x"), 1L, None, true)))
  }

  test("sortedNeighborhood: exactly n*w pairs (minus tail), spans bucket boundaries") {
    // sort key = 2-digit string, bucket = first digit: ranks must be
    // GLOBAL, so (id 19, id 20) — adjacent across the '1'/'2' bucket
    // boundary — must pair at dist 1
    val rows = (10L to 39L).map(i => (i, i.toString)).toDF("id", "sk")
    val out = Blocking.sortedNeighborhood(rows, col("id"), col("sk"),
      substring(col("sk"), 1, 1), w = 3)
      .as[(Long, Long, Long)].collect()
    val n = 30
    assert(out.length == n * 3 - (1 + 2 + 3)) // last 3 records truncate
    assert(out.contains((19L, 20L, 1L)))
    assert(out.contains((19L, 22L, 3L)))
    assert(out.forall { case (a, b, dd) => b - a == dd }) // numeric order == lex order here
  }
}
