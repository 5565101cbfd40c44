package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language ID (marker-word heuristic),
  * and document fingerprinting. All pure Catalyst expressions (no UDFs)
  * so they run inside whole-stage codegen over 100 TB of documents.
  */
object TextAnalysis {

  /** Number of non-overlapping occurrences of `needle` in `haystack`,
    * computed via length arithmetic (codegen-friendly, and exactly
    * reproducible in any SQL engine for oracle checks). */
  def occurrences(haystack: Column, needle: String): Column =
    ((length(haystack) - length(replace(haystack, lit(needle), lit("")))) /
      needle.length).cast("long")

  /** Whitespace token count for single-space-separated text. */
  def tokenCount(text: Column): Column =
    (length(text) - length(replace(text, lit(" "), lit(""))) + 1).cast("long")

  /** BPE-ish subword count estimate: words + punctuation marks, the usual
    * ~1.3 tokens/word heuristic floor for budget accounting. */
  def subwordEstimate(text: Column): Column =
    (tokenCount(text).cast("double") * 1.3).cast("long")

  /** GPT-2-family pre-tokenizer pattern: contraction suffixes, letter
    * runs, digit runs, punctuation runs, whitespace runs — each match is
    * one pre-token (the BPE merge step only ever splits WITHIN these, so
    * this is the lower bound real tokenizers refine). Kept RE2-compatible
    * so the same pattern runs in the DuckDB oracle. */
  val BpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Pre-token count under the BPE-ish pattern (codegen'd regexp_count). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpePattern)).cast("long")

  /** Quality signals: character count, token count, mean word length,
    * stopword ratio (against a small marker list). Returns a struct. */
  def qualitySignals(text: Column): Column = {
    val chars = length(text).cast("long")
    val toks = tokenCount(text)
    val stop = occurrences(concat(lit(" "), text, lit(" ")), " the ") +
      occurrences(concat(lit(" "), text, lit(" ")), " a ")
    struct(
      chars.as("n_chars"),
      toks.as("n_tokens"),
      ((chars - (toks - lit(1))).cast("double") / toks.cast("double")).as("mean_word_len"),
      (stop.cast("double") / toks.cast("double")).as("stopword_ratio"))
  }

  /** Language-ID by marker-word scoring: each language has marker tokens;
    * the language with the highest marker count wins (deterministic
    * tie-break by score then language code). `markers` maps language code
    * to marker words. */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scored = markers.map { case (code, words) =>
      val score = words.map(w => occurrences(padded, s" $w ")).reduce(_ + _)
      struct(score.as("score"), lit(code).as("code"))
    }
    // argmax: sort by (score desc, code asc) — array_sort on struct sorts
    // ascending by field order, so sort (-score, code) and take the head.
    val arr = array(scored.map(s =>
      struct((s.getField("score") * -1).as("negscore"), s.getField("code").as("code"))): _*)
    element_at(array_sort(arr), 1).getField("code")
  }

  /** Document fingerprint: hash of whitespace-normalized lowercase text —
    * the rolling-hash analog for exact near-duplicate keys. */
  /** Repetition-based quality signals (Gopher/RefinedWeb style rules):
    * distinct-word ratio, top-word share, and the duplicated-bigram
    * fraction within a document. The per-word counts run as explode +
    * two-level aggregation (scale-safe); only the bounded per-document
    * bigram arrays use HOF expressions. Fractions are DECIMAL(9,6) for
    * engine-independent bytes. Returns (doc_id, n_words, word_ratio,
    * top_word_share, dup_bigram_frac). */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame,
      id: Column, text: Column): org.apache.spark.sql.DataFrame = {
    val words = split(text, " ")
    val base = df.select(id.as("doc_id"), words.as("w"))
    val counts = base.select(col("doc_id"), explode(col("w")).as("word"))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("n")).as("top_n"))
    // guard: Spark sequence(1, 0) DESCENDS ([1, 0]) rather than being
    // empty, so a one-word doc would index out of bounds
    val bigrams = base.select(col("doc_id"),
      when(size(col("w")) >= 2,
        transform(sequence(lit(1), size(col("w")) - 1),
          i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
        .otherwise(array().cast("array<string>"))
        .as("bg"))
      .select(col("doc_id"), size(col("bg")).as("n_bg"),
        size(array_distinct(col("bg"))).as("n_bg_distinct"))
    // decimal round-trip pins the fraction to 6 places so the bytes are
    // engine-independent (double division alone differs in the last ulp)
    // null divisor (not ANSI divide-by-zero) when a doc has no bigrams
    def frac(a: Column, b: Column): Column =
      (a.cast("double") / when(b =!= 0, b).cast("double"))
        .cast("decimal(9,6)").cast("double")
    counts.join(bigrams, "doc_id")
      .select(col("doc_id"), col("n_words"),
        frac(col("n_distinct"), col("n_words")).as("word_ratio"),
        frac(col("top_n"), col("n_words")).as("top_word_share"),
        frac(col("n_bg") - col("n_bg_distinct"), col("n_bg")).as("dup_bigram_frac"))
  }

  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** CCNet-style statistical quality scoring: train an add-one-smoothed
    * bigram language model on the `train` split and score every `eval`
    * document by average negative log-likelihood (high = unlike the
    * reference corpus = drop candidate). The exact-arithmetic stand-in
    * for the KenLM perplexity filter production pipelines run.
    *
    * Scale shape: the model IS two aggregated tables — bigram counts
    * and (derived) prefix counts — built with one shuffle each from the
    * train split; scoring is two hash equi-joins from the exploded eval
    * bigrams, then a per-doc aggregate. No model object, no driver
    * state, no broadcast requirement (counts join distributed when the
    * vocab is large). The NLL is decimal-rounded to 4 places so the
    * ln() ulp difference between engines cannot flip an oracle hash.
    *
    * Returns (doc_id, n_bigrams, n_unseen, avg_nll); docs under two
    * words score 0 bigrams / 0.0 NLL (null-free output). */
  def bigramLmReport(docs: org.apache.spark.sql.DataFrame,
      id: Column, text: Column, splitCol: Column): org.apache.spark.sql.DataFrame = {
    val base = docs.select(id.as("doc_id"), splitCol.as("split"),
      split(text, " ").as("w"))
    val bigrams = base.select(col("doc_id"), col("split"),
      explode(when(size(col("w")) >= 2,
        transform(sequence(lit(1), size(col("w")) - 1),
          i => struct(element_at(col("w"), i).as("w1"),
            element_at(col("w"), i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("doc_id"), col("split"), col("b.w1"), col("b.w2"))
    val trainBg = bigrams.filter(col("split") === "train")
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val prefix = trainBg.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = base.filter(col("split") === "train")
      .select(explode(col("w")).as("u")).agg(countDistinct(col("u")).as("v"))
    val scored = bigrams.filter(col("split") === "eval")
      .select("doc_id", "w1", "w2")
      .join(trainBg, Seq("w1", "w2"), "left")
      .join(prefix, Seq("w1"), "left")
      .select(col("doc_id"),
        coalesce(col("c2"), lit(0L)).as("c2"),
        coalesce(col("c1"), lit(0L)).as("c1"))
    val perDoc = scored.crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c2") === 0, 1L).otherwise(0L)).as("n_unseen"),
        avg(log(col("c1") + col("v")) - log(col("c2") + 1))
          .cast("decimal(12,4)").cast("double").as("avg_nll"))
    base.filter(col("split") === "eval").select("doc_id").distinct()
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
        coalesce(col("avg_nll"), lit(0.0)).as("avg_nll"))
  }

  /** Hashed bag-of-words features, LENGTH-NORMALIZED (fastText-style
    * mean): (doc_id, b, cnt) with b = hash60(word) mod `buckets` and
    * cnt = occurrences / document word count. Normalization matters:
    * raw counts make every bucket's gradient proportional to document
    * length, so any length–label correlation in the corpus becomes a
    * length prior that drowns the lexical signal (observed on the
    * fixture corpus, where doc parity correlates with length). The
    * integer/integer division is a single correctly-rounded IEEE op —
    * engine-portable. Fixed bucket count keeps the weight tables
    * broadcast-size at any corpus scale (the DSIR lesson, q134). */
  private def hashedFeatures(docs: org.apache.spark.sql.DataFrame,
      id: Column, text: Column, buckets: Int): org.apache.spark.sql.DataFrame =
    docs.select(id.as("doc_id"), split(text, " ").as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("double").as("l"),
        explode(col("ws")).as("wo"))
      .select(col("doc_id"), col("l"),
        pmod(Dedup.hash60(col("wo")), lit(buckets)).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg((count(lit(1)).cast("double") / first(col("l"))).as("cnt"))

  private def r4(c: Column): Column = c.cast("decimal(12,4)").cast("double")

  /** Order-independent double sum: each term is quantized to 12
    * decimal places and accumulated in EXACT decimal arithmetic, so
    * the aggregate no longer depends on Spark's partition/merge order
    * (a plain double SUM does, and the round-9 second-seed sweep
    * caught it flipping a DECIMAL(12,4) rounding boundary — seed-42
    * green was luck, not determinism). Decimal partial aggregation
    * map-side-combines like any sum, and DECIMAL(30,12) holds ~1e17
    * docs' worth of unit-scale terms — the scale-safe alternative to
    * sorted-fold summation, whose per-group collect would be O(group)
    * memory. The oracle replays the identical quantize-then-sum. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(30,12)")).cast("double")

  /** DCLM/fastText-style trained quality classifier: a logistic probe
    * over hashed bag-of-words features, trained IN-ENGINE by full-batch
    * gradient descent on the `trainFilter` split. Each round is one
    * broadcast join (weights are `buckets` rows), one groupBy(doc)
    * margin aggregate, and one groupBy(bucket) gradient aggregate —
    * nothing driver-side, nothing quadratic, and the weight table never
    * exceeds `buckets` rows regardless of corpus size.
    *
    * Determinism contract (what makes the DuckDB oracle able to replay
    * training): the margin z and each weight update round-trip
    * DECIMAL(12,4) — double summation order and libm `exp` differ
    * across engines only in final ulps, which the 4-dp barrier absorbs
    * (the q129 ln() precedent). Round 1 starts from w = 0, so z = 0 and
    * p = 0.5 exactly on both engines.
    *
    * @param label  boolean weak-supervision label evaluated on `docs`
    * @param lr     learning rate — sized for the NORMALIZED feature
    *   scale (per-doc tf sums to 1, so gradients are O(1/len); the
    *   default 100 reaches separation in two rounds on balanced labels)
    * @return (b, w) — one weight per hash bucket, all buckets present */
  def logisticWeights(docs: org.apache.spark.sql.DataFrame,
      id: Column, text: Column, label: Column, trainFilter: Column,
      buckets: Int = 32, rounds: Int = 2, lr: Double = 100.0): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    val train = docs.filter(trainFilter)
      .select(id.as("doc_id"), when(label, 1.0).otherwise(0.0).as("y"))
    // persist the feature frame: every round reads it twice (margin +
    // gradient), and without the persist each round would re-scan and
    // re-aggregate the raw corpus
    val x = hashedFeatures(docs.filter(trainFilter), id, text, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one 1-row count action up front: an empty train split would
    // otherwise 0/0 the updates into an all-null weight table that
    // flows silently into every downstream score
    val n = train.count().toDouble
    require(n > 0, "logisticWeights: trainFilter selects no documents")
    var w = spark.range(buckets)
      .select(col("id").cast("long").as("b"), lit(0.0).as("w"))
    (1 to rounds).foreach { _ =>
      val z = x.join(broadcast(w), "b")
        .groupBy("doc_id").agg(r4(dsum(col("w") * col("cnt"))).as("z"))
      val resid = train.join(z, "doc_id")
        .select(col("doc_id"), (col("y") - lit(1.0) / (lit(1.0) + exp(-col("z")))).as("r"))
      val grad = x.join(resid, "doc_id")
        .groupBy("b").agg(dsum(col("r") * col("cnt")).as("g"))
      w = w.join(grad, Seq("b"), "left")
        .select(col("b"),
          r4(col("w") + lit(lr) * coalesce(col("g"), lit(0.0)) / lit(n)).as("w"))
        .localCheckpoint() // tiny frame; stops round-over-round lineage growth
    }
    // the per-round localCheckpoint materialized the final weights, so
    // they no longer reference x's lineage — safe to release here
    x.unpersist(blocking = false)
    w
  }

  /** Score documents under trained [[logisticWeights]]: the 4-dp margin
    * z = Σ w_b·x_b and the sign decision. `buckets` must match
    * training. Returns (doc_id, score, predicted). */
  def logisticScores(docs: org.apache.spark.sql.DataFrame,
      id: Column, text: Column, weights: org.apache.spark.sql.DataFrame,
      buckets: Int = 32): org.apache.spark.sql.DataFrame =
    hashedFeatures(docs, id, text, buckets)
      .join(broadcast(weights.select(col("b"), col("w"))), "b")
      .groupBy("doc_id").agg(r4(dsum(col("w") * col("cnt"))).as("score"))
      .select(col("doc_id"), col("score"), (col("score") > 0).as("predicted"))

  /** C4-style line keep rule (Raffel et al. 2020 §2.2 heuristics, the
    * subset that needs no external model): a line survives iff it ends
    * in terminal punctuation, has at least `minWords` words, and hits
    * neither the boilerplate blocklist ("lorem ipsum") nor the
    * code-fragment brace heuristic. Pure string expressions — the
    * filter runs inside codegen over every line of the corpus. */
  def c4LineKeep(line: Column, minWords: Int = 4): Column =
    substring(line, -1, 1) === "." &&
      tokenCount(line) >= minWords &&
      !line.contains("lorem ipsum") &&
      !line.contains("{")

  /** Filter an array-of-lines column down to the C4 survivors. */
  def c4CleanLines(lines: Column, minWords: Int = 4): Column =
    filter(lines, l => c4LineKeep(l, minWords))

  /** The Gopher stop-word list (Rae et al. 2021, A1.1): a document must
    * contain at least two of these to pass the stop-word rule. */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality signals (Rae et al. 2021, A1.1) over
    * single-space text plus an array-of-lines column for the two
    * line-level rules. All fractions round-trip DECIMAL(9,6) so the
    * bytes are engine-independent, and everything is Catalyst
    * expressions — the whole rule set runs inside one codegen'd
    * projection per document. Returns a struct:
    * (n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
    * bullet_frac, ellipsis_frac). */
  def gopherSignals(text: Column, lines: Column): Column = {
    val w = split(text, " ")
    val nWords = size(w).cast("long")
    def ratio(a: Column, b: Column): Column =
      (a.cast("double") / when(b =!= 0, b).cast("double"))
        .cast("decimal(9,6)").cast("double")
    val sumLen = aggregate(w, lit(0L), (acc, x) => acc + length(x))
    // symbol-to-word ratio: '#' and '...' occurrences per word
    val symbolHits = occurrences(text, "#") + occurrences(text, "...")
    val alphaWords = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
    val stopHits = size(array_intersect(
      w, array(GopherStopWords.map(lit): _*))).cast("long")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("* "))).cast("long")
    val ellipsisLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    struct(
      nWords.as("n_words"),
      ratio(sumLen, nWords).as("mean_word_len"),
      ratio(symbolHits, nWords).as("symbol_ratio"),
      ratio(alphaWords, nWords).as("alpha_frac"),
      stopHits.as("stop_hits"),
      ratio(bulletLines, nLines).as("bullet_frac"),
      ratio(ellipsisLines, nLines).as("ellipsis_frac"))
  }

  /** The Gopher keep rule over [[gopherSignals]]: word count in
    * [minWords, maxWords], mean word length in [3, 10], symbol ratio
    * < 0.1, ≥ 80 % alphabetic words, ≥ 2 stop words, < 90 % bullet
    * lines, < 30 % ellipsis lines. Null-safe: a degenerate document
    * (no words / no lines → null ratios) is dropped, not null. */
  def gopherKeep(sig: Column, minWords: Int = 50, maxWords: Int = 100000): Column =
    coalesce(
      sig.getField("n_words").between(minWords, maxWords) &&
        sig.getField("mean_word_len").between(3.0, 10.0) &&
        sig.getField("symbol_ratio") < 0.1 &&
        sig.getField("alpha_frac") > 0.8 &&
        sig.getField("stop_hits") >= 2 &&
        sig.getField("bullet_frac") < 0.9 &&
        sig.getField("ellipsis_frac") < 0.3,
      lit(false))

  /** BPE-style pair-merge training, `rounds` merge rounds unrolled:
    * each round counts adjacent symbol pairs corpus-wide, picks the
    * most frequent pair (ties broken lexicographically), and applies
    * the greedy left-to-right non-overlapping merge to every document
    * — the exact induction loop of byte-pair-encoding tokenizer
    * training (Sennrich et al. 2016), run on word symbols here.
    *
    * Joiner contract (shared by the trainer, [[bpeEncode]] and
    * [[bpeCoverage]]): merged symbols join with "_", so source symbols
    * MUST NOT contain the joiner — a corpus with literal underscores in
    * words (code, identifiers) needs a pre-pass remapping them, or a
    * merged symbol becomes indistinguishable from a literal token and
    * coverage's word-count recovery corrupts silently.
    *
    * Pure integer/string arithmetic, so merges reproduce bit-for-bit
    * in any engine. Per round: one explode + pair-count aggregate, a
    * 1-row argmax via min(struct(-cnt, a, b)) (no global sort), a
    * broadcast of that single winner row, and the merge applied as an
    * `aggregate` fold inside codegen. Nothing shuffles except the pair
    * counts; document arrays never leave their partitions.
    *
    * Lineage: each round's corpus is derived from the previous round's,
    * so an unbounded unrolling would recompute every earlier merge on
    * every later round's pair count. Beyond `checkpointAfter` rounds the
    * trainer therefore ends each round in a localCheckpoint
    * materialization barrier — same contract as the IVF k-means trainer
    * (Similarity.kmeansCentroids) — making per-round cost flat in the
    * round number. Short trainings (the common case) keep the pure
    * lazy plan: a checkpoint there would only add materialization cost.
    *
    * Returns one row per round:
    * (round, sym_a, sym_b, pair_count, n_symbols_after). */
  // ——— BPE string encoding (round-17, guide §1.2 "per-task work") ———
  // The greedy left-to-right non-overlapping merge was an `aggregate`
  // fold over the symbol array whose accumulator is rebuilt by
  // array-concat at every element — O(k²) element copies per document
  // of k symbols, PER round (training) and PER rule (encoding). The
  // merge is instead applied as ONE linear `replace` over a framed
  // string encoding of the symbol stream:
  //
  //   enc(syms) = " x<s1>  x<s2>  …  x<sk> "
  //
  // every symbol slot is prefixed with a literal 'x' (so the EMPTY
  // symbol — a doc with consecutive spaces — still occupies a slot and
  // survives the round-trip) and separated by TWO spaces with single-
  // space edges. A rule (a, b) is the literal pattern " x{a}  x{b} " →
  // replacement " x{a}_{b} ": the pattern's single framing spaces can
  // only align at slot boundaries (symbols contain no spaces — they
  // come from split on ' '), and because `replace` substitutes
  // non-overlapping occurrences scanning left to right and resumes
  // AFTER each replacement, its semantics are exactly the greedy fold's
  // (a merged symbol never re-merges with the next element in the same
  // pass; consecutive disjoint pairs all merge — each match consumes
  // one space of the following double gap and the replacement restores
  // it). Decode = split on the double gap + strip the 'x'. Equivalence
  // to the old fold is pinned by RetrievalSpec (greedy-run, rank-order,
  // round-2-counts cases) and a new consecutive-spaces case.
  private def bpeStr(text: Column): Column =
    concat(lit(" "),
      concat_ws("  ", transform(split(text, " "), s => concat(lit("x"), s))),
      lit(" "))
  private def bpeSyms(s: Column): Column =
    transform(split(trim(s), "  "), t => t.substr(lit(2), length(t)))
  private def bpePat(a: Column, b: Column): Column =
    concat(lit(" x"), a, lit("  x"), b, lit(" "))
  private def bpeRep(a: Column, b: Column): Column =
    concat(lit(" x"), a, lit("_"), b, lit(" "))

  def bpeMergeRounds(df: org.apache.spark.sql.DataFrame, text: Column,
      rounds: Int, checkpointAfter: Int = 4): org.apache.spark.sql.DataFrame = {
    val emptyPairs = array().cast("array<struct<a:string,b:string>>")
    def pairCounts(sdf: org.apache.spark.sql.DataFrame) = sdf
      .select(bpeSyms(col("s")).as("syms"))
      .select(explode(when(size(col("syms")) >= 2,
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b"))))
        .otherwise(emptyPairs)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    def winner(pairs: org.apache.spark.sql.DataFrame) = pairs
      .agg(min(struct((-col("cnt")).as("nc"), col("a"), col("b"))).as("w"))
      .select((-col("w.nc")).as("pair_count"), col("w.a").as("sym_a"),
        col("w.b").as("sym_b"))
    def applyMerge(sdf: org.apache.spark.sql.DataFrame,
        win: org.apache.spark.sql.DataFrame) = sdf
      .crossJoin(broadcast(win))
      .select(replace(col("s"), bpePat(col("sym_a"), col("sym_b")),
        bpeRep(col("sym_a"), col("sym_b"))).as("s"))
    var cur = df.select(bpeStr(text).as("s"))
    val rows = (1 to rounds).map { r =>
      val win = winner(pairCounts(cur))
      cur = applyMerge(cur, win)
      if (rounds > checkpointAfter) cur = cur.localCheckpoint()
      val nAfter = cur
        .agg(sum(size(bpeSyms(col("s")))).cast("long").as("n_symbols_after"))
      win.withColumn("round", lit(r.toLong)).crossJoin(nAfter)
    }
    rows.reduce(_.unionByName(_))
      .select(col("round"), col("sym_a"), col("sym_b"), col("pair_count"),
        col("n_symbols_after"))
  }

  /** BPE *encoding*: apply a trained merge table to tokenize documents —
    * the operator that closes the pretraining seam between merge
    * training (`bpeMergeRounds`) and sequence packing
    * (`Packing.packManifest`): train a tokenizer on one split, encode
    * the whole corpus, pack real token counts.
    *
    * `merges` is the trainer's output schema (round, sym_a, sym_b …):
    * rules MUST apply in training order (BPE rank order — rule r+1 was
    * induced on a corpus that had rule r applied), and each rule applies
    * as the same greedy left-to-right non-overlapping adjacent merge
    * the trainer used, so encoding the training split reproduces the
    * trainer's final corpus exactly.
    *
    * Scale shape: the merge table is rank-many rows (a tokenizer is
    * ~10^4–10^5 rules) — aggregated to ONE array row and broadcast; the
    * encode itself is a nested `aggregate` fold (outer over rules,
    * inner over the document's symbols) that runs entirely inside the
    * document's partition. No shuffle, no UDF, no driver collect: the
    * whole encode is one narrow projection over the corpus.
    *
    * Returns (doc_id, n_tokens, tokens_md5): the post-merge token
    * count and an md5 digest of the space-joined token stream (the
    * engine-independent witness that two encoders produced the same
    * tokens). */
  def bpeEncode(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, merges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bpeEncodeTokens(docs, id, text, merges)
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("toks"))).as("tokens_md5"))

  /** The encode fold itself: (doc_id, toks array<string>) — tokens in
    * document order after all merges. Internal currency for
    * [[bpeEncode]] and [[bpeCoverage]]. */
  def bpeEncodeTokens(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, merges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // one row: rules ordered by training round
    val rules = merges
      .agg(array_sort(collect_list(struct(col("round"), col("sym_a"), col("sym_b"))))
        .as("rules"))
    // outer fold over the rules, each rule ONE linear string replace
    // (see the bpeStr encoding note above) — O(rules × doc length)
    // instead of the old nested array fold's O(rules × doc length²)
    docs.select(id.as("doc_id"), bpeStr(text).as("s"))
      .crossJoin(broadcast(rules))
      .select(col("doc_id"),
        bpeSyms(aggregate(col("rules"), col("s"), (acc, rule) =>
          replace(acc, bpePat(rule.getField("sym_a"), rule.getField("sym_b")),
            bpeRep(rule.getField("sym_a"), rule.getField("sym_b")))))
          .as("toks"))
  }

  /** Tokenizer-QA coverage report per document: word count, post-merge
    * token count, how many tokens are MERGED symbols (the trained
    * rules' footprint — merged symbols carry the "_" joiner, which is
    * part of the merge spec), and the compression ratio
    * tokens/words pinned to DECIMAL(9,6) for engine-independent bytes.
    * The merge footprint is how a tokenizer team detects domain drift:
    * a corpus slice where merges stop firing (compression → 1) is
    * out-of-distribution for the trained vocab. Same narrow
    * broadcast-fold shape as the encoder. */
  def bpeCoverage(docs: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, merges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bpeEncodeTokens(docs, id, text, merges)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(filter(col("toks"), s => s.contains("_"))).cast("long")
          .as("n_merged"),
        // a merged token of m source words carries m-1 joiners, so
        // words = tokens + Σ joiners — recovered from the token stream
        // alone (assumes source words are joiner-free, which the merge
        // spec shares; the oracle computes n_words from the ORIGINAL
        // text, so the hash match proves this recovery identity)
        aggregate(col("toks"), lit(0L), (acc, s) =>
          acc + (length(s) - length(replace(s, lit("_"), lit("")))))
          .as("joiners"))
      .withColumn("n_words", col("n_tokens") + col("joiners"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"), col("n_merged"),
        (col("n_tokens").cast("double") / col("n_words").cast("double"))
          .cast("decimal(9,6)").cast("double").as("compression"))
}
