package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, and SimHash near-duplicate detection.
  *
  * Design for 100 TB: every variant is shuffle-bounded by (a) a
  * document-frequency cap on shingles (drops ubiquitous shingles before
  * the pair join, the classic blocking trick — without it one common
  * shingle joins every document against every other) and (b) candidate
  * generation through equi-joins on bucket keys (LSH bands / shingles),
  * never a cross join.
  */
object Dedup {

  /** Portable 60-bit string hash: fold of the first 15 hex digits of md5.
    * Chosen over xxhash64/murmur because it is bit-for-bit reproducible in
    * any engine that has md5 (DuckDB oracle parity). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** The j-th salted hash position of `key` in [0, m) — the shared
    * bucket/slot arithmetic of the bloom filter and count-min sketch
    * (one definition so both families' oracles stay bit-aligned with
    * one SQL replay: hash60('<salt><j>|' || key) % m). */
  private[operators] def saltedPos(key: Column, j: Int, m: Int,
      salt: String): Column =
    pmod(hash60(concat(lit(s"$salt$j|"), key.cast("string"))), lit(m.toLong))

  /** Exact dedup: group by content hash, keep the smallest id.
    * Returns (content_hash, keeper_id, dup_count). */
  def exact(df: DataFrame, id: Column, content: Column): DataFrame =
    df.select(md5(content).as("content_hash"), id.as("_id"))
      .groupBy("content_hash")
      .agg(min(col("_id")).as("keeper_id"), count(lit(1)).as("dup_count"))

  /** Incremental (cross-snapshot) exact dedup: deduplicate a fresh
    * crawl drop against an already-curated base corpus — the recurring
    * production shape where each new CommonCrawl dump dedupes against
    * everything previously kept, without ever re-deduping the base.
    *
    * Per fresh document the manifest records:
    *  - `dup_of_base` — its content fingerprint exists in the base
    *    (keeper = the smallest base id holding that fingerprint);
    *  - `dup_in_new`  — novel vs the base but a smaller fresh id shares
    *    the fingerprint (keeper = that id);
    *  - `kept`        — first occurrence anywhere (keeper = itself).
    *
    * Plan shape: one fingerprint aggregate over each side plus two
    * equi-joins on the hash — the base side reduces to ONE row per
    * distinct fingerprint before the join, so the cost is bounded by
    * distinct content, not corpus size, and nothing is broadcast
    * (both sides shuffle on the hash key).
    *
    * Returns (id, content_hash, status, keeper_id). */
  def incrementalExact(
      base: DataFrame, baseId: Column, baseContent: Column,
      fresh: DataFrame, freshId: Column, freshContent: Column): DataFrame = {
    val baseKeepers = base
      .select(md5(baseContent).as("content_hash"), baseId.as("bid"))
      .groupBy("content_hash").agg(min(col("bid")).as("base_keeper"))
    val f = fresh.select(freshId.as("id"), md5(freshContent).as("content_hash"))
    val freshKeepers = f.groupBy("content_hash")
      .agg(min(col("id")).as("fresh_keeper"))
    f.join(baseKeepers, Seq("content_hash"), "left")
      .join(freshKeepers, Seq("content_hash"))
      .select(col("id"), col("content_hash"),
        when(col("base_keeper").isNotNull, lit("dup_of_base"))
          .when(col("fresh_keeper") =!= col("id"), lit("dup_in_new"))
          .otherwise(lit("kept")).as("status"),
        coalesce(col("base_keeper"),
          when(col("fresh_keeper") =!= col("id"), col("fresh_keeper"))
            .otherwise(col("id"))).as("keeper_id"))
  }

  /** Paragraph-level exact dedup across the whole corpus (the C4 /
    * RefinedWeb cleaning step): documents split into fixed-size word
    * chunks, every chunk kept only at its FIRST occurrence corpus-wide
    * (smallest (doc, position)), and documents reassembled from their
    * surviving chunks in order. All joins are equi-joins on the chunk
    * hash — first-occurrence selection is a groupBy(min(struct)), never
    * a window over the full corpus — so the plan survives 100TB.
    * Returns (doc_id, n_chunks, n_kept, deduped_text). */
  def paragraphDedup(
      df: DataFrame, id: Column, text: Column, chunkWords: Int = 3): DataFrame = {
    val words = split(text, " ")
    val chunks = transform(
      sequence(lit(0), ceil(size(words).cast("double") / chunkWords).cast("int") - 1),
      i => concat_ws(" ", slice(words, i * chunkWords + 1, lit(chunkWords))))
    val exploded = df.select(id.as("doc_id"), posexplode(chunks).as(Seq("pos", "chunk")))
    val keepers = exploded.groupBy(col("chunk"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("keeper"))
    exploded
      .join(keepers, "chunk")
      .withColumn("kept",
        col("keeper.doc_id") === col("doc_id") && col("keeper.pos") === col("pos"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("kept"), 1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("pos"), col("chunk"))))),
          x => x.getField("chunk")), " ").as("deduped_text"))
  }

  /** Distinct word n-gram shingles per document: (doc id, shingle),
    * with shingles whose global document frequency exceeds `maxDf`
    * dropped (blocking cap). `text` must be single-space tokenized. */
  /** Per-document word n-grams, one row per occurrence-deduped shingle.
    * The token array is materialized ONCE per row in a prior projection:
    * inlining `split` into the transform lambda would re-split the text
    * for every sequence element (HOF lambdas get no common-subexpression
    * elimination and no codegen — measured 3× slower). */
  private def rawShingles(df: DataFrame, id: Column, text: Column, n: Int): DataFrame =
    df.select(id.as("doc"), split(text, " ").as("ws"))
      .select(col("doc"),
        explode(transform(
          sequence(lit(0), greatest(size(col("ws")) - n, lit(0))),
          i => when(size(col("ws")) >= n,
            concat_ws(" ", slice(col("ws"), i + lit(1), lit(n)))))).as("shingle"))
      .filter(col("shingle").isNotNull)

  def shingles(df: DataFrame, id: Column, text: Column, n: Int, maxDf: Long): DataFrame = {
    val sh = rawShingles(df, id, text, n).distinct()
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    sh.join(freq, "shingle").select(col("doc"), col("shingle"))
  }

  /** N-gram Jaccard near-dup pairs: exact Jaccard over the (df-capped)
    * shingle sets of each pair that shares at least one shingle.
    * Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    *
    * ONE aggregation on the shingle key does everything the candidate
    * stage needs: `collect_set(doc)` dedups (doc, shingle) implicitly,
    * its size IS the document frequency (df cap = a size filter — no
    * separate frequency join), and the bounded in-bucket pair list
    * (≤ maxDf²/2 per shingle) is generated from the collected array.
    * Intersection counts and per-doc set sizes are then two small
    * aggregations over the SAME exchange (Catalyst plans a
    * ReusedExchange — the shingle shuffle happens once), so the whole
    * operator is shingle-shuffle → pair/size aggregations → one join,
    * with no cache and no per-document array riding through the pair
    * join. */
  /** EXACT Jaccard similarity join with the prefix-filtering guarantee
    * (PPJoin family, Chaudhuri et al. / Xiao et al.): two sets with
    * Jaccard >= t MUST share a token among each side's first
    * `|s| - ceil(t·|s|) + 1` tokens in any GLOBAL canonical order — so
    * candidates come from an equi-join on prefix tokens only, and
    * unlike the df-capped [[ngramJaccardPairs]] no qualifying pair can
    * ever be missed. The canonical order is rarest-first (df asc, token
    * asc), which also makes prefixes the most selective tokens. The
    * threshold test is INTEGER (`den·inter >= num·union`), so no
    * floating point touches the decision.
    *
    * Scale shape: one df aggregate, one per-doc rank window, a
    * prefix-token equi-join (fan-out bounded by prefix df, which
    * rarest-first minimizes), and two id-joins for exact verification —
    * all equi-joins, never doc×doc.
    *
    * @param toks (doc: long, tok: string) DISTINCT token sets
    * @param num/den threshold t = num/den (e.g. 3/5 for 0.6)
    * @return (a, b, inter, union_sz) with a < b, Jaccard >= t exactly */
  def prefixJaccardJoin(toks: DataFrame, num: Int, den: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val sizes = toks.groupBy("doc").agg(count(lit(1)).as("sz"))
    val ranked = toks.join(dfreq, "tok")
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc").orderBy(col("df"), col("tok"))))
      .join(sizes, "doc")
      // prefix length = sz - ceil(t*sz) + 1, ceil via integer arithmetic
      .withColumn("plen", col("sz") - expr(s"($num * sz + $den - 1) div $den") + 1)
    val prefix = ranked.where(col("rk") <= col("plen")).select("doc", "tok")
    val cands = prefix.select(col("doc").as("a"), col("tok"))
      .join(prefix.select(col("doc").as("b"), col("tok")), "tok")
      .where(col("a") < col("b")).select("a", "b").distinct()
    val inter = cands
      .join(toks.select(col("doc").as("a"), col("tok")), "a")
      .join(toks.select(col("doc").as("b"), col("tok")), Seq("b", "tok"), "left_semi")
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("doc").as("b"), col("sz").as("szb")), "b")
      .withColumn("union_sz", col("sza") + col("szb") - col("inter"))
      .where(col("inter") * den >= col("union_sz") * num)
      .select("a", "b", "inter", "union_sz")
  }

  def ngramJaccardPairs(
      df: DataFrame, id: Column, text: Column,
      n: Int, maxDf: Long, threshold: Double): DataFrame = {
    val byShingle = rawShingles(df, id, text, n).groupBy(col("shingle"))
      .agg(array_sort(collect_set(col("doc"))).as("docs"))
      .filter(size(col("docs")) <= lit(maxDf.toInt))
    val inter = byShingle
      .select(explode(flatten(transform(col("docs"), (a, i) =>
        transform(slice(col("docs"), i + lit(2), size(col("docs"))),
          b => struct(a.as("a"), b.as("b")))))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("inter"))
    val sizes = byShingle
      .select(explode(col("docs")).as("doc"))
      .groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    inter
      .join(sizes.toDF("a", "sza"), "a")
      .join(sizes.toDF("b", "szb"), "b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("jaccard"))
  }

  // Permutations live in a 31-bit domain so a*h+b never overflows a long
  // (a, h < 2^31 ⇒ a*h < 2^62) — required under ANSI arithmetic.
  private val MersennePrime31 = (1L << 31) - 1

  /** Mersenne-prime modulus of the permutation domain — public so the
    * DuckDB oracle SQL can be generated with the same constants. */
  val PermModulus: Long = MersennePrime31

  /** Deterministic MinHash permutation parameters (a, b) for hash i.
    * Public for oracle-SQL generation. */
  def perm(i: Int): (Long, Long) = {
    // fixed LCG-derived multipliers; any fixed coprime-ish set works
    val a = ((2862933555777941757L * (i + 1) + 3037000493L) & Long.MaxValue) % (MersennePrime31 - 1) + 1
    val b = ((4294967291L * (i + 1) + 1442695040888963407L) & Long.MaxValue) % MersennePrime31
    (a, b)
  }

  /** MinHash signatures: per document, `numHashes` minima of permuted
    * shingle hashes. Returns (doc, sig array<long>). */
  def minhashSignatures(
      df: DataFrame, id: Column, text: Column,
      n: Int, maxDf: Long, numHashes: Int): DataFrame = {
    val sh = shingles(df, id, text, n, maxDf)
      .withColumn("h", pmod(hash60(col("shingle")), lit(MersennePrime31)))
    val mins = (0 until numHashes).map { i =>
      val (a, b) = perm(i)
      min(pmod(col("h") * a + b, lit(MersennePrime31))).as(s"m$i")
    }
    sh.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
      .select(col("doc"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Explode a signature frame (doc, sig) into one row per LSH band:
    * (doc, sig, band, bucket) with bucket = md5 of the band's signature
    * slice — the equi-join key shared by the within-corpus and
    * cross-corpus candidate generators. */
  private def bandedSignatures(sig: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sig.select(
      col("doc"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => md5(concat_ws("_", transform(
          slice(col("sig"), b * lit(rowsPerBand) + lit(1), lit(rowsPerBand)),
          x => x.cast("string")))))))
      .select(col("doc"), col("sig"), col("pos").as("band"), col("col").as("bucket"))

  /** Fraction of matching signature positions — the MinHash Jaccard
    * estimate. Exact k/numHashes arithmetic (engine-portable). */
  private def estJaccard(a: Column, b: Column, numHashes: Int): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), v => v))
      .cast("double") / lit(numHashes).cast("double")

  /** MinHash + LSH candidate pairs: band the signature, bucket-join on
    * (band, bucket-hash), return distinct candidate pairs with the
    * estimated Jaccard (fraction of matching signature positions).
    * `bands * rowsPerBand` must equal the signature length. */
  def minhashLshPairs(
      df: DataFrame, id: Column, text: Column,
      n: Int = 3, maxDf: Long = 100, bands: Int = 8, rowsPerBand: Int = 4,
      minEstJaccard: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Query-scoped cache, not a bare .cache(): both sides of the
    // banded self-join read it (one compute, one fused action), but a
    // bare .cache() here was never released — the operator returns a
    // lazy frame, so it CANNOT unpersist — and every nearDedup-family
    // query leaked one corpus-sized signature frame into the block
    // manager for the life of the session (guide §5: unpersist when
    // done). QueryScoped registers the handle for the harnesses'
    // between-query sweep; an eager localCheckpoint was tried first
    // and cost a separate materialization job per call (q42 0.45 →
    // 2.76 s) for the same leak fix.
    val sig = QueryScoped.cached(
      minhashSignatures(df, id, text, n, maxDf, numHashes))
    val banded = bandedSignatures(sig, bands, rowsPerBand)
    val pairs = banded.select(col("doc").as("a"), col("sig").as("siga"), col("band"), col("bucket"))
      .join(banded.select(col("doc").as("b"), col("sig").as("sigb"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("siga"), col("sigb"))
      .distinct()
    pairs
      .withColumn("est_jaccard", estJaccard(col("siga"), col("sigb"), numHashes))
      .filter(col("est_jaccard") >= minEstJaccard)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("est_jaccard"))
  }

  /** Incremental NEAR-dedup: fuzzy-dedupe a fresh crawl drop against a
    * curated base corpus (the [[incrementalExact]] shape at MinHash
    * granularity — each new dump is near-deduped against everything
    * previously kept without re-deduping the base). Signatures are
    * computed per side with that side's own df cap; candidates come
    * from the cross-corpus banded equi-join (fresh × base bucket
    * collisions only — never fresh × base all-pairs); a fresh document
    * is `near_dup_of_base` when its best candidate reaches
    * `minEstJaccard` (best = highest estimate, ties → smallest base
    * id), else `kept`.
    *
    * Returns one row per fresh doc:
    * (id, status, matched_base_id, est_jaccard) — match columns null
    * for kept docs. */
  def incrementalNearDup(
      base: DataFrame, baseId: Column, baseText: Column,
      fresh: DataFrame, freshId: Column, freshText: Column,
      n: Int = 3, maxDf: Long = 100, bands: Int = 8, rowsPerBand: Int = 4,
      minEstJaccard: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val bSig = minhashSignatures(base, baseId, baseText, n, maxDf, numHashes)
    val fSig = minhashSignatures(fresh, freshId, freshText, n, maxDf, numHashes)
    val bBand = bandedSignatures(bSig, bands, rowsPerBand)
      .select(col("doc").as("bid"), col("sig").as("bsig"), col("band"), col("bucket"))
    val fBand = bandedSignatures(fSig, bands, rowsPerBand)
      .select(col("doc").as("fid"), col("sig").as("fsig"), col("band"), col("bucket"))
    val best = fBand.join(bBand, Seq("band", "bucket"))
      .select(col("fid"), col("bid"), col("fsig"), col("bsig")).distinct()
      .withColumn("est", estJaccard(col("fsig"), col("bsig"), numHashes))
      .filter(col("est") >= minEstJaccard)
      .groupBy(col("fid"))
      .agg(min_by(struct(col("bid"), col("est")),
        struct(negate(col("est")), col("bid"))).as("m"))
      .select(col("fid"), col("m.bid").as("matched_base_id"),
        col("m.est").as("est_jaccard"))
    fresh.select(freshId.as("id")).distinct()
      .join(best, col("id") === col("fid"), "left")
      .select(col("id"),
        when(col("matched_base_id").isNotNull, lit("near_dup_of_base"))
          .otherwise(lit("kept")).as("status"),
        col("matched_base_id"), col("est_jaccard"))
  }

  /** The COMPOSED lexical near-dedup pipeline (the RedPajama/SlimPajama
    * fuzzy-dedup shape a training-data team ships): MinHash+LSH
    * candidate pairs → connected-components closure (an est-Jaccard
    * chain a~b~c is ONE duplication group) → keeper per cluster
    * (highest `weight`, ties → lowest id — same representative rule as
    * the semantic variant, Similarity.semanticDedup) → one manifest row
    * per document. The lexical twin of q116's embedding pipeline.
    *
    * 100 TB shape: candidates are the banded signature equi-join (never
    * doc×doc), the closure runs over bare id pairs
    * (ConnectedComponents' hash-signature-barrier loop), the keeper is
    * one max_by partial aggregate, and the manifest join is keyed on
    * the component id — no shuffle in the whole pipeline carries text
    * or signatures past the banding join.
    *
    * `weights` is (id, weight) — e.g. document length or a quality
    * score; members missing a weight rank lowest.
    * Returns (doc_id, component, kept_id, is_kept, n_members). */
  def nearDedupManifest(
      df: DataFrame, id: Column, text: Column, weights: DataFrame,
      n: Int = 3, maxDf: Long = 100, bands: Int = 8, rowsPerBand: Int = 4,
      minEstJaccard: Double = 0.5): DataFrame = {
    val pairs = minhashLshPairs(df, id, text, n, maxDf, bands, rowsPerBand,
      minEstJaccard)
    val comp = ConnectedComponents.run(
      df.select(id.as("id")),
      pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
    val rep = ConnectedComponents.representatives(comp, weights)
    comp.join(rep, "component")
      .select(col("id").as("doc_id"), col("component"), col("kept_id"),
        (col("id") === col("kept_id")).as("is_kept"), col("n_members"))
  }

  /** SimHash: 60-bit signature — bit j is set iff the sum over tokens of
    * ±1 (sign = token-hash bit j) is positive. Near-dups = pairs within
    * `maxHamming` bits; candidate generation by splitting the signature
    * into maxHamming+1 chunks and joining on any equal chunk (pigeonhole:
    * ≤ maxHamming differing bits spread over maxHamming+1 chunks leave at
    * least one chunk equal — so recall is exactly 100% by construction,
    * for ANY maxHamming, not just the default). */
  def simhashSignatures(df: DataFrame, id: Column, text: Column): DataFrame = {
    val tok = df.select(id.as("doc"), explode(split(text, " ")).as("t"))
      .withColumn("h", hash60(col("t")))
    val bitSums = (0 until 60).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1)) === 1, 1).otherwise(-1)).as(s"s$j")
    }
    tok.groupBy(col("doc")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc"),
        (0 until 60).map(j => when(col(s"s$j") > 0, 1L << j).otherwise(0L))
          .reduce((a: Column, b: Column) => a.bitwiseOR(b)).as("simhash"))
  }

  def simhashPairs(df: DataFrame, id: Column, text: Column, maxHamming: Int = 3): DataFrame = {
    // swept query-scoped cache, not an unreleasable .cache() — see
    // minhashLshPairs
    val sig = QueryScoped.cached(simhashSignatures(df, id, text))
    val bits = 60
    val numChunks = maxHamming + 1
    val chunkSize = (bits + numChunks - 1) / numChunks
    // ceil-sized chunks can leave trailing empty windows (lo >= bits) for
    // large maxHamming — drop them, then re-check that enough chunks
    // remain for the pigeonhole guarantee.
    val chunkLos = (0 until numChunks).map(_ * chunkSize).filter(_ < bits)
    require(chunkLos.size > maxHamming,
      s"simhash: cannot guarantee recall for maxHamming=$maxHamming with 60-bit signatures")
    val chunked = sig.select(col("doc"), col("simhash"),
      posexplode(array(chunkLos.map { lo =>
        val width = math.min(chunkSize, bits - lo)
        shiftright(col("simhash"), lo).bitwiseAND(lit((1L << width) - 1))
      }: _*)))
      .select(col("doc"), col("simhash"), col("pos").as("chunk"), col("col").as("ckey"))
    chunked.select(col("doc").as("a"), col("simhash").as("ha"), col("chunk"), col("ckey"))
      .join(chunked.select(col("doc").as("b"), col("simhash").as("hb"), col("chunk"), col("ckey")),
        Seq("chunk", "ckey"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("ha"), col("hb")).distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("hamming"))
  }

  /** Exact repeated-substring excision (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better": remove every span
    * whose n-gram occurs elsewhere, instead of dropping whole docs):
    * every word position opening an n-gram that appears >= minCount
    * times CORPUS-WIDE (other docs or the same doc) contributes the
    * interval [pos, pos+n-1]; per-doc overlapping intervals merge; the
    * merged spans are cut out and the remaining words reassembled.
    *
    * Scale shape: one explode to (doc, pos, ngram-hash), a hash-keyed
    * count aggregate, an equi-join back (the hot-hash side is tiny —
    * only repeated n-grams survive the HAVING), and doc-partitioned
    * windows for the classic running-max interval merge. Nothing is
    * quadratic and no window ever spans more than one document's
    * repeated positions.
    *
    * Returns (doc_id, n_words, n_spans, n_removed_words, kept_md5) —
    * the kept text is digested rather than returned (it can be near
    * the original size; callers wanting the text itself re-run the
    * final projection without the md5). */
  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    * the MOSS algorithm): per document, hash every word n-gram, then
    * keep only each sliding window's MINIMUM hash. Density is ~2/(w+1)
    * of the n-gram stream, yet any two documents sharing a verbatim
    * run of ≥ n+w−1 words are GUARANTEED to share an anchor (every
    * length-w window inside the shared run picks the same minimum on
    * both sides). This is the scale answer to cross-document exact
    * substring dedup: the all-n-grams join (the q41 shape) ships the
    * whole n-gram stream through the shuffle; winnowing ships a
    * guaranteed-recall sample of it.
    *
    * Documents with fewer than `w` n-grams emit nothing — they cannot
    * contain a ≥ n+w−1-word run (whole-short-doc duplicates are exact
    * dedup's job, q40). Returns (doc_id, a) distinct anchors. */
  def winnowAnchors(
      df: DataFrame, id: Column, text: Column,
      n: Int = 8, w: Int = 4): DataFrame = {
    val words = split(text, " ")
    val p = (size(words) - (n - 1)).cast("long")
    val ng = df.select(id.as("doc_id"), words.as("w"), p.as("p"))
      .where(col("p") >= w)
      .select(col("doc_id"), col("p"),
        explode(transform(sequence(lit(1), col("p")),
          i => struct(i.cast("long").as("pos"),
            hash60(concat_ws(" ", slice(col("w"), i, lit(n)))).as("h")))).as("g"))
      .select(col("doc_id"), col("p"), col("g.pos").as("pos"), col("g.h").as("h"))
    val wspec = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, w - 1)
    ng.withColumn("a", min(col("h")).over(wspec))
      .where(col("pos") <= col("p") - (w - 1)) // full windows only
      .select(col("doc_id"), col("a")).distinct()
  }

  /** Candidate pairs from shared winnowing anchors: a df-capped anchor
    * equi-join (an anchor hotter than `maxDf` is boilerplate — it
    * would fan out quadratically and is dropped, logged by the cap
    * being data-visible in the output counts), then one aggregate
    * counting shared anchors per pair. Never doc×doc.
    * Returns (x, y, shared_anchors) with x < y. */
  def winnowPairs(anchors: DataFrame, maxDf: Long = 64): DataFrame = {
    val an = anchors.toDF("doc_id", "a")
    val keep = an.groupBy("a").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf).select("a")
    val kept = an.join(keep, "a")
    kept.select(col("a"), col("doc_id").as("x"))
      .join(kept.select(col("a"), col("doc_id").as("y")), "a")
      .where(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("shared_anchors"))
  }

  def exciseRepeatedSpans(
      df: DataFrame, id: Column, text: Column, n: Int,
      minCount: Long = 2): DataFrame = {
    val words = df.select(id.as("_id"), split(text, " ").as("w"))
    val sh = words
      .select(col("_id"),
        explode(when(size(col("w")) >= n,
          transform(sequence(lit(1), size(col("w")) - (n - 1)),
            i => struct(i.cast("long").as("pos"),
              md5(concat_ws(" ", slice(col("w"), i, lit(n)))).as("h"))))
          .otherwise(array().cast("array<struct<pos:bigint,h:string>>"))).as("p"))
      .select(col("_id"), col("p.pos").as("pos"), col("p.h").as("h"))
    val hot = sh.groupBy("h").agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount).select("h")
    val dp = sh.join(hot, "h").select(col("_id"), col("pos"))
    val wPrev = Window.partitionBy("_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = dp
      .withColumn("e", col("pos") + (n - 1))
      .withColumn("brk",
        when(col("pos") > coalesce(max(col("e")).over(wPrev), lit(-1L)), 1L)
          .otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(wRun))
      .groupBy("_id", "grp")
      .agg(min(col("pos")).as("s"), max(col("e")).as("e"))
    val perDoc = spans.groupBy("_id").agg(
      count(lit(1)).as("n_spans"),
      sum(col("e") - col("s") + 1).as("n_removed"),
      sort_array(collect_list(struct(col("s"), col("e")))).as("sp"))
    val spArr = coalesce(col("sp"), array().cast("array<struct<s:bigint,e:bigint>>"))
    val kept = filter(col("w"), (_, i) =>
      !exists(spArr, b => i + 1 >= b.getField("s") && i + 1 <= b.getField("e")))
    words.join(perDoc, Seq("_id"), "left")
      .select(col("_id").as("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed_words"),
        md5(concat_ws(" ", kept)).as("kept_md5"))
  }
}
