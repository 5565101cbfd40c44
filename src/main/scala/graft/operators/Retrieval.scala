package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval and data-selection operators for training-data
  * pipelines: BM25 lexical search (the retrieval side of
  * decontamination / hard-negative mining) and DSIR-style importance
  * weighting (select raw-corpus documents that look like a target
  * distribution — Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling").
  *
  * Both are pure equi-join/aggregate plans: the inverted-index join is
  * keyed on the term, importance weighting on the hashed feature
  * bucket — no doc×doc or doc×query nested loop anywhere, so both
  * survive a 100 TB corpus (posting lists and bucket tables shuffle;
  * nothing materializes quadratically).
  *
  * All floating-point outputs are rounded through DECIMAL(12,4) so an
  * external engine recomputing the same arithmetic hash-matches
  * (sum-of-ln / idf·tf sums carry ~1e-13 ulp noise, orders below the
  * rounding grain).
  */
object Retrieval {

  /** Tokenize `text` into word n-gram terms (words joined with '_').
    * With a tiny base vocabulary, n-grams restore the Zipfian term
    * discrimination real corpora have; with a real corpus, n=1 is
    * plain keyword search. */
  def ngramTerms(text: Column, n: Int): Column = {
    val w = split(text, " ")
    if (n == 1) w
    // guard: Spark's sequence(1, stop) runs DESCENDING for stop < 1
    // (unlike generate_series), so sub-n-word docs need the empty case
    else when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws("_", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** BM25 top-k retrieval: for each query, the `k` best-scoring corpus
    * documents under Lucene-flavoured BM25
    * (idf = ln(1 + (N - df + .5)/(df + .5)), tf-saturation k1, length
    * normalization b). Terms with df > maxDfFrac·N are pruned before
    * the postings join — the stop-term cap that bounds the hottest
    * posting list at scale (a df-capped inverted index is how web-scale
    * engines keep the join skew-free).
    *
    * Plan shape: one explode → (doc,term) partial-aggregated tf carrying
    * doc length in the same pass (no separate dl join), a term-keyed df
    * aggregate, the postings equi-join against the query's distinct
    * terms, a (qid,doc) score aggregate, and one window for the per-query
    * top-k. Corpus stats (N, avgdl) ride a broadcast 1-row frame.
    *
    * Returns (qid, doc_id, n_terms_hit, score, rank), rank 1..k ordered
    * by rounded score desc then doc_id — ties broken deterministically
    * in the rounded domain so ranking is engine-portable.
    */
  def bm25TopK(
      corpus: DataFrame, docId: Column, docText: Column,
      queries: DataFrame, qid: Column, qText: Column,
      n: Int, k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFrac: Double = 0.5): DataFrame = {
    val terms = corpus
      .select(docId.as("doc_id"), size(split(docText, " ")).cast("long").as("dl"),
        explode(ngramTerms(docText, n)).as("term"))
    val tf = terms.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // N / avgdl over ALL corpus docs (termless docs included) — one
    // narrow scan collapsing to a single broadcast row
    val stats = corpus
      .select(size(split(docText, " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl").cast("double")).as("avgdl"))
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val qTerms = queries
      .select(qid.as("qid"), explode(ngramTerms(qText, n)).as("term"))
      .distinct()
    val postings = tf
      .join(dfr, "term")
      .crossJoin(broadcast(stats))
      .where(col("df") <= col("n_docs").cast("double") * maxDfFrac)
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfPart = (col("tf") * (lit(k1) + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    val scored = qTerms.join(postings, "term")
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum(idf * tfPart).as("s"))
      .withColumn("score", col("s").cast("decimal(12,4)").cast("double"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("n_terms_hit"), col("score"),
        col("rank").cast("long").as("rank"))
  }

  /** Distinct character trigrams per record — the pg_trgm-style index
    * unit for fuzzy NAME search (the reference ecosystem serves
    * sanctions-entity name lookup through a fuzzy full-text index;
    * trigram overlap is the standard engine-side primitive for it).
    * Sub-3-char names fall back to the whole string; empties drop. */
  def trigramSets(df: DataFrame, id: Column, name: Column): DataFrame = {
    val tgs = when(length(name) >= 3,
      array_distinct(transform(sequence(lit(1), length(name) - 2),
        i => name.substr(i, lit(3)))))
      .otherwise(when(length(name) > 0, array(name))
        .otherwise(array().cast("array<string>")))
    df.select(id.as("id"), tgs.as("tg"))
  }

  /** The trigram inverted index as a MAINTAINED artifact: exploded
    * (id, t3) posting rows. Appending new records is pure posting
    * union (document frequencies are additive, sizes are per-id —
    * nothing existing is touched), so index maintenance costs
    * O(delta) like the bloom (q206) and ANN (q193) indexes; q229
    * gates merge ≡ rebuild. */
  def trigramIndex(targets: DataFrame, id: Column, name: Column): DataFrame =
    trigramSets(targets, id, name)
      .select(col("id"), explode(col("tg")).as("t3"))

  /** Fuzzy search served FROM a postings index (no access to the
    * original name column): candidates from the df-capped posting
    * join, exact Jaccard from posting-match counts and per-side set
    * sizes — row-identical to [[trigramTopK]] (spec-locked). */
  def trigramTopKFromPostings(
      postings: DataFrame,
      queries: DataFrame, qid: Column, qName: Column,
      k: Int, maxDf: Long = 256L): DataFrame = {
    val post = postings.toDF("id", "t3")
    val qt = trigramSets(queries, qid, qName).toDF("qid", "qtg")
    val qpost = qt.select(col("qid"), explode(col("qtg")).as("t3"))
    val keep = post.groupBy("t3").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .select(col("t3"))
    val cand = qpost.join(keep, "t3").join(post, "t3")
      .select(col("qid"), col("id").as("cid")).distinct()
    // Rebuild each CANDIDATE's trigram set from its postings (one
    // aggregate over candidate ids only — semi-join pruned), then
    // score by array_intersect exactly like the array path. Scoring
    // per-posting instead (cand ⋈ qpost ⋈ post) measured exponent
    // 0.94 across the decade — candidates × query-trigrams posting
    // matches; this form is ∝ candidates, matching trigramTopK.
    val candSets = post
      .join(cand.select(col("cid").as("id")).distinct(), Seq("id"), "left_semi")
      .groupBy("id").agg(collect_list(col("t3")).as("tg"))
      .withColumnRenamed("id", "cid")
    val scored = cand.join(candSets, "cid").join(qt, "qid")
      .withColumn("inter",
        size(array_intersect(col("qtg"), col("tg"))).cast("long"))
      .withColumn("score", col("inter").cast("double") /
        (size(col("qtg")) + size(col("tg")) - col("inter")).cast("double"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("cid").as("target_id"), col("inter"),
        col("score"), col("rank").cast("long").as("rank"))
  }

  /** Candidate (qid, id) pairs from the df-capped trigram postings
    * equi-join — the generation stage shared by the Jaccard ranking
    * ([[trigramTopK]]) and any downstream comparator (e.g. the
    * codegen'd Jaro–Winkler in q213). */
  def trigramCandidates(
      targets: DataFrame, targetId: Column, targetName: Column,
      queries: DataFrame, qid: Column, qName: Column,
      maxDf: Long = 256L): DataFrame = {
    val tt = trigramSets(targets, targetId, targetName)
    val qt = trigramSets(queries, qid, qName).toDF("qid", "qtg")
    val tpost = tt.select(col("id"), explode(col("tg")).as("t3"))
    val keep = tpost.groupBy("t3").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
      .select(col("t3"))
    val qpost = qt.select(col("qid"), explode(col("qtg")).as("t3"))
    qpost.join(keep, "t3").join(tpost, "t3")
      .select(col("qid"), col("id")).distinct()
  }

  /** Fuzzy name search over a trigram inverted index: candidates come
    * from a df-capped trigram postings equi-join (trigrams with posting
    * lists longer than the ABSOLUTE `maxDf` are stop-trigrams — they
    * never seed a candidate). The cap being absolute, not fractional,
    * is the scale contract: per-query candidates are bounded by
    * |query trigrams|·maxDf AT ANY CORPUS SIZE, so pair volume is
    * linear in queries by construction — a fractional cap grows with
    * N and measured exponent 1.28 across a 25× decade on replicated
    * name cores (STRESS round-11);
    * each candidate is then scored by EXACT trigram-set Jaccard via
    * array_intersect on the two per-record sets (no per-trigram pair
    * shuffle — the Blocking.candidates shape), and a per-query window
    * keeps the top `k` (score desc, id asc — a ratio of small integers
    * is an exact double, so the ordering is engine-portable without a
    * rounding barrier).
    *
    * Returns (qid, target_id, inter, score, rank). */
  def trigramTopK(
      targets: DataFrame, targetId: Column, targetName: Column,
      queries: DataFrame, qid: Column, qName: Column,
      k: Int, maxDf: Long = 256L): DataFrame = {
    val tt = trigramSets(targets, targetId, targetName)
    val qt = trigramSets(queries, qid, qName).toDF("qid", "qtg")
    val cand = trigramCandidates(targets, targetId, targetName,
      queries, qid, qName, maxDf)
    val scored = cand.join(qt, "qid").join(tt, "id")
      .withColumn("inter",
        size(array_intersect(col("qtg"), col("tg"))).cast("long"))
      .withColumn("score", col("inter").cast("double") /
        (size(col("qtg")) + size(col("tg")) - col("inter")).cast("double"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("id").as("target_id"), col("inter"),
        col("score"), col("rank").cast("long").as("rank"))
  }

  /** DSIR-style importance weights: per-document log importance under
    * hashed n-gram features — Σ_tokens ln(p_target(bucket) /
    * p_raw(bucket)) with add-one smoothing over `buckets` feature
    * buckets. `isTarget` marks the rows defining the target
    * distribution; every row is scored (target rows too — their weights
    * report how concentrated the target distribution is).
    *
    * The feature space is fixed-width (`buckets` rows), so both
    * distribution tables collapse to broadcast-size regardless of corpus
    * size, and scoring is one explode + bucket aggregate + broadcast
    * join + doc aggregate: the exact shape importance-resampling needs
    * at 100 TB (no vocabulary blow-up — hashing bounds the model).
    *
    * Returns (doc_id, is_target, n_feats, weight) with weight rounded
    * through DECIMAL(12,4). */
  def dsirWeights(
      df: DataFrame, docId: Column, text: Column, isTarget: Column,
      n: Int, buckets: Int): DataFrame = {
    val feats = df
      .select(docId.as("doc_id"), isTarget.as("is_target"),
        explode(ngramTerms(text, n)).as("term"))
      .withColumn("bucket", pmod(Dedup.hash60(col("term")), lit(buckets.toLong)))
      .groupBy("doc_id", "is_target", "bucket")
      .agg(count(lit(1)).as("c"))
    val bucketStats = feats.groupBy("bucket").agg(
      sum(when(col("is_target"), col("c")).otherwise(lit(0L))).as("ct"),
      sum(col("c")).as("cr"))
    val totals = bucketStats.agg(
      sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val lnRatio =
      (log(col("ct") + lit(1.0)) - log(col("tt") + lit(buckets.toDouble))) -
        (log(col("cr") + lit(1.0)) - log(col("tr") + lit(buckets.toDouble)))
    feats
      .join(broadcast(bucketStats), "bucket")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id", "is_target")
      .agg(sum(col("c")).as("n_feats"), sum(col("c") * lnRatio).as("w0"))
      .select(col("doc_id"), col("is_target"),
        col("n_feats"),
        col("w0").cast("decimal(12,4)").cast("double").as("weight"))
  }
}
