package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-dataset matching (xref/enrichment) as a query: blocked candidate
  * generation, similarity scoring, and per-subject top-k pruning with
  * score-ratio and cutoff (zavod/zavod/integration/dedupe.py:42-90,
  * zavod/zavod/runner/local_enricher.py:33-121).
  *
  * The reference uses a DuckDB-backed inverted index on one node; here
  * the inverted index IS a DataFrame keyed by a blocking key, so
  * candidate generation is an equi-join that scales out.
  *
  * Blocking keys are token *bigrams over the SORTED distinct token set*,
  * not single tokens: over a vocabulary of V tokens the bigram key space
  * is ~V², so per-key document frequency — and with it the pair fan-out
  * of the join, which is quadratic in df — drops by ~V× versus
  * single-token blocking. A token key over a small vocabulary
  * degenerates toward an all-pairs join (every key shared by n/V
  * documents ⇒ Σ df² ≈ n²/V pairs); the bigram key keeps candidate
  * generation near-linear. A df cap bounds the residual worst case
  * (skewed keys) so no reducer sees more than maxDf² pairs per key.
  *
  * Sorting the tokens before forming bigrams preserves recall for
  * word-order variants: 'Ivan Ivanov' and 'Ivanov Ivan' (token Jaccard
  * 1.0, a candidate pair under the reference's token inverted index)
  * share every sorted bigram, where positional bigrams would share none.
  * Names whose token SETS differ but overlap can still miss (sorted
  * adjacency differs), which is the deliberate recall-vs-fanout trade;
  * exact-set variants — the reference's primary dupe class — always
  * collide.
  */
object Blocking {

  private def words(name: Column): Column =
    filter(split(Consolidate.nameKey(name), " "), t => length(t) > 0)

  /** Distinct sorted token set per record — the scoring side. */
  def tokenSets(df: DataFrame, id: Column, name: Column): DataFrame =
    df.select(id.as("id"), array_sort(array_distinct(words(name))).as("toks"))

  /** Blocking-key frame: (id, bkey) where bkey is an adjacent bigram of
    * the SORTED distinct token set (single-token names fall back to the
    * lone token), with keys above `maxDf` document frequency dropped —
    * the candidate-cap analog of the reference's blocker limits
    * (zavod/zavod/runner/local_enricher.py:36-45). */
  def blockingKeys(df: DataFrame, id: Column, name: Column, maxDf: Long): DataFrame =
    blockingKeysWithFreq(df, id, name, maxDf)._1

  /** blockingKeys plus the per-key document-frequency frame (already
    * computed for the cap — reused by the skew salting decision). */
  private def blockingKeysWithFreq(
      df: DataFrame, id: Column, name: Column,
      maxDf: Long): (DataFrame, DataFrame) = {
    val w = array_sort(array_distinct(words(name)))
    val keysExpr = when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(w)
    val keys = df.select(id.as("id"), explode(keysExpr).as("bkey")).distinct()
    val freq = keys.groupBy("bkey").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    (keys.join(freq, "bkey").select(col("id"), col("bkey")), freq)
  }

  /** Name-level phonetic fingerprint: the sorted distinct soundex codes
    * of the name's tokens, space-joined — the phonetic analog of the
    * token fingerprint the reference's matcher normalizes names to
    * (fingerprints-style: order-, duplicate- and spelling-insensitive).
    * Invariant under word order and any respelling that preserves each
    * token's initial letter and consonant skeleton ('lavender
    * goldenrod' ≡ 'goldanrad lavandar'). A single-token soundex key
    * would be useless at scale (26×10³ possible codes ⇒ enormous df);
    * the full sorted code SET is combinatorially distinctive, so the
    * fingerprint works as ONE df-capped equi-join key. */
  def phoneticFingerprint(name: Column): Column =
    array_join(
      array_sort(array_distinct(transform(words(name), t => soundex(t)))), " ")

  /** Phonetic candidate pairs: records with the same df-capped phonetic
    * fingerprint, scored by LEXICAL token Jaccard — so the score
    * surfaces how little surface overlap the phonetic key recovered
    * (a fully vowel-mangled twin pairs at score 0). Same equi-join
    * shape (and therefore the same 100 TB profile) as [[candidates]],
    * with one key per record instead of per bigram. */
  def candidatesPhonetic(
      subjects: DataFrame, targets: DataFrame,
      subjectId: Column, subjectName: Column,
      targetId: Column, targetName: Column,
      maxDf: Long = 100): DataFrame = {
    def keys(df: DataFrame, id: Column, name: Column) = {
      val k = df.select(id.as("id"), phoneticFingerprint(name).as("bkey"))
        .filter(length(col("bkey")) > 0).distinct()
      val freq = k.groupBy("bkey").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf)
      k.join(freq, "bkey").select(col("id"), col("bkey"))
    }
    val sk = keys(subjects, subjectId, subjectName).toDF("subject_id", "bkey")
    val tk = keys(targets, targetId, targetName).toDF("target_id", "bkey")
    val pairs = sk.join(tk, "bkey")
      .select(col("subject_id"), col("target_id")).distinct()
    val st = tokenSets(subjects, subjectId, subjectName).toDF("subject_id", "s_toks")
    val tt = tokenSets(targets, targetId, targetName).toDF("target_id", "t_toks")
    pairs.join(st, "subject_id").join(tt, "target_id")
      .withColumn("inter", size(array_intersect(col("s_toks"), col("t_toks"))))
      .withColumn("score",
        col("inter").cast("double") /
          (size(col("s_toks")) + size(col("t_toks")) - col("inter")).cast("double"))
      .select(col("subject_id"), col("target_id"), col("score"))
  }

  /** J9: blocked candidate pairs between subjects and targets with a
    * token-set Jaccard score. Candidates come from the bigram equi-join;
    * the exact token Jaccard is then computed via array_intersect on the
    * (small) per-record token sets — no per-token pair shuffle.
    * Returns (subject_id, target_id, score). */
  def candidates(
      subjects: DataFrame, targets: DataFrame,
      subjectId: Column, subjectName: Column,
      targetId: Column, targetName: Column,
      maxDf: Long = 100,
      saltBuckets: Int = 1,
      saltMinPairs: Long = 250000L): DataFrame = {
    val (sk0, sFreq) = blockingKeysWithFreq(subjects, subjectId, subjectName, maxDf)
    val (tk0, tFreq) = blockingKeysWithFreq(targets, targetId, targetName, maxDf)
    val sk = sk0.toDF("subject_id", "bkey")
    val tk = tk0.toDF("target_id", "bkey")
    // Skew path (saltBuckets > 1): the df cap bounds per-key fan-out at
    // maxDf², but ALL of one hot key (a common surname bigram) still
    // lands on ONE reducer — at a raised maxDf that single straggler is
    // the 100× bottleneck. Keys whose subject-df × target-df exceeds
    // `saltMinPairs` are salted: the subject side splits across the
    // salt buckets by id hash, the target side replicates into each —
    // exactly once per (key, pair), so the result is identical to the
    // unsalted join (exactness locked in BlockingSpec). Cold keys keep
    // salt 0 on both sides and pay nothing.
    val rawPairs =
      if (saltBuckets <= 1) sk.join(tk, "bkey")
      else {
        val hot = sFreq.select(col("bkey"), col("df").as("sdf"))
          .join(tFreq.select(col("bkey"), col("df").as("tdf")), "bkey")
          .filter(col("sdf") * col("tdf") >= saltMinPairs)
          .select(col("bkey"), lit(true).as("__hot"))
        val skS = sk.join(broadcast(hot), Seq("bkey"), "left")
          .withColumn("__salt", when(col("__hot"),
            pmod(xxhash64(col("subject_id")), lit(saltBuckets.toLong)))
            .otherwise(lit(0L)))
          .drop("__hot")
        val tkS = tk.join(broadcast(hot), Seq("bkey"), "left")
          .withColumn("__salt", explode(when(col("__hot"),
            sequence(lit(0L), lit(saltBuckets.toLong - 1)))
            .otherwise(array(lit(0L)))))
          .drop("__hot")
        skS.join(tkS, Seq("bkey", "__salt"))
      }
    val pairs = rawPairs
      .select(col("subject_id"), col("target_id")).distinct()
    val st = tokenSets(subjects, subjectId, subjectName).toDF("subject_id", "s_toks")
    val tt = tokenSets(targets, targetId, targetName).toDF("target_id", "t_toks")
    pairs.join(st, "subject_id").join(tt, "target_id")
      .withColumn("inter", size(array_intersect(col("s_toks"), col("t_toks"))))
      .withColumn("score",
        col("inter").cast("double") /
          (size(col("s_toks")) + size(col("t_toks")) - col("inter")).cast("double"))
      .select(col("subject_id"), col("target_id"), col("score"))
  }

  /** O2/O3: per-subject pruning — keep candidates above `cutoff`, within
    * `minScoreRatio` of the subject's best score, top `k` by score with
    * deterministic tie-break on target id
    * (local_enricher.py:36-53,104-121).
    *
    * The cutoff predicate runs BEFORE the window shuffle (it prunes the
    * bulk of the candidates), which is semantics-preserving: the
    * per-subject max always survives the cutoff whenever any row does,
    * so `max(score)` over survivors equals the global per-subject best.
    * Both window functions share one partitioning, so this is a single
    * shuffle. */
  def topK(
      cands: DataFrame, k: Int = 10,
      cutoff: Double = 0.5, minScoreRatio: Double = 0.1): DataFrame = {
    val w = Window.partitionBy("subject_id")
    val rankW = w.orderBy(col("score").desc, col("target_id").asc)
    cands
      .filter(col("score") >= cutoff)
      .withColumn("best", max(col("score")).over(w))
      .filter(col("score") >= col("best") * minScoreRatio)
      .withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("subject_id"), col("target_id"), col("score"), col("rank"))
  }

  /** Exact edit-distance-1 join via deletion neighborhoods (FastSS,
    * Bocek et al. 2007): two strings with Levenshtein distance ≤ 1 MUST
    * share a key in `{s} ∪ single-deletions(s)` (a substitution meets
    * at the both-sides deletion, an insertion/deletion meets at the
    * shorter string itself), so candidates come from an equi-join on
    * ~(len+1) keys per string — never name×name — and one exact
    * `levenshtein` check removes the false candidates (e.g. adjacent
    * transpositions share a deletion at distance 2). The complete exact
    * companion to the phonetic/bigram blockers, whose recall is
    * empirical (q142); here recall is a theorem.
    *
    * @param names (id, name); ids with equal names are still distinct
    * @return (a, b, dist) with a < b and dist ∈ {0, 1} */
  def editDistanceJoin(names: DataFrame, id: Column, name: Column): DataFrame = {
    val base = names.select(id.as("nid"), name.as("nm"))
      .where(col("nm").isNotNull)
    // empty names keep their identity key only (sequence(1, 0) would
    // DESCEND in Spark); "" still meets every 1-char name at the shared
    // "" deletion key, so the completeness theorem holds for them too
    val keys = base.select(col("nid"), explode(expr(
        """CASE WHEN length(nm) = 0 THEN array(nm)
          |ELSE array_union(array(nm),
          |  transform(sequence(1, length(nm)), i ->
          |    concat(substring(nm, 1, CAST(i AS INT) - 1),
          |           substring(nm, CAST(i AS INT) + 1, length(nm)))))
          |END""".stripMargin)).as("k"))
    val cands = keys.select(col("nid").as("a"), col("k"))
      .join(keys.select(col("nid").as("b"), col("k")), "k")
      .where(col("a") < col("b")).select("a", "b").distinct()
    cands
      .join(base.select(col("nid").as("a"), col("nm").as("nma")), "a")
      .join(base.select(col("nid").as("b"), col("nm").as("nmb")), "b")
      .withColumn("dist", levenshtein(col("nma"), col("nmb")).cast("long"))
      .where(col("dist") <= 1)
      .select("a", "b", "dist")
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD'95): sort
    * every record by `sortKey`, pair each record with its `w` global
    * successors — pair volume is EXACTLY n·w, the tightest candidate
    * budget of any blocker (key-based blockers are df-capped but still
    * data-dependent).
    *
    * The global rank does NOT use a single-partition window: `bucket`
    * must be a monotone prefix of `sortKey` (e.g. its first character),
    * ranks are row_numbers WITHIN each bucket plus broadcast per-bucket
    * offsets — the Packing two-phase shape — and cross-bucket neighbor
    * pairs fall out of the rank arithmetic (rank+j spans bucket
    * boundaries). The successor join is an equi-join on the computed
    * rank. Returns (a, b, dist) with dist ∈ [1, w] the rank gap. */
  def sortedNeighborhood(
      df: DataFrame, id: Column, sortKey: Column, bucket: Column,
      w: Int): DataFrame = {
    val base = df.select(id.as("id"), sortKey.as("sk"), bucket.as("bk"))
    val inB = Window.partitionBy("bk").orderBy(col("sk"), col("id"))
    val run = base.withColumn("__r", row_number().over(inB).cast("long"))
    // tiny per-bucket frame: the only globally-ordered window
    val offsets = base.groupBy("bk").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .drop("__n")
    val ranked = run.join(broadcast(offsets), "bk")
      .select(col("id"), (col("__r") + col("__off")).as("rnk"))
    val probes = ranked.select(col("id").as("b"), col("rnk").as("rb"))
    ranked.select(col("id").as("a"), col("rnk").as("ra"),
        explode(sequence(lit(1L), lit(w.toLong))).as("dist"))
      .withColumn("rb", col("ra") + col("dist"))
      .join(probes, "rb")
      .select(col("a"), col("b"), col("dist"))
  }
}
