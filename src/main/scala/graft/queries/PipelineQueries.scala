package graft.queries

import graft.operators.{Blocking, Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import Q._

/** Training-data pipeline operators: deduplication, similarity search,
  * text analysis, multimodal plumbing — the 100 TB-scale extensions
  * beyond the reference's own surface.
  */
object PipelineQueries {

  val decls: Seq[Decl] = Seq(

    // Exact dedup by content hash.
    decl("q40_dedup_exact",
      (s, d) => Dedup.exact(t(s, d, "documents"), col("doc_id"), col("text")),
      """SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY md5(text)""".stripMargin),

    // Exact n-gram Jaccard near-dup pairs (df-capped shingle blocking).
    decl("q41_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(t(s, d, "documents"),
          col("doc_id"), col("text"), n = 3, maxDf = 50, threshold = 0.6)
        .select(col("doc_a"), col("doc_b"),
          col("jaccard").cast("decimal(18,6)").cast("double").as("jaccard")),
      """WITH words AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        |sh0 AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(w)-2),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) s
        |  FROM words WHERE len(w) >= 3),
        |sh AS (SELECT sh0.doc_id, sh0.s FROM sh0
        |  JOIN (SELECT s, COUNT(*) df FROM sh0 GROUP BY s) f ON sh0.s = f.s AND f.df <= 50),
        |sz AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id a, b.doc_id b, COUNT(*) i FROM sh a
        |  JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT inter.a AS doc_a, inter.b AS doc_b,
        |  CAST(CAST(i::DOUBLE / (sa.sz + sb.sz - i)::DOUBLE AS DECIMAL(18,6)) AS DOUBLE) AS jaccard
        |FROM inter JOIN sz sa ON inter.a = sa.doc_id JOIN sz sb ON inter.b = sb.doc_id
        |WHERE i::DOUBLE / (sa.sz + sb.sz - i)::DOUBLE >= 0.6""".stripMargin),

    // MinHash + LSH near-dup candidates (rows-only check: the banded
    // hash arithmetic is not reasonably expressible in the oracle).
    declNoOracle("q42_minhash_lsh",
      (s, d) => Dedup.minhashLshPairs(t(s, d, "documents"),
        col("doc_id"), col("text"), n = 3, maxDf = 50,
        bands = 8, rowsPerBand = 4, minEstJaccard = 0.5)),

    // SimHash near-dup candidates (rows-only check).
    declNoOracle("q43_simhash",
      (s, d) => Dedup.simhashPairs(t(s, d, "documents"),
        col("doc_id"), col("text"), maxHamming = 6)),

    // Brute-force cosine top-k ANN (exact baseline).
    decl("q44_ann_cosine",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.cosineTopK(
          e.filter(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding")),
          e.select(col("vec_id"), col("embedding")), k = 10)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"))
      },
      """WITH q AS (SELECT vec_id qid, embedding::DOUBLE[] qe FROM embeddings WHERE vec_id % 100 = 0),
        |c AS (SELECT vec_id nid, embedding::DOUBLE[] ne FROM embeddings),
        |scored AS (SELECT qid, nid, list_cosine_similarity(qe, ne) cos
        |  FROM q, c WHERE qid != nid),
        |ranked AS (SELECT qid AS query_id, nid AS neighbor_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rnk
        |  FROM scored)
        |SELECT query_id, neighbor_id, rnk FROM ranked WHERE rnk <= 10""".stripMargin),

    // LSH-bucketed ANN — the scale path (rows-only check).
    declNoOracle("q45_ann_lsh",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.cosineTopKLsh(
          e.filter(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding")),
          e.select(col("vec_id"), col("embedding")), k = 10, dim = 64, planes = 6)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"))
      }),

    // Text quality signals.
    decl("q46_text_quality",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.qualitySignals(col("text")).as("q"))
        .select(col("doc_id"), col("q.n_chars").as("n_chars"),
          col("q.n_tokens").as("n_tokens"),
          col("q.mean_word_len").cast("decimal(18,6)").cast("double").as("mean_word_len"),
          col("q.stopword_ratio").cast("decimal(18,6)").cast("double").as("stopword_ratio")),
      """SELECT doc_id, length(text) AS n_chars,
        |  (length(text) - length(replace(text, ' ', '')) + 1) AS n_tokens,
        |  CAST(CAST((length(text) - (length(text) - length(replace(text, ' ', '')) + 1) + 1)::DOUBLE
        |    / (length(text) - length(replace(text, ' ', '')) + 1)::DOUBLE AS DECIMAL(18,6)) AS DOUBLE) AS mean_word_len,
        |  CAST(CAST((
        |      (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5
        |    + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) // 3
        |    )::DOUBLE / (length(text) - length(replace(text, ' ', '')) + 1)::DOUBLE AS DECIMAL(18,6)) AS DOUBLE) AS stopword_ratio
        |FROM documents""".stripMargin),

    // Language ID by marker-word scoring (argmax with deterministic ties).
    decl("q47_langid",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.langId(col("text"), Seq(
            "en" -> Seq("the", "a"),
            "x1" -> Seq("data", "table"),
            "x2" -> Seq("spark", "query"))).as("lang_pred")),
      """SELECT doc_id, CASE
        |  WHEN s_en >= s_x1 AND s_en >= s_x2 THEN 'en'
        |  WHEN s_x1 >= s_x2 THEN 'x1'
        |  ELSE 'x2' END AS lang_pred
        |FROM (SELECT doc_id,
        |    (length(p) - length(replace(p, ' the ', ''))) // 5 + (length(p) - length(replace(p, ' a ', ''))) // 3 AS s_en,
        |    (length(p) - length(replace(p, ' data ', ''))) // 6 + (length(p) - length(replace(p, ' table ', ''))) // 7 AS s_x1,
        |    (length(p) - length(replace(p, ' spark ', ''))) // 7 + (length(p) - length(replace(p, ' query ', ''))) // 7 AS s_x2
        |  FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents))""".stripMargin),

    // Document fingerprint (normalized content hash).
    decl("q48_fingerprint",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")),
      """SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin),

    // Token-count histogram buckets.
    decl("q49_token_buckets",
      (s, d) => t(s, d, "documents")
        .select((TextAnalysis.tokenCount(col("text")) - TextAnalysis.tokenCount(col("text")) % 10).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_docs")),
      """SELECT tc - tc % 10 AS bucket, COUNT(*) AS n_docs FROM (
        |  SELECT (length(text) - length(replace(text, ' ', '')) + 1) AS tc FROM documents)
        |GROUP BY 1""".stripMargin),

    // Multimodal metadata: binary blobs + deterministic stub decode math.
    decl("q50_multimodal_meta",
      (s, d) => {
        val media = t(s, d, "documents").select(
          col("doc_id").as("media_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
          encode(col("text"), "UTF-8").as("content"),
          lit("application/octet-stream").as("mime"),
          octet_length(col("text")).cast("long").as("n_bytes"))
        Multimodal.extractFeatures(media)
          .select(col("media_id"), col("modality"), col("n_bytes"),
            col("width").cast("long").as("width"), col("height").cast("long").as("height"),
            col("duration_ms"), col("n_frames").cast("long").as("n_frames"))
      },
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
        |  strlen(text) AS n_bytes,
        |  CASE WHEN doc_id % 3 = 0 THEN 16 + strlen(text) % 128 ELSE 0 END AS width,
        |  CASE WHEN doc_id % 3 = 0 THEN 16 + (strlen(text) * 7) % 128 ELSE 0 END AS height,
        |  CASE WHEN doc_id % 3 = 1 THEN strlen(text) * 8 ELSE 0 END AS duration_ms,
        |  CASE WHEN doc_id % 3 = 2 THEN 1 + strlen(text) % 32 ELSE 0 END AS n_frames
        |FROM documents""".stripMargin),

    // J9/J10/O2/O3: token-blocked similarity join with per-subject top-k,
    // cutoff, and score-ratio pruning — the xref/enrichment pipeline.
    decl("q51_blocking_topk",
      (s, d) => {
        val p = t(s, d, "part")
        val subjects = p.filter(col("p_partkey") % 2 === 0)
        val targets = p.filter(col("p_partkey") % 2 === 1)
        val cands = Blocking.candidates(subjects, targets,
          col("p_partkey"), col("p_name"), col("p_partkey"), col("p_name"),
          maxDf = 5000)
        Blocking.topK(cands, k = 5, cutoff = 0.5, minScoreRatio = 0.1)
          .select(col("subject_id"), col("target_id"),
            col("score").cast("decimal(18,6)").cast("double").as("score"), col("rank").as("rnk"))
      },
      """WITH tok AS (
        |  SELECT DISTINCT p_partkey AS id, unnest(string_split(trim(lower(p_name)), ' ')) AS token
        |  FROM part),
        |tokf AS (SELECT tok.id, tok.token FROM tok
        |  JOIN (SELECT token, COUNT(*) df FROM tok GROUP BY token) f
        |  ON tok.token = f.token AND f.df <= 5000),
        |si AS (SELECT id, token FROM tokf WHERE id % 2 = 0),
        |ti AS (SELECT id, token FROM tokf WHERE id % 2 = 1),
        |ssz AS (SELECT id, COUNT(*) sz FROM si GROUP BY id),
        |tsz AS (SELECT id, COUNT(*) sz FROM ti GROUP BY id),
        |cand AS (
        |  SELECT si.id AS subject_id, ti.id AS target_id, COUNT(*) AS inter
        |  FROM si JOIN ti ON si.token = ti.token GROUP BY 1, 2),
        |scored AS (
        |  SELECT subject_id, target_id,
        |    inter::DOUBLE / (ssz.sz + tsz.sz - inter)::DOUBLE AS score
        |  FROM cand JOIN ssz ON cand.subject_id = ssz.id JOIN tsz ON cand.target_id = tsz.id),
        |pruned AS (
        |  SELECT subject_id, target_id, score,
        |    max(score) OVER (PARTITION BY subject_id) AS best
        |  FROM scored)
        |SELECT subject_id, target_id,
        |  CAST(CAST(score AS DECIMAL(18,6)) AS DOUBLE) AS score, rnk
        |FROM (
        |  SELECT subject_id, target_id, score,
        |    row_number() OVER (PARTITION BY subject_id ORDER BY score DESC, target_id) AS rnk
        |  FROM pruned WHERE score >= 0.5 AND score >= best * 0.1)
        |WHERE rnk <= 5""".stripMargin)
  )
}
