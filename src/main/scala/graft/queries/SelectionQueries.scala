package graft.queries

import graft.operators.{Quantiles, Retrieval, Sampling, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._
import PipelineQueries.sqlHash60

/** Data-selection operators of a training-data pipeline: BM25 lexical
  * retrieval (decontamination lookup / hard-negative mining), DSIR
  * importance weighting (pick raw docs that look like a target
  * distribution), and mixture-planned stratified sampling (allocate a
  * doc budget across languages by temperature-scaled token mass).
  *
  * The corpus vocabulary is tiny and synthetic, so the retrieval
  * queries run over word TRIGRAMS (≈30k distinct terms, Zipf-ish df) —
  * the same operator over real text runs n=1. Every oracle rebuilds
  * the full arithmetic in SQL: idf/tf-saturation sums, hashed-feature
  * log-ratios, and the hash-threshold quota selection, all rounded
  * through DECIMAL(12,4) where doubles accumulate.
  */
object SelectionQueries {

  /** Unrolled Viterbi DP steps b1..bN over the acc list — DuckDB
    * lambdas cannot capture outer lambda variables, so the engine's
    * nested `aggregate` fold becomes a per-position CTE chain in the
    * oracle (the BPE/Lloyd/PageRank unrolled-rounds pattern). */
  private def viterbiSteps(n: Int, maxPieceLen: Int, unk: Long, big: Long): String =
    (1 to n).map { i =>
      s"""b$i AS (SELECT c, CASE WHEN len(c) < $i THEN acc ELSE
         |  acc[1:$i] || [list_min(list_transform(
         |    generate_series(greatest(0, $i - $maxPieceLen), $i - 1), j ->
         |      acc[j + 1] +
         |      coalesce(map_extract(m, substr(c, (j + 1)::INT, ($i - j)::INT))[1],
         |        CASE WHEN $i - j = 1 THEN $unk ELSE $big END) * 1024 + 1))] ||
         |  acc[$i+2:] END AS acc, m FROM b${i - 1})""".stripMargin
    }.mkString(",\n")

  /** q168: unigram-LM (SentencePiece-style) VITERBI segmentation — the
    * second tokenizer family beside BPE. The corpus's 31-word synthetic
    * vocabulary is too easy to segment, so the fixture glues adjacent
    * word pairs into COMPOUNDS and the tokenizer must rediscover the
    * boundaries: with integer −log₂ piece costs every frequent compound
    * segments into exactly its two constituent words (verified — the
    * top compounds all report 2 pieces). All-integer DP states pack
    * (cost, n_pieces) so ties break toward fewer pieces; the oracle
    * retrains the vocabulary and replays the full DP as unrolled
    * per-position CTEs. */
  private[queries] def unigramDecl: Decl =
    decl("q168_unigram_segment",
      (s, d) => {
        val docs = t(s, d, "documents")
        // materialize the split once per doc — element_at inside the
        // lambda must not re-split the text per compound
        val cs = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
          .select(col("doc_id"), explode(expr(
            """CASE WHEN size(ws) >= 2 THEN
              |  transform(sequence(1, size(ws) div 2), i ->
              |    concat(element_at(ws, CAST(2 * i - 1 AS INT)),
              |           element_at(ws, CAST(2 * i AS INT))))
              |ELSE array() END""".stripMargin)).as("c"))
        val vocab = graft.operators.Unigram.trainVocab(cs, col("c"),
          maxPieceLen = 6, minFreq = 20L)
        graft.operators.Unigram.segmentReport(cs, col("doc_id"), col("c"),
          vocab, maxPieceLen = 6, maxUnitLen = 16)
      },
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |cs AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) // 2),
         |        i -> ws[2*i-1] || ws[2*i])) AS c FROM w),
         |cw AS (SELECT c, COUNT(*)::BIGINT AS cnt FROM cs GROUP BY 1),
         |sub AS (SELECT c, cnt, unnest(flatten(list_transform(generate_series(1, len(c)),
         |        i -> list_transform(generate_series(1, 6),
         |          l -> CASE WHEN i + l - 1 <= len(c) THEN substr(c, i, l) END)))) AS p
         |        FROM cw),
         |pf AS (SELECT p, SUM(cnt)::BIGINT AS freq FROM sub WHERE p IS NOT NULL GROUP BY 1),
         |vocab AS (SELECT p, (64 - len(bin(freq))) * 1000000 AS cost
         |          FROM pf WHERE freq >= 20),
         |vm AS (SELECT map_from_entries(list(struct_pack(k := p, v := cost))) AS m
         |       FROM vocab),
         |b0 AS (SELECT c, [0::BIGINT] ||
         |       list_transform(generate_series(1, len(c)),
         |         z -> 4611686018427387904::BIGINT) AS acc, vm.m AS m FROM cw, vm),
         |${viterbiSteps(16, 6, 60000000L, 4611686018427387L)},
         |dp AS (SELECT c, acc[len(c) + 1] AS state FROM b16)
         |SELECT cs.doc_id AS doc_id, COUNT(*)::BIGINT AS n_units,
         |  SUM(CASE WHEN len(dp.c) > 16 THEN len(dp.c)::BIGINT
         |      ELSE dp.state % 1024 END)::BIGINT AS n_pieces,
         |  SUM(CASE WHEN len(dp.c) > 16 THEN len(dp.c)::BIGINT * 60000000
         |      ELSE dp.state // 1024 END)::BIGINT AS total_cost
         |FROM cs JOIN dp ON cs.c = dp.c GROUP BY 1""".stripMargin)

  /** Shared BM25 oracle chain (WITH w … sc) — q133 ranks it directly,
    * q169/q179 fuse it with a semantic ranking. `qLimit` appends an
    * ORDER BY/LIMIT to the query-set CTE (q169's pinned-100 cap). */
  private def bm25Ctes(qLimit: String = ""): String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |tg AS (SELECT doc_id, len(w)::BIGINT AS dl,
      |  unnest(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
      |    i -> w[i] || '_' || w[i+1] || '_' || w[i+2])) AS term FROM w),
      |tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf, min(dl) AS dl
      |       FROM tg GROUP BY 1, 2),
      |stats AS (SELECT COUNT(*)::BIGINT AS n_docs, AVG(len(w)::DOUBLE) AS avgdl FROM w),
      |dfr AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1),
      |q AS (SELECT doc_id AS qid, w[1:8] AS qw FROM w WHERE doc_id % 37 = 3$qLimit),
      |qt AS (SELECT DISTINCT qid,
      |  unnest(list_transform(generate_series(1, greatest(len(qw) - 2, 0)),
      |    i -> qw[i] || '_' || qw[i+1] || '_' || qw[i+2])) AS term FROM q),
      |post AS (SELECT tf.doc_id AS doc_id, tf.term AS term, tf.tf AS tf,
      |         tf.dl AS dl, dfr.df AS df, stats.n_docs AS n_docs, stats.avgdl AS avgdl
      |         FROM tf JOIN dfr USING (term), stats
      |         WHERE dfr.df <= stats.n_docs::DOUBLE * 0.5),
      |sc AS (SELECT qt.qid AS qid, post.doc_id AS doc_id,
      |       COUNT(*)::BIGINT AS n_terms_hit,
      |       CAST(CAST(SUM(
      |         ln(1.0 + (post.n_docs - post.df + 0.5) / (post.df + 0.5)) *
      |         (post.tf * (1.2 + 1.0)) /
      |         (post.tf + 1.2 * (1.0 - 0.75 + 0.75 * post.dl / post.avgdl)))
      |         AS DECIMAL(12,4)) AS DOUBLE) AS score
      |       FROM qt JOIN post USING (term) GROUP BY 1, 2)""".stripMargin

  val decls: Seq[Decl] = Seq(

    // BM25 top-10 retrieval: queries are the first 8 words of every
    // doc_id%37==3 doc, so each query's source doc carries a planted
    // strong match while shared trigrams produce genuine partial
    // matches to rank. Stop-term cap df <= N/2 verified in-plan.
    decl("q133_bm25_topk",
      (s, d) => {
        val docs = t(s, d, "documents")
        val qs = docs.where(col("doc_id") % 37 === 3)
          .select(col("doc_id").as("qid"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qt"))
        Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
          qs, col("qid"), col("qt"), n = 3, k = 10)
      },
      bm25Ctes() +
      """
        |SELECT qid, doc_id, n_terms_hit, score, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::BIGINT AS rank
        |  FROM sc) WHERE rank <= 10""".stripMargin),

    // Fuzzy NAME search over a trigram inverted index (round-11): the
    // pg_trgm shape — the reference ecosystem's entity-name lookup is
    // fuzzy full-text search, and trigram-overlap retrieval is its
    // engine-side primitive. Queries are real customer names with a
    // deterministic typo (3rd character deleted), so token-level
    // equality fails and only sub-word matching can recover the
    // source row (the shared "customer#0…" stem is exactly the
    // stop-trigram regime — the ABSOLUTE df cap (256) removes it from
    // candidate GENERATION while the exact Jaccard still scores it, and the
    // discriminating digit-suffix trigrams drive retrieval; rank-1
    // self-recovery is spec-asserted). Candidates: df-capped trigram
    // postings equi-join
    // (stop-trigrams never seed candidates); score: EXACT trigram-set
    // Jaccard via array_intersect; per-query top-3 window. The oracle
    // rebuilds the index, the cap, the candidate join and the exact
    // Jaccard from scratch in SQL.
    decl("q211_trigram_name_search",
      (s, d) => {
        val c = t(s, d, "customer")
        val targets = c.select(col("c_custkey").cast("long").as("id"),
          lower(col("c_name")).as("nm"))
        val qs = c.where(col("c_custkey") % 89 === 1)
          .select(col("c_custkey").cast("long").as("qid"),
            concat(substring(lower(col("c_name")), 1, 2),
              expr("substring(lower(c_name), 4)")).as("qnm"))
        Retrieval.trigramTopK(targets, col("id"), col("nm"),
          qs, col("qid"), col("qnm"), k = 3, maxDf = 256L)
      },
      """WITH tgt AS (SELECT c_custkey::BIGINT AS id, lower(c_name) AS nm FROM customer),
        |q AS (SELECT c_custkey::BIGINT AS qid,
        |  substr(lower(c_name), 1, 2) || substr(lower(c_name), 4) AS nm
        |  FROM customer WHERE c_custkey % 89 = 1),
        |ttg AS (SELECT id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(nm) - 2), i -> substr(nm, i, 3)))) AS t3
        |  FROM tgt WHERE len(nm) >= 3
        |  UNION ALL SELECT id, nm FROM tgt WHERE len(nm) BETWEEN 1 AND 2),
        |qtg AS (SELECT qid, unnest(list_distinct(list_transform(
        |    generate_series(1, len(nm) - 2), i -> substr(nm, i, 3)))) AS t3
        |  FROM q WHERE len(nm) >= 3
        |  UNION ALL SELECT qid, nm FROM q WHERE len(nm) BETWEEN 1 AND 2),
        |tsz AS (SELECT id, COUNT(*)::BIGINT AS tn FROM ttg GROUP BY 1),
        |qsz AS (SELECT qid, COUNT(*)::BIGINT AS qn FROM qtg GROUP BY 1),
        |keep AS (SELECT t3 FROM (SELECT t3, COUNT(*)::BIGINT AS df FROM ttg GROUP BY 1)
        |  WHERE df <= 256),
        |cand AS (SELECT DISTINCT qid, id
        |  FROM qtg JOIN keep USING (t3) JOIN ttg USING (t3)),
        |inter AS (SELECT c.qid, c.id, COUNT(*)::BIGINT AS inter
        |  FROM cand c JOIN qtg ON qtg.qid = c.qid
        |  JOIN ttg ON ttg.id = c.id AND ttg.t3 = qtg.t3
        |  GROUP BY 1, 2),
        |sc AS (SELECT i.qid, i.id, i.inter,
        |  i.inter::DOUBLE / (qn + tn - i.inter)::DOUBLE AS score
        |  FROM inter i JOIN qsz USING (qid) JOIN tsz USING (id))
        |SELECT qid, id AS target_id, inter, score, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id)::BIGINT AS rank
        |  FROM sc) WHERE rank <= 3""".stripMargin),

    // Incremental text-index maintenance (round-11): the trigram
    // inverted index as a MAINTAINED artifact, completing the index
    // lifecycle trio (ANN q193, bloom q206, text here). Base postings
    // built once; an append batch contributes ONLY its own postings
    // (document frequencies are additive, per-id sizes disjoint —
    // maintenance is O(delta)); search is served from the merged
    // postings with no access to the original names. The oracle is the
    // FULL REBUILD (q211's SQL verbatim), so merge ≡ rebuild is the
    // gate, and the postings path is spec-locked row-identical to the
    // array path.
    decl("q229_trigram_index_maintenance",
      (s, d) => {
        val c = t(s, d, "customer")
        def named(df: org.apache.spark.sql.DataFrame) =
          df.select(col("c_custkey").cast("long").as("id"),
            lower(col("c_name")).as("nm"))
        val base = named(c.where(col("c_custkey") % 3 =!= 0))
        val delta = named(c.where(col("c_custkey") % 3 === 0))
        val maintained = Retrieval.trigramIndex(base, col("id"), col("nm"))
          .unionByName(Retrieval.trigramIndex(delta, col("id"), col("nm")))
        val qs = c.where(col("c_custkey") % 89 === 1)
          .select(col("c_custkey").cast("long").as("qid"),
            concat(substring(lower(col("c_name")), 1, 2),
              expr("substring(lower(c_name), 4)")).as("qnm"))
        Retrieval.trigramTopKFromPostings(maintained,
          qs, col("qid"), col("qnm"), k = 3, maxDf = 256L)
      },
      """WITH tgt AS (SELECT c_custkey::BIGINT AS id, lower(c_name) AS nm FROM customer),
        |q AS (SELECT c_custkey::BIGINT AS qid,
        |  substr(lower(c_name), 1, 2) || substr(lower(c_name), 4) AS nm
        |  FROM customer WHERE c_custkey % 89 = 1),
        |ttg AS (SELECT id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(nm) - 2), i -> substr(nm, i, 3)))) AS t3
        |  FROM tgt WHERE len(nm) >= 3
        |  UNION ALL SELECT id, nm FROM tgt WHERE len(nm) BETWEEN 1 AND 2),
        |qtg AS (SELECT qid, unnest(list_distinct(list_transform(
        |    generate_series(1, len(nm) - 2), i -> substr(nm, i, 3)))) AS t3
        |  FROM q WHERE len(nm) >= 3
        |  UNION ALL SELECT qid, nm FROM q WHERE len(nm) BETWEEN 1 AND 2),
        |tsz AS (SELECT id, COUNT(*)::BIGINT AS tn FROM ttg GROUP BY 1),
        |qsz AS (SELECT qid, COUNT(*)::BIGINT AS qn FROM qtg GROUP BY 1),
        |keep AS (SELECT t3 FROM (SELECT t3, COUNT(*)::BIGINT AS df FROM ttg GROUP BY 1)
        |  WHERE df <= 256),
        |cand AS (SELECT DISTINCT qid, id
        |  FROM qtg JOIN keep USING (t3) JOIN ttg USING (t3)),
        |inter AS (SELECT c.qid, c.id, COUNT(*)::BIGINT AS inter
        |  FROM cand c JOIN qtg ON qtg.qid = c.qid
        |  JOIN ttg ON ttg.id = c.id AND ttg.t3 = qtg.t3
        |  GROUP BY 1, 2),
        |sc AS (SELECT i.qid, i.id, i.inter,
        |  i.inter::DOUBLE / (qn + tn - i.inter)::DOUBLE AS score
        |  FROM inter i JOIN qsz USING (qid) JOIN tsz USING (id))
        |SELECT qid, id AS target_id, inter, score, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id)::BIGINT AS rank
        |  FROM sc) WHERE rank <= 3""".stripMargin),

    // STREAMING text-index maintenance (round-11): the q229 arithmetic
    // under the lakehouse streaming protocol — each micro-batch of new
    // records appends ONLY its own postings to a versioned store
    // (postings/v<bid> = prev ∪ batch postings, overwrite-per-batch
    // keyed on bid: idempotent under at-least-once re-delivery, the
    // q176/q205 rule), with a checkpoint restart between the two
    // drops. Search served from the final version must equal the
    // FULL-REBUILD oracle — the maintained artifact is never stale and
    // never rescans old records.
    decl("q234_streaming_text_index",
      (s, d) => {
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q234_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val c = t(s, d, "customer")
        def named(df: org.apache.spark.sql.DataFrame) =
          df.select(col("c_custkey").cast("long").as("id"),
            lower(col("c_name")).as("nm"))
        def processAvailable(): Unit = {
          val stream = s.readStream.schema("id LONG, nm STRING")
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream, s"$base/ck",
            trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow())) {
            (batch, bid) =>
              val sp = batch.sparkSession
              val prevPath = new org.apache.hadoop.fs.Path(s"$base/postings/v${bid - 1}")
              val prev =
                if (bid > 0 && fs.exists(prevPath)) sp.read.parquet(prevPath.toString)
                else Retrieval.trigramIndex(batch.limit(0), col("id"), col("nm"))
              prev.unionByName(
                  Retrieval.trigramIndex(batch, col("id"), col("nm")))
                .write.mode("overwrite").parquet(s"$base/postings/v$bid")
          }
          q.awaitTermination()
        }
        named(c.where(col("c_custkey") % 3 =!= 0))
          .write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          named(c.where(col("c_custkey") % 3 === 0))
            .write.mode("append").parquet(landing)
          processAvailable()
        }
        val qs = c.where(col("c_custkey") % 89 === 1)
          .select(col("c_custkey").cast("long").as("qid"),
            concat(substring(lower(col("c_name")), 1, 2),
              expr("substring(lower(c_name), 4)")).as("qnm"))
        Retrieval.trigramTopKFromPostings(
          s.read.parquet(s"$base/postings/v1"),
          qs, col("qid"), col("qnm"), k = 3, maxDf = 256L)
      },
      """WITH tgt AS (SELECT c_custkey::BIGINT AS id, lower(c_name) AS nm FROM customer),
        |q AS (SELECT c_custkey::BIGINT AS qid,
        |  substr(lower(c_name), 1, 2) || substr(lower(c_name), 4) AS nm
        |  FROM customer WHERE c_custkey % 89 = 1),
        |ttg AS (SELECT id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(nm) - 2), i -> substr(nm, i, 3)))) AS t3
        |  FROM tgt WHERE len(nm) >= 3
        |  UNION ALL SELECT id, nm FROM tgt WHERE len(nm) BETWEEN 1 AND 2),
        |qtg AS (SELECT qid, unnest(list_distinct(list_transform(
        |    generate_series(1, len(nm) - 2), i -> substr(nm, i, 3)))) AS t3
        |  FROM q WHERE len(nm) >= 3
        |  UNION ALL SELECT qid, nm FROM q WHERE len(nm) BETWEEN 1 AND 2),
        |tsz AS (SELECT id, COUNT(*)::BIGINT AS tn FROM ttg GROUP BY 1),
        |qsz AS (SELECT qid, COUNT(*)::BIGINT AS qn FROM qtg GROUP BY 1),
        |keep AS (SELECT t3 FROM (SELECT t3, COUNT(*)::BIGINT AS df FROM ttg GROUP BY 1)
        |  WHERE df <= 256),
        |cand AS (SELECT DISTINCT qid, id
        |  FROM qtg JOIN keep USING (t3) JOIN ttg USING (t3)),
        |inter AS (SELECT c.qid, c.id, COUNT(*)::BIGINT AS inter
        |  FROM cand c JOIN qtg ON qtg.qid = c.qid
        |  JOIN ttg ON ttg.id = c.id AND ttg.t3 = qtg.t3
        |  GROUP BY 1, 2),
        |sc AS (SELECT i.qid, i.id, i.inter,
        |  i.inter::DOUBLE / (qn + tn - i.inter)::DOUBLE AS score
        |  FROM inter i JOIN qsz USING (qid) JOIN tsz USING (id))
        |SELECT qid, id AS target_id, inter, score, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id)::BIGINT AS rank
        |  FROM sc) WHERE rank <= 3""".stripMargin),

    // POSTING-STORE COMPACTION (round-12): the maintenance event the
    // O(delta) append lifecycle needs. Each streaming micro-batch
    // writes ONLY its own posting files (nothing existing is read or
    // rewritten — contrast q234's merged-version write, which pays
    // O(index) per batch), so the file count grows one batch-worth per
    // trigger until Snapshot.compactFiles packs the small files: the
    // manifest-level commitCompact arithmetic (q182/q208) with the
    // ROWS of packed files remapped through the same
    // Layout.compactionPlan prefix sum, kept files untouched. The
    // gate: search served from the COMPACTED rows equals the
    // full-rebuild oracle (compaction is invisible to queries), and
    // the file counts before/after ride the same hash-checked row.
    decl("q240_posting_store_compaction",
      (s, d) => {
        val tag = Q.scratchTag(d)
        val base = s"/tmp/graft_q240_$tag"
        val fs = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(base), true)
        val landing = s"$base/landing"
        fs.mkdirs(new org.apache.hadoop.fs.Path(landing))
        val c = t(s, d, "customer")
        def named(df: org.apache.spark.sql.DataFrame) =
          df.select(col("c_custkey").cast("long").as("id"),
            lower(col("c_name")).as("nm"))
        def processAvailable(): Unit = {
          val stream = s.readStream.schema("id LONG, nm STRING")
            .option("maxFilesPerTrigger", "10000").parquet(landing)
          val q = graft.streaming.StatementStream.foreachBatchSink(
            stream, s"$base/ck",
            trigger = Some(org.apache.spark.sql.streaming.Trigger.AvailableNow())) {
            (batch, bid) =>
              // the batch's own postings, hash-packed into a few fresh
              // files — the base load gets 2 big files, every delta
              // batch 6 small ones (the accumulation compaction bounds)
              val nf = if (bid == 0L) 2L else 6L
              val off = if (bid == 0L) 0L else 2L + (bid - 1L) * 6L
              graft.operators.Retrieval.trigramIndex(batch, col("id"), col("nm"))
                .withColumn("file_id", lit(off) +
                  pmod(graft.operators.Dedup.hash60(
                    concat(lit("pf|"), col("id").cast("string"))), lit(nf)))
                .write.mode("overwrite").parquet(s"$base/postings/batch$bid")
          }
          q.awaitTermination()
        }
        named(c.where(pmod(col("c_custkey"), lit(5)).isin(0L, 4L)))
          .write.mode("append").parquet(landing)
        Q.withStreamStatePartitions(s, landing) {
          processAvailable()
          named(c.where(pmod(col("c_custkey"), lit(5)).isin(1L, 2L)))
            .write.mode("append").parquet(landing)
          processAvailable()
          named(c.where(pmod(col("c_custkey"), lit(5)) === 3L))
            .write.mode("append").parquet(landing)
          processAvailable()
        }
        val rows = s.read.parquet(s"$base/postings/batch*")
        val m = graft.operators.Snapshot.manifestEntriesBy(
            rows, col("file_id"), col("t3"), 4L)
          .select("file_id", "n_rows", "min_key", "max_key")
        val (m5, rows5) = graft.operators.Snapshot.compactFiles(
          rows, m, col("t3"), smallRows = 2500L, targetRows = 6000L,
          version = 5L)
        val totals = broadcast(m.agg(count(lit(1)).as("files_before"))
          .crossJoin(m5.agg(count(lit(1)).as("files_after"),
            sum(col("n_rows")).as("rows_live"))))
        val qs = c.where(col("c_custkey") % 89 === 1)
          .select(col("c_custkey").cast("long").as("qid"),
            concat(substring(lower(col("c_name")), 1, 2),
              expr("substring(lower(c_name), 4)")).as("qnm"))
        Retrieval.trigramTopKFromPostings(rows5.select(col("id"), col("t3")),
            qs, col("qid"), col("qnm"), k = 3, maxDf = 256L)
          .crossJoin(totals)
      },
      s"""WITH tgt AS (SELECT c_custkey::BIGINT AS id, lower(c_name) AS nm FROM customer),
        |q AS (SELECT c_custkey::BIGINT AS qid,
        |  substr(lower(c_name), 1, 2) || substr(lower(c_name), 4) AS nm
        |  FROM customer WHERE c_custkey % 89 = 1),
        |ttg AS (SELECT id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(nm) - 2), i -> substr(nm, i, 3)))) AS t3
        |  FROM tgt WHERE len(nm) >= 3
        |  UNION ALL SELECT id, nm FROM tgt WHERE len(nm) BETWEEN 1 AND 2),
        |qtg AS (SELECT qid, unnest(list_distinct(list_transform(
        |    generate_series(1, len(nm) - 2), i -> substr(nm, i, 3)))) AS t3
        |  FROM q WHERE len(nm) >= 3
        |  UNION ALL SELECT qid, nm FROM q WHERE len(nm) BETWEEN 1 AND 2),
        |tsz AS (SELECT id, COUNT(*)::BIGINT AS tn FROM ttg GROUP BY 1),
        |qsz AS (SELECT qid, COUNT(*)::BIGINT AS qn FROM qtg GROUP BY 1),
        |keep AS (SELECT t3 FROM (SELECT t3, COUNT(*)::BIGINT AS df FROM ttg GROUP BY 1)
        |  WHERE df <= 256),
        |cand AS (SELECT DISTINCT qid, id
        |  FROM qtg JOIN keep USING (t3) JOIN ttg USING (t3)),
        |inter AS (SELECT c.qid, c.id, COUNT(*)::BIGINT AS inter
        |  FROM cand c JOIN qtg ON qtg.qid = c.qid
        |  JOIN ttg ON ttg.id = c.id AND ttg.t3 = qtg.t3
        |  GROUP BY 1, 2),
        |sc AS (SELECT i.qid, i.id, i.inter,
        |  i.inter::DOUBLE / (qn + tn - i.inter)::DOUBLE AS score
        |  FROM inter i JOIN qsz USING (qid) JOIN tsz USING (id)),
        |pf AS (SELECT id, t3,
        |    CASE WHEN id % 5 IN (0, 4) THEN h % 2
        |         WHEN id % 5 IN (1, 2) THEN 2 + (h % 6)
        |         ELSE 8 + (h % 6) END AS file_id
        |  FROM (SELECT id, t3, ${sqlHash60("('pf|' || id::VARCHAR)")} AS h FROM ttg)),
        |m AS (SELECT file_id, COUNT(*)::BIGINT AS n_rows FROM pf GROUP BY 1),
        |fb AS (SELECT COUNT(*)::BIGINT AS files_before FROM m),
        |pk AS (SELECT file_id, n_rows,
        |    COALESCE(SUM(n_rows) OVER (ORDER BY file_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS strt
        |  FROM m WHERE n_rows < 2500),
        |grp AS (SELECT (strt // 6000)::BIGINT AS g, SUM(n_rows)::BIGINT AS n_rows
        |  FROM pk GROUP BY 1),
        |m5 AS (SELECT n_rows FROM m WHERE n_rows >= 2500
        |  UNION ALL SELECT n_rows FROM grp),
        |fa AS (SELECT COUNT(*)::BIGINT AS files_after,
        |  SUM(n_rows)::BIGINT AS rows_live FROM m5)
        |SELECT qid, target_id, inter, score, rank,
        |  files_before, files_after, rows_live FROM (
        |  SELECT qid, id AS target_id, inter, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, id)::BIGINT AS rank
        |  FROM sc) CROSS JOIN fb CROSS JOIN fa WHERE rank <= 3""".stripMargin),

    // The composed fuzzy-match API (round-11): trigram candidate
    // generation (the q211 index) ranked by the NATIVE codegen'd
    // Jaro–Winkler expression (graft.functions.expr.JaroWinkler — a
    // two-pointer match scan no built-in HOF can express without
    // leaving whole-stage codegen). The implementation is byte-matched
    // to DuckDB's jaro_winkler_similarity (classic Winkler: 0.7 boost
    // threshold, prefix cap 4, floor'd transposition halves, empty→0),
    // so the oracle replays candidate generation AND scoring; a 6-dp
    // barrier absorbs division-order ulps. At scale this is the
    // matching-service shape: index prunes, comparator ranks — never
    // query×corpus.
    decl("q213_fuzzy_match_jw",
      (s, d) => {
        val c = t(s, d, "customer")
        val targets = c.select(col("c_custkey").cast("long").as("id"),
          lower(col("c_name")).as("nm"))
        val qs = c.where(col("c_custkey") % 89 === 1)
          .select(col("c_custkey").cast("long").as("qid"),
            concat(substring(lower(col("c_name")), 1, 2),
              expr("substring(lower(c_name), 4)")).as("qnm"))
        val cand = Retrieval.trigramCandidates(targets, col("id"), col("nm"),
          qs, col("qid"), col("qnm"), maxDf = 256L)
        val scored = cand.join(qs, "qid").join(targets, "id")
          .withColumn("jw", graft.functions.Names.jaroWinkler(col("qnm"), col("nm"))
            .cast("decimal(10,6)").cast("double"))
        val w = Window.partitionBy("qid").orderBy(col("jw").desc, col("id"))
        scored.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
          .select(col("qid"), col("id").as("target_id"), col("jw"),
            col("rank").cast("long").as("rank"))
      },
      """WITH tgt AS (SELECT c_custkey::BIGINT AS id, lower(c_name) AS nm FROM customer),
        |q AS (SELECT c_custkey::BIGINT AS qid,
        |  substr(lower(c_name), 1, 2) || substr(lower(c_name), 4) AS nm
        |  FROM customer WHERE c_custkey % 89 = 1),
        |ttg AS (SELECT id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(nm) - 2), i -> substr(nm, i, 3)))) AS t3
        |  FROM tgt WHERE len(nm) >= 3
        |  UNION ALL SELECT id, nm FROM tgt WHERE len(nm) BETWEEN 1 AND 2),
        |qtg AS (SELECT qid, unnest(list_distinct(list_transform(
        |    generate_series(1, len(nm) - 2), i -> substr(nm, i, 3)))) AS t3
        |  FROM q WHERE len(nm) >= 3
        |  UNION ALL SELECT qid, nm FROM q WHERE len(nm) BETWEEN 1 AND 2),
        |keep AS (SELECT t3 FROM (SELECT t3, COUNT(*)::BIGINT AS df FROM ttg GROUP BY 1)
        |  WHERE df <= 256),
        |cand AS (SELECT DISTINCT qid, id
        |  FROM qtg JOIN keep USING (t3) JOIN ttg USING (t3)),
        |sc AS (SELECT c.qid, c.id,
        |  CAST(jaro_winkler_similarity(q.nm, t.nm) AS DECIMAL(10,6))::DOUBLE AS jw
        |  FROM cand c JOIN q ON q.qid = c.qid JOIN tgt t ON t.id = c.id)
        |SELECT qid, id AS target_id, jw, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY jw DESC, id)::BIGINT AS rank
        |  FROM sc) WHERE rank <= 3""".stripMargin),

    // DSIR importance weights, target = English: planted per-language
    // marker tokens make the language distributions genuinely differ,
    // so en docs score positive and others negative — the sign
    // structure (not just the arithmetic) is oracle-checked.
    decl("q134_dsir_weights",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"),
          concat(col("text"), lit(" m_"), col("lang"), lit(" m_"), col("lang"),
            lit(" t_"), col("lang")).as("pt"),
          (col("lang") === "en").as("tgt"))
        Retrieval.dsirWeights(docs, col("doc_id"), col("pt"), col("tgt"),
          n = 1, buckets = 64)
      },
      s"""WITH d0 AS (SELECT doc_id,
         |  text || ' m_' || lang || ' m_' || lang || ' t_' || lang AS pt,
         |  lang = 'en' AS is_target FROM documents),
         |tk AS (SELECT doc_id, is_target, unnest(string_split(pt, ' ')) AS term FROM d0),
         |f AS (SELECT doc_id, is_target, ${sqlHash60("term")} % 64 AS bucket,
         |      COUNT(*)::BIGINT AS c FROM tk GROUP BY 1, 2, 3),
         |bs AS (SELECT bucket,
         |       SUM(CASE WHEN is_target THEN c ELSE 0 END)::BIGINT AS ct,
         |       SUM(c)::BIGINT AS cr FROM f GROUP BY 1),
         |tot AS (SELECT SUM(ct)::BIGINT AS tt, SUM(cr)::BIGINT AS tr FROM bs)
         |SELECT f.doc_id AS doc_id, f.is_target AS is_target,
         |  SUM(f.c)::BIGINT AS n_feats,
         |  CAST(CAST(SUM(f.c *
         |    ((ln(bs.ct + 1.0) - ln(tot.tt + 64.0)) - (ln(bs.cr + 1.0) - ln(tot.tr + 64.0))))
         |    AS DECIMAL(12,4)) AS DOUBLE) AS weight
         |FROM f JOIN bs USING (bucket), tot GROUP BY 1, 2""".stripMargin),

    // Mixture-planned stratified sample: sqrt-temperature token-mass
    // quotas over languages, smallest-salted-hash pick per stratum with
    // the 4x hash-space threshold prefilter in-spec (the oracle applies
    // the same filter, so exactness is unconditional).
    // Weighted sampling WITHOUT replacement (round-11, Efraimidis &
    // Spirakis): token-mass-weighted per-language document draws via
    // exponential arrival keys −ln(u)/w from salted hashes — one
    // projection + per-stratum top-m window, no reservoir state, and
    // the key construction is hash-deterministic so any engine, retry
    // or executor count draws the SAME sample. The oracle rebuilds u,
    // the keys and the ranking from scratch; the DECIMAL(28,9) barrier
    // puts ln/division ulps far below the ranking grain.
    decl("q218_weighted_sample",
      (s, d) => {
        val docs = t(s, d, "documents")
        Sampling.weightedSample(docs, col("doc_id"), col("lang"),
          size(split(col("text"), " ")), "es", m = 20)
          .select(col("id"), col("stratum"), col("weight"),
            col("key").cast("double").as("key"), col("pick_rank"))
      },
      s"""WITH b AS (SELECT doc_id AS id, lang AS stratum,
         |  len(string_split(text, ' '))::DOUBLE AS weight FROM documents
         |  WHERE len(string_split(text, ' ')) > 0),
         |k AS (SELECT id, stratum, weight,
         |  CAST(-ln((${sqlHash60("('es|' || id::VARCHAR)")}::DOUBLE + 1.0)
         |    / 1152921504606846976.0) / weight AS DECIMAL(28,9)) AS key FROM b)
         |SELECT id, stratum, weight, key::DOUBLE AS key, pick_rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY stratum
         |    ORDER BY key, id)::BIGINT AS pick_rank FROM k)
         |WHERE pick_rank <= 20""".stripMargin),

    decl("q135_mixture_sample",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        Sampling.mixtureSample(docs, col("doc_id"), col("lang"), col("tok"),
          "mix", budget = 100)
          .select(col("id").as("doc_id"), col("stratum").as("lang"),
            col("stratum_docs"), col("stratum_tokens"), col("quota"),
            col("pick_rank"))
      },
      s"""WITH b AS (SELECT doc_id, lang,
         |  len(string_split(text, ' '))::BIGINT AS tok FROM documents),
         |st AS (SELECT lang, COUNT(*)::BIGINT AS stratum_docs,
         |       SUM(tok)::BIGINT AS stratum_tokens FROM b GROUP BY 1),
         |tot AS (SELECT SUM(sqrt(stratum_tokens::DOUBLE)) AS t FROM st),
         |qs AS (SELECT st.*, floor(100.0 * sqrt(stratum_tokens::DOUBLE) / tot.t + 0.5)::BIGINT AS quota
         |       FROM st, tot),
         |qt AS (SELECT *, floor(least(1.0, 4.0 * quota::DOUBLE / stratum_docs::DOUBLE)
         |       * 1152921504606846976.0)::BIGINT AS thr FROM qs),
         |h AS (SELECT doc_id, lang, ${sqlHash60("('mix|' || doc_id::VARCHAR)")} AS h FROM b),
         |f AS (SELECT h.doc_id AS doc_id, h.lang AS lang, qt.stratum_docs AS stratum_docs,
         |      qt.stratum_tokens AS stratum_tokens, qt.quota AS quota, h.h AS h
         |      FROM h JOIN qt USING (lang) WHERE h.h < qt.thr),
         |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)::BIGINT AS pick_rank
         |      FROM f)
         |SELECT doc_id, lang, stratum_docs, stratum_tokens, quota, pick_rank
         |FROM r WHERE pick_rank <= quota""".stripMargin),

    // Cluster-balanced mixture sampling (the domain-mixing shape of
    // DoReMi/D4-style curation, with k-means domains instead of given
    // labels): train the deterministic spherical k-means (q93's
    // trainer, 2 Lloyd rounds), label every embedding with its cell
    // (one min_by partial aggregate), and allocate a 60-doc budget
    // across the LEARNED domains by sqrt-temperature token mass with
    // the smallest-salted-hash pick. The oracle unrolls both Lloyd
    // rounds, the assignment, and the full quota arithmetic — trained
    // clusters, not given strata, drive the sample.
    decl("q146_cluster_mixture",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val corpus = e.select(col("vec_id"), col("embedding"))
        val seed = e.filter(col("vec_id") % 50 === 7)
          .select(col("vec_id"), col("embedding"))
        val trained = Similarity.kmeansCentroids(corpus, seed, dim = 64,
          maxIterations = 2, earlyStop = false)
        val assigned = Similarity.cellAssignments(corpus, trained)
        val toks = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
        Sampling.mixtureSample(
          assigned.join(toks, col("id") === col("doc_id")),
          col("id"), col("centroid_id"), col("n_chars"),
          "clustermix", budget = 60)
          .select(col("id").as("vec_id"), col("stratum").as("centroid_id"),
            col("stratum_docs"), col("stratum_tokens"), col("quota"),
            col("pick_rank"))
      },
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c0 AS (SELECT vec_id AS centroid_id, v AS cvec FROM e WHERE vec_id % 50 = 7),
         |a1 AS (
         |  SELECT id, vec, centroid_id FROM (
         |    SELECT e.vec_id AS id, e.v AS vec, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.centroid_id) AS crank
         |    FROM e CROSS JOIN c0 c)
         |  WHERE crank = 1),
         |c1 AS (
         |  SELECT centroid_id,
         |    list_transform(generate_series(1, 64),
         |      d -> list_reduce(list_transform(vs, x -> x[d]),
         |             (acc, x) -> acc + x) / len(vs)) AS cvec
         |  FROM (SELECT centroid_id, list(vec ORDER BY id) AS vs
         |        FROM a1 GROUP BY centroid_id)),
         |a2 AS (
         |  SELECT id, vec, centroid_id FROM (
         |    SELECT e.vec_id AS id, e.v AS vec, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.centroid_id) AS crank
         |    FROM e CROSS JOIN c1 c)
         |  WHERE crank = 1),
         |c2 AS (
         |  SELECT centroid_id,
         |    list_transform(generate_series(1, 64),
         |      d -> list_reduce(list_transform(vs, x -> x[d]),
         |             (acc, x) -> acc + x) / len(vs)) AS cvec
         |  FROM (SELECT centroid_id, list(vec ORDER BY id) AS vs
         |        FROM a2 GROUP BY centroid_id)),
         |asg AS (
         |  SELECT id, centroid_id FROM (
         |    SELECT e.vec_id AS id, c.centroid_id,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.centroid_id) AS crank
         |    FROM e CROSS JOIN c2 c)
         |  WHERE crank = 1),
         |b AS (SELECT a.id AS doc_id, a.centroid_id AS stratum, d.n_chars::BIGINT AS tok
         |      FROM asg a JOIN documents d ON a.id = d.doc_id),
         |st AS (SELECT stratum, COUNT(*)::BIGINT AS stratum_docs,
         |       SUM(tok)::BIGINT AS stratum_tokens FROM b GROUP BY 1),
         |tot AS (SELECT SUM(sqrt(stratum_tokens::DOUBLE)) AS t FROM st),
         |qs AS (SELECT st.*, floor(60.0 * sqrt(stratum_tokens::DOUBLE) / tot.t + 0.5)::BIGINT AS quota
         |       FROM st, tot),
         |qt AS (SELECT *, floor(least(1.0, 4.0 * quota::DOUBLE / stratum_docs::DOUBLE)
         |       * 1152921504606846976.0)::BIGINT AS thr FROM qs),
         |h AS (SELECT doc_id, stratum, ${sqlHash60("('clustermix|' || doc_id::VARCHAR)")} AS h FROM b),
         |f AS (SELECT h.doc_id AS doc_id, h.stratum AS stratum, qt.stratum_docs AS stratum_docs,
         |      qt.stratum_tokens AS stratum_tokens, qt.quota AS quota, h.h AS h
         |      FROM h JOIN qt USING (stratum) WHERE h.h < qt.thr),
         |r AS (SELECT *, row_number() OVER (PARTITION BY stratum ORDER BY h, doc_id)::BIGINT AS pick_rank
         |      FROM f)
         |SELECT doc_id AS vec_id, stratum AS centroid_id, stratum_docs, stratum_tokens,
         |  quota, pick_rank
         |FROM r WHERE pick_rank <= quota""".stripMargin),

    // Deterministic systematic resampling to exactly 2000 copies:
    // integer weights = token count, +40 planted upweight for English,
    // zeroed on doc_id%41==6 (the zero-copy path). The oracle replays
    // the all-integer boundary arithmetic on a plain global cumsum —
    // proving the two-phase prefix decomposition AND that no copy
    // drifts across a boundary in either engine.
    decl("q138_systematic_resample",
      (s, d) => {
        val tok = size(split(col("text"), " ")).cast("long")
        val w = when(col("doc_id") % 41 === 6, lit(0L))
          .otherwise(tok + when(col("lang") === "en", lit(40L)).otherwise(lit(0L)))
        Sampling.systematicResample(
          t(s, d, "documents").select(col("doc_id"), w.as("w0")),
          col("doc_id"), col("w0"), m = 2000L)
      },
      """WITH b AS (SELECT doc_id,
        |  CASE WHEN doc_id % 41 = 6 THEN 0
        |       ELSE len(string_split(text, ' '))
        |            + CASE WHEN lang = 'en' THEN 40 ELSE 0 END END::BIGINT AS w
        |  FROM documents),
        |r AS (SELECT doc_id, w,
        |      SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS c FROM b),
        |t AS (SELECT SUM(w)::BIGINT AS t FROM b)
        |SELECT doc_id, w,
        |  (least(2000, (greatest(2 * 2000 * c - t.t, 0) + 2 * t.t - 1) // (2 * t.t))
        |   - least(2000, (greatest(2 * 2000 * (c - w) - t.t, 0) + 2 * t.t - 1) // (2 * t.t)))::BIGINT AS n_copies
        |FROM r, t""".stripMargin),

    // Reciprocal-rank fusion of the two retrieval modalities: BM25
    // lexical top-10 (q133's machinery) and exact-cosine semantic
    // top-10 over the embeddings, fused per (query, doc) as
    // 1/(60+r_lex) + 1/(60+r_sem) — the standard RRF constant. Rank
    // lists are integers, RRF terms are exact IEEE reciprocals of
    // integers, and the fused ordering tie-breaks by doc id, so the
    // fusion is engine-portable without any tolerance. The full-outer
    // join shape is the production one: neither ranker's misses block
    // the other's hits.
    //
    // ROLE + SCOPE (round-10): this is the exact-cosine RECALL
    // BASELINE for q179's production LSH arm, so its query set is
    // capped at the first 100 %37==3 ids — the exact arm then costs
    // O(100·n), a measurement of recall-baseline quality rather than a
    // deliberately-quadratic (n²/37) bench member. At the sf0.01 gate
    // the cap does not bind (≈13 queries), so oracle semantics are
    // unchanged; at the 25× stress point it caps 1350 queries at 100.
    decl("q169_rrf_fusion",
      (s, d) => {
        val docs = t(s, d, "documents")
        val qs = docs.where(col("doc_id") % 37 === 3)
          .orderBy(col("doc_id")).limit(100)
          .select(col("doc_id").as("qid"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qt"))
        val lex = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
            qs, col("qid"), col("qt"), n = 3, k = 10)
          .select(col("qid"), col("doc_id"), col("rank").as("r_lex"))
        val e = t(s, d, "embeddings")
        val sem = Similarity.cosineTopK(
            e.where(col("vec_id") % 37 === 3).orderBy(col("vec_id")).limit(100)
              .select(col("vec_id"), col("embedding")),
            e.select(col("vec_id"), col("embedding")), k = 10)
          .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
            col("rank").as("r_sem"))
        val fused = lex.join(sem, Seq("qid", "doc_id"), "full_outer")
          .withColumn("rrf",
            (coalesce(lit(1.0) / (lit(60L) + col("r_lex")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60L) + col("r_sem")), lit(0.0)))
              .cast("decimal(12,8)").cast("double"))
          .withColumn("rank_fused", row_number().over(
            Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id")))
            .cast("long"))
          .where(col("rank_fused") <= 5)
        fused.select(col("qid"), col("doc_id"),
          coalesce(col("r_lex"), lit(0L)).as("r_lex"),
          coalesce(col("r_sem"), lit(0L)).as("r_sem"),
          col("rrf"), col("rank_fused"))
      },
      bm25Ctes(" ORDER BY doc_id LIMIT 100") + """,
        |lex AS (SELECT qid, doc_id, rank AS r_lex FROM (
        |  SELECT qid, doc_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::BIGINT AS rank
        |  FROM sc) WHERE rank <= 10),
        |qe AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
        |       WHERE vec_id % 37 = 3 ORDER BY vec_id LIMIT 100),
        |ce AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS nv FROM embeddings),
        |semsc AS (SELECT qid, nid, list_cosine_similarity(qv, nv) AS cos
        |          FROM qe, ce WHERE qid != nid),
        |sem AS (SELECT qid, nid AS doc_id, rnk AS r_sem FROM (
        |  SELECT qid, nid,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)::BIGINT AS rnk
        |  FROM semsc) WHERE rnk <= 10),
        |fu AS (SELECT COALESCE(lex.qid, sem.qid) AS qid,
        |       COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
        |       COALESCE(r_lex, 0)::BIGINT AS r_lex, COALESCE(r_sem, 0)::BIGINT AS r_sem,
        |       CAST(CAST(COALESCE(1.0 / (60 + r_lex), 0) + COALESCE(1.0 / (60 + r_sem), 0)
        |         AS DECIMAL(12,8)) AS DOUBLE) AS rrf
        |       FROM lex FULL OUTER JOIN sem
        |         ON lex.qid = sem.qid AND lex.doc_id = sem.doc_id)
        |SELECT qid, doc_id, r_lex, r_sem, rrf, rank_fused FROM (
        |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id)::BIGINT AS rank_fused
        |  FROM fu) WHERE rank_fused <= 5""".stripMargin),

    // RRF over the SCALE-SAFE semantic arm: identical fusion arithmetic
    // to q169, but the semantic ranker is the RECALL-CONTRACTED router
    // (Similarity.cosineTopKAnnAuto) instead of q169's brute-force
    // all-pairs cosine. The declared contract is (cosTarget = 0.35,
    // recall = 0.9) — 0.35 because that is the measured cosine level of
    // this corpus's true top-10 neighbors (STRESS.md recall table), so
    // the contract covers the neighbors the fusion actually serves, not
    // just the easy cos≈1 near-dups. BOTH sizing axes now come from the
    // data: planesFor(n) holds bucket occupancy (cost) constant,
    // tablesNeeded(planes, 0.35, 0.9) holds recall at the declared
    // similarity level, and when that table count exceeds the measured
    // LSH-viability bound (8 tables — see cosineTopKAnnAuto's derating
    // rationale) the router switches to the trained IVF index rather
    // than serving silently-degraded recall (the round-10 verdict's
    // one `weak`, closed here with the decade contract-level recall
    // measured at 0.953/1.000/1.000). Candidate volume stays ∝ n·targetBucket·tables, not
    // |queries|×|corpus|, so the fused plan survives the 100× scale-up
    // where q169's exact arm (kept as the recall baseline) is n²/37.
    // The oracle bakes the sized plane literals for the sf0.01 corpus
    // (n=500 → planes=2, tables=tablesFor(2, 0.35, 0.9)=5) from the
    // same Scala sizing functions, exactly as q188 does — the
    // oracle-shaped plan IS the production-shaped plan.
    decl("q179_rrf_fusion_ann",
      (s, d) => {
        val docs = t(s, d, "documents")
        val qs = docs.where(col("doc_id") % 37 === 3)
          .select(col("doc_id").as("qid"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qt"))
        val lex = Retrieval.bm25TopK(docs, col("doc_id"), col("text"),
            qs, col("qid"), col("qt"), n = 3, k = 10)
          .select(col("qid"), col("doc_id"), col("rank").as("r_lex"))
        val e = t(s, d, "embeddings")
        val sem = Similarity.cosineTopKAnnAuto(
            e.where(col("vec_id") % 37 === 3).select(col("vec_id"), col("embedding")),
            e.select(col("vec_id"), col("embedding")),
            k = 10, dim = 64, targetBucketSize = 128,
            cosTarget = 0.35, recall = 0.9)
          .select(col("query_id").as("qid"), col("neighbor_id").as("doc_id"),
            col("rank").as("r_sem"))
        val fused = lex.join(sem, Seq("qid", "doc_id"), "full_outer")
          .withColumn("rrf",
            (coalesce(lit(1.0) / (lit(60L) + col("r_lex")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60L) + col("r_sem")), lit(0.0)))
              .cast("decimal(12,8)").cast("double"))
          .withColumn("rank_fused", row_number().over(
            Window.partitionBy("qid").orderBy(col("rrf").desc, col("doc_id")))
            .cast("long"))
          .where(col("rank_fused") <= 5)
        fused.select(col("qid"), col("doc_id"),
          coalesce(col("r_lex"), lit(0L)).as("r_lex"),
          coalesce(col("r_sem"), lit(0L)).as("r_sem"),
          col("rrf"), col("rank_fused"))
      },
      {
        // the multi-table signature CTE mirrors Similarity
        // .tableBucketsCol bit-for-bit (q107's oracle pattern), with
        // the plane count SIZED for the sf0.01 corpus exactly as the
        // runtime auto-sizing computes it (500 embeddings → 2 planes)
        val autoPlanes = Similarity.planesFor(500L, 128)
        val autoTables = Similarity.tablesFor(autoPlanes, 0.35, 0.9)
        val mtTables = (0 until autoTables).map { tbl =>
          val bits = (0 until autoPlanes).map { p =>
            val abs = tbl * autoPlanes + p
            val plane = (0 until 64)
              .map(dd => if (Similarity.planeSign(abs, dd) > 0) "1.0" else "-1.0")
              .mkString("[", ",", "]")
            s"(CASE WHEN list_inner_product(v, $plane::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
          }.mkString(" + ")
          s"SELECT vec_id, v, $tbl AS tbl, $bits AS bits FROM e"
        }.mkString("\n  UNION ALL\n  ")
        bm25Ctes() + s""",
          |lex AS (SELECT qid, doc_id, rank AS r_lex FROM (
          |  SELECT qid, doc_id,
          |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id)::BIGINT AS rank
          |  FROM sc) WHERE rank <= 10),
          |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
          |mtb AS (
          |  $mtTables),
          |cand AS (
          |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
          |  FROM mtb q JOIN mtb c ON q.tbl = c.tbl AND q.bits = c.bits
          |  WHERE q.vec_id % 37 = 3 AND q.vec_id != c.vec_id),
          |semsc AS (SELECT qid, nid, list_cosine_similarity(eq.v, en.v) AS cos
          |          FROM cand JOIN e eq ON cand.qid = eq.vec_id
          |                    JOIN e en ON cand.nid = en.vec_id),
          |sem AS (SELECT qid, nid AS doc_id, rnk AS r_sem FROM (
          |  SELECT qid, nid,
          |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid)::BIGINT AS rnk
          |  FROM semsc) WHERE rnk <= 10),
          |fu AS (SELECT COALESCE(lex.qid, sem.qid) AS qid,
          |       COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
          |       COALESCE(r_lex, 0)::BIGINT AS r_lex, COALESCE(r_sem, 0)::BIGINT AS r_sem,
          |       CAST(CAST(COALESCE(1.0 / (60 + r_lex), 0) + COALESCE(1.0 / (60 + r_sem), 0)
          |         AS DECIMAL(12,8)) AS DOUBLE) AS rrf
          |       FROM lex FULL OUTER JOIN sem
          |         ON lex.qid = sem.qid AND lex.doc_id = sem.doc_id)
          |SELECT qid, doc_id, r_lex, r_sem, rrf, rank_fused FROM (
          |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rrf DESC, doc_id)::BIGINT AS rank_fused
          |  FROM fu) WHERE rank_fused <= 5""".stripMargin
      }),

    // ANN RECALL is now a gate, not just a probe: recall@10 of q179's
    // production arm (auto-sized multi-table sign-LSH) against the
    // exact top-10, per query, hash-checked — so the sublinear fusion
    // cannot silently trade recall for speed as the corpus grows (the
    // round-9 ProbeAnnRecall finding, promoted per the verdict). The
    // oracle replays BOTH arms: brute-force cosine ranking and the
    // sized-plane LSH candidates (the q179 bake), then the per-query
    // found/exact counts and the decimal-quantized ratio.
    decl("q186_ann_recall_gate",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val corpus = e.select(col("vec_id"), col("embedding"))
        // the same pinned-100 query cap as q169: BOTH arms run the
        // identical query set, so recall@10 is well-defined while the
        // exact arm stays O(100·n) at any corpus size (uncapped it
        // would be the n²/37 member q169's re-scope just removed)
        val qs = e.where(col("vec_id") % 37 === 3)
          .orderBy(col("vec_id")).limit(100)
          .select(col("vec_id"), col("embedding"))
        val exact = Similarity.cosineTopK(qs, corpus, k = 10)
          .select(col("query_id"), col("neighbor_id"))
        // the arm under measurement is EXACTLY the production router
        // q179 now runs, with q179's declared (0.35, 0.9) contract —
        // the gate gates what production serves (round-10 verdict #1)
        val approx = Similarity.cosineTopKAnnAuto(qs, corpus,
            k = 10, dim = 64, targetBucketSize = 128,
            cosTarget = 0.35, recall = 0.9)
          .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
        exact.join(approx, Seq("query_id", "neighbor_id"), "left")
          .groupBy(col("query_id"))
          .agg(count(lit(1)).as("n_exact"),
            sum(coalesce(col("hit"), lit(0L))).as("n_found"))
          .select(col("query_id"), col("n_exact"), col("n_found"),
            (col("n_found").cast("double") / col("n_exact").cast("double"))
              .cast("decimal(12,6)").cast("double").as("recall"))
      },
      {
        val autoPlanes = Similarity.planesFor(500L, 128)
        val autoTables = Similarity.tablesFor(autoPlanes, 0.35, 0.9)
        val mtTables = (0 until autoTables).map { tbl =>
          val bits = (0 until autoPlanes).map { p =>
            val abs = tbl * autoPlanes + p
            val plane = (0 until 64)
              .map(dd => if (Similarity.planeSign(abs, dd) > 0) "1.0" else "-1.0")
              .mkString("[", ",", "]")
            s"(CASE WHEN list_inner_product(v, $plane::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
          }.mkString(" + ")
          s"SELECT vec_id, v, $tbl AS tbl, $bits AS bits FROM e"
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |qe AS (SELECT vec_id AS qid, v AS qv FROM e
           |       WHERE vec_id % 37 = 3 ORDER BY vec_id LIMIT 100),
           |exsc AS (SELECT qid, c.vec_id AS nid,
           |         list_cosine_similarity(qv, c.v) AS cos
           |         FROM qe, e c WHERE c.vec_id != qid),
           |ex AS (SELECT qid, nid FROM (
           |  SELECT qid, nid, row_number() OVER (PARTITION BY qid
           |    ORDER BY cos DESC, nid) AS rnk FROM exsc) WHERE rnk <= 10),
           |mtb AS (
           |  $mtTables),
           |cand AS (
           |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
           |  FROM mtb q JOIN mtb c ON q.tbl = c.tbl AND q.bits = c.bits
           |  JOIN qe ON q.vec_id = qe.qid
           |  WHERE q.vec_id != c.vec_id),
           |apsc AS (SELECT qid, nid, list_cosine_similarity(eq.v, en.v) AS cos
           |         FROM cand JOIN e eq ON cand.qid = eq.vec_id
           |                   JOIN e en ON cand.nid = en.vec_id),
           |ap AS (SELECT qid, nid FROM (
           |  SELECT qid, nid, row_number() OVER (PARTITION BY qid
           |    ORDER BY cos DESC, nid) AS rnk FROM apsc) WHERE rnk <= 10)
           |SELECT ex.qid AS query_id, COUNT(*)::BIGINT AS n_exact,
           |  SUM(CASE WHEN ap.nid IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_found,
           |  CAST(CAST(SUM(CASE WHEN ap.nid IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
           |    / COUNT(*)::DOUBLE AS DECIMAL(12,6)) AS DOUBLE) AS recall
           |FROM ex LEFT JOIN ap ON ex.qid = ap.qid AND ex.nid = ap.nid
           |GROUP BY 1""".stripMargin
      }),

    // BOTH axes of the LSH sizing family on one oracle-gated path:
    // planes from planesFor(n) (cost) AND tables from tablesFor
    // (recall at the declared similarity target) — the q186/round-9
    // recall-decay finding as a production entry point instead of a
    // caller-pinned table count. At the sf0.01 gate the sizing
    // resolves to planes=2, tables=2 (cos-0.9 neighbors at 90%
    // recall); the oracle bakes exactly those literals, computed from
    // the same Scala functions (the q179/q180 bake pattern).
    decl("q188_ann_recall_sized",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.cosineTopKLshAutoRecall(
          e.where(col("vec_id") % 37 === 3).select(col("vec_id"), col("embedding")),
          e.select(col("vec_id"), col("embedding")),
          k = 10, dim = 64, targetBucketSize = 128,
          cosTarget = 0.9, recall = 0.9)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"))
      },
      {
        val autoPlanes = Similarity.planesFor(500L, 128)
        val autoTables = Similarity.tablesFor(autoPlanes, 0.9, 0.9)
        val mtTables = (0 until autoTables).map { tbl =>
          val bits = (0 until autoPlanes).map { p =>
            val abs = tbl * autoPlanes + p
            val plane = (0 until 64)
              .map(dd => if (Similarity.planeSign(abs, dd) > 0) "1.0" else "-1.0")
              .mkString("[", ",", "]")
            s"(CASE WHEN list_inner_product(v, $plane::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
          }.mkString(" + ")
          s"SELECT vec_id, v, $tbl AS tbl, $bits AS bits FROM e"
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |mtb AS (
           |  $mtTables),
           |cand AS (
           |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
           |  FROM mtb q JOIN mtb c ON q.tbl = c.tbl AND q.bits = c.bits
           |  WHERE q.vec_id % 37 = 3 AND q.vec_id != c.vec_id),
           |sc2 AS (SELECT qid, nid, list_cosine_similarity(eq.v, en.v) AS cos
           |        FROM cand JOIN e eq ON cand.qid = eq.vec_id
           |                  JOIN e en ON cand.nid = en.vec_id)
           |SELECT qid AS query_id, nid AS neighbor_id, rnk FROM (
           |  SELECT qid, nid, row_number() OVER (PARTITION BY qid
           |    ORDER BY cos DESC, nid) AS rnk FROM sc2)
           |WHERE rnk <= 10""".stripMargin
      })) :+ unigramDecl :+ doremiDecl :+ madDecl :+ neymanAllocDecl :+ neymanSampleDecl :+ quartilesDecl :+ gateDecl :+ ariDecl

  // DoReMi-style mixture reweighting (Xie et al. 2023): per-domain
    // excess loss (chars-per-token proxy vs the corpus-wide reference,
    // decimal-summed means so the excess is order-independent) drives
    // one exponentiated-gradient step + uniform smoothing, then a
    // largest-remainder allocation of a 10k-doc budget — Σ n_alloc ≡
    // budget exactly. The oracle replays every stage: the 4-dp clamp
    // before exp, the DECIMAL(20,8) quantization after it (the one op
    // where libm and the JVM may differ by an ulp), the exact decimal
    // normalizer, and the signed remainder correction. Constants 2.0 /
    // 0.75 / 0.25 are exactly representable, so both engines mix
    // bit-identical doubles. Scale shape: one pass over documents for
    // the per-domain means; everything after is domain-sized.
  private def doremiDecl: Decl =
    decl("q198_doremi_reweight",
      (s, d) => {
        val b = t(s, d, "documents").select(col("source").as("domain"),
          (col("n_chars").cast("double") /
            size(split(col("text"), " ")).cast("double")).as("cpt"))
        val dm = b.groupBy("domain").agg(
          (sum(col("cpt").cast("decimal(30,12)")).cast("double") /
            count(lit(1)).cast("double")).as("ml"))
        val g = broadcast(b.agg(
          (sum(col("cpt").cast("decimal(30,12)")).cast("double") /
            count(lit(1)).cast("double")).as("gl")))
        val ex = dm.crossJoin(g)
          .select(col("domain"), (col("ml") - col("gl")).as("excess"))
        Sampling.doremiReweight(ex, eta = 2.0, smoothing = 0.25,
          budget = 10000L)
      },
      s"""WITH b AS (SELECT source AS domain,
         |  n_chars::DOUBLE / len(string_split(text, ' '))::DOUBLE AS cpt
         |  FROM documents),
         |dm AS (SELECT domain,
         |       CAST(SUM(CAST(cpt AS DECIMAL(30,12))) AS DOUBLE)
         |         / COUNT(*)::DOUBLE AS ml FROM b GROUP BY 1),
         |g AS (SELECT CAST(SUM(CAST(cpt AS DECIMAL(30,12))) AS DOUBLE)
         |      / COUNT(*)::DOUBLE AS gl FROM b),
         |e AS (SELECT domain,
         |      CAST(CAST(greatest(ml - g.gl, 0.0) AS DECIMAL(12,4)) AS DOUBLE)
         |        AS excess FROM dm, g),
         |x AS (SELECT domain, excess,
         |      CAST(exp(CAST(2.0 AS DOUBLE) * excess) AS DECIMAL(20,8)) AS ed
         |      FROM e),
         |n AS (SELECT SUM(ed) AS sm, COUNT(*)::BIGINT AS k FROM x),
         |w AS (SELECT domain, excess,
         |      CAST(CAST(0.75 AS DOUBLE) * (ed::DOUBLE / n.sm::DOUBLE)
         |        + CAST(0.25 AS DOUBLE) / n.k::DOUBLE AS DECIMAL(18,6)) AS w6
         |      FROM x, n),
         |a AS (SELECT domain, excess, w6, w6 * 10000 AS share,
         |      floor(w6 * 10000)::BIGINT AS base FROM w),
         |l AS (SELECT (10000 - SUM(base))::BIGINT AS lft FROM a),
         |r AS (SELECT a.*, (share - base) AS rem,
         |      row_number() OVER (ORDER BY (share - base) DESC, domain ASC)::BIGINT AS ru,
         |      row_number() OVER (ORDER BY (share - base) ASC, domain DESC)::BIGINT AS rd
         |      FROM a)
         |SELECT domain, excess, w6::DOUBLE AS weight,
         |  (base + CASE WHEN l.lft > 0 AND ru <= l.lft THEN 1
         |               WHEN l.lft < 0 AND rd <= -l.lft THEN -1
         |               ELSE 0 END)::BIGINT AS n_alloc
         |FROM r, l""".stripMargin)

  // q301 (round-14): ROBUST outlier gate — per-language exact lower
  // median + MAD of document length from the VALUE HISTOGRAM (the
  // only ordered window runs over distinct lengths, bounded by the
  // value domain, never a row sort — the 100 TB shape for exact
  // order statistics on integral columns), flagging docs more than
  // 3 MADs out. MAD is the scale one corrupt 10⁹-char document
  // cannot move, unlike the stddev z-score it replaces; everything
  // is an integer order statistic, so the oracle replays median,
  // MAD, and the gate itself from first principles.
  private def madDecl: Decl =
    decl("q301_mad_outlier_gate",
      (s, d) => {
        val docs = t(s, d, "documents")
        val mm = Quantiles.medianMad(docs, col("lang"), col("n_chars"))
        docs.select(col("lang").as("g"), col("n_chars").cast("long").as("v"))
          .join(broadcast(mm), "g")
          .groupBy(col("g").as("lang"), col("n").as("n_docs"),
            col("med").as("median_chars"), col("mad").as("mad_chars"))
          .agg(sum(when(abs(col("v") - col("med")) > lit(3L) * col("mad"),
            1L).otherwise(0L)).as("n_outliers"))
      },
      """WITH h AS (SELECT lang AS g, n_chars::BIGINT AS v,
        |  COUNT(*)::BIGINT AS cnt FROM documents GROUP BY 1, 2),
        |n AS (SELECT g, SUM(cnt)::BIGINT AS n FROM h GROUP BY 1),
        |c AS (SELECT g, v, cnt,
        |  SUM(cnt) OVER (PARTITION BY g ORDER BY v)::BIGINT AS cum FROM h),
        |med AS (SELECT c.g, n.n, v AS med FROM c JOIN n USING (g)
        |        WHERE cum >= (n + 1) // 2 AND cum - cnt < (n + 1) // 2),
        |h2 AS (SELECT d.lang AS g, ABS(d.n_chars - med.med)::BIGINT AS v,
        |       COUNT(*)::BIGINT AS cnt
        |       FROM documents d JOIN med ON d.lang = med.g GROUP BY 1, 2),
        |n2 AS (SELECT g, SUM(cnt)::BIGINT AS n FROM h2 GROUP BY 1),
        |c2 AS (SELECT g, v, cnt,
        |  SUM(cnt) OVER (PARTITION BY g ORDER BY v)::BIGINT AS cum FROM h2),
        |mad AS (SELECT c2.g, v AS mad FROM c2 JOIN n2 USING (g)
        |        WHERE cum >= (n + 1) // 2 AND cum - cnt < (n + 1) // 2)
        |SELECT d.lang, med.n AS n_docs, med.med AS median_chars,
        |  mad.mad AS mad_chars,
        |  SUM(CASE WHEN ABS(d.n_chars - med.med) > 3 * mad.mad
        |      THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM documents d JOIN med ON d.lang = med.g
        |JOIN mad ON d.lang = mad.g
        |GROUP BY 1, 2, 3, 4""".stripMargin)

  // q302 (round-14): NEYMAN optimal stratified allocation — the
  // 200-doc budget lands where the estimator variance is: each
  // language's share is proportional to its dispersion mass
  // Σ|len − median| (the integer robust analogue of N_h·σ_h —
  // proportional allocation would oversample big low-variance
  // strata), apportioned by largest remainder so quotas sum to the
  // budget EXACTLY with no float share ever computed. The oracle
  // replays median, dispersion, floor quotas, and the remainder
  // top-up rank for rank.
  private def neymanAllocDecl: Decl =
    decl("q302_neyman_allocation",
      (s, d) => Sampling.neymanAllocation(t(s, d, "documents"),
        col("lang"), col("n_chars"), budget = 200L),
      """WITH h AS (SELECT lang AS g, n_chars::BIGINT AS v,
        |  COUNT(*)::BIGINT AS cnt FROM documents GROUP BY 1, 2),
        |n AS (SELECT g, SUM(cnt)::BIGINT AS n FROM h GROUP BY 1),
        |c AS (SELECT g, v, cnt,
        |  SUM(cnt) OVER (PARTITION BY g ORDER BY v)::BIGINT AS cum FROM h),
        |med AS (SELECT c.g, n.n, v AS med FROM c JOIN n USING (g)
        |        WHERE cum >= (n + 1) // 2 AND cum - cnt < (n + 1) // 2),
        |disp AS (SELECT d.lang AS g,
        |  SUM(ABS(d.n_chars - med.med))::BIGINT AS disp
        |  FROM documents d JOIN med ON d.lang = med.g GROUP BY 1),
        |tot AS (SELECT SUM(disp)::BIGINT AS tot FROM disp),
        |q AS (SELECT g, disp, (200 * disp) // tot.tot AS base,
        |      (200 * disp) % tot.tot AS rem FROM disp, tot),
        |lft AS (SELECT (200 - SUM(base))::BIGINT AS lft FROM q),
        |r AS (SELECT g, disp, base, rem,
        |      row_number() OVER (ORDER BY rem DESC, g ASC)::BIGINT AS ru FROM q)
        |SELECT r.g AS stratum, med.n AS n_rows, med.med AS median,
        |  r.disp AS dispersion,
        |  (r.base + CASE WHEN r.ru <= lft.lft THEN 1 ELSE 0 END)::BIGINT
        |    AS quota
        |FROM r JOIN med ON r.g = med.g, lft""".stripMargin)

  // q303 (round-14): draw the q302 sample deterministically — rows
  // rank inside their stratum by a salted id hash (membership is a
  // pure function of the id: the corpus growing elsewhere never
  // re-deals a stratum — the assignSplits stability property), the
  // rank window is bounded by the constant budget FIRST (plans as a
  // WindowGroupLimit heap, never a full per-stratum sort), then
  // trimmed to each stratum's exact quota. Oracle re-derives every
  // rank from the same md5-prefix hash.
  private def neymanSampleDecl: Decl =
    decl("q303_neyman_sample",
      (s, d) => Sampling.neymanSample(t(s, d, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars")),
        col("lang"), col("n_chars"), col("doc_id"),
        budget = 200L, salt = "ney")
        .select(col("doc_id"), col("lang"), col("rk")),
      s"""WITH h AS (SELECT lang AS g, n_chars::BIGINT AS v,
         |  COUNT(*)::BIGINT AS cnt FROM documents GROUP BY 1, 2),
         |n AS (SELECT g, SUM(cnt)::BIGINT AS n FROM h GROUP BY 1),
         |c AS (SELECT g, v, cnt,
         |  SUM(cnt) OVER (PARTITION BY g ORDER BY v)::BIGINT AS cum FROM h),
         |med AS (SELECT c.g, n.n, v AS med FROM c JOIN n USING (g)
         |        WHERE cum >= (n + 1) // 2 AND cum - cnt < (n + 1) // 2),
         |disp AS (SELECT d.lang AS g,
         |  SUM(ABS(d.n_chars - med.med))::BIGINT AS disp
         |  FROM documents d JOIN med ON d.lang = med.g GROUP BY 1),
         |tot AS (SELECT SUM(disp)::BIGINT AS tot FROM disp),
         |q AS (SELECT g, (200 * disp) // tot.tot AS base,
         |      (200 * disp) % tot.tot AS rem FROM disp, tot),
         |lft AS (SELECT (200 - SUM(base))::BIGINT AS lft FROM q),
         |quota AS (SELECT g,
         |  (base + CASE WHEN row_number() OVER (ORDER BY rem DESC, g ASC)
         |     <= lft.lft THEN 1 ELSE 0 END)::BIGINT AS quota FROM q, lft),
         |rk AS (SELECT doc_id, lang,
         |  row_number() OVER (PARTITION BY lang ORDER BY
         |    ${sqlHash60("('ney|' || doc_id::VARCHAR)")}, doc_id)::BIGINT AS rk
         |  FROM documents)
         |SELECT rk.doc_id, rk.lang, rk.rk
         |FROM rk JOIN quota ON rk.lang = quota.g
         |WHERE rk.rk <= quota.quota""".stripMargin)

  // q306 (round-14): EXACT per-language length quartiles — the q301
  // histogram order statistics generalized to a rational quantile
  // list: the p-th value is the ceil(n·num/den)-th order statistic,
  // target index computed as (n·num + qden − 1) div qden, so neither
  // the index nor the value ever touches a float (histQuantiles q166
  // is the approximate fixed-resolution twin; this is the exact arm
  // for integral domains). Pivoted to one row per language so the
  // whole corpus-length profile reads at a glance.
  private def quartilesDecl: Decl =
    decl("q306_exact_quartiles",
      (s, d) => Quantiles.histExactQuantiles(t(s, d, "documents"),
          col("lang"), col("n_chars"), Seq((1, 4), (1, 2), (3, 4)))
        .groupBy(col("g").as("lang"), col("n").as("n_docs"))
        .agg(max(when(col("qnum") === 1 && col("qden") === 4,
          col("value"))).as("p25"),
          max(when(col("qnum") === 1 && col("qden") === 2,
            col("value"))).as("p50"),
          max(when(col("qnum") === 3 && col("qden") === 4,
            col("value"))).as("p75")),
      """WITH h AS (SELECT lang AS g, n_chars::BIGINT AS v,
        |  COUNT(*)::BIGINT AS cnt FROM documents GROUP BY 1, 2),
        |n AS (SELECT g, SUM(cnt)::BIGINT AS n FROM h GROUP BY 1),
        |c AS (SELECT g, v, cnt,
        |  SUM(cnt) OVER (PARTITION BY g ORDER BY v)::BIGINT AS cum FROM h),
        |q AS (SELECT unnest([1, 1, 3]) AS qnum, unnest([4, 2, 4]) AS qden),
        |pick AS (SELECT c.g, n.n, q.qnum, q.qden, c.v
        |  FROM c JOIN n USING (g), q
        |  WHERE cum >= (n * qnum + qden - 1) // qden
        |    AND cum - cnt < (n * qnum + qden - 1) // qden)
        |SELECT g AS lang, n AS n_docs,
        |  MAX(CASE WHEN qnum = 1 AND qden = 4 THEN v END)::BIGINT AS p25,
        |  MAX(CASE WHEN qnum = 1 AND qden = 2 THEN v END)::BIGINT AS p50,
        |  MAX(CASE WHEN qnum = 3 AND qden = 4 THEN v END)::BIGINT AS p75
        |FROM pick GROUP BY 1, 2""".stripMargin)

  // q314 (round-14): GATE CALIBRATION — the length threshold that
  // best agrees with a reference label ("is this English"), in exact
  // integer argmax: agreement counts need no per-threshold
  // denominator (unlike Gini/entropy — no rational comparison
  // anywhere), candidates are the distinct lengths with cumulative
  // counts from the value histogram, both rule orientations tried,
  // the argmax one mergeable max_by. This is how a curation pipeline
  // tunes its cheap gates against an expensive reference on a sample;
  // base_agree (the majority class) says whether the gate beats doing
  // nothing. Ties break to the smallest threshold (oracle: the same
  // ORDER BY ... LIMIT 1).
  private def gateDecl: Decl =
    decl("q314_threshold_gate_calibration",
      (s, d) => graft.operators.Eval.bestThresholdGate(
        t(s, d, "documents"), col("n_chars"), col("lang") === "en"),
      """WITH h AS (SELECT n_chars::BIGINT AS v,
        |  SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS pos_at,
        |  SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS neg_at
        |  FROM documents GROUP BY 1),
        |t AS (SELECT SUM(pos_at)::BIGINT AS n_pos,
        |      SUM(neg_at)::BIGINT AS n_neg FROM h),
        |c AS (SELECT v,
        |  SUM(pos_at) OVER (ORDER BY v)::BIGINT AS pos_le,
        |  SUM(neg_at) OVER (ORDER BY v)::BIGINT AS neg_le FROM h),
        |s AS (SELECT v,
        |  (pos_le + n_neg - neg_le)::BIGINT AS agree_pos,
        |  (neg_le + n_pos - pos_le)::BIGINT AS agree_neg FROM c, t),
        |b AS (SELECT v, (agree_pos >= agree_neg) AS le_pos,
        |  GREATEST(agree_pos, agree_neg)::BIGINT AS agree FROM s
        |  ORDER BY agree DESC, v ASC, le_pos DESC LIMIT 1)
        |SELECT b.v AS threshold, b.le_pos AS le_predicts_positive,
        |  (t.n_pos + t.n_neg)::BIGINT AS n, t.n_pos,
        |  b.agree, GREATEST(t.n_pos, t.n_neg)::BIGINT AS base_agree
        |FROM b, t""".stripMargin)

  // q322 (round-15): ADJUSTED RAND INDEX — the chance-corrected
  // pairwise cluster agreement beside q280's B-cubed, from the SAME
  // contingency counts (Σ C(n_ij,2) / Σ C(n_p,2) / Σ C(n_t,2) /
  // C(n,2) — all closed-form exact integers; the only rational is the
  // final division, one fixed IEEE expression mirrored term-for-term
  // in the oracle). The fixture predicts nation membership with a
  // hash-deterministic ~10% of customers split off into wrong labels,
  // so every count is non-trivial and the ARI sits strictly inside
  // (0, 1) — a pure-agreement metric would hide the noise rate that
  // chance correction exposes. The oracle replays cells, marginals,
  // pair sums, and the division from first principles.
  private def ariDecl: Decl =
    decl("q322_adjusted_rand",
      (s, d) => {
        val c = t(s, d, "customer")
          .select(col("c_custkey").cast("long").as("id"),
            col("c_nationkey").cast("long").as("nk"))
        val pred = c.select(col("id"),
          when(pmod(graft.operators.Dedup.hash60(
              concat(lit("ari|"), col("id").cast("string"))), lit(10L)) === 0L,
            lit(100L) + pmod(col("nk") + 1L, lit(25L)))
            .otherwise(col("nk")).as("p"))
        graft.operators.Eval.adjustedRand(
          pred, c.select(col("id"), col("nk").as("t")))
      },
      s"""WITH c AS (SELECT c_custkey::BIGINT AS id,
         |  c_nationkey::BIGINT AS nk FROM customer),
         |jj AS (SELECT id,
         |  CASE WHEN ${sqlHash60("('ari|' || id::VARCHAR)")} % 10 = 0
         |       THEN 100 + (nk + 1) % 25 ELSE nk END AS p,
         |  nk AS t FROM c),
         |cellc AS (SELECT p, t, COUNT(*)::BIGINT AS nij FROM jj GROUP BY 1, 2),
         |pmar AS (SELECT p, COUNT(*)::BIGINT AS np FROM jj GROUP BY 1),
         |tmar AS (SELECT t, COUNT(*)::BIGINT AS nt FROM jj GROUP BY 1),
         |ni AS (SELECT COUNT(*)::BIGINT AS n_items FROM jj),
         |tpp AS (SELECT COALESCE(SUM((nij * (nij - 1)) // 2), 0)::BIGINT
         |        AS tp_pairs FROM cellc),
         |ppp AS (SELECT COUNT(*)::BIGINT AS pred_clusters,
         |        COALESCE(SUM((np * (np - 1)) // 2), 0)::BIGINT AS pred_pairs
         |        FROM pmar),
         |ttt AS (SELECT COUNT(*)::BIGINT AS true_clusters,
         |        COALESCE(SUM((nt * (nt - 1)) // 2), 0)::BIGINT AS true_pairs
         |        FROM tmar),
         |bps AS (SELECT COALESCE(SUM(CAST((nij * nij)::DOUBLE / np::DOUBLE
         |          AS DECIMAL(30,12))), 0) AS bp_sum
         |        FROM cellc JOIN pmar USING (p)),
         |brs AS (SELECT COALESCE(SUM(CAST((nij * nij)::DOUBLE / nt::DOUBLE
         |          AS DECIMAL(30,12))), 0) AS br_sum
         |        FROM cellc JOIN tmar USING (t)),
         |base AS (SELECT ni.n_items, ppp.pred_clusters, ttt.true_clusters,
         |  ppp.pred_pairs, ttt.true_pairs, tpp.tp_pairs,
         |  CAST(CAST(bps.bp_sum::DOUBLE / ni.n_items::DOUBLE
         |    AS DECIMAL(10,6)) AS DOUBLE) AS bcubed_prec,
         |  CAST(CAST(brs.br_sum::DOUBLE / ni.n_items::DOUBLE
         |    AS DECIMAL(10,6)) AS DOUBLE) AS bcubed_rec,
         |  ((ni.n_items * (ni.n_items - 1)) // 2)::BIGINT AS total_pairs
         |  FROM ni, ppp, ttt, tpp, bps, brs)
         |SELECT *,
         |  CASE WHEN total_pairs > 0
         |        AND (pred_pairs + true_pairs)::DOUBLE / 2.0
         |            - pred_pairs::DOUBLE * true_pairs::DOUBLE
         |              / total_pairs::DOUBLE <> 0.0
         |       THEN CAST(CAST((tp_pairs::DOUBLE
         |              - pred_pairs::DOUBLE * true_pairs::DOUBLE
         |                / total_pairs::DOUBLE)
         |            / ((pred_pairs + true_pairs)::DOUBLE / 2.0
         |              - pred_pairs::DOUBLE * true_pairs::DOUBLE
         |                / total_pairs::DOUBLE) AS DECIMAL(10,6)) AS DOUBLE)
         |       END AS ari
         |FROM base""".stripMargin)
}
