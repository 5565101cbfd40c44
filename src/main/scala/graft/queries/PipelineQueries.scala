package graft.queries

import graft.operators.{AnnIndex, AsOf, Blocking, ConnectedComponents, Contamination, Curation, Dedup, Matcher, Multimodal, Packing, Pii, ProductQuantizer, RangeJoin, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Training-data pipeline operators: deduplication, similarity search,
  * text analysis, multimodal plumbing — the 100 TB-scale extensions
  * beyond the reference's own surface.
  *
  * The signature-based operators (q42 MinHash+LSH, q43 SimHash, q45
  * sign-LSH ANN) carry EXACT DuckDB oracles: their deterministic hash
  * arithmetic (md5-derived 60-bit hashes, fixed permutation constants,
  * fixed hyperplane signs) is re-generated as SQL from the same Scala
  * constants, so the driver's hash-match verifies the full signature
  * pipeline, not just a row count.
  */
object PipelineQueries {

  /** Events with `tsu` = event time in integer microseconds — the
    * engine-portable comparison domain (the parquet carries nanos;
    * DuckDB oracles use epoch_ns(ts) // 1000). */
  private def eventsMicros(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("tsu", expr("ts div 1000"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // UTC session tz everywhere → NTZ→TIMESTAMP cast is value-preserving
        raw.withColumn("tsu",
          unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)))
      case _ => raw.withColumn("tsu", unix_micros(col("ts")))
    }
  }

  /** DuckDB CTE fragment implementing classic soundex (H/W-skip rule,
    * vowel separators — validated character-for-character against
    * Spark's builtin). Expects a prior CTE `toks0` with a `tok` column;
    * defines `up`, `ks`, and `sx(tok, code)`. */
  private val sqlSoundexCtes: String =
    """up AS (SELECT DISTINCT tok, upper(tok) AS u FROM toks0),
      |ks AS (SELECT tok, u,
      |  list_transform(generate_series(1, len(u)), i ->
      |    CASE WHEN substr(u,i,1) IN ('B','F','P','V') THEN '1'
      |         WHEN substr(u,i,1) IN ('C','G','J','K','Q','S','X','Z') THEN '2'
      |         WHEN substr(u,i,1) IN ('D','T') THEN '3'
      |         WHEN substr(u,i,1) = 'L' THEN '4'
      |         WHEN substr(u,i,1) IN ('M','N') THEN '5'
      |         WHEN substr(u,i,1) = 'R' THEN '6'
      |         ELSE '0' END) AS k
      |  FROM up),
      |sx AS (SELECT tok,
      |  substr(u,1,1) || rpad(substr(coalesce(array_to_string(
      |    list_transform(
      |      list_filter(generate_series(2, len(u)), i ->
      |        substr(u,i,1) NOT IN ('H','W') AND k[i] != '0'
      |        AND k[i] != k[list_max(list_filter(generate_series(1, i-1),
      |          j -> j = 1 OR substr(u,j,1) NOT IN ('H','W')))]),
      |      i -> k[i]), ''), ''), 1, 3), 3, '0') AS code
      |  FROM ks)""".stripMargin

  /** DuckDB fragment: 60-bit hash of column `c` = first 15 hex digits of
    * md5 as a BIGINT — bit-for-bit Dedup.hash60. */
  private[queries] def sqlHash60(c: String): String =
    s"list_sum(list_transform(generate_series(1, 15), " +
      s"i -> ((strpos('0123456789abcdef', substr(md5($c), i, 1)) - 1)::BIGINT << (4 * (15 - i)))))::BIGINT"

  /** The [[graft.operators.Hll.report]] TWO-RANGE estimate as a SQL
    * expression over an aggregate row carrying `nrs` (registers set)
    * and `setnum` (Σ 2^(R−M_j) over set registers): raw harmonic
    * estimate, switched to linear counting m·ln(m/V) when raw ≤ 2.5·m
    * and empty registers exist — round-16, mirrored by every HLL
    * oracle (q286/q289/q320 and the statistics.json facets). */
  private[queries] def sqlHllEstCase(m: Long, rMax: Int, nrs: String,
      setnum: String): String = {
    val alpha = m match {
      case 16L => "0.673"
      case 32L => "0.697"
      case 64L => "0.709"
      case _   => s"(0.7213 / (1.0 + 1.079 / $m.0))"
    }
    val harmonic = s"(($setnum + ($m - $nrs) * (1::BIGINT << $rMax))::DOUBLE)"
    val raw = s"(($alpha * $m.0 * $m.0 * (1::BIGINT << $rMax)::DOUBLE) / $harmonic)"
    s"""CASE WHEN $raw <= ${2.5 * m} AND $nrs < $m
       |     THEN ROUND($m.0 * ln($m.0 / ($m - $nrs)::DOUBLE), 6)
       |     ELSE ROUND($raw, 6) END""".stripMargin
  }

  /** Per-group portable-HLL estimate CTE chain (p = 8, the q320
    * register/harmonic arithmetic) over a `(code, eid)` pairs CTE,
    * ending in `he_$tag(code, est)` with est rendered as fixed-point
    * DECIMAL(18,6) text — shared by the statistics.json oracles
    * (q102, q109) whose country facets carry the sketched distinct
    * arm beside the exact count. */
  private[queries] def sqlHllEst(tag: String, pairsCte: String): String =
    s"""hh_$tag AS (SELECT code, ${sqlHash60("eid")} AS h FROM $pairsCte),
       |hr_$tag AS (SELECT code, h % 256 AS reg, h // 256 AS s FROM hh_$tag),
       |hm_$tag AS (SELECT code, reg,
       |  MAX(CASE WHEN s = 0 THEN 53
       |      ELSE bit_count((s & -s) - 1) + 1 END)::BIGINT AS mr
       |  FROM hr_$tag GROUP BY 1, 2),
       |ha_$tag AS (SELECT code, COUNT(*)::BIGINT AS nrs,
       |  SUM(1::BIGINT << (53 - mr)::INT)::BIGINT AS setnum
       |  FROM hm_$tag GROUP BY 1),
       |he_$tag AS (SELECT code,
       |  (${sqlHllEstCase(256L, 53, "nrs", "setnum")})
       |    ::DECIMAL(18,6)::VARCHAR AS est
       |  FROM ha_$tag)""".stripMargin

  /** MinHash signature CTE chain (words → df-capped 3-shingles →
    * hashes → 32-column per-doc signature) with the same permutation
    * constants as Dedup.perm — shared by the q42 and q145 oracles. */
  private def minhashSigCtes: String = {
    val m = Dedup.PermModulus
    val mins = (0 until 32).map { i =>
      val (a, b) = Dedup.perm(i)
      s"min((h * $a + $b) % $m) AS m$i"
    }.mkString(",\n    ")
    s"""words AS (SELECT doc_id AS doc, string_split(text, ' ') w FROM documents),
       |sh0 AS (SELECT DISTINCT doc, unnest(list_transform(generate_series(1, len(w)-2),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) s
       |  FROM words WHERE len(w) >= 3),
       |sh AS (SELECT sh0.doc, sh0.s FROM sh0
       |  JOIN (SELECT s, COUNT(*) df FROM sh0 GROUP BY s) f ON sh0.s = f.s AND f.df <= 50),
       |hs AS (SELECT doc, ${sqlHash60("s")} % $m AS h FROM sh),
       |sig AS (SELECT doc,
       |    $mins
       |  FROM hs GROUP BY doc)""".stripMargin
  }

  /** LSH band-collision predicate + matching-position sum over two sig
    * aliases a/b — shared by the q42 and q145 oracles. */
  private def minhashBandEq: String = (0 until 8).map { j =>
    (0 until 4).map(r => s"a.m${4 * j + r} = b.m${4 * j + r}")
      .mkString("(", " AND ", ")")
  }.mkString("\n   OR ")
  private def minhashEqSum: String =
    (0 until 32).map(i => s"(CASE WHEN a.m$i = b.m$i THEN 1 ELSE 0 END)")
      .mkString(" + ")

  /** q42 oracle: the full MinHash+LSH pipeline in SQL. */
  private def q42Oracle: String =
    s"""WITH $minhashSigCtes
       |SELECT a.doc AS doc_a, b.doc AS doc_b,
       |  ($minhashEqSum)::DOUBLE / 32.0 AS est_jaccard
       |FROM sig a JOIN sig b ON a.doc < b.doc
       |WHERE ($minhashBandEq)
       |  AND ($minhashEqSum)::DOUBLE / 32.0 >= 0.5""".stripMargin

  /** q43 oracle: full SimHash signatures + brute-force hamming pairs in
    * SQL. The Spark side's pigeonhole candidate generation is guaranteed
    * 100%-recall for its maxHamming, so brute force is the exact oracle. */
  private def q43Oracle: String =
    s"""WITH tok AS (SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS t FROM documents),
       |th AS (SELECT doc, ${sqlHash60("t")} AS h FROM tok),
       |bits AS (SELECT doc, j,
       |    CASE WHEN SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) > 0
       |         THEN (1::BIGINT << j) ELSE 0::BIGINT END AS bit
       |  FROM th, generate_series(0, 59) AS g(j)
       |  GROUP BY doc, j),
       |sig AS (SELECT doc, SUM(bit)::BIGINT AS s FROM bits GROUP BY doc)
       |SELECT a.doc AS doc_a, b.doc AS doc_b,
       |  bit_count(xor(a.s, b.s))::BIGINT AS hamming
       |FROM sig a JOIN sig b ON a.doc < b.doc
       |WHERE bit_count(xor(a.s, b.s)) <= 6""".stripMargin

  /** q45 oracle: sign-LSH bucket + in-bucket exact cosine ranking, with
    * the hyperplane sign matrix inlined from Similarity.planeSign. */
  private def q45Oracle: String = {
    val bucketExpr = (0 until 6).map { p =>
      val plane = (0 until 64)
        .map(dd => if (Similarity.planeSign(p, dd) > 0) "1.0" else "-1.0")
        .mkString("[", ",", "]")
      s"(CASE WHEN list_inner_product(v, $plane::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n    + ")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, v,
       |    $bucketExpr AS bucket
       |  FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id % 100 = 0),
       |c AS (SELECT vec_id AS neighbor_id, v AS nv, bucket FROM b),
       |scored AS (SELECT query_id, neighbor_id, list_cosine_similarity(qv, nv) AS cos
       |  FROM q JOIN c USING (bucket) WHERE query_id != neighbor_id)
       |SELECT query_id, neighbor_id, rnk FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= 10""".stripMargin
  }

  /** q101 oracle: exact / single-probe LSH / multi-probe LSH /
    * multi-table LSH / IVF all recomputed in SQL (plane matrix inlined)
    * over the planted-overlay corpus, then recall@10, planted-pair
    * recall, and measured candidate fraction of each method. */
  private def q101Oracle: String = {
    val bucketExpr = (0 until 6).map { p =>
      val plane = (0 until 64)
        .map(dd => if (Similarity.planeSign(p, dd) > 0) "1.0" else "-1.0")
        .mkString("[", ",", "]")
      s"(CASE WHEN list_inner_product(v, $plane::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("\n    + ")
    // multi-table: 4 tables x 12 planes, disjoint plane indices
    val mtTables = (0 until 4).map { tbl =>
      val bits = (0 until 12).map { p =>
        val abs = tbl * 12 + p
        val plane = (0 until 64)
          .map(dd => if (Similarity.planeSign(abs, dd) > 0) "1.0" else "-1.0")
          .mkString("[", ",", "]")
        s"(CASE WHEN list_inner_product(v, $plane::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, v, $tbl AS tbl, $bits AS bits FROM e"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |pl AS (
       |  SELECT vec_id + 1000000 AS vec_id,
       |    list_transform(generate_series(1, 64),
       |      i -> v[i] + (CASE WHEN (i - 1) % 2 = 0
       |                   THEN 0.002::DOUBLE ELSE -0.002::DOUBLE END)) AS v
       |  FROM eb WHERE vec_id % 50 = 0),
       |e AS (SELECT vec_id, v FROM eb UNION ALL SELECT vec_id, v FROM pl),
       |qv AS (SELECT vec_id, v FROM eb WHERE vec_id % 100 = 0 AND vec_id < 100000),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rnk
       |    FROM qv q CROSS JOIN e c
       |    WHERE q.vec_id != c.vec_id)
       |  WHERE rnk <= 10),
       |mtb AS (
       |  $mtTables),
       |mt_cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM mtb q JOIN mtb c ON q.tbl = c.tbl AND q.bits = c.bits
       |  WHERE q.vec_id % 100 = 0 AND q.vec_id < 100000 AND q.vec_id != c.vec_id),
       |mt AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT m.query_id, m.neighbor_id,
       |      row_number() OVER (PARTITION BY m.query_id
       |        ORDER BY list_cosine_similarity(q.v, c.v) DESC, m.neighbor_id) AS rnk
       |    FROM mt_cand m JOIN e q ON m.query_id = q.vec_id
       |                   JOIN e c ON m.neighbor_id = c.vec_id)
       |  WHERE rnk <= 10),
       |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
       |qb AS (SELECT vec_id AS query_id, v AS qv2, bucket FROM b
       |       WHERE vec_id % 100 = 0 AND vec_id < 100000),
       |cb AS (SELECT vec_id AS neighbor_id, v AS nv, bucket FROM b),
       |lsh_cand AS (
       |  SELECT query_id, neighbor_id, qv2, nv
       |  FROM qb JOIN cb USING (bucket) WHERE query_id != neighbor_id),
       |lsh AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY list_cosine_similarity(qv2, nv) DESC, neighbor_id) AS rnk
       |    FROM lsh_cand)
       |  WHERE rnk <= 10),
       |mprobes AS (
       |  SELECT query_id, qv2,
       |    unnest([bucket] || list_transform(generate_series(0, 5),
       |      i -> xor(bucket, (1::BIGINT << i)))) AS bucket2
       |  FROM qb),
       |mp_cand AS (
       |  SELECT DISTINCT query_id, neighbor_id
       |  FROM mprobes p JOIN cb ON p.bucket2 = cb.bucket
       |  WHERE query_id != neighbor_id),
       |mp AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT m.query_id, m.neighbor_id,
       |      row_number() OVER (PARTITION BY m.query_id
       |        ORDER BY list_cosine_similarity(q.v, c.v) DESC, m.neighbor_id) AS rnk
       |    FROM mp_cand m JOIN e q ON m.query_id = q.vec_id
       |                   JOIN e c ON m.neighbor_id = c.vec_id)
       |  WHERE rnk <= 10),
       |cents AS (SELECT vec_id AS centroid_id, v AS cvec FROM eb WHERE vec_id % 50 = 7),
       |assigned AS (
       |  SELECT neighbor_id, nv, centroid_id FROM (
       |    SELECT e.vec_id AS neighbor_id, e.v AS nv, c.centroid_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.centroid_id) AS crank
       |    FROM e CROSS JOIN cents c)
       |  WHERE crank = 1),
       |iprobes AS (
       |  SELECT query_id, qv2, centroid_id FROM (
       |    SELECT q.vec_id AS query_id, q.v AS qv2, c.centroid_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, c.cvec) DESC, c.centroid_id) AS prank
       |    FROM qv q CROSS JOIN cents c)
       |  WHERE prank <= 2),
       |ivf_cand AS (
       |  SELECT p.query_id, p.qv2, a.neighbor_id, a.nv
       |  FROM iprobes p JOIN assigned a USING (centroid_id)
       |  WHERE p.query_id != a.neighbor_id),
       |ivf AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY list_cosine_similarity(qv2, nv) DESC, neighbor_id) AS rnk
       |    FROM ivf_cand)
       |  WHERE rnk <= 10),
       |dims AS (
       |  SELECT (SELECT COUNT(*) FROM qv) AS nq, (SELECT COUNT(*) FROM e) AS nc,
       |    (SELECT COUNT(*) FROM exact) AS exact_pairs,
       |    (SELECT COUNT(*) FROM exact WHERE neighbor_id = query_id + 1000000)
       |      AS planted_pairs),
       |methods AS (
       |  SELECT 'ivf' AS method,
       |    (SELECT COUNT(*) FROM exact JOIN ivf USING (query_id, neighbor_id)) AS found_pairs,
       |    (SELECT COUNT(*) FROM exact JOIN ivf USING (query_id, neighbor_id)
       |     WHERE neighbor_id = query_id + 1000000) AS planted_found,
       |    (SELECT COUNT(*) FROM ivf_cand) AS cand_pairs
       |  UNION ALL
       |  SELECT 'lsh',
       |    (SELECT COUNT(*) FROM exact JOIN lsh USING (query_id, neighbor_id)),
       |    (SELECT COUNT(*) FROM exact JOIN lsh USING (query_id, neighbor_id)
       |     WHERE neighbor_id = query_id + 1000000),
       |    (SELECT COUNT(*) FROM lsh_cand)
       |  UNION ALL
       |  SELECT 'lsh_multiprobe',
       |    (SELECT COUNT(*) FROM exact JOIN mp USING (query_id, neighbor_id)),
       |    (SELECT COUNT(*) FROM exact JOIN mp USING (query_id, neighbor_id)
       |     WHERE neighbor_id = query_id + 1000000),
       |    (SELECT COUNT(*) FROM mp_cand)
       |  UNION ALL
       |  SELECT 'lsh_multitable',
       |    (SELECT COUNT(*) FROM exact JOIN mt USING (query_id, neighbor_id)),
       |    (SELECT COUNT(*) FROM exact JOIN mt USING (query_id, neighbor_id)
       |     WHERE neighbor_id = query_id + 1000000),
       |    (SELECT COUNT(*) FROM mt_cand))
       |SELECT method, exact_pairs, found_pairs,
       |  found_pairs::DOUBLE / exact_pairs::DOUBLE AS recall,
       |  planted_pairs, planted_found,
       |  planted_found::DOUBLE / planted_pairs::DOUBLE AS planted_recall,
       |  cand_pairs,
       |  cand_pairs::DOUBLE / (nq * (nc - 1))::DOUBLE AS cand_fraction
       |FROM methods CROSS JOIN dims""".stripMargin
  }

  /** The q189 planted-overlay embedding corpus: every 50th base vector
    * near-copied at +1e6 (±0.002 per-coordinate), every 100th at +2e6
    * (+0.003/−0.001) — deterministic near-identical clusters of 2–3.
    * Shared by q189 (IVF-cell dedup) and q192 (its measured boundary
    * loss). */
  private def ivfOverlayCorpus(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
    val pl1 = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + when(i % 2 === 0, lit(0.002)).otherwise(lit(-0.002)))
          .as("embedding"))
    val pl2 = base.filter(col("vec_id") % 100 === 0)
      .select((col("vec_id") + 2000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + when(i % 3 === 0, lit(0.003)).otherwise(lit(-0.001)))
          .as("embedding"))
    base.unionByName(pl1).unionByName(pl2)
  }

  /** IVFPQ lifecycle decl shared by q235 (the 4-bit baseline whose
    * constants the round-12 STRESS decade used as the contrast arm)
    * and q244 (the PRODUCTION 7-bit/k=128 code width that closed the
    * ADC gap to the cell ceiling — 0.719 -> 0.891 recall at 25x on
    * the low-cos arm). Same engine path, same oracle replay; only the
    * codebook cardinality, the pack shift and the decode mask change.
    * See the q235 decl comment below for the full lifecycle story. */
  /** The IVFPQ TRAINING lifecycle replayed as a WITH-chain prefix —
    * coarse k-means (c0 -> c2, the 2 unrolled hash-seeded Lloyd
    * rounds), member assignment (mv), PQ codebook training
    * (cb0 -> cb2) and the packed one-long member codes (packed).
    * Shared by the q235/q244 lifecycle gates and q268's streaming
    * dedup replay. Ends at `packed`, no trailing comma. */
  private[queries] def pqTrainCtes(pqK: Int): String = {
    val bits = graft.operators.ProductQuantizer.bitsFor(pqK)
    s"""WITH eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |hs AS (SELECT vec_id, v, ${sqlHash60("vec_id::VARCHAR")} AS h FROM eb),
        |c0 AS (SELECT centroid_id, cvec FROM (
        |  SELECT row_number() OVER (ORDER BY h, vec_id)::BIGINT - 1 AS centroid_id,
        |         v AS cvec FROM hs)
        |  WHERE centroid_id < ${graft.operators.Similarity.kFor(500L)}),
        |a1 AS (SELECT id, vec, centroid_id FROM (
        |  SELECT eb.vec_id AS id, eb.v AS vec, c.centroid_id,
        |    row_number() OVER (PARTITION BY eb.vec_id
        |      ORDER BY list_cosine_similarity(eb.v, c.cvec) DESC, c.centroid_id) AS crank
        |  FROM eb CROSS JOIN c0 c)
        |  WHERE crank = 1),
        |c1 AS (SELECT centroid_id,
        |  list_transform(generate_series(1, 64),
        |    d -> list_reduce(list_transform(vs, x -> x[d]),
        |           (acc, x) -> acc + x) / len(vs)) AS cvec
        |  FROM (SELECT centroid_id, list(vec ORDER BY id) AS vs
        |        FROM a1 GROUP BY centroid_id)),
        |a2 AS (SELECT id, vec, centroid_id FROM (
        |  SELECT eb.vec_id AS id, eb.v AS vec, c.centroid_id,
        |    row_number() OVER (PARTITION BY eb.vec_id
        |      ORDER BY list_cosine_similarity(eb.v, c.cvec) DESC, c.centroid_id) AS crank
        |  FROM eb CROSS JOIN c1 c)
        |  WHERE crank = 1),
        |c2 AS (SELECT centroid_id,
        |  list_transform(generate_series(1, 64),
        |    d -> list_reduce(list_transform(vs, x -> x[d]),
        |           (acc, x) -> acc + x) / len(vs)) AS cvec
        |  FROM (SELECT centroid_id, list(vec ORDER BY id) AS vs
        |        FROM a2 GROUP BY centroid_id)),
        |mv AS (SELECT id, vec, centroid_id FROM (
        |  SELECT eb.vec_id AS id, eb.v AS vec, c.centroid_id,
        |    row_number() OVER (PARTITION BY eb.vec_id
        |      ORDER BY list_cosine_similarity(eb.v, c.cvec) DESC, c.centroid_id) AS crank
        |  FROM eb CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |sv AS (SELECT id, x.sub AS sub, x.svec AS svec FROM (
        |  SELECT vec_id AS id, unnest(list_transform(generate_series(0, 7), s ->
        |    {'sub': s, 'svec': list_transform(generate_series(1, 8),
        |                         j -> v[s * 8 + j])})) AS x
        |  FROM eb)),
        |seeds AS (SELECT code, vec_id FROM (
        |  SELECT row_number() OVER (ORDER BY h, vec_id)::BIGINT - 1 AS code,
        |         vec_id FROM hs)
        |  WHERE code < $pqK),
        |cb0 AS (SELECT sv.sub, seeds.code, sv.svec AS cvec
        |  FROM sv JOIN seeds ON sv.id = seeds.vec_id),
        |p1 AS (SELECT id, sub, svec, code FROM (
        |  SELECT sv.id, sv.sub, sv.svec, c.code,
        |    row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
        |      (2.0 * list_reduce(list_transform(generate_series(1, 8),
        |         j -> sv.svec[j] * c.cvec[j]), (a, b) -> a + b)
        |       - list_reduce(list_transform(generate_series(1, 8),
        |         j -> c.cvec[j] * c.cvec[j]), (a, b) -> a + b)) DESC,
        |      c.code) AS rk
        |  FROM sv JOIN cb0 c USING (sub)) WHERE rk = 1),
        |cb1 AS (SELECT sub, code,
        |  list_transform(generate_series(1, 8), d ->
        |    list_reduce(list_transform(vs, x -> x[d]),
        |      (acc, x) -> acc + x) / len(vs)) AS cvec
        |  FROM (SELECT sub, code, list(svec ORDER BY id) AS vs
        |        FROM p1 GROUP BY 1, 2)),
        |p2 AS (SELECT id, sub, svec, code FROM (
        |  SELECT sv.id, sv.sub, sv.svec, c.code,
        |    row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
        |      (2.0 * list_reduce(list_transform(generate_series(1, 8),
        |         j -> sv.svec[j] * c.cvec[j]), (a, b) -> a + b)
        |       - list_reduce(list_transform(generate_series(1, 8),
        |         j -> c.cvec[j] * c.cvec[j]), (a, b) -> a + b)) DESC,
        |      c.code) AS rk
        |  FROM sv JOIN cb1 c USING (sub)) WHERE rk = 1),
        |cb2 AS (SELECT sub, code,
        |  list_transform(generate_series(1, 8), d ->
        |    list_reduce(list_transform(vs, x -> x[d]),
        |      (acc, x) -> acc + x) / len(vs)) AS cvec
        |  FROM (SELECT sub, code, list(svec ORDER BY id) AS vs
        |        FROM p2 GROUP BY 1, 2)),
        |codes AS (SELECT id, sub, code FROM (
        |  SELECT sv.id, sv.sub, c.code,
        |    row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
        |      (2.0 * list_reduce(list_transform(generate_series(1, 8),
        |         j -> sv.svec[j] * c.cvec[j]), (a, b) -> a + b)
        |       - list_reduce(list_transform(generate_series(1, 8),
        |         j -> c.cvec[j] * c.cvec[j]), (a, b) -> a + b)) DESC,
        |      c.code) AS rk
        |  FROM sv JOIN cb2 c USING (sub)) WHERE rk = 1),
        |packed AS (SELECT id,
        |  SUM(code * (1::BIGINT << ($bits * sub)))::BIGINT AS pq_code
        |  FROM codes GROUP BY id)""".stripMargin
  }

  private def ivfpqDecl(name: String, pqK: Int): Decl = {
    val bits = graft.operators.ProductQuantizer.bitsFor(pqK)
    val mask = (1L << bits) - 1L
    decl(name,
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        // deterministic per-dataset path, pre-deleted (the q282 pattern)
        val root = s"/tmp/graft_${name}_" + Q.scratchTag(d)
        val fsH = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fsH.delete(new org.apache.hadoop.fs.Path(root), true)
        AnnIndex.buildPq(s, root, e, dim = 64, m = 8, pqK = pqK,
          commitMillis = 1000L)
        val qs = e.filter(col("vec_id") % 100 === 0)
        AnnIndex.queryPq(s, root, qs, k = 10, dim = 64, m = 8,
            nprobe = 2, r = 50, pqK = pqK)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"))
      },
      pqTrainCtes(pqK) + s""",
        |qs AS (SELECT vec_id AS query_id, v FROM eb WHERE vec_id % 100 = 0),
        |probes AS (SELECT query_id, centroid_id FROM (
        |  SELECT qs.query_id, c.centroid_id,
        |    row_number() OVER (PARTITION BY qs.query_id
        |      ORDER BY list_cosine_similarity(qs.v, c.cvec) DESC, c.centroid_id) AS prank
        |  FROM qs CROSS JOIN c2 c)
        |  WHERE prank <= 2),
        |qsv AS (SELECT query_id, x.sub AS sub, x.qsub AS qsub FROM (
        |  SELECT query_id, unnest(list_transform(generate_series(0, 7), s ->
        |    {'sub': s, 'qsub': list_transform(generate_series(1, 8),
        |                         j -> v[s * 8 + j])})) AS x
        |  FROM qs)),
        |lut AS (SELECT q.query_id, c.sub, c.code,
        |    list_reduce(list_transform(generate_series(1, 8),
        |      j -> q.qsub[j] * c.cvec[j]), (a, b) -> a + b) AS ip,
        |    list_reduce(list_transform(generate_series(1, 8),
        |      j -> c.cvec[j] * c.cvec[j]), (a, b) -> a + b) AS cn2
        |  FROM qsv q JOIN cb2 c USING (sub)),
        |cand0 AS (SELECT p.query_id, m.id, pk.pq_code
        |  FROM probes p JOIN mv m USING (centroid_id)
        |  JOIN packed pk ON m.id = pk.id
        |  WHERE p.query_id != m.id),
        |dec AS (SELECT query_id, id,
        |  unnest(generate_series(0, 7)) AS sub, pq_code FROM cand0),
        |scored AS (SELECT d.query_id, d.id,
        |    SUM(l.ip::DECIMAL(30,12)) AS ddot,
        |    SUM(l.cn2::DECIMAL(30,12)) AS dn2
        |  FROM dec d JOIN lut l ON d.query_id = l.query_id
        |    AND d.sub = l.sub AND ((d.pq_code >> ($bits * d.sub)) & $mask) = l.code
        |  GROUP BY 1, 2),
        |cand AS (SELECT query_id, id FROM (
        |  SELECT query_id, id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY (ddot::DOUBLE / sqrt(dn2::DOUBLE)) DESC, id) AS arank
        |  FROM scored)
        |  WHERE arank <= 50)
        |SELECT query_id, neighbor_id, rnk FROM (
        |  SELECT c.query_id, c.id AS neighbor_id,
        |    row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY list_cosine_similarity(q.v, e.v) DESC, c.id) AS rnk
        |  FROM cand c JOIN eb e ON c.id = e.vec_id
        |  JOIN qs q ON c.query_id = q.query_id)
        |WHERE rnk <= 10""".stripMargin)
  }

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

    // MinHash + LSH near-dup candidates — exact oracle over the same
    // banded signature arithmetic (constants inlined from Dedup.perm).
    decl("q42_minhash_lsh",
      (s, d) => Dedup.minhashLshPairs(t(s, d, "documents"),
        col("doc_id"), col("text"), n = 3, maxDf = 50,
        bands = 8, rowsPerBand = 4, minEstJaccard = 0.5),
      q42Oracle),

    // SimHash near-dup pairs — pigeonhole candidate generation with
    // chunks = maxHamming+1 guarantees 100% recall, so the brute-force
    // SQL signature pipeline is an exact oracle.
    decl("q43_simhash",
      (s, d) => Dedup.simhashPairs(t(s, d, "documents"),
          col("doc_id"), col("text"), maxHamming = 6)
        .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming")),
      q43Oracle),

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

    // LSH-bucketed ANN — the scale path; exact oracle with the plane
    // sign matrix inlined from Similarity.planeSign.
    decl("q45_ann_lsh",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.cosineTopKLsh(
          e.filter(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding")),
          e.select(col("vec_id"), col("embedding")), k = 10, dim = 64, planes = 6)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"))
      },
      q45Oracle),

    // Embedding-cosine near-dup pairs — sign-LSH bucketed; the oracle
    // mirrors the bucketing with the same plane constants, so the
    // bucket-local pair semantics are exactly checked.
    decl("q92_cosine_neardup",
      (s, d) => Similarity.cosineNearDupPairs(
          t(s, d, "embeddings").select(col("vec_id"), col("embedding")),
          dim = 64, threshold = 0.8, planes = 6)
        .select(col("a"), col("b")),
      {
        val bucketExpr = (0 until 6).map { p =>
          val plane = (0 until 64)
            .map(dd => if (Similarity.planeSign(p, dd) > 0) "1.0" else "-1.0")
            .mkString("[", ",", "]")
          s"(CASE WHEN list_inner_product(v, $plane::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
        }.mkString("\n    + ")
        s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e)
           |SELECT l.vec_id AS a, r.vec_id AS b
           |FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
           |WHERE list_cosine_similarity(l.v, r.v) >= 0.8""".stripMargin
      }),

    // IVF ANN with a TRAINED coarse quantizer: two spherical-k-means
    // (Lloyd's) iterations from a deterministic seed (vec_id % 50 = 7),
    // then nprobe=2 cell probing and exact in-cell ranking. The oracle
    // unrolls both Lloyd iterations in SQL — centroid means are folded
    // in sorted member order on BOTH engines (aggregate ↔ list_reduce),
    // so the trained centroids agree bit-for-bit.
    decl("q93_ann_ivf",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val corpus = e.select(col("vec_id"), col("embedding"))
        val seed = e.filter(col("vec_id") % 50 === 7)
          .select(col("vec_id"), col("embedding"))
        val trained = Similarity.kmeansCentroids(corpus, seed, dim = 64,
          maxIterations = 2, earlyStop = false)
        Similarity.ivfTopK(
          e.filter(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding")),
          corpus, trained, k = 10, nprobe = 2)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
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
        |assigned AS (
        |  SELECT neighbor_id, nv, centroid_id FROM (
        |    SELECT e.vec_id AS neighbor_id, e.v AS nv, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM e CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |probes AS (
        |  SELECT query_id, qv, centroid_id FROM (
        |    SELECT e.vec_id AS query_id, e.v AS qv, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.centroid_id) AS prank
        |    FROM e CROSS JOIN c2 c WHERE e.vec_id % 100 = 0)
        |  WHERE prank <= 2)
        |SELECT query_id, neighbor_id, rnk FROM (
        |  SELECT p.query_id, a.neighbor_id,
        |    row_number() OVER (PARTITION BY p.query_id
        |      ORDER BY list_cosine_similarity(p.qv, a.nv) DESC, a.neighbor_id) AS rnk
        |  FROM probes p JOIN assigned a USING (centroid_id)
        |  WHERE p.query_id != a.neighbor_id)
        |WHERE rnk <= 10""".stripMargin),

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

    // BPE-ish pre-token counting (token budgets for training pipelines).
    decl("q94_bpe_tokens",
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          TextAnalysis.bpeTokenCount(
            concat(col("text"), lit(" it's 3.14 done"))).as("n_bpe"),
          TextAnalysis.tokenCount(col("text")).as("n_ws")),
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text || ' it''s 3.14 done',
         |    '${TextAnalysis.BpePattern.replace("'", "''")}'))::BIGINT AS n_bpe,
         |  (length(text) - length(replace(text, ' ', '')) + 1) AS n_ws
         |FROM documents""".stripMargin),

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

    // Multimodal frame sampling: one video row explodes into stride-4
    // frame rows (the flatMap shape a real decoder pipeline uses); the
    // oracle replays the frame-count and sampling arithmetic from byte
    // lengths — so the explode's CARDINALITY contract (and the exact
    // frame numbers via max) is hash-gated, not just row counts.
    // Scale shape: pure per-row flatMap, no shuffle until the count agg.
    decl("q207_multimodal_frame_sample",
      (s, d) => {
        // content deliberately SHORT (8..32 bytes) so frame offsets wrap
        // past the blob and tail slices come up short of 16 — the
        // arithmetic the oracle replays is the interesting half
        val media = t(s, d, "documents")
          .filter(col("doc_id") % 3 === 2)
          .select(col("doc_id").as("media_id"),
            lit("video").as("modality"),
            encode(expr("substring(text, 1, 8 + cast(doc_id % 25 as int))"),
              "UTF-8").as("content"))
        Multimodal.sampleFrames(media, stride = 4)
          .groupBy("media_id")
          .agg(count(lit(1)).as("n_sampled"),
            max(col("frame_no")).as("max_frame_no"),
            sum(octet_length(col("frame_bytes")).cast("long")).as("frame_bytes_total"))
      },
      """WITH m AS (SELECT doc_id AS media_id,
        |  strlen(left(text, (8 + doc_id % 25)::INT)) AS nb
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id,
        |  ((1 + nb % 32) + 3) // 4 AS n_sampled,
        |  (((1 + nb % 32) - 1) // 4) * 4 AS max_frame_no,
        |  -- each sampled frame slices min(16, nb - (frame_no % nb))
        |  (SELECT SUM(LEAST(16, nb - (f.f % nb)))
        |   FROM (SELECT UNNEST(generate_series(0, (1 + nb % 32) - 1, 4)) AS f) f
        |  )::BIGINT AS frame_bytes_total
        |FROM m""".stripMargin),

    // Multi-table near-dup pairs — recovers pairs straddling a single
    // hyperplane (the q92 single-probe blind spot); oracle rebuilds all
    // eight hash tables with the plane matrices inlined.
    decl("q107_cosine_neardup_multitable",
      (s, d) => Similarity.cosineNearDupPairsTables(
          t(s, d, "embeddings").select(col("vec_id"), col("embedding")),
          dim = 64, threshold = 0.8, planes = 6, tables = 4)
        .select(col("a"), col("b")),
      {
        val mtTables = (0 until 4).map { tbl =>
          val bits = (0 until 6).map { p =>
            val abs = tbl * 6 + p
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
           |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
           |  FROM mtb l JOIN mtb r ON l.tbl = r.tbl AND l.bits = r.bits
           |  WHERE l.vec_id < r.vec_id)
           |SELECT a, b FROM cand
           |JOIN e ea ON cand.a = ea.vec_id
           |JOIN e eb ON cand.b = eb.vec_id
           |WHERE list_cosine_similarity(ea.v, eb.v) >= 0.8""".stripMargin
      }),

    // Multi-feature match scoring (the matcher stage behind candidate
    // generation — J10's pluggable algorithm slot): each part pairs
    // with a mutated twin exercising a different evidence mix —
    // k%3==0 vowel-mangled name (phonetic rescues a 0-Jaccard pair),
    // k%3==1 keeps one of the two tokens (Jaccard 0.5), k%3==2 exact;
    // countries agree for even k, actively mismatch otherwise
    // (negative evidence); years agree unless k%5==0; identifiers
    // shared only for k%7==0 (decisive alone). The oracle recomputes
    // every feature — including the phonetic fingerprints via the SQL
    // soundex — and the clamped weighted sum.
    decl("q125_match_scoring",
      (s, d) => {
        val p = t(s, d, "part")
        val k = col("p_partkey")
        def arr(c: org.apache.spark.sql.Column) = array(c.cast("string"))
        val subjects = p.select((k * 2).as("id"), arr(col("p_name")).as("names"),
          arr(concat(lit("c"), k % 25)).as("countries"),
          arr(lit(1950) + k % 50).as("years"),
          arr(concat(lit("ID"), k)).as("idents"))
        val tname = when(k % 3 === 0, regexp_replace(col("p_name"), "[eiou]", "a"))
          .when(k % 3 === 1, array_join(slice(split(col("p_name"), " "), 1, 1), " "))
          .otherwise(col("p_name"))
        val targets = p.select((k * 2 + 1).as("id"), arr(tname).as("names"),
          arr(concat(lit("c"), when(k % 2 === 0, k % 25).otherwise((k + 1) % 25)))
            .as("countries"),
          arr(lit(1950) + when(k % 5 === 0, k % 50 + 1).otherwise(k % 50))
            .as("years"),
          arr(when(k % 7 === 0, concat(lit("ID"), k))
            .otherwise(concat(lit("XX"), k))).as("idents"))
        val pairs = p.select((k * 2).as("subject_id"), (k * 2 + 1).as("target_id"))
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast("decimal(18,6)").cast("double")
        Matcher.score(pairs, subjects, targets)
          .select(col("subject_id"), col("target_id"),
            dec(col("name_jaccard")).as("name_jaccard"), col("phonetic_eq"),
            col("country_match"), col("year_match"), col("ident_match"),
            dec(col("score")).as("score"))
      },
      s"""WITH base AS (
         |  SELECT p_partkey AS k, p_name,
         |    CASE WHEN p_partkey % 3 = 0
         |           THEN regexp_replace(p_name, '[eiou]', 'a', 'g')
         |         WHEN p_partkey % 3 = 1
         |           THEN array_to_string(string_split(p_name, ' ')[1:1], ' ')
         |         ELSE p_name END AS tname
         |  FROM part),
         |norm AS (
         |  SELECT k,
         |    list_filter(string_split(regexp_replace(trim(lower(p_name)), '\\s+', ' ', 'g'), ' '),
         |      t -> len(t) > 0) AS sw,
         |    list_filter(string_split(regexp_replace(trim(lower(tname)), '\\s+', ' ', 'g'), ' '),
         |      t -> len(t) > 0) AS tw
         |  FROM base),
         |toks0 AS (SELECT DISTINCT tok FROM (
         |  SELECT unnest(sw) AS tok FROM norm
         |  UNION SELECT unnest(tw) FROM norm)),
         |$sqlSoundexCtes,
         |stoks AS (SELECT k, unnest(sw) AS tok FROM norm),
         |ttoks AS (SELECT k, unnest(tw) AS tok FROM norm),
         |sfps AS (SELECT st.k,
         |    array_to_string(list_sort(list_distinct(list(sx.code))), ' ') AS sfp
         |  FROM stoks st JOIN sx ON st.tok = sx.tok GROUP BY st.k),
         |tfps AS (SELECT tt.k,
         |    array_to_string(list_sort(list_distinct(list(sx.code))), ' ') AS tfp
         |  FROM ttoks tt JOIN sx ON tt.tok = sx.tok GROUP BY tt.k),
         |fps AS (SELECT s.k, s.sfp, t.tfp FROM sfps s JOIN tfps t ON s.k = t.k),
         |feat AS (
         |  SELECT n.k,
         |    len(list_intersect(list_distinct(n.sw), list_distinct(n.tw)))::DOUBLE
         |      / (len(list_distinct(n.sw)) + len(list_distinct(n.tw))
         |         - len(list_intersect(list_distinct(n.sw), list_distinct(n.tw))))::DOUBLE
         |      AS name_jaccard,
         |    CASE WHEN f.sfp = f.tfp THEN 1.0 ELSE 0.0 END AS phonetic_eq,
         |    CASE WHEN n.k % 2 = 0 THEN 1.0 ELSE -1.0 END AS country_match,
         |    CASE WHEN n.k % 5 = 0 THEN -1.0 ELSE 1.0 END AS year_match,
         |    CASE WHEN n.k % 7 = 0 THEN 1.0 ELSE 0.0 END AS ident_match
         |  FROM norm n JOIN fps f ON n.k = f.k)
         |SELECT k * 2 AS subject_id, k * 2 + 1 AS target_id,
         |  CAST(CAST(name_jaccard AS DECIMAL(18,6)) AS DOUBLE) AS name_jaccard,
         |  phonetic_eq, country_match, year_match, ident_match,
         |  CAST(CAST(least(greatest(
         |    name_jaccard * 0.4 + phonetic_eq * 0.2 + country_match * 0.15
         |    + year_match * 0.1 + ident_match * 0.6, 0.0), 1.0)
         |    AS DECIMAL(18,6)) AS DOUBLE) AS score
         |FROM feat""".stripMargin),

    // Corpus profiling: per-language volume and length distribution —
    // the data-engineering report that precedes any cleaning run.
    // Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    // `quantile_cont`, rank p·(n−1) linear interpolation); doubles are
    // decimal-rounded so a last-ulp interpolation difference cannot
    // flip the hash.
    decl("q124_corpus_profile",
      (s, d) => {
        val dec = (c: org.apache.spark.sql.Column) =>
          c.cast("decimal(18,6)").cast("double")
        t(s, d, "documents")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"),
            expr("percentile(n_chars, 0.5)").as("p50"),
            expr("percentile(n_chars, 0.95)").as("p95"),
            avg(col("n_chars")).as("mean"))
          .select(col("lang"), col("n_docs"), col("total_chars"),
            col("min_chars"), col("max_chars"),
            dec(col("p50")).as("p50_chars"), dec(col("p95")).as("p95_chars"),
            dec(col("mean")).as("mean_chars"))
      },
      """SELECT lang, COUNT(*)::BIGINT AS n_docs,
        |  SUM(n_chars)::BIGINT AS total_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |  CAST(CAST(quantile_cont(n_chars, 0.5) AS DECIMAL(18,6)) AS DOUBLE)
        |    AS p50_chars,
        |  CAST(CAST(quantile_cont(n_chars, 0.95) AS DECIMAL(18,6)) AS DOUBLE)
        |    AS p95_chars,
        |  CAST(CAST(AVG(n_chars) AS DECIMAL(18,6)) AS DOUBLE) AS mean_chars
        |FROM documents GROUP BY lang""".stripMargin),

    // PII detection + redaction. The synthetic corpus carries no PII,
    // so a deterministic overlay plants emails / IPv4s / phones / cards
    // (Luhn-valid AND Luhn-invalid candidates) from doc_id — replicated
    // verbatim in the oracle — and the operator must detect, validate,
    // and scrub them exactly (counts + md5 of the redacted text).
    decl("q126_pii_redaction",
      (s, d) => {
        val doc = col("doc_id")
        val piiText = concat(col("text"),
          when(doc % 4 === 0, concat(lit(" contact user"), doc.cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
          when(doc % 3 === 0, concat(lit(" from 10."), (doc % 200).cast("string"),
            lit(".0."), (doc % 250).cast("string"), lit(" logged"))).otherwise(lit("")),
          when(doc % 5 === 0, concat(lit(" call +1-555-"),
            lpad((doc % 1000).cast("string"), 3, "0"), lit("-0199"))).otherwise(lit("")),
          when(doc % 7 === 0, lit(" card 4532015112830366 on file"))
            .when(doc % 7 === 1, lit(" card 4532015112830367 on file"))
            .otherwise(lit("")))
        t(s, d, "documents")
          .select(doc, piiText.as("pt"))
          .select(doc, Pii.counts(col("pt")).as("c"),
            md5(Pii.redact(col("pt"))).as("redacted_md5"))
          .select(doc, col("c.n_emails"), col("c.n_ips"), col("c.n_phones"),
            col("c.n_cards"), col("c.n_valid_cards"), col("redacted_md5"))
      },
      {
        val luhn = "(list_sum(list_transform(generate_series(1, len(d)), i -> " +
          "CASE WHEN i % 2 = 0 THEN (CASE WHEN (ascii(substr(reverse(d), i, 1)) - 48) * 2 > 9 " +
          "THEN (ascii(substr(reverse(d), i, 1)) - 48) * 2 - 9 " +
          "ELSE (ascii(substr(reverse(d), i, 1)) - 48) * 2 END) " +
          "ELSE (ascii(substr(reverse(d), i, 1)) - 48) END)) % 10 = 0)"
        s"""WITH pii AS (
           |  SELECT doc_id, text
           |    || CASE WHEN doc_id % 4 = 0 THEN ' contact user' || doc_id::VARCHAR || '@example.com now' ELSE '' END
           |    || CASE WHEN doc_id % 3 = 0 THEN ' from 10.' || (doc_id % 200)::VARCHAR || '.0.' || (doc_id % 250)::VARCHAR || ' logged' ELSE '' END
           |    || CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-0199' ELSE '' END
           |    || CASE WHEN doc_id % 7 = 0 THEN ' card 4532015112830366 on file'
           |       WHEN doc_id % 7 = 1 THEN ' card 4532015112830367 on file' ELSE '' END
           |    AS pt
           |  FROM documents)
           |SELECT doc_id,
           |  len(regexp_extract_all(pt, '${Pii.EmailPattern}'))::BIGINT AS n_emails,
           |  len(regexp_extract_all(pt, '${Pii.Ipv4Pattern}'))::BIGINT AS n_ips,
           |  len(regexp_extract_all(pt, '${Pii.PhonePattern}'))::BIGINT AS n_phones,
           |  len(regexp_extract_all(pt, '${Pii.CardPattern}'))::BIGINT AS n_cards,
           |  len(list_filter(regexp_extract_all(pt, '${Pii.CardPattern}'), d -> $luhn))::BIGINT AS n_valid_cards,
           |  md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(pt,
           |    '${Pii.EmailPattern}', '[EMAIL]', 'g'),
           |    '${Pii.CardPattern}', '[CARD]', 'g'),
           |    '${Pii.PhonePattern}', '[PHONE]', 'g'),
           |    '${Pii.Ipv4Pattern}', '[IP]', 'g')) AS redacted_md5
           |FROM pii""".stripMargin
      }),

    // Benchmark contamination: eval-split docs sharing verbatim 8-gram
    // shingles with the train split. The split rides the q121 hash
    // assignment (salt 'contam'); a planted 15-word phrase on doc_id%9
    // docs guarantees cross-split overlap, and the corpus's own planted
    // near-duplicates surface as fully-contaminated eval docs. Oracle
    // rebuilds split, shingles, and overlap join in SQL.
    decl("q127_benchmark_contamination",
      (s, d) => {
        val phrase = "benchmark question answer pair leaks verbatim into " +
          "the training corpus and must be caught"
        val docs = t(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 9 === 0, lit(" " + phrase))
              .otherwise(lit(""))).as("pt"))
        val withSplit = Sampling.assignSplits(docs, col("doc_id"), "contam",
          Seq("train" -> 9000, "eval" -> 1000))
        Contamination.report(withSplit, col("doc_id"), col("pt"), col("split"))
      },
      {
        val phrase = "benchmark question answer pair leaks verbatim into " +
          "the training corpus and must be caught"
        s"""WITH d0 AS (
           |  SELECT doc_id,
           |    text || CASE WHEN doc_id % 9 = 0 THEN ' $phrase' ELSE '' END AS pt,
           |    CASE WHEN ${sqlHash60("('contam|' || doc_id::VARCHAR)")} % 10000 >= 9000
           |      THEN 'eval' ELSE 'train' END AS split
           |  FROM documents),
           |w AS (SELECT doc_id, split, string_split(pt, ' ') AS w FROM d0),
           |sh AS (SELECT doc_id, split, unnest(list_transform(generate_series(1, len(w) - 7),
           |       i -> array_to_string(w[i:i+7], ' '))) AS shingle FROM w WHERE len(w) >= 8),
           |tr AS (SELECT DISTINCT shingle FROM sh WHERE split = 'train'),
           |ev AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE split = 'eval'),
           |tot AS (SELECT doc_id, COUNT(*)::BIGINT AS n_shingles FROM ev GROUP BY 1),
           |shr AS (SELECT ev.doc_id AS doc_id, COUNT(*)::BIGINT AS n_shared
           |        FROM ev JOIN tr USING (shingle) GROUP BY 1)
           |SELECT d.doc_id,
           |  coalesce(tot.n_shingles, 0)::BIGINT AS n_shingles,
           |  coalesce(shr.n_shared, 0)::BIGINT AS n_shared,
           |  coalesce(CAST(CAST(shr.n_shared::DOUBLE / nullif(tot.n_shingles, 0)
           |    AS DECIMAL(9,6)) AS DOUBLE), 0.0) AS contam_frac,
           |  coalesce(shr.n_shared, 0) >= 5 AS contaminated
           |FROM (SELECT doc_id FROM d0 WHERE split = 'eval') d
           |LEFT JOIN tot ON d.doc_id = tot.doc_id
           |LEFT JOIN shr ON d.doc_id = shr.doc_id""".stripMargin
      }),

    // C4-style line-level cleaning. The corpus has no line structure,
    // so the query manufactures it deterministically (7-word chunks,
    // terminal '.' on (doc_id+chunk)%3!=0, planted boilerplate / code /
    // too-short junk lines) — replicated verbatim in the oracle — and
    // the operator's keep rule must prune exactly: terminal punct,
    // >=4 words, no "lorem ipsum", no brace.
    decl("q128_c4_line_cleaning",
      (s, d) => {
        val doc = col("doc_id")
        val wc = size(col("w"))
        val nchunks = ((wc + lit(6)) / lit(7)).cast("int")
        val lines0 = transform(sequence(lit(1), nchunks), c =>
          concat(
            concat_ws(" ", slice(col("w"), (c - 1) * 7 + 1,
              least(lit(7), wc - (c - 1) * 7))),
            when((doc + c) % 3 =!= 0, lit(".")).otherwise(lit(""))))
        val emptyArr = array().cast("array<string>")
        val junk = concat(
          when(doc % 4 === 0, array(lit("lorem ipsum dolor sit amet line.")))
            .otherwise(emptyArr),
          when(doc % 6 === 0, array(lit("function init() { return 0; }")))
            .otherwise(emptyArr),
          when(doc % 5 === 0, array(lit("tiny line."))).otherwise(emptyArr))
        t(s, d, "documents")
          .select(doc, split(col("text"), " ").as("w"))
          .select(doc, concat(lines0, junk).as("lines"))
          .select(doc, size(col("lines")).cast("long").as("n_lines"),
            TextAnalysis.c4CleanLines(col("lines")).as("kept"))
          .select(doc, col("n_lines"), size(col("kept")).cast("long").as("n_kept"),
            md5(array_join(col("kept"), "\n")).as("cleaned_md5"))
      },
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |chunks AS (
        |  SELECT doc_id, list_transform(generate_series(1, ((len(w) + 6) // 7)), c ->
        |    array_to_string(w[(c-1)*7+1 : least(c*7, len(w))], ' ')
        |    || CASE WHEN (doc_id + c) % 3 != 0 THEN '.' ELSE '' END) AS lines0
        |  FROM w),
        |planted AS (
        |  SELECT doc_id, list_concat(lines0,
        |    CASE WHEN doc_id % 4 = 0 THEN ['lorem ipsum dolor sit amet line.'] ELSE [] END
        |    || CASE WHEN doc_id % 6 = 0 THEN ['function init() { return 0; }'] ELSE [] END
        |    || CASE WHEN doc_id % 5 = 0 THEN ['tiny line.'] ELSE [] END) AS lines
        |  FROM chunks),
        |cleaned AS (
        |  SELECT doc_id, len(lines)::BIGINT AS n_lines,
        |    list_filter(lines, l ->
        |      substr(l, len(l), 1) = '.'
        |      AND (length(l) - length(replace(l, ' ', '')) + 1) >= 4
        |      AND NOT contains(l, 'lorem ipsum')
        |      AND NOT contains(l, '{')) AS kept
        |  FROM planted)
        |SELECT doc_id, n_lines, len(kept)::BIGINT AS n_kept,
        |  md5(coalesce(array_to_string(kept, chr(10)), '')) AS cleaned_md5
        |FROM cleaned""".stripMargin),

    // Bigram-LM quality scoring (the KenLM/CCNet perplexity filter in
    // exact arithmetic): model = train-split bigram + prefix counts,
    // score = per-eval-doc average NLL under add-one smoothing. An OOV
    // tail planted on doc_id%3 docs exercises the unseen-bigram path;
    // the oracle rebuilds split, model tables, and scoring in SQL.
    decl("q129_lm_quality_score",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" zxqv"), (col("doc_id") % 7).cast("string"), lit(" glorp")))
              .otherwise(lit(""))).as("pt"))
        val withSplit = Sampling.assignSplits(docs, col("doc_id"), "lm",
          Seq("train" -> 9000, "eval" -> 1000))
        TextAnalysis.bigramLmReport(withSplit, col("doc_id"), col("pt"), col("split"))
      },
      s"""WITH d0 AS (
         |  SELECT doc_id,
         |    text || CASE WHEN doc_id % 3 = 0 THEN ' zxqv' || (doc_id % 7)::VARCHAR || ' glorp' ELSE '' END AS pt,
         |    CASE WHEN ${sqlHash60("('lm|' || doc_id::VARCHAR)")} % 10000 >= 9000
         |      THEN 'eval' ELSE 'train' END AS split
         |  FROM documents),
         |w AS (SELECT doc_id, split, string_split(pt, ' ') AS w FROM d0),
         |bg AS (SELECT doc_id, split,
         |         unnest(list_transform(generate_series(1, len(w) - 1),
         |           i -> {'w1': w[i], 'w2': w[i+1]})) AS b
         |       FROM w WHERE len(w) >= 2),
         |tbg AS (SELECT b.w1 AS w1, b.w2 AS w2, COUNT(*)::BIGINT AS c2
         |        FROM bg WHERE split = 'train' GROUP BY 1, 2),
         |tpre AS (SELECT w1, SUM(c2)::BIGINT AS c1 FROM tbg GROUP BY 1),
         |vocab AS (SELECT COUNT(DISTINCT un.u)::BIGINT AS v FROM (
         |  SELECT unnest(w) AS u FROM w WHERE split = 'train') un),
         |ev AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg WHERE split = 'eval'),
         |scored AS (
         |  SELECT ev.doc_id AS doc_id,
         |    coalesce(tbg.c2, 0) AS c2, coalesce(tpre.c1, 0) AS c1
         |  FROM ev LEFT JOIN tbg ON ev.w1 = tbg.w1 AND ev.w2 = tbg.w2
         |          LEFT JOIN tpre ON ev.w1 = tpre.w1),
         |agg AS (
         |  SELECT s.doc_id AS doc_id, COUNT(*)::BIGINT AS n_bigrams,
         |    SUM(CASE WHEN s.c2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_unseen,
         |    CAST(CAST(AVG(ln((s.c1 + vocab.v)::DOUBLE) - ln((s.c2 + 1)::DOUBLE))
         |      AS DECIMAL(12,4)) AS DOUBLE) AS avg_nll
         |  FROM scored s, vocab GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(agg.n_bigrams, 0)::BIGINT AS n_bigrams,
         |  coalesce(agg.n_unseen, 0)::BIGINT AS n_unseen,
         |  coalesce(agg.avg_nll, 0.0) AS avg_nll
         |FROM (SELECT DISTINCT doc_id FROM d0 WHERE split = 'eval') d
         |LEFT JOIN agg ON d.doc_id = agg.doc_id""".stripMargin
      ),

    // The COMPOSED curation pipeline, decontamination direction the
    // real one: exact dedup → PII scrub → hash split → drop TRAIN docs
    // leaking held-out content (≥5 shared 8-gram shingles with the
    // eval set) → repetition quality gate → one manifest row per doc
    // with ordered drop reasons. Planted clone bodies (doc_id%31=7),
    // doc-specific repetitive bodies (doc_id%23=5), PII overlays, and
    // the cross-split phrase make every reason reachable; the oracle
    // rebuilds the whole flow in SQL. (The q129 LM gate composes the
    // same way — verified separately to keep this oracle bounded.)
    decl("q130_curation_manifest",
      (s, d) => {
        val doc = col("doc_id")
        val phrase = "benchmark question answer pair leaks verbatim into " +
          "the training corpus and must be caught"
        val repBody = array_join(array_repeat(
          concat(lit("w"), doc.cast("string"), lit(" z"), doc.cast("string")), 25), " ")
        val base = t(s, d, "documents").select(doc,
          when(doc % 31 === 7,
            lit("cloned doc body repeated across the corpus for dedup testing purposes"))
            .when(doc % 23 === 5, repBody)
            .otherwise(col("text")).as("orig"))
        val pt = concat(col("orig"),
          when(doc % 4 === 0, concat(lit(" contact user"), doc.cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
          when(doc % 5 === 0, concat(lit(" call +1-555-"),
            lpad((doc % 1000).cast("string"), 3, "0"), lit("-0199"))).otherwise(lit("")),
          when(doc % 9 === 0, lit(" " + phrase)).otherwise(lit("")))
        val red = base.select(doc, col("orig"), pt.as("pt"))
          .select(doc, col("orig"), Pii.counts(col("pt")).as("c"),
            Pii.redact(col("pt")).as("rt"))
          .select(doc, col("orig"), col("rt"),
            (col("c.n_emails") + col("c.n_ips") + col("c.n_phones") +
              col("c.n_cards")).as("n_pii"))
        val sp = Sampling.assignSplits(red, doc, "cur",
          Seq("train" -> 9000, "eval" -> 1000))
        val keepers = Dedup.exact(base, doc, col("orig"))
          .select(col("keeper_id").as("doc_id"), lit(true).as("is_keeper"))
        val evalSh = Contamination.shingleSet(
          sp.filter(col("split") === "eval"), doc, col("rt"))
          .select("shingle").distinct()
        val shr = Contamination.shingleSet(
          sp.filter(col("split") === "train"), doc, col("rt"))
          .join(evalSh, Seq("shingle"))
          .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        val qual = TextAnalysis.repetitionSignals(sp, doc, col("rt"))
          .select(col("doc_id"), col("n_words"), col("dup_bigram_frac"))
        val reason = when(coalesce(col("is_keeper"), lit(false)) === false, "duplicate")
          .when(col("split") === "eval", "heldout")
          .when(coalesce(col("n_shared"), lit(0L)) >= 5, "contaminated")
          .when(col("n_words") < 20, "too_short")
          .when(coalesce(col("dup_bigram_frac"), lit(0.0)) > 0.30, "repetitive")
          .otherwise("")
        sp.join(keepers, Seq("doc_id"), "left")
          .join(shr, Seq("doc_id"), "left")
          .join(qual, Seq("doc_id"), "left")
          .select(doc, reason.as("drop_reason"), (reason === "").as("kept"),
            col("n_pii").cast("long").as("n_pii"),
            coalesce(col("n_shared"), lit(0L)).cast("long").as("n_shared"),
            col("n_words").cast("long").as("n_tokens"),
            md5(col("rt")).as("clean_md5"))
      },
      {
        val phrase = "benchmark question answer pair leaks verbatim into " +
          "the training corpus and must be caught"
        val reasonSql =
          """CASE WHEN ex.keeper IS NULL THEN 'duplicate'
            |       WHEN r.split = 'eval' THEN 'heldout'
            |       WHEN coalesce(shr.n_shared, 0) >= 5 THEN 'contaminated'
            |       WHEN q.n_words < 20 THEN 'too_short'
            |       WHEN q.dup_bigram_frac > 0.30 THEN 'repetitive'
            |       ELSE '' END""".stripMargin
        s"""WITH b AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 31 = 7 THEN 'cloned doc body repeated across the corpus for dedup testing purposes'
           |         WHEN doc_id % 23 = 5 THEN array_to_string(list_transform(generate_series(1, 25),
           |           i -> 'w' || doc_id::VARCHAR || ' z' || doc_id::VARCHAR), ' ')
           |         ELSE text END AS orig
           |  FROM documents),
           |pt AS (
           |  SELECT doc_id, orig, orig
           |    || CASE WHEN doc_id % 4 = 0 THEN ' contact user' || doc_id::VARCHAR || '@example.com now' ELSE '' END
           |    || CASE WHEN doc_id % 5 = 0 THEN ' call +1-555-' || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-0199' ELSE '' END
           |    || CASE WHEN doc_id % 9 = 0 THEN ' $phrase' ELSE '' END AS pt
           |  FROM b),
           |ex AS (SELECT min(doc_id) AS keeper FROM pt GROUP BY md5(orig)),
           |rt AS (
           |  SELECT doc_id,
           |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(pt,
           |      '${Pii.EmailPattern}', '[EMAIL]', 'g'), '${Pii.CardPattern}', '[CARD]', 'g'),
           |      '${Pii.PhonePattern}', '[PHONE]', 'g'), '${Pii.Ipv4Pattern}', '[IP]', 'g') AS rt,
           |    len(regexp_extract_all(pt, '${Pii.EmailPattern}')) + len(regexp_extract_all(pt, '${Pii.Ipv4Pattern}'))
           |      + len(regexp_extract_all(pt, '${Pii.PhonePattern}')) + len(regexp_extract_all(pt, '${Pii.CardPattern}')) AS n_pii,
           |    CASE WHEN ${sqlHash60("('cur|' || doc_id::VARCHAR)")} % 10000 >= 9000
           |      THEN 'eval' ELSE 'train' END AS split
           |  FROM pt),
           |w AS (SELECT doc_id, split, string_split(rt, ' ') AS w FROM rt),
           |sh AS (SELECT DISTINCT doc_id, split, unnest(list_transform(generate_series(1, len(w) - 7),
           |       i -> array_to_string(w[i:i+7], ' '))) AS shingle FROM w WHERE len(w) >= 8),
           |evs AS (SELECT DISTINCT shingle FROM sh WHERE split = 'eval'),
           |shr AS (SELECT s.doc_id AS doc_id, COUNT(*)::BIGINT AS n_shared
           |        FROM sh s JOIN evs USING (shingle) WHERE s.split = 'train' GROUP BY 1),
           |qual AS (
           |  SELECT doc_id, len(w)::BIGINT AS n_words,
           |    CASE WHEN len(w) >= 2 THEN
           |      (((len(w) - 1 - len(list_distinct(list_transform(generate_series(1, len(w) - 1),
           |        i -> w[i] || ' ' || w[i+1]))))::DOUBLE / (len(w) - 1)::DOUBLE)::DECIMAL(9,6))::DOUBLE
           |    ELSE 0.0 END AS dup_bigram_frac
           |  FROM w)
           |SELECT r.doc_id,
           |  $reasonSql AS drop_reason,
           |  ($reasonSql) = '' AS kept,
           |  r.n_pii::BIGINT AS n_pii,
           |  coalesce(shr.n_shared, 0)::BIGINT AS n_shared,
           |  q.n_words AS n_tokens,
           |  md5(r.rt) AS clean_md5
           |FROM rt r
           |LEFT JOIN ex ON r.doc_id = ex.keeper
           |LEFT JOIN shr ON r.doc_id = shr.doc_id
           |JOIN qual q ON r.doc_id = q.doc_id""".stripMargin
      }),

    // URL canonicalization + URL-level dedup (the crawl-pipeline key:
    // collapse scheme/host case, www., default ports, fragments, utm_*
    // params, param order, and trailing slashes BEFORE any content
    // comparison). Four planted raw-URL shapes per doc; keeper = min
    // doc_id per canonical form. Path case stays significant.
    decl("q131_url_canonical",
      (s, d) => {
        val doc = col("doc_id")
        val raw = when(doc % 4 === 0,
          concat(lit("HTTPS://WWW.Example"), (doc % 20).cast("string"),
            lit(".COM:443/Articles/"), (doc % 50).cast("string"),
            lit("/?utm_source=feed&b=2&a=1&utm_campaign=x#frag")))
          .when(doc % 4 === 1,
            concat(lit("http://example"), (doc % 20).cast("string"),
              lit(".com/Articles/"), (doc % 50).cast("string"), lit("/")))
          .when(doc % 4 === 2,
            concat(lit("https://www.example"), (doc % 20).cast("string"),
              lit(".com/articles/"), (doc % 50).cast("string"), lit("?a=1&b=2")))
          .otherwise(concat(lit("https://Example"), (doc % 20).cast("string"),
            lit(".com")))
        val urls = t(s, d, "documents").select(doc,
          graft.functions.Urls.canonicalUrl(raw).as("canonical_url"))
        val groups = urls.groupBy("canonical_url")
          .agg(min(doc).as("keeper_id"), count(lit(1)).as("n_docs"))
        urls.join(groups, Seq("canonical_url"))
          .select(doc, col("canonical_url"), col("keeper_id"), col("n_docs"))
      },
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'HTTPS://WWW.Example' || (doc_id % 20)::VARCHAR || '.COM:443/Articles/' || (doc_id % 50)::VARCHAR || '/?utm_source=feed&b=2&a=1&utm_campaign=x#frag'
        |      WHEN 1 THEN 'http://example' || (doc_id % 20)::VARCHAR || '.com/Articles/' || (doc_id % 50)::VARCHAR || '/'
        |      WHEN 2 THEN 'https://www.example' || (doc_id % 20)::VARCHAR || '.com/articles/' || (doc_id % 50)::VARCHAR || '?a=1&b=2'
        |      ELSE 'https://Example' || (doc_id % 20)::VARCHAR || '.com'
        |    END AS raw
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id,
        |    lower(regexp_extract(raw, '^([A-Za-z]+)://', 1)) AS scheme,
        |    regexp_replace(lower(regexp_extract(raw, '^[A-Za-z]+://([^/?#]+)', 1)), '^www\.|:443$|:80$', '', 'g') AS host,
        |    regexp_extract(raw, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path,
        |    regexp_extract(raw, '\?([^#]*)', 1) AS query
        |  FROM u),
        |canon AS (
        |  SELECT doc_id, scheme || '://' || host ||
        |    CASE WHEN path = '' OR path = '/' THEN '/'
        |         WHEN substr(path, len(path), 1) = '/' THEN substr(path, 1, len(path) - 1)
        |         ELSE path END ||
        |    CASE WHEN cq != '' THEN '?' || cq ELSE '' END AS canonical_url
        |  FROM (SELECT *, array_to_string(list_sort(list_filter(string_split(query, '&'),
        |          p -> p != '' AND NOT starts_with(p, 'utm_'))), '&') AS cq FROM parts)),
        |g AS (SELECT canonical_url, min(doc_id) AS keeper_id, COUNT(*)::BIGINT AS n_docs
        |      FROM canon GROUP BY 1)
        |SELECT c.doc_id, c.canonical_url, g.keeper_id, g.n_docs
        |FROM canon c JOIN g USING (canonical_url)""".stripMargin),

    // Token-level sequence packing (concat-and-chop pretraining
    // layout). The global offset prefix-sum runs two-phase (per-bucket
    // window + tiny bucket-offset frame) so no corpus-wide ordered
    // window exists; the oracle computes the same offsets with a plain
    // global cumsum, proving the decomposition exact.
    decl("q132_sequence_packing",
      (s, d) => Packing.packManifest(t(s, d, "documents"),
        col("doc_id"), col("text"), seqLen = 512L, bucketSize = 100L),
      """WITH toks AS (
        |  SELECT doc_id,
        |    (length(text) - length(replace(text, ' ', '')) + 2)::BIGINT AS n_tokens
        |  FROM documents),
        |run AS (
        |  SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM toks)
        |SELECT doc_id, n_tokens,
        |  (cum - n_tokens)::BIGINT AS off_start,
        |  ((cum - n_tokens) // 512)::BIGINT AS seq_first,
        |  ((cum - 1) // 512)::BIGINT AS seq_last
        |FROM run""".stripMargin),

    // Banded range join: every lineitem shipped inside a promo window
    // ([order date, +7d] for a count-bounded promo set — bounded like
    // q101's query sample so the fan-out stays linear in the corpus).
    // The interval explodes into its ≤2 seven-day bands; the join is a
    // hash equi-join on the band with the exact BETWEEN as residual —
    // never a nested loop. DuckDB evaluates the plain BETWEEN join.
    decl("q122_range_join",
      (s, d) => {
        val day0 = lit("1995-01-01").cast("date")
        val promos = t(s, d, "orders")
          .filter(col("o_orderkey") % 97 === 0 && col("o_orderkey") < 97L * 200)
          .select(col("o_orderkey").as("promo_id"),
            datediff(col("o_orderdate").cast("date"), day0).cast("long").as("lo"))
          .withColumn("hi", col("lo") + 7)
        val pts = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            datediff(col("l_shipdate").cast("date"), day0).cast("long").as("pd"))
        RangeJoin.pointInInterval(pts, promos, "pd", "lo", "hi", bandWidth = 7)
          .select(col("l_orderkey"), col("l_linenumber"), col("pd"),
            col("promo_id"))
      },
      """WITH promos AS (
        |  SELECT o_orderkey AS promo_id,
        |    date_diff('day', DATE '1995-01-01', o_orderdate::DATE) AS lo,
        |    date_diff('day', DATE '1995-01-01', o_orderdate::DATE) + 7 AS hi
        |  FROM orders WHERE o_orderkey % 97 = 0 AND o_orderkey < 19400),
        |pts AS (
        |  SELECT l_orderkey, l_linenumber,
        |    date_diff('day', DATE '1995-01-01', l_shipdate::DATE) AS pd
        |  FROM lineitem)
        |SELECT l_orderkey, l_linenumber, pd, promo_id
        |FROM pts JOIN promos ON pd BETWEEN lo AND hi""".stripMargin),

    // Gap-based sessionization: one window shuffle turns the event
    // stream into per-user sessions (30-minute gap rule); the oracle
    // replicates the lag/cumsum construction. Per-row break flags
    // depend only on the predecessor's timestamp, so equal-timestamp
    // orderings cannot change any session assignment.
    decl("q120_sessionize",
      (s, d) => {
        val ev = eventsMicros(s, d).select(col("user_id"), col("tsu"))
        Sampling.sessionize(ev, col("user_id"), col("tsu"),
            maxGap = 30L * 60 * 1000000)
          .groupBy(col("user_id"), col("session_idx"))
          .agg(count(lit(1)).as("n_events"),
            min(col("tsu")).as("start_tsu"), max(col("tsu")).as("end_tsu"))
      },
      """WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000 AS tsu FROM events),
        |lagd AS (SELECT user_id, tsu,
        |    CASE WHEN lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) IS NULL
        |           OR tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu)
        |              <= 1800000000 THEN 0 ELSE 1 END AS brk
        |  FROM ev),
        |sess AS (SELECT user_id, tsu,
        |    (SUM(brk) OVER (PARTITION BY user_id ORDER BY tsu
        |      ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
        |  FROM lagd)
        |SELECT user_id, session_idx, COUNT(*)::BIGINT AS n_events,
        |  MIN(tsu) AS start_tsu, MAX(tsu) AS end_tsu
        |FROM sess GROUP BY user_id, session_idx""".stripMargin),

    // Deterministic hash-based train/valid/test split: the assignment
    // is a pure function of the document id (corpus growth or cluster
    // layout can never migrate a document between splits — the
    // train/eval-contamination guard). Every single assignment is
    // hash-checked via the md5-prefix hash's exact SQL mirror.
    decl("q121_stratified_split",
      (s, d) => Sampling.assignSplits(
          t(s, d, "documents").select(col("doc_id"), col("lang")),
          col("doc_id"), "graft",
          Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))
        .select(col("doc_id"), col("lang"), col("split")),
      s"""SELECT doc_id, lang,
         |  CASE WHEN b < 8000 THEN 'train'
         |       WHEN b < 9000 THEN 'valid' ELSE 'test' END AS split
         |FROM (SELECT doc_id, lang,
         |  ${sqlHash60("('graft|' || doc_id::VARCHAR)")} % 10000 AS b
         |  FROM documents)""".stripMargin),

    // Cluster-safe split (round-12): q121's hash split leaks when two
    // NEAR-DUPLICATE documents land on opposite sides of the
    // train/test fence — the paraphrase of a test document trains the
    // model on its own eval set. The leakage-safe production rule:
    // split by CLUSTER, not by document — every member of a near-dup
    // cluster follows its component's hash. Composed entirely from
    // shipped operators (minhashLshPairs → ConnectedComponents.run →
    // assignSplits on the component id); the oracle replays the
    // minhash pipeline, closes components with a recursive CTE
    // (component = min reachable id, the CC label convention), and
    // re-derives every assignment from the md5-prefix hash mirror.
    // Scale: pairs are banded-LSH bucket joins; CC's fixpoint shuffles
    // only the (small) pair graph plus one id-level grouping to attach
    // isolated docs; the split itself is a pure projection on the
    // component id.
    decl("q253_cluster_safe_split",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
          n = 3, maxDf = 50, bands = 8, rowsPerBand = 4, minEstJaccard = 0.5)
        val labels = ConnectedComponents.run(
          docs.select(col("doc_id").as("id")),
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        Sampling.assignSplits(
            labels.select(col("id").as("doc_id"), col("component")),
            col("component"), "graft",
            Seq("train" -> 8000, "valid" -> 1000, "test" -> 1000))
          .select(col("doc_id"), col("component"), col("split"))
      },
      s"""WITH RECURSIVE $minhashSigCtes,
         |prs AS (
         |  SELECT a.doc AS da, b.doc AS db
         |  FROM sig a JOIN sig b ON a.doc < b.doc
         |  WHERE ($minhashBandEq)
         |    AND ($minhashEqSum)::DOUBLE / 32.0 >= 0.5),
         |sym AS (SELECT da AS x, db AS y FROM prs
         |        UNION SELECT db, da FROM prs),
         |reach(id, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x),
         |comp AS (SELECT id AS doc_id, MIN(m) AS component
         |         FROM reach GROUP BY id)
         |SELECT doc_id, component,
         |  CASE WHEN b < 8000 THEN 'train'
         |       WHEN b < 9000 THEN 'valid' ELSE 'test' END AS split
         |FROM (SELECT doc_id, component,
         |  ${sqlHash60("('graft|' || component::VARCHAR)")} % 10000 AS b
         |  FROM comp)""".stripMargin),

    // q283 (round-13): CANONICAL-DOCUMENT ELECTION — the step a dedup
    // pipeline runs AFTER clustering: per near-dup component, keep one
    // representative (longest text, then smallest id — a total order,
    // so any engine and any partitioning elect identically) and mark
    // the rest as duplicates of it. The election is a single
    // max_by(id, (len, −id)) aggregate — mergeable partial state, no
    // window, no sort — while the ORACLE elects via a per-component
    // ROW_NUMBER window, so the gate proves the aggregate ≡ rank-1
    // rewrite (the q282 min_by lesson at component granularity).
    decl("q283_dedup_canonical_election",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
          n = 3, maxDf = 50, bands = 8, rowsPerBand = 4, minEstJaccard = 0.5)
        val labels = ConnectedComponents.run(
          docs.select(col("doc_id").as("id")),
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        val withLen = labels.join(
          docs.select(col("doc_id").as("id"),
            size(split(col("text"), " ")).cast("long").as("len")), "id")
        val elect = withLen.groupBy("component")
          .agg(max_by(col("id"), struct(col("len"), -col("id")))
            .as("canonical_id"), count(lit(1)).as("comp_size"))
        withLen.join(elect, "component")
          .select(col("id").as("doc_id"), col("component"), col("len"),
            col("canonical_id"), col("comp_size"),
            when(col("id") === col("canonical_id"), lit("kept"))
              .otherwise(lit("dup")).as("status"))
      },
      s"""WITH RECURSIVE $minhashSigCtes,
         |prs AS (
         |  SELECT a.doc AS da, b.doc AS db
         |  FROM sig a JOIN sig b ON a.doc < b.doc
         |  WHERE ($minhashBandEq)
         |    AND ($minhashEqSum)::DOUBLE / 32.0 >= 0.5),
         |sym AS (SELECT da AS x, db AS y FROM prs
         |        UNION SELECT db, da FROM prs),
         |reach(id, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x),
         |comp AS (SELECT id, MIN(m) AS component FROM reach GROUP BY id),
         |wl AS (SELECT comp.id, comp.component,
         |       len(string_split(d.text, ' '))::BIGINT AS len
         |       FROM comp JOIN documents d ON comp.id = d.doc_id),
         |rk AS (SELECT id, component, len,
         |       ROW_NUMBER() OVER (PARTITION BY component
         |         ORDER BY len DESC, id ASC) AS rn
         |       FROM wl),
         |el AS (SELECT component, MIN(CASE WHEN rn = 1 THEN id END)
         |         AS canonical_id, COUNT(*)::BIGINT AS comp_size
         |       FROM rk GROUP BY 1)
         |SELECT wl.id AS doc_id, wl.component, wl.len, el.canonical_id,
         |  el.comp_size,
         |  CASE WHEN wl.id = el.canonical_id THEN 'kept' ELSE 'dup' END
         |    AS status
         |FROM wl JOIN el USING (component)""".stripMargin),

    // q280 (round-13): CLUSTERING-QUALITY EVALUATION — pairwise
    // precision/recall and B-cubed of the LSH near-dup clustering
    // (q253's predicted components) against the EXACT Jaccard
    // clustering (q171's integer-threshold join, closed into
    // components) as reference. The reference threshold is a STRICT
    // 19/20: the corpus's planted dup families sit at jaccard ≈1.0
    // with a near-miss at 0.9, so the strict truth splits that pair
    // out while the est≥0.5 LSH keeps it — the disagreement arms
    // (precision < 1, over-merge cells) are exercised by real data,
    // not just by the hand fixture in the spec. This is the ER QA readout a resolver
    // team watches: how much does the approximate banding pipeline
    // over- or under-merge relative to exact similarity? Both
    // clusterings are REAL operators (nothing fixture-arithmetic); the
    // metric reduces everything to contingency counts, so no pair is
    // ever enumerated (C(n,2) in closed form — the property that keeps
    // the evaluation computable when a cluster holds 10⁷ members).
    // The oracle replays both clusterings (recursive-CTE closures) and
    // the full contingency arithmetic.
    decl("q280_er_cluster_quality",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val lsh = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
          n = 3, maxDf = 50, bands = 8, rowsPerBand = 4, minEstJaccard = 0.5)
        val pred = ConnectedComponents.run(
          docs.select(col("doc_id").as("id")),
          lsh.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        val toks = docs
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .where(size(col("ws")) >= 3)
          .select(col("doc_id").as("doc"), explode(expr(
            """array_distinct(transform(sequence(1, size(ws) - 2), i ->
              |  concat_ws('_', element_at(ws, CAST(i AS INT)),
              |    element_at(ws, CAST(i + 1 AS INT)),
              |    element_at(ws, CAST(i + 2 AS INT)))))""".stripMargin))
            .as("tok"))
        val exact = Dedup.prefixJaccardJoin(toks, num = 19, den = 20)
        val truth = ConnectedComponents.run(
          docs.select(col("doc_id").as("id")),
          exact.select(col("a").as("src"), col("b").as("dst")))
        graft.operators.Eval.clusterAgreement(
          pred.select(col("id"), col("component").as("p")),
          truth.select(col("id"), col("component").as("t")))
      },
      s"""WITH RECURSIVE $minhashSigCtes,
         |prs AS (
         |  SELECT a.doc AS da, b.doc AS db
         |  FROM sig a JOIN sig b ON a.doc < b.doc
         |  WHERE ($minhashBandEq)
         |    AND ($minhashEqSum)::DOUBLE / 32.0 >= 0.5),
         |symp AS (SELECT da AS x, db AS y FROM prs
         |         UNION SELECT db, da FROM prs),
         |reachp(id, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.id, s.y FROM reachp r JOIN symp s ON r.m = s.x),
         |predc AS (SELECT id, MIN(m) AS p FROM reachp GROUP BY id),
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         |tk AS (SELECT DISTINCT doc_id AS doc,
         |       unnest(list_transform(generate_series(1, len(ws) - 2),
         |         i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2])) AS tok
         |       FROM w WHERE len(ws) >= 3),
         |szs AS (SELECT doc, COUNT(*)::BIGINT AS sz FROM tk GROUP BY 1),
         |it AS (SELECT a.doc AS a, b.doc AS b, COUNT(*)::BIGINT AS inter
         |       FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc < b.doc
         |       GROUP BY 1, 2),
         |ep AS (SELECT it.a AS a, it.b AS b
         |       FROM it JOIN szs sa ON it.a = sa.doc
         |       JOIN szs sb ON it.b = sb.doc
         |       WHERE inter * 20 >= (sa.sz + sb.sz - inter) * 19),
         |syme AS (SELECT a AS x, b AS y FROM ep UNION SELECT b, a FROM ep),
         |reache(id, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.id, s.y FROM reache r JOIN syme s ON r.m = s.x),
         |truec AS (SELECT id, MIN(m) AS t FROM reache GROUP BY id),
         |jj AS (SELECT predc.id, p, t FROM predc JOIN truec USING (id)),
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
         |        FROM cellc JOIN tmar USING (t))
         |SELECT ni.n_items, ppp.pred_clusters, ttt.true_clusters,
         |  ppp.pred_pairs, ttt.true_pairs, tpp.tp_pairs,
         |  CAST(CAST(bps.bp_sum::DOUBLE / ni.n_items::DOUBLE
         |    AS DECIMAL(10,6)) AS DOUBLE) AS bcubed_prec,
         |  CAST(CAST(brs.br_sum::DOUBLE / ni.n_items::DOUBLE
         |    AS DECIMAL(10,6)) AS DOUBLE) AS bcubed_rec
         |FROM ni, ppp, ttt, tpp, bps, brs""".stripMargin),

    // As-of join: for each click, the user's latest purchase at or
    // before the click instant. One shuffle (union + running window),
    // no range-join explosion; DuckDB's native ASOF LEFT JOIN is the
    // oracle, so the tie-inclusive point-in-time semantics are checked
    // directly. Timestamps compare as integer microseconds on both
    // engines (the parquet carries nanos; both floor-divide).
    decl("q119_asof_join",
      (s, d) => {
        val ev = eventsMicros(s, d)
          .select(col("event_id"), col("user_id"), col("tsu"),
            col("event_type"), col("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("tsu"), col("event_id"), col("value"))
        // equal-timestamp purchases resolve to the max event id via the
        // window tie-break — no pre-aggregation exchange
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("tsu"),
            col("event_id").as("p_event_id"), col("value").as("p_value"))
        AsOf.asOfJoin(clicks, purchases, "user_id", "tsu",
            rightTieBreak = Seq("p_event_id"))
          // null-free output: the driver compare treats NULL/NaN rows as
          // mismatched even when both engines emit them identically
          .withColumn("p_event_id", coalesce(col("p_event_id"), lit(-1L)))
          .withColumn("p_value", coalesce(col("p_value"), lit(0.0)))
      },
      """WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS tsu,
        |    event_type, value FROM events),
        |cl AS (SELECT user_id, tsu, event_id, value FROM ev
        |  WHERE event_type = 'click'),
        |pu AS (SELECT user_id, tsu, max(event_id) AS p_event_id,
        |    arg_max(value, event_id) AS p_value
        |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, tsu)
        |SELECT cl.user_id, cl.tsu, cl.event_id, cl.value,
        |  COALESCE(pu.p_event_id, -1) AS p_event_id,
        |  COALESCE(pu.p_value, 0.0) AS p_value
        |FROM cl ASOF LEFT JOIN pu
        |  ON cl.user_id = pu.user_id AND cl.tsu >= pu.tsu""".stripMargin),

    // Phonetic-fingerprint blocking (the fuzzy complement to q51's
    // bigram keys). Fixture: each part key spells its zero-padded
    // digits as words with a positional consonant suffix ('010423' →
    // 'zerob oned fourg twol threem ...'); the target twin (fresh id)
    // respells every word with a DIFFERENT vowel pattern over the same
    // initial + consonant skeleton — zero lexical token
    // overlap, identical soundex codes. The positional suffix makes
    // each code encode (digit, position), so the sorted-code-set
    // fingerprint is unique per key and every subject pairs with
    // exactly its twin: output linear in the corpus at every SF. The
    // oracle implements the full classic soundex (H/W-skip rule, vowel
    // separators) in SQL — validated character-for-character against
    // Spark's builtin — and re-derives the fingerprint per pair.
    // Sorted-neighborhood blocking (round-11, Hernández & Stolfo
    // SIGMOD'95): records sorted by reversed lowercase name (suffix
    // order clusters the discriminating digit tails), each paired with
    // its 7 global successors — candidate volume EXACTLY n·w. The
    // global rank is the two-phase shape (within-bucket row_number +
    // broadcast bucket offsets, bucket = first sort-key char), and the
    // oracle replays it as one true global row_number, proving the
    // decomposition exact — including pairs straddling bucket
    // boundaries.
    decl("q217_sorted_neighborhood",
      (s, d) => {
        val c = t(s, d, "customer")
        val base = c.select(col("c_custkey").cast("long").as("id"),
          reverse(lower(col("c_name"))).as("sk"))
        Blocking.sortedNeighborhood(base, col("id"), col("sk"),
          substring(col("sk"), 1, 1), w = 7)
      },
      """WITH r AS (SELECT c_custkey::BIGINT AS id,
        |  row_number() OVER (ORDER BY reverse(lower(c_name)), c_custkey) AS rnk
        |  FROM customer)
        |SELECT a.id AS a, b.id AS b, j::BIGINT AS dist
        |FROM r a CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS j) s
        |JOIN r b ON b.rnk = a.rnk + j""".stripMargin),

    decl("q118_phonetic_blocking",
      (s, d) => {
        val spellS = Seq("zero", "one", "two", "three", "four",
          "five", "six", "seven", "eight", "nine")
        val spellT = Seq("zara", "ona", "twa", "thraa", "foar",
          "fiva", "sax", "savan", "eaght", "nina")
        // six digit positions cover every key below 1,000,000 (all
        // provided SFs; a larger corpus would need a seventh position,
        // and only six single consonants have distinct soundex codes —
        // extend with two-letter suffixes if that day comes)
        val sufx = Seq("b", "d", "g", "l", "m", "r")
        def spelled(words: Seq[String]) = {
          val m = (0 to 9).map(i => i.toString -> words(i)).toMap
          (key: org.apache.spark.sql.Column) =>
            concat_ws(" ", zip_with(
              split(lpad(key.cast("string"), 6, "0"), ""),
              typedLit(sufx),
              (ch, sf) => concat(element_at(typedLit(m), ch), sf)))
        }
        val p = t(s, d, "part")
        val subjects = p.select((col("p_partkey") * 2).as("id"),
          spelled(spellS)(col("p_partkey")).as("nm"))
        val targets = p.select((col("p_partkey") * 2 + 1).as("id"),
          spelled(spellT)(col("p_partkey")).as("nm"))
        val pairs = Blocking.candidatesPhonetic(subjects, targets,
          col("id"), col("nm"), col("id"), col("nm"), maxDf = 100)
        // re-attach the verified fingerprint: hash-checks the actual
        // soundex codes, not just the pair ids (score is 0 by
        // construction — disjoint vocabularies)
        pairs.join(subjects, col("subject_id") === col("id"))
          .select(col("subject_id"), col("target_id"),
            Blocking.phoneticFingerprint(col("nm")).as("fp"))
      },
      s"""WITH names AS (
        |  SELECT p_partkey * 2 AS id, p_partkey AS key, 0 AS side FROM part
        |  UNION ALL
        |  SELECT p_partkey * 2 + 1, p_partkey, 1 FROM part),
        |spelled AS (
        |  SELECT id, side, list_transform(
        |    generate_series(1, 6),
        |    i -> (CASE substr(lpad(key::VARCHAR, 6, '0'), i, 1)
        |      WHEN '0' THEN CASE side WHEN 0 THEN 'zero' ELSE 'zara' END
        |      WHEN '1' THEN CASE side WHEN 0 THEN 'one' ELSE 'ona' END
        |      WHEN '2' THEN CASE side WHEN 0 THEN 'two' ELSE 'twa' END
        |      WHEN '3' THEN CASE side WHEN 0 THEN 'three' ELSE 'thraa' END
        |      WHEN '4' THEN CASE side WHEN 0 THEN 'four' ELSE 'foar' END
        |      WHEN '5' THEN CASE side WHEN 0 THEN 'five' ELSE 'fiva' END
        |      WHEN '6' THEN CASE side WHEN 0 THEN 'six' ELSE 'sax' END
        |      WHEN '7' THEN CASE side WHEN 0 THEN 'seven' ELSE 'savan' END
        |      WHEN '8' THEN CASE side WHEN 0 THEN 'eight' ELSE 'eaght' END
        |      ELSE CASE side WHEN 0 THEN 'nine' ELSE 'nina' END END)
        |      || (CASE i WHEN 1 THEN 'b' WHEN 2 THEN 'd' WHEN 3 THEN 'g'
        |          WHEN 4 THEN 'l' WHEN 5 THEN 'm' ELSE 'r' END)) AS ws
        |  FROM names),
        |toks0 AS (SELECT id, side, unnest(ws) AS tok FROM spelled),
        |$sqlSoundexCtes,
        |fps AS (SELECT t.id, t.side,
        |    array_to_string(list_sort(list_distinct(list(s.code))), ' ') AS fp
        |  FROM toks0 t JOIN sx s ON t.tok = s.tok GROUP BY t.id, t.side),
        |skeys AS (SELECT k.id, k.fp FROM (SELECT id, fp FROM fps WHERE side = 0) k
        |  JOIN (SELECT fp, COUNT(*) df FROM fps WHERE side = 0 GROUP BY fp) f
        |  ON k.fp = f.fp AND f.df <= 100),
        |tkeys AS (SELECT k.id, k.fp FROM (SELECT id, fp FROM fps WHERE side = 1) k
        |  JOIN (SELECT fp, COUNT(*) df FROM fps WHERE side = 1 GROUP BY fp) f
        |  ON k.fp = f.fp AND f.df <= 100)
        |SELECT DISTINCT sk.id AS subject_id, tk.id AS target_id, sk.fp
        |FROM skeys sk JOIN tkeys tk ON sk.fp = tk.fp""".stripMargin),

    // Int8-quantized ANN: per-vector symmetric quantization (the 4×
    // storage/bandwidth path for 100 TB embedding stores) and top-k
    // ranking on the integer codes — scales cancel in the cosine ratio.
    // The floor-form quantizer is engine-portable, so the oracle
    // reproduces the exact codes and the exact ranking.
    decl("q117_ann_int8",
      (s, d) => {
        val e = t(s, d, "embeddings")
        Similarity.cosineTopKInt8(
          e.filter(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding")),
          e.select(col("vec_id"), col("embedding")), k = 10)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"))
      },
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |  FROM e),
        |qq AS (SELECT vec_id,
        |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
        |         ELSE list_transform(v,
        |           x -> least(greatest(floor(x / scale + 0.5), -127.0), 127.0))
        |    END AS q
        |  FROM sc),
        |qs AS (SELECT vec_id AS query_id, q AS qv FROM qq
        |  WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(qv, c.q) AS qcos
        |  FROM qs, qq c WHERE c.vec_id != query_id)
        |SELECT query_id, neighbor_id, rnk FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY qcos DESC, neighbor_id) AS rnk
        |  FROM scored)
        |WHERE rnk <= 10""".stripMargin),

    // SemDeDup-style semantic dedup: LSH near-dup pairs chained into
    // clusters by connected components (transitive closure — a 0.8+
    // cosine chain is ONE duplication group), each cluster collapsed to
    // its longest member (ties → lowest id). The synthetic embeddings
    // have no 0.8+ pairs of their own, so near-copies are PLANTED
    // (q101's overlay pattern): every %50 base gets a +1e6 perturbed
    // copy, every %100 base an additional +2e6 copy — 3-member clusters
    // exercising the closure, with overlay weights covering all three
    // representative outcomes (planted wins, base wins, tie → lowest
    // id). The oracle rebuilds the overlay, the eight hash tables AND
    // the closure (recursive CTE) in SQL, so the full
    // pairs→clusters→representative pipeline is hash-checked.
    decl("q116_semantic_dedup",
      (s, d) => {
        val base = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val pl1 = base.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => x + when(i % 2 === 0, lit(0.002)).otherwise(lit(-0.002)))
              .as("embedding"))
        val pl2 = base.filter(col("vec_id") % 100 === 0)
          .select((col("vec_id") + 2000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => x + when(i % 3 === 0, lit(0.003)).otherwise(lit(-0.001)))
              .as("embedding"))
        val corpus = base.unionByName(pl1).unionByName(pl2)
        val docs = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
        val weights = docs
          .unionByName(docs.filter(col("doc_id") % 50 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              // (id div 50) % 5 - 2 ∈ {-2..2}: the planted copy beats,
              // ties (→ lowest id), or loses to its base — all three
              // representative outcomes occur in the fixture
              (col("n_chars") + expr("doc_id div 50 % 5 - 2")).as("n_chars")))
          .unionByName(docs.filter(col("doc_id") % 100 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              (col("n_chars") - 1).as("n_chars")))
        Similarity.semanticDedup(corpus, weights,
          dim = 64, threshold = 0.8, planes = 4, tables = 8)
      },
      {
        val mtTables = (0 until 8).map { tbl =>
          val bits = (0 until 4).map { p =>
            val abs = tbl * 4 + p
            val plane = (0 until 64)
              .map(dd => if (Similarity.planeSign(abs, dd) > 0) "1.0" else "-1.0")
              .mkString("[", ",", "]")
            s"(CASE WHEN list_inner_product(v, $plane::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
          }.mkString(" + ")
          s"SELECT vec_id, v, $tbl AS tbl, $bits AS bits FROM e"
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH RECURSIVE eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |pl1 AS (
           |  SELECT vec_id + 1000000 AS vec_id,
           |    list_transform(generate_series(1, 64),
           |      i -> v[i] + (CASE WHEN (i - 1) % 2 = 0
           |                   THEN 0.002::DOUBLE ELSE -0.002::DOUBLE END)) AS v
           |  FROM eb WHERE vec_id % 50 = 0),
           |pl2 AS (
           |  SELECT vec_id + 2000000 AS vec_id,
           |    list_transform(generate_series(1, 64),
           |      i -> v[i] + (CASE WHEN (i - 1) % 3 = 0
           |                   THEN 0.003::DOUBLE ELSE -0.001::DOUBLE END)) AS v
           |  FROM eb WHERE vec_id % 100 = 0),
           |e AS (SELECT * FROM eb UNION ALL SELECT * FROM pl1
           |  UNION ALL SELECT * FROM pl2),
           |wts AS (
           |  SELECT doc_id, n_chars FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000, n_chars + doc_id // 50 % 5 - 2
           |  FROM documents WHERE doc_id % 50 = 0
           |  UNION ALL
           |  SELECT doc_id + 2000000, n_chars - 1
           |  FROM documents WHERE doc_id % 100 = 0),
           |mtb AS (
           |  $mtTables),
           |cand AS (
           |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
           |  FROM mtb l JOIN mtb r ON l.tbl = r.tbl AND l.bits = r.bits
           |  WHERE l.vec_id < r.vec_id),
           |pairs AS (
           |  SELECT a, b FROM cand
           |  JOIN e ea ON cand.a = ea.vec_id
           |  JOIN e eb2 ON cand.b = eb2.vec_id
           |  WHERE list_cosine_similarity(ea.v, eb2.v) >= 0.8),
           |sym AS (SELECT a AS x, b AS y FROM pairs
           |  UNION SELECT b, a FROM pairs),
           |reach(id, m) AS (
           |  SELECT vec_id, vec_id FROM e
           |  UNION
           |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x),
           |comp AS (SELECT id, MIN(m) AS component FROM reach GROUP BY id),
           |wt AS (SELECT c.id, c.component, w.n_chars
           |  FROM comp c LEFT JOIN wts w ON c.id = w.doc_id),
           |rep AS (SELECT component, id,
           |    row_number() OVER (PARTITION BY component
           |      ORDER BY n_chars DESC NULLS LAST, id ASC) AS rn
           |  FROM wt)
           |SELECT c.component, r.id AS kept_id, c.n_members
           |FROM (SELECT component, COUNT(*)::BIGINT AS n_members
           |      FROM comp GROUP BY component) c
           |JOIN rep r ON c.component = r.component AND r.rn = 1""".stripMargin
      }),

    // q116's pipeline through the PRODUCTION entry point: planes come
    // from Similarity.planesFor(n) instead of the pinned 4 — the sizing
    // rule the round-8 stress A/B promoted to code, now oracle-gated.
    // The oracle bakes the SIZED plane count (computed from the same
    // Scala constant at SQL-generation time, exactly like a pinned
    // knob would be), so the oracle-shaped plan and the
    // production-shaped plan are now the same plan.
    decl("q180_semantic_dedup_auto",
      (s, d) => {
        val base = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val pl1 = base.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => x + when(i % 2 === 0, lit(0.002)).otherwise(lit(-0.002)))
              .as("embedding"))
        val pl2 = base.filter(col("vec_id") % 100 === 0)
          .select((col("vec_id") + 2000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => x + when(i % 3 === 0, lit(0.003)).otherwise(lit(-0.001)))
              .as("embedding"))
        val corpus = base.unionByName(pl1).unionByName(pl2)
        val docs = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
        val weights = docs
          .unionByName(docs.filter(col("doc_id") % 50 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              (col("n_chars") + expr("doc_id div 50 % 5 - 2")).as("n_chars")))
          .unionByName(docs.filter(col("doc_id") % 100 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              (col("n_chars") - 1).as("n_chars")))
        Similarity.semanticDedupAuto(corpus, weights,
          dim = 64, threshold = 0.8, targetBucketSize = 128, tables = 8)
      },
      {
        // sf0.01 fixture corpus: 500 base + 500/50 + 500/100 planted
        // overlays = 515 vectors → planesFor sizes the tables; the SQL
        // bakes the sized literal the same way q116 bakes its pinned 4
        val autoPlanes = Similarity.planesFor(515L, 128)
        val mtTables = (0 until 8).map { tbl =>
          val bits = (0 until autoPlanes).map { p =>
            val abs = tbl * autoPlanes + p
            val plane = (0 until 64)
              .map(dd => if (Similarity.planeSign(abs, dd) > 0) "1.0" else "-1.0")
              .mkString("[", ",", "]")
            s"(CASE WHEN list_inner_product(v, $plane::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
          }.mkString(" + ")
          s"SELECT vec_id, v, $tbl AS tbl, $bits AS bits FROM e"
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH RECURSIVE eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |pl1 AS (
           |  SELECT vec_id + 1000000 AS vec_id,
           |    list_transform(generate_series(1, 64),
           |      i -> v[i] + (CASE WHEN (i - 1) % 2 = 0
           |                   THEN 0.002::DOUBLE ELSE -0.002::DOUBLE END)) AS v
           |  FROM eb WHERE vec_id % 50 = 0),
           |pl2 AS (
           |  SELECT vec_id + 2000000 AS vec_id,
           |    list_transform(generate_series(1, 64),
           |      i -> v[i] + (CASE WHEN (i - 1) % 3 = 0
           |                   THEN 0.003::DOUBLE ELSE -0.001::DOUBLE END)) AS v
           |  FROM eb WHERE vec_id % 100 = 0),
           |e AS (SELECT * FROM eb UNION ALL SELECT * FROM pl1
           |  UNION ALL SELECT * FROM pl2),
           |wts AS (
           |  SELECT doc_id, n_chars FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000, n_chars + doc_id // 50 % 5 - 2
           |  FROM documents WHERE doc_id % 50 = 0
           |  UNION ALL
           |  SELECT doc_id + 2000000, n_chars - 1
           |  FROM documents WHERE doc_id % 100 = 0),
           |mtb AS (
           |  $mtTables),
           |cand AS (
           |  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
           |  FROM mtb l JOIN mtb r ON l.tbl = r.tbl AND l.bits = r.bits
           |  WHERE l.vec_id < r.vec_id),
           |pairs AS (
           |  SELECT a, b FROM cand
           |  JOIN e ea ON cand.a = ea.vec_id
           |  JOIN e eb2 ON cand.b = eb2.vec_id
           |  WHERE list_cosine_similarity(ea.v, eb2.v) >= 0.8),
           |sym AS (SELECT a AS x, b AS y FROM pairs
           |  UNION SELECT b, a FROM pairs),
           |reach(id, m) AS (
           |  SELECT vec_id, vec_id FROM e
           |  UNION
           |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x),
           |comp AS (SELECT id, MIN(m) AS component FROM reach GROUP BY id),
           |wt AS (SELECT c.id, c.component, w.n_chars
           |  FROM comp c LEFT JOIN wts w ON c.id = w.doc_id),
           |rep AS (SELECT component, id,
           |    row_number() OVER (PARTITION BY component
           |      ORDER BY n_chars DESC NULLS LAST, id ASC) AS rn
           |  FROM wt)
           |SELECT c.component, r.id AS kept_id, c.n_members
           |FROM (SELECT component, COUNT(*)::BIGINT AS n_members
           |      FROM comp GROUP BY component) c
           |JOIN rep r ON c.component = r.component AND r.rn = 1""".stripMargin
      }),

    // Mega-cluster-safe semantic dedup (the round-9 25× finding made a
    // gate): the corpus plants (a) a 3001-member EXACT-duplicate
    // cluster per %500==7 base vector — the boilerplate/template shape
    // that made in-bucket pair enumeration Ω(cluster²) — which the
    // exact-vector collapse reduces to ONE rep before any pairing, and
    // (b) a 41-member NEAR-identical cluster per %500==11 base vector
    // (perturbations ~1e-7, pairwise cosine ≈ 1) large enough to trip
    // the signature-group collapse (> 16 members share the full
    // 8-table×4-plane signature). Both defenses must reproduce the
    // EXACT transitive-closure semantics here: the oracle replays the
    // uncollapsed math — with its own legitimate identical-vector
    // grouping so the replay stays polynomial — and hash-checks
    // clusters, sizes, and weighted representatives on both seeds.
    decl("q184_semantic_dedup_megacluster",
      (s, d) => {
        val base = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val mega = base.filter(col("vec_id") % 500 === 7)
          .crossJoin(s.range(0, 3000).toDF("j"))
          .select((lit(100000000L) + col("vec_id") * 10000L + col("j")).as("vec_id"),
            col("embedding"))
        val near = base.filter(col("vec_id") % 500 === 11)
          .crossJoin(s.range(0, 40).toDF("j"))
          .select((lit(200000000L) + col("vec_id") * 10000L + col("j")).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              x + (col("j") + lit(1L)) * lit(1e-7) *
                when(i % 2 === 0, lit(1.0)).otherwise(lit(-1.0))).as("embedding"))
        // three identical ZERO vectors: cos(0, ·) is NaN, so they must
        // survive as singletons through every collapse (the documented
        // NaN semantics, previously unit-test-only — the round-10
        // advisory noted the oracle merged identical zero vectors where
        // the engine does not; both sides now encode the same rule)
        val zeros = s.range(0, 3)
          .select((lit(300000000L) + col("id")).as("vec_id"),
            array_repeat(lit(0.0f), 64).as("embedding"))
        val corpus = base.unionByName(mega).unionByName(near).unionByName(zeros)
        val docs = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
        // planted NEAR members carry weights straddling the base's, so
        // the weighted-representative pick is exercised on a collapsed
        // cluster; MEGA copies carry none (weightless ranks lowest)
        val weights = docs.unionByName(
          docs.filter(col("doc_id") % 500 === 11)
            .crossJoin(s.range(0, 40).toDF("j"))
            .select((lit(200000000L) + col("doc_id") * 10000L + col("j")).as("doc_id"),
              (col("n_chars") + col("j") % 5 - 2).as("n_chars")))
        Similarity.semanticDedup(corpus, weights,
          dim = 64, threshold = 0.8, planes = 4, tables = 8)
      },
      {
        val mtTables = (0 until 8).map { tbl =>
          val bits = (0 until 4).map { p =>
            val abs = tbl * 4 + p
            val plane = (0 until 64)
              .map(dd => if (Similarity.planeSign(abs, dd) > 0) "1.0" else "-1.0")
              .mkString("[", ",", "]")
            s"(CASE WHEN list_inner_product(v, $plane::DOUBLE[]) > 0 THEN ${1L << p} ELSE 0 END)"
          }.mkString(" + ")
          s"SELECT rid, v, $tbl AS tbl, $bits AS bits FROM reps"
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH RECURSIVE eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |mega AS (SELECT 100000000 + vec_id * 10000 + j AS vec_id, v
           |  FROM eb, generate_series(0, 2999) AS g(j) WHERE vec_id % 500 = 7),
           |nr AS (SELECT 200000000 + vec_id * 10000 + j AS vec_id,
           |    list_transform(generate_series(1, 64),
           |      i -> v[i] + (j + 1) * 1e-7 *
           |        (CASE WHEN (i - 1) % 2 = 0 THEN 1.0 ELSE -1.0 END)) AS v
           |  FROM eb, generate_series(0, 39) AS g(j) WHERE vec_id % 500 = 11),
           |zz AS (SELECT 300000000 + j AS vec_id,
           |  list_transform(generate_series(1, 64), x -> 0.0::DOUBLE) AS v
           |  FROM generate_series(0, 2) AS gz(j)),
           |e AS (SELECT * FROM eb UNION ALL SELECT * FROM mega
           |  UNION ALL SELECT * FROM nr UNION ALL SELECT * FROM zz),
           |reps AS (
           |  SELECT MIN(vec_id) AS rid, v FROM e
           |  WHERE list_inner_product(v, v) > 0 GROUP BY v
           |  UNION ALL
           |  SELECT vec_id AS rid, v FROM e
           |  WHERE NOT (list_inner_product(v, v) > 0)),
           |mtb AS (
           |  $mtTables),
           |cand AS (
           |  SELECT DISTINCT l.rid AS a, r.rid AS b
           |  FROM mtb l JOIN mtb r ON l.tbl = r.tbl AND l.bits = r.bits
           |  WHERE l.rid < r.rid),
           |pairs AS (
           |  SELECT a, b FROM cand
           |  JOIN reps ra ON cand.a = ra.rid
           |  JOIN reps rb ON cand.b = rb.rid
           |  WHERE list_cosine_similarity(ra.v, rb.v) >= 0.8),
           |sym AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
           |reach(id, m) AS (
           |  SELECT rid, rid FROM reps
           |  UNION
           |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x),
           |rcomp AS (SELECT id, MIN(m) AS component FROM reach GROUP BY id),
           |memb AS (
           |  SELECT e.vec_id AS id, r.rid FROM e JOIN reps r ON e.v = r.v
           |  WHERE list_inner_product(e.v, e.v) > 0
           |  UNION ALL
           |  SELECT vec_id, vec_id FROM e
           |  WHERE NOT (list_inner_product(v, v) > 0)),
           |comp AS (SELECT memb.id, rcomp.component
           |  FROM memb JOIN rcomp ON memb.rid = rcomp.id),
           |wts AS (SELECT doc_id, n_chars FROM documents
           |  UNION ALL
           |  SELECT 200000000 + doc_id * 10000 + j, n_chars + j % 5 - 2
           |  FROM documents, generate_series(0, 39) AS g(j) WHERE doc_id % 500 = 11),
           |wt AS (SELECT c.id, c.component, w.n_chars
           |  FROM comp c LEFT JOIN wts w ON c.id = w.doc_id),
           |rep AS (SELECT component, id,
           |    row_number() OVER (PARTITION BY component
           |      ORDER BY n_chars DESC NULLS LAST, id ASC) AS rn
           |  FROM wt)
           |SELECT c.component, r.id AS kept_id, c.n_members
           |FROM (SELECT component, COUNT(*)::BIGINT AS n_members
           |      FROM comp GROUP BY component) c
           |JOIN rep r ON c.component = r.component AND r.rn = 1""".stripMargin
      }),

    // q93's IVF through the PRODUCTION sizing: k = kFor(n) ≈ √n
    // centroids seeded by Similarity.seedCentroids (smallest portable
    // hash60 of the id — exactly replayed by the oracle's sqlHash60,
    // which is WHY seedCentroids uses hash60 and not xxhash64), then
    // the same two unrolled Lloyd rounds and nprobe=2 probing as q93.
    // Retires the STRESS_r08 k∝n flag on the oracle-gated path: the
    // centroid count no longer grows with the corpus.
    decl("q181_ann_ivf_auto",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val corpus = e.select(col("vec_id"), col("embedding"))
        // k from the corpus COUNT at runtime (√n rule); the oracle
        // bakes kFor(500) = the sized literal for the sf0.01 gate
        val n = corpus.select("vec_id").count()
        val seed = Similarity.seedCentroids(corpus, Similarity.kFor(n))
        val trained = Similarity.kmeansCentroids(corpus, seed, dim = 64,
          maxIterations = 2, earlyStop = false)
        Similarity.ivfTopK(
          e.filter(col("vec_id") % 100 === 0).select(col("vec_id"), col("embedding")),
          corpus, trained, k = 10, nprobe = 2)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"))
      },
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |hs AS (SELECT vec_id, v, ${sqlHash60("vec_id::VARCHAR")} AS h FROM e),
        |c0 AS (SELECT centroid_id, cvec FROM (
        |  SELECT row_number() OVER (ORDER BY h, vec_id)::BIGINT - 1 AS centroid_id,
        |         v AS cvec FROM hs)
        |  WHERE centroid_id < ${Similarity.kFor(500L)}),
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
        |assigned AS (
        |  SELECT neighbor_id, nv, centroid_id FROM (
        |    SELECT e.vec_id AS neighbor_id, e.v AS nv, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM e CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |probes AS (
        |  SELECT query_id, qv, centroid_id FROM (
        |    SELECT e.vec_id AS query_id, e.v AS qv, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.centroid_id) AS prank
        |    FROM e CROSS JOIN c2 c WHERE e.vec_id % 100 = 0)
        |  WHERE prank <= 2)
        |SELECT query_id, neighbor_id, rnk FROM (
        |  SELECT p.query_id, a.neighbor_id,
        |    row_number() OVER (PARTITION BY p.query_id
        |      ORDER BY list_cosine_similarity(p.qv, a.nv) DESC, a.neighbor_id) AS rnk
        |  FROM probes p JOIN assigned a USING (centroid_id)
        |  WHERE p.query_id != a.neighbor_id)
        |WHERE rnk <= 10""".stripMargin),

    // SemDeDup through the trained coarse quantizer (the alternative
    // regime path, now oracle-gated): the q116 overlay corpus (planted
    // +1e6/+2e6 near-copies), k = kFor(515) ≈ √n hash60-seeded
    // centroids, two unrolled Lloyd rounds, cell assignment, CELL-LOCAL
    // pair enumeration at θ=0.8, transitive closure, weighted keeper.
    // Cross-cell pairs are out of scope BY DESIGN (the SemDeDup trade)
    // — the oracle replays the same cell split, so any boundary loss
    // is computed identically by both engines, on both seeds.
    decl("q189_semantic_dedup_ivf",
      (s, d) => {
        val corpus = ivfOverlayCorpus(s, d)
        val docs = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
        val weights = docs
          .unionByName(docs.filter(col("doc_id") % 50 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"),
              (col("n_chars") + expr("doc_id div 50 % 5 - 2")).as("n_chars")))
          .unionByName(docs.filter(col("doc_id") % 100 === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"),
              (col("n_chars") - 1).as("n_chars")))
        val n = corpus.select("vec_id").count()
        val seed = Similarity.seedCentroids(corpus, Similarity.kFor(n))
        val trained = Similarity.kmeansCentroids(corpus, seed, dim = 64,
          maxIterations = 2, earlyStop = false)
        Similarity.semanticDedupIvf(corpus, weights, threshold = 0.8, trained)
      },
      s"""WITH RECURSIVE eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |pl1 AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 2 = 0
        |                   THEN 0.002::DOUBLE ELSE -0.002::DOUBLE END)) AS v
        |  FROM eb WHERE vec_id % 50 = 0),
        |pl2 AS (
        |  SELECT vec_id + 2000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 3 = 0
        |                   THEN 0.003::DOUBLE ELSE -0.001::DOUBLE END)) AS v
        |  FROM eb WHERE vec_id % 100 = 0),
        |e AS (SELECT * FROM eb UNION ALL SELECT * FROM pl1
        |  UNION ALL SELECT * FROM pl2),
        |wts AS (
        |  SELECT doc_id, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, n_chars + doc_id // 50 % 5 - 2
        |  FROM documents WHERE doc_id % 50 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, n_chars - 1
        |  FROM documents WHERE doc_id % 100 = 0),
        |hs AS (SELECT vec_id, v, ${sqlHash60("vec_id::VARCHAR")} AS h FROM e),
        |c0 AS (SELECT centroid_id, cvec FROM (
        |  SELECT row_number() OVER (ORDER BY h, vec_id)::BIGINT - 1 AS centroid_id,
        |         v AS cvec FROM hs)
        |  WHERE centroid_id < ${Similarity.kFor(515L)}),
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
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT e.vec_id AS id, e.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM e CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |pairs AS (
        |  SELECT l.id AS a, r.id AS b
        |  FROM asg l JOIN asg r ON l.centroid_id = r.centroid_id
        |  WHERE l.id < r.id AND list_cosine_similarity(l.vec, r.vec) >= 0.8),
        |sym AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
        |reach(id, m) AS (
        |  SELECT vec_id, vec_id FROM e
        |  UNION
        |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x),
        |comp AS (SELECT id, MIN(m) AS component FROM reach GROUP BY id),
        |wt AS (SELECT c.id, c.component, w.n_chars
        |  FROM comp c LEFT JOIN wts w ON c.id = w.doc_id),
        |rep AS (SELECT component, id,
        |    row_number() OVER (PARTITION BY component
        |      ORDER BY n_chars DESC NULLS LAST, id ASC) AS rn
        |  FROM wt)
        |SELECT c.component, r.id AS kept_id, c.n_members
        |FROM (SELECT component, COUNT(*)::BIGINT AS n_members
        |      FROM comp GROUP BY component) c
        |JOIN rep r ON c.component = r.component AND r.rn = 1""".stripMargin),

    // q189's boundary loss, MEASURED (round-10 brief #2): cell-local
    // pair enumeration loses exactly the θ-pairs whose endpoints land
    // in different cells, and this gate counts them instead of leaving
    // "by design" unquantified. Per sampled vector (the planted-family
    // ids, (id mod 1e6) % 50 == 0 — every θ-pair in this corpus is
    // incident to one): the exact θ-neighbor count at 0.8, how many
    // share the vector's top-1 cell (recalled by q189's enumeration),
    // how many straddle a boundary (lost), and how many share ANY of
    // the two nearest cells (recalled by the nprobe=2 multi-assignment
    // — semanticDedupIvf's boundary fix, cellAssignmentsMulti). The
    // exact arm is O(|sample|·n), the q169/q186 capped-baseline shape;
    // the oracle retrains the quantizer and replays every count.
    decl("q192_semantic_dedup_ivf_boundary",
      (s, d) => {
        val corpus = ivfOverlayCorpus(s, d)
        val n = corpus.select("vec_id").count()
        val seed = Similarity.seedCentroids(corpus, Similarity.kFor(n))
        val trained = Similarity.kmeansCentroids(corpus, seed, dim = 64,
          maxIterations = 2, earlyStop = false)
        val v = corpus.select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("vec"))
        val cells1 = Similarity.cellAssignments(v, trained)
        val cells2 = Similarity.cellAssignmentsMulti(v, trained, nprobe = 2)
        val sample = v.filter((col("id") % 1000000L) % 50 === 0)
          .select(col("id").as("u"), col("vec").as("uv"))
        val ex = broadcast(sample)
          .join(v.select(col("id").as("v"), col("vec").as("vv")),
            col("u") =!= col("v"))
          .filter(Similarity.cosine(col("uv"), col("vv")) >= 0.8)
          .select(col("u"), col("v"))
        val shared2 = ex
          .join(cells2.toDF("u", "c"), Seq("u"))
          .join(cells2.toDF("v", "c"), Seq("v", "c"))
          .select(col("u"), col("v")).distinct()
          .withColumn("p2", lit(1L))
        ex.join(cells1.toDF("u", "cu"), Seq("u"))
          .join(cells1.toDF("v", "cv"), Seq("v"))
          .join(shared2, Seq("u", "v"), "left")
          .groupBy(col("u"))
          .agg(count(lit(1)).as("n_theta"),
            sum((col("cu") === col("cv")).cast("long")).as("n_same_cell"),
            sum(coalesce(col("p2"), lit(0L))).as("n_probe2"))
          .select(col("u").as("vec_id"), col("n_theta"), col("n_same_cell"),
            (col("n_theta") - col("n_same_cell")).as("n_cross_cell"),
            col("n_probe2"))
      },
      s"""WITH eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |pl1 AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 2 = 0
        |                   THEN 0.002::DOUBLE ELSE -0.002::DOUBLE END)) AS v
        |  FROM eb WHERE vec_id % 50 = 0),
        |pl2 AS (
        |  SELECT vec_id + 2000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 3 = 0
        |                   THEN 0.003::DOUBLE ELSE -0.001::DOUBLE END)) AS v
        |  FROM eb WHERE vec_id % 100 = 0),
        |e AS (SELECT * FROM eb UNION ALL SELECT * FROM pl1
        |  UNION ALL SELECT * FROM pl2),
        |hs AS (SELECT vec_id, v, ${sqlHash60("vec_id::VARCHAR")} AS h FROM e),
        |c0 AS (SELECT centroid_id, cvec FROM (
        |  SELECT row_number() OVER (ORDER BY h, vec_id)::BIGINT - 1 AS centroid_id,
        |         v AS cvec FROM hs)
        |  WHERE centroid_id < ${graft.operators.Similarity.kFor(515L)}),
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
        |ranked AS (
        |  SELECT e.vec_id AS id, c.centroid_id,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_cosine_similarity(e.v, c.cvec) DESC, c.centroid_id) AS crank
        |  FROM e CROSS JOIN c2 c),
        |asg AS (SELECT id, centroid_id FROM ranked WHERE crank = 1),
        |asgm AS (SELECT id, centroid_id FROM ranked WHERE crank <= 2),
        |ex AS (
        |  SELECT su.vec_id AS u, cv.vec_id AS v
        |  FROM e su JOIN e cv ON su.vec_id != cv.vec_id
        |  WHERE (su.vec_id % 1000000) % 50 = 0
        |    AND list_cosine_similarity(su.v, cv.v) >= 0.8),
        |p2 AS (
        |  SELECT DISTINCT ex.u, ex.v FROM ex
        |  JOIN asgm mu ON ex.u = mu.id
        |  JOIN asgm mv ON ex.v = mv.id AND mu.centroid_id = mv.centroid_id)
        |SELECT ex.u AS vec_id, COUNT(*)::BIGINT AS n_theta,
        |  SUM(CASE WHEN au.centroid_id = av.centroid_id THEN 1 ELSE 0 END)::BIGINT
        |    AS n_same_cell,
        |  SUM(CASE WHEN au.centroid_id = av.centroid_id THEN 0 ELSE 1 END)::BIGINT
        |    AS n_cross_cell,
        |  SUM(CASE WHEN p2.u IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_probe2
        |FROM ex JOIN asg au ON ex.u = au.id
        |JOIN asg av ON ex.v = av.id
        |LEFT JOIN p2 ON ex.u = p2.u AND ex.v = p2.v
        |GROUP BY 1""".stripMargin),

    // PERSISTED ANN index: build-once / query-many (AnnIndex — the
    // Snapshot × Similarity composition). The index trains ONCE on the
    // base corpus and publishes as v1 (commit t=1000); the planted
    // batch (every 50th vector near-copied at +1e6) is then appended
    // with the quantizer FROZEN — assigned to v1's centroids, never
    // retrained — publishing v2 (t=2000). Both probes run through the
    // published store: the as-of(t=1500) probe time-travels to v1 and
    // must not see any appended id; the current probe serves v2 where
    // each planted near-copy outranks every true neighbor of its twin.
    // The oracle replays the whole lifecycle relationally: quantizer
    // trained on the BASE ONLY (the freeze — contrast q189, which
    // trains on the overlay), the appended batch assigned to those
    // same frozen centroids, probes ranked per version. FS-side
    // guarantees (atomic publish, centroid freeze bit-equality, vacuum)
    // are AnnIndexSpec-gated.
    decl("q193_ann_index_persisted",
      (s, d) => {
        val base = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val added = base.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => x + when(i % 2 === 0, lit(0.002)).otherwise(lit(-0.002)))
              .as("embedding"))
        // deterministic per-dataset path, pre-deleted (the q282 pattern)
        val root = "/tmp/graft_q193_" + Q.scratchTag(d)
        val fsH = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fsH.delete(new org.apache.hadoop.fs.Path(root), true)
        AnnIndex.build(s, root, base, dim = 64, commitMillis = 1000L)
        AnnIndex.append(s, root, added, commitMillis = 2000L)
        val queries = base.filter(col("vec_id") % 100 === 0)
        val v1 = AnnIndex.query(s, root, queries, k = 10, nprobe = 2,
            asOfMillis = Some(1500L))
          .select(lit(1L).as("index_version"), col("query_id"),
            col("neighbor_id"), col("rank").as("rnk"))
        val v2 = AnnIndex.query(s, root, queries, k = 10, nprobe = 2)
          .select(lit(2L).as("index_version"), col("query_id"),
            col("neighbor_id"), col("rank").as("rnk"))
        v1.unionByName(v2)
      },
      s"""WITH eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |pl1 AS (
        |  SELECT vec_id + 1000000 AS vec_id,
        |    list_transform(generate_series(1, 64),
        |      i -> v[i] + (CASE WHEN (i - 1) % 2 = 0
        |                   THEN 0.002::DOUBLE ELSE -0.002::DOUBLE END)) AS v
        |  FROM eb WHERE vec_id % 50 = 0),
        |hs AS (SELECT vec_id, v, ${sqlHash60("vec_id::VARCHAR")} AS h FROM eb),
        |c0 AS (SELECT centroid_id, cvec FROM (
        |  SELECT row_number() OVER (ORDER BY h, vec_id)::BIGINT - 1 AS centroid_id,
        |         v AS cvec FROM hs)
        |  WHERE centroid_id < ${graft.operators.Similarity.kFor(500L)}),
        |a1 AS (
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT eb.vec_id AS id, eb.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY eb.vec_id
        |        ORDER BY list_cosine_similarity(eb.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM eb CROSS JOIN c0 c)
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
        |    SELECT eb.vec_id AS id, eb.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY eb.vec_id
        |        ORDER BY list_cosine_similarity(eb.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM eb CROSS JOIN c1 c)
        |  WHERE crank = 1),
        |c2 AS (
        |  SELECT centroid_id,
        |    list_transform(generate_series(1, 64),
        |      d -> list_reduce(list_transform(vs, x -> x[d]),
        |             (acc, x) -> acc + x) / len(vs)) AS cvec
        |  FROM (SELECT centroid_id, list(vec ORDER BY id) AS vs
        |        FROM a2 GROUP BY centroid_id)),
        |mv1 AS (
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT eb.vec_id AS id, eb.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY eb.vec_id
        |        ORDER BY list_cosine_similarity(eb.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM eb CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |madd AS (
        |  SELECT id, vec, centroid_id FROM (
        |    SELECT pl1.vec_id AS id, pl1.v AS vec, c.centroid_id,
        |      row_number() OVER (PARTITION BY pl1.vec_id
        |        ORDER BY list_cosine_similarity(pl1.v, c.cvec) DESC, c.centroid_id) AS crank
        |    FROM pl1 CROSS JOIN c2 c)
        |  WHERE crank = 1),
        |mv2 AS (SELECT * FROM mv1 UNION ALL SELECT * FROM madd),
        |probes AS (
        |  SELECT query_id, qv, centroid_id FROM (
        |    SELECT eb.vec_id AS query_id, eb.v AS qv, c.centroid_id,
        |      row_number() OVER (PARTITION BY eb.vec_id
        |        ORDER BY list_cosine_similarity(eb.v, c.cvec) DESC, c.centroid_id) AS prank
        |    FROM eb CROSS JOIN c2 c WHERE eb.vec_id % 100 = 0)
        |  WHERE prank <= 2)
        |SELECT 1::BIGINT AS index_version, query_id, neighbor_id, rnk FROM (
        |  SELECT p.query_id, m.id AS neighbor_id,
        |    row_number() OVER (PARTITION BY p.query_id
        |      ORDER BY list_cosine_similarity(p.qv, m.vec) DESC, m.id) AS rnk
        |  FROM probes p JOIN mv1 m USING (centroid_id)
        |  WHERE p.query_id != m.id)
        |WHERE rnk <= 10
        |UNION ALL
        |SELECT 2::BIGINT AS index_version, query_id, neighbor_id, rnk FROM (
        |  SELECT p.query_id, m.id AS neighbor_id,
        |    row_number() OVER (PARTITION BY p.query_id
        |      ORDER BY list_cosine_similarity(p.qv, m.vec) DESC, m.id) AS rnk
        |  FROM probes p JOIN mv2 m USING (centroid_id)
        |  WHERE p.query_id != m.id)
        |WHERE rnk <= 10""".stripMargin),

    // PRODUCT QUANTIZATION: train → encode → ADC → exact re-rank
    // (operators/ProductQuantizer — the memory half of ANN serving:
    // 8×16 codebooks make a member cost ~4 information bytes instead
    // of 512). Codebooks train per-subspace in ONE relational pass
    // (hash-seeded, 2 fixed Lloyd rounds keyed by (sub, code) — the
    // same protocol as the coarse quantizer), encoding ranks by the
    // L2-equivalent 2·⟨s,c⟩−⟨c,c⟩ score, and ADC sums per-subspace
    // partials through the DECIMAL barrier so the candidate cut is
    // exact and order-independent — the property that lets DuckDB
    // replay the whole lifecycle: subspace slicing, both training
    // rounds, encoding, the per-query lookup tables, the decimal ADC
    // ranking, and the full-precision re-rank of the top-50.
    decl("q195_pq_topk",
      (s, d) => {
        val e = t(s, d, "embeddings").select(col("vec_id"), col("embedding"))
        val cb = ProductQuantizer.trainCodebooks(e, dim = 64, m = 8,
          k = 16, iterations = 2)
        val codes = ProductQuantizer.encode(e, cb, dim = 64, m = 8)
        val qs = e.filter(col("vec_id") % 100 === 0)
        ProductQuantizer.adcTopK(qs, codes, cb, e, dim = 64, m = 8,
            k = 10, r = 50)
          .select(col("query_id"), col("neighbor_id"), col("rank").as("rnk"))
      },
      s"""WITH eb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |sv AS (SELECT id, x.sub AS sub, x.svec AS svec FROM (
        |  SELECT vec_id AS id, unnest(list_transform(generate_series(0, 7), s ->
        |    {'sub': s, 'svec': list_transform(generate_series(1, 8),
        |                         j -> v[s * 8 + j])})) AS x
        |  FROM eb)),
        |hs AS (SELECT vec_id, ${sqlHash60("vec_id::VARCHAR")} AS h FROM eb),
        |seeds AS (SELECT code, vec_id FROM (
        |  SELECT row_number() OVER (ORDER BY h, vec_id)::BIGINT - 1 AS code,
        |         vec_id FROM hs)
        |  WHERE code < 16),
        |cb0 AS (SELECT sv.sub, seeds.code, sv.svec AS cvec
        |  FROM sv JOIN seeds ON sv.id = seeds.vec_id),
        |a1 AS (SELECT id, sub, svec, code FROM (
        |  SELECT sv.id, sv.sub, sv.svec, c.code,
        |    row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
        |      (2.0 * list_reduce(list_transform(generate_series(1, 8),
        |         j -> sv.svec[j] * c.cvec[j]), (a, b) -> a + b)
        |       - list_reduce(list_transform(generate_series(1, 8),
        |         j -> c.cvec[j] * c.cvec[j]), (a, b) -> a + b)) DESC,
        |      c.code) AS rk
        |  FROM sv JOIN cb0 c USING (sub)) WHERE rk = 1),
        |cb1 AS (SELECT sub, code,
        |  list_transform(generate_series(1, 8), d ->
        |    list_reduce(list_transform(vs, x -> x[d]),
        |      (acc, x) -> acc + x) / len(vs)) AS cvec
        |  FROM (SELECT sub, code, list(svec ORDER BY id) AS vs
        |        FROM a1 GROUP BY 1, 2)),
        |a2 AS (SELECT id, sub, svec, code FROM (
        |  SELECT sv.id, sv.sub, sv.svec, c.code,
        |    row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
        |      (2.0 * list_reduce(list_transform(generate_series(1, 8),
        |         j -> sv.svec[j] * c.cvec[j]), (a, b) -> a + b)
        |       - list_reduce(list_transform(generate_series(1, 8),
        |         j -> c.cvec[j] * c.cvec[j]), (a, b) -> a + b)) DESC,
        |      c.code) AS rk
        |  FROM sv JOIN cb1 c USING (sub)) WHERE rk = 1),
        |cb2 AS (SELECT sub, code,
        |  list_transform(generate_series(1, 8), d ->
        |    list_reduce(list_transform(vs, x -> x[d]),
        |      (acc, x) -> acc + x) / len(vs)) AS cvec
        |  FROM (SELECT sub, code, list(svec ORDER BY id) AS vs
        |        FROM a2 GROUP BY 1, 2)),
        |codes AS (SELECT id, sub, code FROM (
        |  SELECT sv.id, sv.sub, c.code,
        |    row_number() OVER (PARTITION BY sv.id, sv.sub ORDER BY
        |      (2.0 * list_reduce(list_transform(generate_series(1, 8),
        |         j -> sv.svec[j] * c.cvec[j]), (a, b) -> a + b)
        |       - list_reduce(list_transform(generate_series(1, 8),
        |         j -> c.cvec[j] * c.cvec[j]), (a, b) -> a + b)) DESC,
        |      c.code) AS rk
        |  FROM sv JOIN cb2 c USING (sub)) WHERE rk = 1),
        |qs AS (SELECT vec_id AS query_id, v FROM eb WHERE vec_id % 100 = 0),
        |qsv AS (SELECT query_id, x.sub AS sub, x.qsub AS qsub FROM (
        |  SELECT query_id, unnest(list_transform(generate_series(0, 7), s ->
        |    {'sub': s, 'qsub': list_transform(generate_series(1, 8),
        |                         j -> v[s * 8 + j])})) AS x
        |  FROM qs)),
        |lut AS (SELECT q.query_id, c.sub, c.code,
        |    list_reduce(list_transform(generate_series(1, 8),
        |      j -> q.qsub[j] * c.cvec[j]), (a, b) -> a + b) AS ip,
        |    list_reduce(list_transform(generate_series(1, 8),
        |      j -> c.cvec[j] * c.cvec[j]), (a, b) -> a + b) AS cn2
        |  FROM qsv q JOIN cb2 c USING (sub)),
        |scored AS (SELECT l.query_id, k.id,
        |    SUM(l.ip::DECIMAL(30,12)) AS ddot,
        |    SUM(l.cn2::DECIMAL(30,12)) AS dn2
        |  FROM codes k JOIN lut l ON k.sub = l.sub AND k.code = l.code
        |  WHERE l.query_id != k.id
        |  GROUP BY 1, 2),
        |cand AS (SELECT query_id, id FROM (
        |  SELECT query_id, id, row_number() OVER (PARTITION BY query_id
        |    ORDER BY (ddot::DOUBLE / sqrt(dn2::DOUBLE)) DESC, id) AS arank
        |  FROM scored)
        |  WHERE arank <= 50)
        |SELECT query_id, neighbor_id, rnk FROM (
        |  SELECT c.query_id, c.id AS neighbor_id,
        |    row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY list_cosine_similarity(q.v, e.v) DESC, c.id) AS rnk
        |  FROM cand c JOIN eb e ON c.id = e.vec_id
        |  JOIN qs q ON c.query_id = q.query_id)
        |WHERE rnk <= 10""".stripMargin),

    // IVFPQ (round-12): the COMPOSITION of the persisted coarse index
    // (q193) with product quantization (q195) — the FAISS IVFPQ serving
    // shape. Both quantizers train on the corpus (coarse: √n cells,
    // 2 Lloyd rounds; PQ: 8×16 codebooks, 2 rounds), members publish
    // through the versioned store carrying their frozen cell AND their
    // PACKED one-long PQ code (8 nibbles — the ~4-information-byte
    // member the 100 TB memory story needs); probes rank nprobe=2
    // coarse cells, ADC scores ONLY the probed cells' members from the
    // packed codes (decode = (pq_code >> 4s) & 15, integer-exact;
    // decimal partial sums), and the top-50 pool re-ranks exactly from
    // full vectors fetched by id. The oracle replays every stage:
    // both trainers, the member assignment, the nibble pack, the
    // probes, the decode, the decimal ADC cut and the exact re-rank.
    ivfpqDecl("q235_ivfpq_lifecycle", pqK = 16),

    // IVFPQ at the PRODUCTION code width (round-12): k=128 codebooks,
    // 7-bit codes, 56 bits packed in the same single long — the config
    // the STRESS decade measured at recall 0.835/0.811/0.891 against
    // cell ceilings 0.854/0.887/0.924. Same oracle replay as q235
    // with the codebook cardinality, pack shift and decode mask swapped.
    ivfpqDecl("q244_ivfpq_wide_codes", pqK = 128),

    // Paragraph-level exact dedup across the corpus (C4/RefinedWeb
    // cleaning): 3-word chunks, first corpus-wide occurrence wins,
    // documents reassembled from surviving chunks. First-occurrence
    // selection is groupBy(min(struct)) on the chunk hash, not a window
    // over the corpus.
    decl("q105_paragraph_dedup",
      (s, d) => Dedup.paragraphDedup(
        t(s, d, "documents"), col("doc_id"), col("text"), chunkWords = 3),
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |ch AS (
        |  SELECT doc_id, x.pos AS pos, x.chunk AS chunk FROM (
        |    SELECT doc_id, unnest(list_transform(
        |        generate_series(0, CAST(ceil(len(ws) / 3.0) AS INT) - 1),
        |        i -> {'pos': i, 'chunk': array_to_string(ws[i * 3 + 1 : i * 3 + 3], ' ')}))
        |      AS x
        |    FROM w)),
        |rk AS (
        |  SELECT doc_id, pos, chunk,
        |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
        |  FROM ch)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |  COUNT(*) FILTER (WHERE rn = 1) AS n_kept,
        |  COALESCE(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '')
        |    AS deduped_text
        |FROM rk GROUP BY doc_id""".stripMargin),

    // Winnowing cross-document substring dedup (round-11, Schleimer et
    // al. SIGMOD'03): per doc hash every 8-word n-gram but keep only
    // each 4-window's MINIMUM hash — ~2/(w+1) of the stream rides the
    // shuffle, yet any two docs sharing a verbatim ≥ 11-word run are
    // GUARANTEED to share an anchor (spec-proven on planted runs).
    // Pairs come from a df-capped anchor equi-join, never doc×doc.
    // The oracle rebuilds n-gram hashes, the window minima, the full-
    // window filter, the cap and the pair counts from scratch in SQL.
    decl("q212_winnow_substring_dedup",
      (s, d) => {
        val anchors = Dedup.winnowAnchors(
          t(s, d, "documents"), col("doc_id"), col("text"), n = 8, w = 4)
        Dedup.winnowPairs(anchors, maxDf = 64)
      },
      s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |st AS (SELECT doc_id, (len(w) - 7)::BIGINT AS p, w FROM tk WHERE len(w) - 7 >= 4),
         |ngp AS (SELECT doc_id, p, w, unnest(generate_series(1, p)) AS pos FROM st),
         |ng AS (SELECT doc_id, p, pos,
         |  ${sqlHash60("array_to_string(w[pos:pos+7], ' ')")} AS h FROM ngp),
         |win AS (SELECT doc_id, p, pos,
         |  MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
         |    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS a FROM ng),
         |an AS (SELECT DISTINCT doc_id, a FROM win WHERE pos <= p - 3),
         |keep AS (SELECT a FROM an GROUP BY a HAVING COUNT(*) <= 64)
         |SELECT x.doc_id AS x, y.doc_id AS y, COUNT(*)::BIGINT AS shared_anchors
         |FROM an x JOIN keep USING (a) JOIN an y USING (a)
         |WHERE x.doc_id < y.doc_id GROUP BY 1, 2""".stripMargin),

    // PSI corpus-drift report (round-11): population stability index
    // between the English slice and the rest over hashed token buckets
    // — the dataset-shift monitor a pipeline runs between crawls.
    // Bucket counts are exact integers; each contribution rounds
    // through DECIMAL(12,6); the total is an exact decimal sum of the
    // ROUNDED contributions — every byte engine-reproducible. The
    // whole report is one explode + 64-row aggregate at any corpus
    // size.
    decl("q220_psi_drift",
      (s, d) => graft.operators.Drift.psiTokenDrift(
        t(s, d, "documents")
          .select(col("lang"), concat(col("text"), lit(" m_"), col("lang"),
            lit(" m_"), col("lang"), lit(" t_"), col("lang")).as("pt")),
        col("pt"), col("lang") === "en", buckets = 64),
      s"""WITH tk AS (SELECT (lang = 'en') AS is_ref,
         |  unnest(list_filter(string_split(
         |    text || ' m_' || lang || ' m_' || lang || ' t_' || lang, ' '),
         |    t -> len(t) > 0)) AS tok
         |  FROM documents),
         |b AS (SELECT ${sqlHash60("tok")} % 64 AS bucket,
         |  SUM(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS n_ref,
         |  SUM(CASE WHEN is_ref THEN 0 ELSE 1 END)::BIGINT AS n_cur
         |  FROM tk GROUP BY 1),
         |tt AS (SELECT SUM(n_ref)::BIGINT AS t_ref, SUM(n_cur)::BIGINT AS t_cur FROM b),
         |c AS (SELECT bucket, n_ref, n_cur,
         |  CAST((n_ref + 1.0::DOUBLE) / (t_ref + 64.0::DOUBLE) AS DECIMAL(12,6))::DOUBLE AS p_ref,
         |  CAST((n_cur + 1.0::DOUBLE) / (t_cur + 64.0::DOUBLE) AS DECIMAL(12,6))::DOUBLE AS p_cur,
         |  CAST(((n_ref + 1.0::DOUBLE) / (t_ref + 64.0::DOUBLE)
         |        - (n_cur + 1.0::DOUBLE) / (t_cur + 64.0::DOUBLE))
         |    * ln(((n_ref + 1.0::DOUBLE) / (t_ref + 64.0::DOUBLE))
         |        / ((n_cur + 1.0::DOUBLE) / (t_cur + 64.0::DOUBLE)))
         |    AS DECIMAL(12,6))::DOUBLE AS contrib
         |  FROM b, tt)
         |SELECT bucket, n_ref, n_cur, p_ref, p_cur, contrib,
         |  (SUM(CAST(contrib AS DECIMAL(30,12))) OVER ())::DOUBLE AS psi_total
         |FROM c""".stripMargin),

    // Repetition-based quality signals (Gopher/RefinedWeb rules):
    // distinct-word ratio, top-word share, duplicated-bigram fraction.
    decl("q106_repetition_signals",
      (s, d) => TextAnalysis.repetitionSignals(
        t(s, d, "documents"), col("doc_id"), col("text")),
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |cnts AS (
        |  SELECT doc_id, SUM(n)::BIGINT AS n_words, COUNT(*) AS n_distinct, MAX(n) AS top_n
        |  FROM (SELECT doc_id, word, COUNT(*) AS n
        |        FROM (SELECT doc_id, unnest(ws) AS word FROM w)
        |        GROUP BY doc_id, word)
        |  GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, len(bgl) AS n_bg, len(list_distinct(bgl)) AS n_bg_distinct
        |  FROM (SELECT doc_id,
        |      list_transform(generate_series(1, len(ws) - 1),
        |        i -> ws[i] || ' ' || ws[i + 1]) AS bgl
        |    FROM w))
        |SELECT doc_id, n_words,
        |  ((n_distinct::DOUBLE / n_words::DOUBLE)::DECIMAL(9,6))::DOUBLE AS word_ratio,
        |  ((top_n::DOUBLE / n_words::DOUBLE)::DECIMAL(9,6))::DOUBLE AS top_word_share,
        |  (((n_bg - n_bg_distinct)::DOUBLE / n_bg::DOUBLE)::DECIMAL(9,6))::DOUBLE AS dup_bigram_frac
        |FROM cnts JOIN bg USING (doc_id)""".stripMargin),

    // ANN recall report over a PLANTED-near-dup overlay corpus: every
    // 50th embedding is duplicated with a deterministic ±0.002
    // per-coordinate perturbation (id offset 1e6, cosine ≈ 0.9997), so
    // each query (vec_id % 100 = 0, count-capped at 1000 queries — see
    // inline comment) has exactly one planted partner at rank 1 of the
    // exact baseline. The report grades each method (IVF
    // nprobe=2, sign-LSH single-probe, multi-probe Hamming-1,
    // multi-table 12-plane × 4-table banded LSH) on overall recall@10,
    // PLANTED-pair recall, and the measured candidate fraction; the
    // oracle recomputes all methods and the arithmetic independently.
    //
    // Measured finding: the base embeddings remain structureless
    // (top-10 cosine ≈ 0.35-0.41), so overall recall still tracks
    // candidate fraction — but the planted pairs demonstrate the
    // LSH-native regime: multi-table recovers ≥ 0.95 of them while
    // examining a few percent of all pairs (p_collide per table =
    // (1-θ/π)^planes → ≈ 1 for θ ≈ 0.025 rad, missing all 4 tables is
    // vanishingly rare).
    decl("q101_ann_recall",
      (s, d) => {
        val e = t(s, d, "embeddings")
        val base = e.select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        val planted = base.filter(col("vec_id") % 50 === 0)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => x + when(i % 2 === 0, lit(0.002)).otherwise(lit(-0.002)))
              .as("embedding"))
        val corpus = base.unionByName(planted)
        // query sample rule: multiples of 100 BELOW 100*1000 — i.e. at
        // most 1000 queries REGARDLESS of corpus size, so the exact
        // (brute-force) ground-truth baseline stays O(1000·n), linear
        // in the corpus, instead of the quadratic O(n²/100) a pure
        // fixed-fraction sample would cost at scale-up. The oracle
        // mirrors the same predicate.
        val qs = base.filter(col("vec_id") % 100 === 0 && col("vec_id") < 100L * 1000)
        val cents = base.filter(col("vec_id") % 50 === 7)
        val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        // ONE scored frame carries every method's candidates AND the
        // exact all-pairs baseline under a `method` column, scored at
        // generation so no downstream exchange carries an embedding;
        // recallReportScored ranks it with ONE window and reports with
        // three grouped aggregations (the per-method form fired ~28
        // scalar jobs across 5 persisted frames — 7% of the bench suite
        // in pure job overhead).
        val P = 1000000L
        val scored = Seq(
          "__exact" -> Similarity.allPairs(qs, corpus),
          "ivf" -> Similarity.ivfCandidates(qs, corpus, cents, nprobe = 2),
          "lsh" -> Similarity.lshCandidates(qs, corpus, dim = 64, planes = 6),
          "lsh_multiprobe" -> Similarity.lshCandidates(qs, corpus, dim = 64,
            planes = 6, multiProbe = true),
          "lsh_multitable" -> Similarity.lshTableCandidates(qs, corpus,
            dim = 64, planes = 12, tables = 4))
          .map { case (m, c) =>
            Similarity.scoreCandidates(c).select(lit(m).as("method"),
              col("query_id"), col("neighbor_id"), col("cosine"))
          }
          .reduce(_ unionByName _)
          .persist(mem)
        val report = Similarity.recallReportScored(scored,
          Seq("ivf", "lsh", "lsh_multiprobe", "lsh_multitable"),
          "__exact", k = 10, P, qs, corpus)
        // the report is 4 rows: materialize it and release the cache —
        // a verify/bench sweep must not leave frames cached for the
        // life of the session
        val rows = report.collect().toSeq
        val schema = report.schema
        scored.unpersist(false)
        s.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
      },
      q101Oracle),

    // J9/J10/O2/O3: sorted-bigram-blocked similarity join with
    // per-subject top-k, cutoff, and score-ratio pruning — the
    // xref/enrichment pipeline. Sorted bigram keys keep candidate
    // generation near-linear on the small-vocabulary name corpus while
    // preserving recall for word-order variants (see Blocking scaladoc).
    decl("q51_blocking_topk",
      (s, d) => {
        val p = t(s, d, "part")
        val subjects = p.filter(col("p_partkey") % 2 === 0)
        val targets = p.filter(col("p_partkey") % 2 === 1)
        val cands = Blocking.candidates(subjects, targets,
          col("p_partkey"), col("p_name"), col("p_partkey"), col("p_name"),
          maxDf = 100)
        Blocking.topK(cands, k = 5, cutoff = 0.5, minScoreRatio = 0.1)
          .select(col("subject_id"), col("target_id"),
            col("score").cast("decimal(18,6)").cast("double").as("score"), col("rank").as("rnk"))
      },
      """WITH pn AS (
        |  SELECT p_partkey AS id,
        |    list_filter(string_split(regexp_replace(trim(lower(p_name)), '\s+', ' ', 'g'), ' '),
        |                t -> len(t) > 0) AS w
        |  FROM part),
        |pns AS (SELECT id, list_sort(list_distinct(w)) AS sw FROM pn),
        |keys0 AS (
        |  SELECT id, unnest(CASE WHEN len(sw) >= 2
        |    THEN list_transform(generate_series(1, len(sw) - 1), i -> sw[i] || ' ' || sw[i+1])
        |    ELSE sw END) AS bkey
        |  FROM pns),
        |keys1 AS (SELECT DISTINCT id, bkey FROM keys0),
        |skeys1 AS (SELECT id, bkey FROM keys1 WHERE id % 2 = 0),
        |tkeys1 AS (SELECT id, bkey FROM keys1 WHERE id % 2 = 1),
        |skeys AS (SELECT k.id, k.bkey FROM skeys1 k
        |  JOIN (SELECT bkey, COUNT(*) df FROM skeys1 GROUP BY bkey) f
        |  ON k.bkey = f.bkey AND f.df <= 100),
        |tkeys AS (SELECT k.id, k.bkey FROM tkeys1 k
        |  JOIN (SELECT bkey, COUNT(*) df FROM tkeys1 GROUP BY bkey) f
        |  ON k.bkey = f.bkey AND f.df <= 100),
        |toks AS (SELECT id, list_distinct(w) AS t FROM pn),
        |pairs AS (SELECT DISTINCT sk.id AS subject_id, tk.id AS target_id
        |  FROM skeys sk JOIN tkeys tk ON sk.bkey = tk.bkey),
        |scored AS (SELECT subject_id, target_id,
        |    len(list_intersect(st.t, tt.t))::DOUBLE
        |      / (len(st.t) + len(tt.t) - len(list_intersect(st.t, tt.t)))::DOUBLE AS score
        |  FROM pairs JOIN toks st ON pairs.subject_id = st.id
        |             JOIN toks tt ON pairs.target_id = tt.id),
        |pruned AS (SELECT subject_id, target_id, score,
        |    max(score) OVER (PARTITION BY subject_id) AS best
        |  FROM scored WHERE score >= 0.5)
        |SELECT subject_id, target_id,
        |  CAST(CAST(score AS DECIMAL(18,6)) AS DOUBLE) AS score, rnk
        |FROM (SELECT subject_id, target_id, score,
        |    row_number() OVER (PARTITION BY subject_id ORDER BY score DESC, target_id) AS rnk
        |  FROM pruned WHERE score >= best * 0.1)
        |WHERE rnk <= 5""".stripMargin),

    // J10/P4/O2/O3 composed: the full xref/enrichment flow as ONE job —
    // blocked candidate generation → per-subject top-k pruning → the
    // same-id short-circuit (targets include every id % 100 = 0, so
    // some subjects exist verbatim on the target side) → the judgement
    // gate (POSITIVE → internal statements, NEGATIVE dropped, unjudged
    // → external candidates; judgements derived deterministically from
    // the pair ids so the oracle can re-derive them). The xref analog
    // of q109's ETL composition (local_enricher.py:86-199 end-to-end).
    decl("q110_xref_pipeline",
      (s, d) => {
        val p = t(s, d, "part")
        val k = col("p_partkey")
        val subjects = p.filter(k % 2 === 0)
        val targets = p.filter(k % 2 === 1 || k % 100 === 0)
        val cands = Blocking.candidates(subjects, targets,
          col("p_partkey"), col("p_name"), col("p_partkey"), col("p_name"),
          maxDf = 100)
        val top = Blocking.topK(cands, k = 5, cutoff = 0.5, minScoreRatio = 0.1)
        val matches = graft.operators.Enricher.withSameIdMatches(
          top.select(col("subject_id"), col("target_id"), col("score")),
          subjects, targets, col("p_partkey"), col("p_partkey"))
        val decisions = matches.select(col("subject_id"), col("target_id"))
          .withColumn("judgement",
            when((col("subject_id") + col("target_id")) % 7 === 0, "POSITIVE")
              .when((col("subject_id") + col("target_id")) % 7 === 1, "NEGATIVE"))
          .filter(col("judgement").isNotNull)
        graft.operators.Enricher.judgementGate(matches, decisions)
          .select(col("subject_id"), col("target_id"),
            col("score").cast("decimal(18,6)").cast("double").as("score"),
            col("route"))
      },
      """WITH pn AS (
        |  SELECT p_partkey AS id,
        |    list_filter(string_split(regexp_replace(trim(lower(p_name)), '\\s+', ' ', 'g'), ' '),
        |                t -> len(t) > 0) AS w
        |  FROM part),
        |pns AS (SELECT id, list_sort(list_distinct(w)) AS sw FROM pn),
        |keys0 AS (
        |  SELECT id, unnest(CASE WHEN len(sw) >= 2
        |    THEN list_transform(generate_series(1, len(sw) - 1), i -> sw[i] || ' ' || sw[i+1])
        |    ELSE sw END) AS bkey
        |  FROM pns),
        |keys1 AS (SELECT DISTINCT id, bkey FROM keys0),
        |skeys1 AS (SELECT id, bkey FROM keys1 WHERE id % 2 = 0),
        |tkeys1 AS (SELECT id, bkey FROM keys1 WHERE id % 2 = 1 OR id % 100 = 0),
        |skeys AS (SELECT k.id, k.bkey FROM skeys1 k
        |  JOIN (SELECT bkey, COUNT(*) df FROM skeys1 GROUP BY bkey) f
        |  ON k.bkey = f.bkey AND f.df <= 100),
        |tkeys AS (SELECT k.id, k.bkey FROM tkeys1 k
        |  JOIN (SELECT bkey, COUNT(*) df FROM tkeys1 GROUP BY bkey) f
        |  ON k.bkey = f.bkey AND f.df <= 100),
        |toks AS (SELECT id, list_distinct(w) AS t FROM pn),
        |pairs AS (SELECT DISTINCT sk.id AS subject_id, tk.id AS target_id
        |  FROM skeys sk JOIN tkeys tk ON sk.bkey = tk.bkey),
        |scored AS (SELECT subject_id, target_id,
        |    len(list_intersect(st.t, tt.t))::DOUBLE
        |      / (len(st.t) + len(tt.t) - len(list_intersect(st.t, tt.t)))::DOUBLE AS score
        |  FROM pairs JOIN toks st ON pairs.subject_id = st.id
        |             JOIN toks tt ON pairs.target_id = tt.id),
        |pruned AS (SELECT subject_id, target_id, score,
        |    max(score) OVER (PARTITION BY subject_id) AS best
        |  FROM scored WHERE score >= 0.5),
        |topk AS (
        |  SELECT subject_id, target_id, score
        |  FROM (SELECT subject_id, target_id, score,
        |      row_number() OVER (PARTITION BY subject_id ORDER BY score DESC, target_id) AS rnk
        |    FROM pruned WHERE score >= best * 0.1)
        |  WHERE rnk <= 5),
        |same AS (
        |  SELECT p_partkey AS subject_id, p_partkey AS target_id, 1.0::DOUBLE AS score
        |  FROM part WHERE p_partkey % 2 = 0 AND (p_partkey % 2 = 1 OR p_partkey % 100 = 0)),
        |allm AS (
        |  SELECT DISTINCT subject_id, target_id, score FROM (
        |    SELECT * FROM topk UNION ALL SELECT * FROM same))
        |SELECT subject_id, target_id,
        |  CAST(CAST(score AS DECIMAL(18,6)) AS DOUBLE) AS score,
        |  CASE WHEN subject_id = target_id THEN 'internal'
        |       WHEN (subject_id + target_id) % 7 = 0 THEN 'internal'
        |       ELSE 'external' END AS route
        |FROM allm
        |WHERE subject_id = target_id OR (subject_id + target_id) % 7 != 1""".stripMargin),

    // The training-data cleaning pipeline composed end-to-end (the
    // C4/RefinedWeb/Gopher shape): exact dedup (survivor = min doc_id
    // per content hash) → corpus-wide paragraph dedup over the
    // survivors → repetition/diversity quality gate over the DEDUPED
    // text (first failing rule recorded as the drop reason, evaluated
    // in fixed order) → language-ID and BPE-ish token counting for the
    // kept docs only. One manifest row per survivor. The training-data
    // counterpart of q109 (ETL) and q110 (xref).
    decl("q111_corpus_pipeline",
      (s, d) => {
        val docs = t(s, d, "documents")
        val keepers = Dedup.exact(docs, col("doc_id"), col("text"))
          .select(col("keeper_id").as("doc_id"))
        val s1 = docs.join(keepers, Seq("doc_id"), "left_semi")
        val s2 = Dedup.paragraphDedup(s1, col("doc_id"), col("text"), chunkWords = 3)
          .select(col("doc_id"), col("deduped_text"))
        val sig = TextAnalysis.repetitionSignals(
          s2.filter(length(col("deduped_text")) > 0),
          col("doc_id"), col("deduped_text"))
        val joined = s2.join(sig, Seq("doc_id"), "left")
        // rule order matters: the short-doc rules run first so the
        // repetition signals (undefined for empty/one-word docs) are
        // only consulted where both engines have well-defined values
        val reason = when(length(col("deduped_text")) === 0, "empty")
          .when(col("n_words") < 20, "too_short")
          .when(col("word_ratio") < 0.40, "low_diversity")
          .when(col("top_word_share") > 0.12, "top_heavy")
          .when(col("dup_bigram_frac") > 0.30, "repetitive")
          .otherwise("")
        val lang = TextAnalysis.langId(col("deduped_text"), Seq(
          "en" -> Seq("the", "a"),
          "x1" -> Seq("data", "table"),
          "x2" -> Seq("spark", "query")))
        joined.withColumn("drop_reason", reason)
          .withColumn("kept", col("drop_reason") === "")
          .select(col("doc_id"), col("kept"), col("drop_reason"),
            // sentinels, not nulls: a null numeric column round-trips as
            // NaN in the comparator and NaN != NaN
            when(col("kept"), lang).otherwise("").as("lang_pred"),
            when(col("kept"), TextAnalysis.bpeTokenCount(col("deduped_text")))
              .otherwise(0L).as("n_bpe"))
      },
      s"""WITH ex AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |s1 AS (SELECT d.doc_id, d.text FROM documents d JOIN ex USING (doc_id)),
         |w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM s1),
         |ch AS (SELECT doc_id, x.pos AS pos, x.chunk AS chunk FROM (
         |    SELECT doc_id, unnest(list_transform(
         |        generate_series(0, CAST(ceil(len(ws) / 3.0) AS INT) - 1),
         |        i -> {'pos': i, 'chunk': array_to_string(ws[i * 3 + 1 : i * 3 + 3], ' ')})) AS x
         |    FROM w)),
         |rk AS (SELECT doc_id, pos, chunk,
         |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn FROM ch),
         |s2 AS (SELECT doc_id,
         |    COALESCE(string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '') AS dt
         |  FROM rk GROUP BY doc_id),
         |wd AS (SELECT doc_id, string_split(dt, ' ') AS ws FROM s2 WHERE len(dt) > 0),
         |cnts AS (SELECT doc_id, SUM(n)::BIGINT AS n_words, COUNT(*) AS n_distinct, MAX(n) AS top_n
         |  FROM (SELECT doc_id, word, COUNT(*) AS n
         |        FROM (SELECT doc_id, unnest(ws) AS word FROM wd) GROUP BY 1, 2)
         |  GROUP BY doc_id),
         |bg AS (SELECT doc_id, len(bgl) AS n_bg, len(list_distinct(bgl)) AS n_bg_distinct
         |  FROM (SELECT doc_id, list_transform(generate_series(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i + 1]) AS bgl FROM wd)),
         |sig AS (SELECT doc_id, n_words,
         |    ((n_distinct::DOUBLE / n_words::DOUBLE)::DECIMAL(9,6))::DOUBLE AS word_ratio,
         |    ((top_n::DOUBLE / n_words::DOUBLE)::DECIMAL(9,6))::DOUBLE AS top_word_share,
         |    (((n_bg - n_bg_distinct)::DOUBLE / n_bg::DOUBLE)::DECIMAL(9,6))::DOUBLE AS dup_bigram_frac
         |  FROM cnts JOIN bg USING (doc_id)),
         |cls AS (SELECT s2.doc_id, s2.dt,
         |    CASE WHEN len(s2.dt) = 0 THEN 'empty'
         |         WHEN sig.n_words < 20 THEN 'too_short'
         |         WHEN sig.word_ratio < 0.40 THEN 'low_diversity'
         |         WHEN sig.top_word_share > 0.12 THEN 'top_heavy'
         |         WHEN sig.dup_bigram_frac > 0.30 THEN 'repetitive'
         |         ELSE '' END AS drop_reason
         |  FROM s2 LEFT JOIN sig USING (doc_id))
         |SELECT doc_id, drop_reason = '' AS kept, drop_reason,
         |  CASE WHEN drop_reason = '' THEN (CASE
         |    WHEN s_en >= s_x1 AND s_en >= s_x2 THEN 'en'
         |    WHEN s_x1 >= s_x2 THEN 'x1' ELSE 'x2' END) ELSE '' END AS lang_pred,
         |  CASE WHEN drop_reason = '' THEN
         |    len(regexp_extract_all(dt, '${TextAnalysis.BpePattern.replace("'", "''")}'))::BIGINT
         |  ELSE 0 END AS n_bpe
         |FROM (SELECT doc_id, drop_reason, dt,
         |    (length(p) - length(replace(p, ' the ', ''))) // 5 + (length(p) - length(replace(p, ' a ', ''))) // 3 AS s_en,
         |    (length(p) - length(replace(p, ' data ', ''))) // 6 + (length(p) - length(replace(p, ' table ', ''))) // 7 AS s_x1,
         |    (length(p) - length(replace(p, ' spark ', ''))) // 7 + (length(p) - length(replace(p, ' query ', ''))) // 7 AS s_x2
         |  FROM (SELECT doc_id, drop_reason, dt, ' ' || dt || ' ' AS p FROM cls))""".stripMargin),

    // Exact repeated-substring excision (Lee et al. 2022): spans whose
    // 8-gram repeats corpus-wide are cut out, not whole docs. Planted
    // structure: a shared 12-word tail on doc_id%13==4 (cross-doc
    // repeats, 5 overlapping shingles merging to one span) and a
    // self-repeat on doc_id%17==2 (the doc's first 10 words appended —
    // excises BOTH the head and the appended tail), on top of the
    // corpus's own planted duplicate docs. The oracle rebuilds shingle
    // counts, the running-max interval merge, and the index-filtered
    // kept-text digest in SQL.
    decl("q136_repeated_span_excision",
      (s, d) => {
        val doc = col("doc_id")
        val phrase = "every repeated passage of training text gets removed " +
          "span by span not document by document"
        val pt = concat(col("text"),
          when(doc % 13 === 4, lit(" " + phrase)).otherwise(lit("")),
          when(doc % 17 === 2,
            concat(lit(" "), concat_ws(" ", slice(split(col("text"), " "), 1, 10))))
            .otherwise(lit("")))
        Dedup.exciseRepeatedSpans(
          t(s, d, "documents").select(doc, pt.as("pt")),
          col("doc_id"), col("pt"), n = 8)
      },
      """WITH d0 AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 13 = 4 THEN ' every repeated passage of training text gets removed span by span not document by document' ELSE '' END
        |  || CASE WHEN doc_id % 17 = 2 THEN ' ' || array_to_string((string_split(text, ' '))[1:10], ' ') ELSE '' END AS pt
        |  FROM documents),
        |w AS (SELECT doc_id, string_split(pt, ' ') AS w FROM d0),
        |sh0 AS (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS pos FROM w),
        |sh AS (SELECT doc_id, pos, md5(array_to_string(w[pos:pos+7], ' ')) AS h FROM sh0),
        |hot AS (SELECT h FROM sh GROUP BY h HAVING COUNT(*) >= 2),
        |dp AS (SELECT sh.doc_id AS doc_id, sh.pos AS pos FROM sh JOIN hot USING (h)),
        |m AS (SELECT doc_id, pos, pos + 7 AS e,
        |  CASE WHEN pos > coalesce(max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
        |  FROM dp),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp FROM m),
        |spans AS (SELECT doc_id, grp, MIN(pos) AS s, MAX(e) AS e FROM g GROUP BY 1, 2),
        |sp AS (SELECT doc_id, COUNT(*)::BIGINT AS n_spans, SUM(e - s + 1)::BIGINT AS n_removed,
        |       array_agg(s ORDER BY s) AS ss, array_agg(e ORDER BY s) AS ee FROM spans GROUP BY 1)
        |SELECT w.doc_id AS doc_id, len(w.w)::BIGINT AS n_words,
        |  coalesce(sp.n_spans, 0)::BIGINT AS n_spans,
        |  coalesce(sp.n_removed, 0)::BIGINT AS n_removed_words,
        |  md5(coalesce(array_to_string(list_transform(
        |    list_filter(generate_series(1, len(w.w)), i ->
        |      coalesce(list_sum(list_transform(generate_series(1, len(coalesce(sp.ss, []))),
        |        j -> CASE WHEN i >= sp.ss[j] AND i <= sp.ee[j] THEN 1 ELSE 0 END)), 0) = 0),
        |    i -> w.w[i]), ' '), '')) AS kept_md5
        |FROM w LEFT JOIN sp USING (doc_id)""".stripMargin),

    // BPE pair-merge training, 3 rounds unrolled in the oracle: each
    // round's winning pair, its count, and the corpus symbol count
    // after the greedy merge. Pure integer/string arithmetic — the
    // oracle replays the full induction (pair counts, lexicographic
    // tie-break, list_reduce greedy merge) and must land on the exact
    // same merges, proving rounds 2-3 see round 1's merged corpus.
    decl("q137_bpe_merge_training",
      (s, d) => TextAnalysis.bpeMergeRounds(
        t(s, d, "documents"), col("text"), rounds = 3),
      (1 to 3).map { i =>
        s"""p$i AS (SELECT syms[j] AS a, syms[j+1] AS b FROM
           |  (SELECT syms, unnest(generate_series(1, len(syms) - 1)) AS j FROM w${i - 1})),
           |c$i AS (SELECT a, b, COUNT(*)::BIGINT AS cnt FROM p$i GROUP BY 1, 2),
           |win$i AS (SELECT a, b, cnt, a || '_' || b AS m FROM c$i ORDER BY cnt DESC, a, b LIMIT 1),
           |w$i AS (SELECT list_reduce(list_transform(syms, s -> [s]),
           |  (acc, nxt) -> CASE WHEN len(acc) > 0 AND acc[-1] = win$i.a AND nxt[1] = win$i.b
           |    THEN acc[1:len(acc)-1] || [win$i.m] ELSE acc || nxt END) AS syms
           |  FROM w${i - 1}, win$i)""".stripMargin
      }.mkString(
        "WITH w0 AS (SELECT string_split(text, ' ') AS syms FROM documents),\n",
        ",\n",
        "\n" + (1 to 3).map { i =>
          s"""SELECT $i::BIGINT AS round, a AS sym_a, b AS sym_b, cnt AS pair_count,
             |  (SELECT SUM(len(syms))::BIGINT FROM w$i) AS n_symbols_after FROM win$i""".stripMargin
        }.mkString("\nUNION ALL\n"))),

    // BPE ENCODE — the seam-closer between tokenizer training (q137)
    // and sequence packing (q132): merges are trained on HALF the
    // corpus (doc_id % 2 = 0), then applied in rank order to every
    // document. The oracle replays the split training AND the rule
    // application per document, so the hash match proves the encoder
    // applies rules in training order with the trainer's exact greedy
    // left-to-right semantics — including on documents the trainer
    // never saw.
    decl("q140_bpe_encode",
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = TextAnalysis.bpeMergeRounds(
          docs.filter(col("doc_id") % 2 === 0), col("text"), rounds = 3)
          .select(col("round"), col("sym_a"), col("sym_b"))
        TextAnalysis.bpeEncode(docs, col("doc_id"), col("text"), merges)
      },
      bpeSplitTrainSql(3) +
        "\nSELECT doc_id, len(syms)::BIGINT AS n_tokens, " +
        "md5(array_to_string(syms, ' ')) AS tokens_md5 FROM e3"),

    // Train → encode → PACK: the full pretraining layout path on real
    // tokenizer output. The packing manifest runs over bpeEncode's
    // n_tokens (+1 separator) through the same two-phase prefix sum as
    // q132; the oracle packs DuckDB's own re-encoded counts with a
    // plain global cumsum.
    decl("q141_bpe_pack",
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = TextAnalysis.bpeMergeRounds(
          docs.filter(col("doc_id") % 2 === 0), col("text"), rounds = 3)
          .select(col("round"), col("sym_a"), col("sym_b"))
        val enc = TextAnalysis.bpeEncode(docs, col("doc_id"), col("text"), merges)
        Packing.packManifestFromCounts(
          enc.select(col("doc_id"), (col("n_tokens") + 1L).as("n_tokens")),
          seqLen = 512L, bucketSize = 100L)
      },
      bpeSplitTrainSql(3) +
        """,
          |toks AS (SELECT doc_id, (len(syms) + 1)::BIGINT AS n_tokens FROM e3),
          |run AS (
          |  SELECT doc_id, n_tokens,
          |    SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
          |  FROM toks)
          |SELECT doc_id, n_tokens,
          |  (cum - n_tokens)::BIGINT AS off_start,
          |  ((cum - n_tokens) // 512)::BIGINT AS seq_first,
          |  ((cum - 1) // 512)::BIGINT AS seq_last
          |FROM run""".stripMargin),

    // Deterministically SHUFFLED sequence packing: the pre-pack
    // permutation every pretraining pipeline runs (id order would put
    // crawl locality into adjacent training sequences), as pure salted-
    // hash arithmetic — reproducible, stable under re-runs, no shuffle
    // table. The two-phase prefix sum generalizes to the hash order by
    // bucketing on the hash's TOP bits (ascending buckets = ascending
    // hash ranges); the oracle's plain global cumsum over (h, doc_id)
    // proves the decomposition exact in the shuffled domain too.
    decl("q148_shuffled_packing",
      (s, d) => Packing.shuffledPackManifest(
        t(s, d, "documents").select(col("doc_id"),
          (TextAnalysis.tokenCount(col("text")) + 1L).as("n_tokens")),
        "shuf", seqLen = 512L, bucketBits = 6),
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    (length(text) - length(replace(text, ' ', '')) + 2)::BIGINT AS n_tokens,
         |    ${sqlHash60("('shuf|' || doc_id::VARCHAR)")} AS h
         |  FROM documents),
         |run AS (
         |  SELECT doc_id, n_tokens,
         |    SUM(n_tokens) OVER (ORDER BY h, doc_id ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM toks)
         |SELECT doc_id, n_tokens,
         |  (cum - n_tokens)::BIGINT AS off_start,
         |  ((cum - n_tokens) // 512)::BIGINT AS seq_first,
         |  ((cum - 1) // 512)::BIGINT AS seq_last
         |FROM run""".stripMargin),

    // Tokenizer-QA coverage: per doc, how hard the trained merges fire
    // (merged-token count, tokens/words compression). The Spark side
    // RECOVERS the word count from the token stream's joiner arithmetic
    // (words = tokens + Σ joiners); the oracle computes it from the
    // ORIGINAL text — the hash match proves the recovery identity, and
    // any drift between encoder and trainer semantics breaks it. The
    // drift detector a tokenizer team runs per corpus slice: merges
    // that stop firing (compression → 1) flag out-of-distribution text.
    decl("q147_bpe_coverage",
      (s, d) => {
        val docs = t(s, d, "documents")
        val merges = TextAnalysis.bpeMergeRounds(
          docs.filter(col("doc_id") % 2 === 0), col("text"), rounds = 3)
          .select(col("round"), col("sym_a"), col("sym_b"))
        TextAnalysis.bpeCoverage(docs, col("doc_id"), col("text"), merges)
      },
      bpeSplitTrainSql(3) +
        """
          |SELECT e3.doc_id AS doc_id,
          |  len(d.syms)::BIGINT AS n_words,
          |  len(e3.syms)::BIGINT AS n_tokens,
          |  len(list_filter(e3.syms, s -> contains(s, '_')))::BIGINT AS n_merged,
          |  CAST(CAST(len(e3.syms)::DOUBLE / len(d.syms)::DOUBLE AS DECIMAL(9,6)) AS DOUBLE) AS compression
          |FROM e3 JOIN d ON e3.doc_id = d.doc_id""".stripMargin),

    // Blocker-recall regression harness — the reference's bench_pairs
    // measure (/root/reference/contrib/bench_pairs.py:1-60: how many
    // known-positive pairs does the blocker re-propose?) as an oracle
    // query. Every part spawns ONE planted variant whose true match is
    // the original; the variant class cycles by key: exact copy,
    // word-order shuffle, soundex-preserving vowel respelling (first
    // letter + consonant skeleton kept), first-token-to-initial. Both
    // production blockers run over the planted subjects vs the original
    // targets, and the report is per (blocker, class): planted pairs,
    // recalled pairs, recall, and total candidate volume — so a
    // recall-destroying blocker change flips the oracle hash, exactly
    // like the reference's regression gate. Expected shape, locked by
    // the oracle: sorted-bigram recalls exact + word-order fully (order
    // invariance by construction), loses most spelling variants (no
    // shared tokens); phonetic recalls exact/word-order/spelling fully
    // and initials never (the initial's soundex code differs).
    decl("q142_blocker_recall",
      (s, d) => {
        val off = 10000000L
        val p = t(s, d, "part")
        val w = split(col("p_name"), " ")
        val cls = (col("p_partkey") % 4).cast("int")
        val variant = when(cls === 0, col("p_name"))
          .when(cls === 1, concat_ws(" ", reverse(w)))
          .when(cls === 2, concat_ws(" ", transform(w, tk =>
            concat(substring(tk, 1, 1),
              translate(substring(tk, 2, 1 << 20), "aeiou", "eioua")))))
          .otherwise(concat_ws(" ",
            concat(array(substring(element_at(w, 1), 1, 1)),
              slice(w, lit(2), greatest(size(w) - 1, lit(0))))))
        val subjects = p.select((col("p_partkey") + off).as("sid"),
          variant.as("snm"), cls.as("cls"))
        val targets = p.select(col("p_partkey").as("tid"), col("p_name").as("tnm"))
        val lex = Blocking.candidates(subjects, targets,
          col("sid"), col("snm"), col("tid"), col("tnm"), maxDf = 100)
        val pho = Blocking.candidatesPhonetic(subjects, targets,
          col("sid"), col("snm"), col("tid"), col("tnm"), maxDf = 100)
        val subjCls = subjects.select(col("sid").as("subject_id"), col("cls"))
        val planted = subjCls.groupBy("cls").agg(count(lit(1)).as("n_planted"))
        def report(nm: String, cands: org.apache.spark.sql.DataFrame) = {
          val cd = cands.select("subject_id", "target_id").distinct()
          val recalled = subjCls
            .withColumn("target_id", col("subject_id") - off)
            .join(cd, Seq("subject_id", "target_id"), "left_semi")
            .groupBy("cls").agg(count(lit(1)).as("n_recalled"))
          val vol = cd.join(subjCls, "subject_id")
            .groupBy("cls").agg(count(lit(1)).as("n_candidates"))
          planted.join(recalled, Seq("cls"), "left").join(vol, Seq("cls"), "left")
            .select(lit(nm).as("blocker"), col("cls"), col("n_planted"),
              coalesce(col("n_recalled"), lit(0L)).as("n_recalled"),
              (coalesce(col("n_recalled"), lit(0L)).cast("double") /
                col("n_planted").cast("double"))
                .cast("decimal(9,6)").cast("double").as("recall"),
              coalesce(col("n_candidates"), lit(0L)).as("n_candidates"))
        }
        report("bigram", lex).unionByName(report("phonetic", pho))
          .withColumn("variant_class",
            when(col("cls") === 0, "exact").when(col("cls") === 1, "word_order")
              .when(col("cls") === 2, "spelling").otherwise("initials"))
          .select(col("blocker"), col("variant_class"), col("n_planted"),
            col("n_recalled"), col("recall"), col("n_candidates"))
      },
      s"""WITH p0 AS (SELECT p_partkey AS pk, p_name AS nm,
        |    string_split(p_name, ' ') AS w, (p_partkey % 4) AS cls FROM part),
        |subj AS (SELECT pk + 10000000 AS id, cls,
        |  CASE cls
        |    WHEN 0 THEN nm
        |    WHEN 1 THEN array_to_string(list_transform(
        |      generate_series(len(w), 1, -1), i -> w[i]), ' ')
        |    WHEN 2 THEN array_to_string(list_transform(w, t ->
        |      substr(t, 1, 1) || translate(substr(t, 2), 'aeiou', 'eioua')), ' ')
        |    ELSE array_to_string([substr(w[1], 1, 1)] || w[2:], ' ')
        |  END AS nm FROM p0),
        |tgt AS (SELECT pk AS id, nm FROM p0),
        |sw AS (SELECT id, list_sort(list_distinct(list_filter(
        |    string_split(nm, ' '), t -> len(t) > 0))) AS sw FROM subj),
        |twd AS (SELECT id, list_sort(list_distinct(list_filter(
        |    string_split(nm, ' '), t -> len(t) > 0))) AS sw FROM tgt),
        |skeys1 AS (SELECT DISTINCT id, unnest(CASE WHEN len(sw) >= 2
        |    THEN list_transform(generate_series(1, len(sw) - 1), i -> sw[i] || ' ' || sw[i+1])
        |    ELSE sw END) AS bkey FROM sw),
        |tkeys1 AS (SELECT DISTINCT id, unnest(CASE WHEN len(sw) >= 2
        |    THEN list_transform(generate_series(1, len(sw) - 1), i -> sw[i] || ' ' || sw[i+1])
        |    ELSE sw END) AS bkey FROM twd),
        |skeys AS (SELECT k.id, k.bkey FROM skeys1 k
        |  JOIN (SELECT bkey, COUNT(*) df FROM skeys1 GROUP BY bkey) f
        |  ON k.bkey = f.bkey AND f.df <= 100),
        |tkeys AS (SELECT k.id, k.bkey FROM tkeys1 k
        |  JOIN (SELECT bkey, COUNT(*) df FROM tkeys1 GROUP BY bkey) f
        |  ON k.bkey = f.bkey AND f.df <= 100),
        |lexpairs AS (SELECT DISTINCT sk.id AS subject_id, tk.id AS target_id
        |  FROM skeys sk JOIN tkeys tk ON sk.bkey = tk.bkey),
        |toks0 AS (SELECT DISTINCT tok FROM (
        |  SELECT unnest(list_filter(string_split(nm, ' '), t -> len(t) > 0)) AS tok
        |  FROM (SELECT nm FROM subj UNION ALL SELECT nm FROM tgt))),
        |$sqlSoundexCtes,
        |sfp AS (SELECT x.id,
        |    array_to_string(list_sort(list_distinct(list(sx.code))), ' ') AS fp
        |  FROM (SELECT id, unnest(list_filter(string_split(nm, ' '),
        |      t -> len(t) > 0)) AS tok FROM subj) x
        |  JOIN sx ON x.tok = sx.tok GROUP BY x.id),
        |tfp AS (SELECT x.id,
        |    array_to_string(list_sort(list_distinct(list(sx.code))), ' ') AS fp
        |  FROM (SELECT id, unnest(list_filter(string_split(nm, ' '),
        |      t -> len(t) > 0)) AS tok FROM tgt) x
        |  JOIN sx ON x.tok = sx.tok GROUP BY x.id),
        |sfpk AS (SELECT k.id, k.fp FROM sfp k
        |  JOIN (SELECT fp, COUNT(*) df FROM sfp GROUP BY fp) f
        |  ON k.fp = f.fp AND f.df <= 100),
        |tfpk AS (SELECT k.id, k.fp FROM tfp k
        |  JOIN (SELECT fp, COUNT(*) df FROM tfp GROUP BY fp) f
        |  ON k.fp = f.fp AND f.df <= 100),
        |phopairs AS (SELECT DISTINCT sk.id AS subject_id, tk.id AS target_id
        |  FROM sfpk sk JOIN tfpk tk ON sk.fp = tk.fp),
        |planted AS (SELECT cls, COUNT(*)::BIGINT AS n_planted FROM subj GROUP BY cls),
        |reports AS (
        |  SELECT 'bigram' AS blocker, p.cls, p.n_planted,
        |    coalesce(r.n, 0)::BIGINT AS n_recalled,
        |    coalesce(v.n, 0)::BIGINT AS n_candidates
        |  FROM planted p
        |  LEFT JOIN (SELECT s.cls, COUNT(*) n FROM lexpairs c
        |    JOIN subj s ON c.subject_id = s.id AND c.target_id = s.id - 10000000
        |    GROUP BY s.cls) r ON p.cls = r.cls
        |  LEFT JOIN (SELECT s.cls, COUNT(*) n FROM lexpairs c
        |    JOIN subj s ON c.subject_id = s.id GROUP BY s.cls) v ON p.cls = v.cls
        |  UNION ALL
        |  SELECT 'phonetic', p.cls, p.n_planted,
        |    coalesce(r.n, 0)::BIGINT, coalesce(v.n, 0)::BIGINT
        |  FROM planted p
        |  LEFT JOIN (SELECT s.cls, COUNT(*) n FROM phopairs c
        |    JOIN subj s ON c.subject_id = s.id AND c.target_id = s.id - 10000000
        |    GROUP BY s.cls) r ON p.cls = r.cls
        |  LEFT JOIN (SELECT s.cls, COUNT(*) n FROM phopairs c
        |    JOIN subj s ON c.subject_id = s.id GROUP BY s.cls) v ON p.cls = v.cls)
        |SELECT blocker,
        |  CASE cls WHEN 0 THEN 'exact' WHEN 1 THEN 'word_order'
        |    WHEN 2 THEN 'spelling' ELSE 'initials' END AS variant_class,
        |  n_planted, n_recalled,
        |  CAST(CAST(n_recalled::DOUBLE / n_planted::DOUBLE AS DECIMAL(9,6)) AS DOUBLE) AS recall,
        |  n_candidates
        |FROM reports""".stripMargin),

    // The COMPOSED lexical near-dedup pipeline (RedPajama/SlimPajama
    // fuzzy dedup): MinHash+LSH pairs (q42's exact signature arithmetic)
    // → connected-components closure → longest-member keeper (ties →
    // lowest id) → one manifest row per document. The lexical twin of
    // q116's semantic pipeline, riding the corpus's own planted
    // duplicate docs. The oracle rebuilds signatures, band collisions,
    // the recursive-CTE closure, and the keeper rule in SQL.
    decl("q145_neardedup_manifest",
      (s, d) => {
        val docs = t(s, d, "documents")
        Dedup.nearDedupManifest(
          docs.select(col("doc_id"), col("text")), col("doc_id"), col("text"),
          docs.select(col("doc_id"), col("n_chars")),
          n = 3, maxDf = 50, bands = 8, rowsPerBand = 4, minEstJaccard = 0.5)
      },
      s"""WITH RECURSIVE $minhashSigCtes,
         |pairs AS (
         |  SELECT a.doc AS a, b.doc AS b
         |  FROM sig a JOIN sig b ON a.doc < b.doc
         |  WHERE ($minhashBandEq)
         |    AND ($minhashEqSum)::DOUBLE / 32.0 >= 0.5),
         |sym AS (SELECT a AS x, b AS y FROM pairs
         |  UNION SELECT b, a FROM pairs),
         |reach(id, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x),
         |comp AS (SELECT id, MIN(m) AS component FROM reach GROUP BY id),
         |wt AS (SELECT c.id, c.component, d.n_chars
         |  FROM comp c LEFT JOIN documents d ON c.id = d.doc_id),
         |rep AS (SELECT component, id,
         |    row_number() OVER (PARTITION BY component
         |      ORDER BY n_chars DESC NULLS LAST, id ASC) AS rn
         |  FROM wt),
         |nm AS (SELECT component, COUNT(*)::BIGINT AS n_members
         |  FROM comp GROUP BY component)
         |SELECT c.id AS doc_id, c.component, r.id AS kept_id,
         |  (c.id = r.id) AS is_kept, nm.n_members
         |FROM comp c
         |JOIN rep r ON c.component = r.component AND r.rn = 1
         |JOIN nm ON c.component = nm.component""".stripMargin),

    // Review-table accept/reject protocol (stateful/review.py
    // review_extraction + reviewer actions) across two crawls: crawl 1
    // seeds the state (all pending), reviewers accept every k%3==0 key
    // (editing the k%6==0 extractions), then crawl 2 exercises every
    // precedence rule at once — k%5==0 changes source AND extraction
    // (full reset, acceptance dropped), k%5==1 bumps crawler_version
    // (reset), k%5==2 changes extraction only (refreshed IF unaccepted,
    // untouched if accepted — reviewer data outranks the crawler),
    // k%5==3 unchanged (last_seen bump only), k%5==4 absent (stale row
    // keeps its old last_seen). The oracle replays the same precedence
    // as CASE logic over a LEFT JOIN of reconstructed crawls.
    decl("q144_review_protocol",
      (s, d) => {
        import graft.operators.Reviews
        val p = t(s, d, "part")
        val k = col("p_partkey")
        val key = concat(lit("p"), k.cast("string"))
        val crawl1 = p.select(key.as("key"), col("p_name").as("source_value"),
          col("p_type").as("original_extraction"),
          lit(1L).as("crawler_version"), lit("llm").as("origin"))
        val state0 = crawl1.limit(0).select(col("key"), col("source_value"),
          col("original_extraction"),
          col("original_extraction").as("extracted_data"),
          lit(false).as("accepted"), col("crawler_version"), col("origin"),
          lit("").as("last_seen_version"), lit("").as("modified_version"),
          lit("").as("modified_by"))
        val state1 = Reviews.reviewExtraction(state0, crawl1, "v1")
        val decisions = p.filter(k % 3 === 0).select(key.as("key"),
          lit(true).as("accepted"),
          when(k % 6 === 0, concat(col("p_type"), lit("_edit")))
            .otherwise(lit(null).cast("string")).as("extracted_edit"),
          lit("alice").as("reviewed_by"))
        val state1r = Reviews.applyReviews(state1, decisions, "v1")
        val crawl2 = p.filter(k % 5 =!= 4).select(key.as("key"),
          when(k % 5 === 0, concat(col("p_name"), lit("_s2")))
            .otherwise(col("p_name")).as("source_value"),
          when(k % 5 === 0, concat(col("p_type"), lit("_v2")))
            .when(k % 5 === 2, concat(col("p_type"), lit("_m2")))
            .otherwise(col("p_type")).as("original_extraction"),
          when(k % 5 === 1, 2L).otherwise(1L).as("crawler_version"),
          lit("llm2").as("origin"))
        Reviews.reviewExtraction(state1r, crawl2, "v2")
      },
      """WITH base AS (SELECT 'p' || p_partkey::VARCHAR AS key, p_partkey AS k,
        |    p_name AS sv, p_type AS oe FROM part),
        |s1 AS (SELECT key, k, sv, oe,
        |  CASE WHEN k % 6 = 0 THEN oe || '_edit' ELSE oe END AS ed,
        |  (k % 3 = 0) AS accepted, 1::BIGINT AS cv, 'llm' AS origin,
        |  'v1' AS lsv, 'v1' AS mv,
        |  CASE WHEN k % 3 = 0 THEN 'alice' ELSE 'crawler' END AS mb
        |  FROM base),
        |c2 AS (SELECT key,
        |  CASE WHEN k % 5 = 0 THEN sv || '_s2' ELSE sv END AS sv2,
        |  CASE WHEN k % 5 = 0 THEN oe || '_v2'
        |       WHEN k % 5 = 2 THEN oe || '_m2' ELSE oe END AS oe2,
        |  CASE WHEN k % 5 = 1 THEN 2 ELSE 1 END::BIGINT AS cv2
        |  FROM base WHERE k % 5 != 4),
        |j AS (SELECT s1.*, c2.sv2, c2.oe2, c2.cv2,
        |  (c2.key IS NOT NULL) AS seen,
        |  coalesce(c2.cv2 > s1.cv OR (c2.sv2 != s1.sv AND c2.oe2 != s1.oe),
        |    false) AS rst,
        |  coalesce(NOT s1.accepted AND c2.oe2 != s1.oe, false) AS fresh
        |  FROM s1 LEFT JOIN c2 ON s1.key = c2.key)
        |SELECT key,
        |  CASE WHEN rst THEN sv2 ELSE sv END AS source_value,
        |  CASE WHEN rst OR fresh THEN oe2 ELSE oe END AS original_extraction,
        |  CASE WHEN rst OR fresh THEN oe2 ELSE ed END AS extracted_data,
        |  CASE WHEN rst THEN false ELSE accepted END AS accepted,
        |  CASE WHEN rst THEN cv2 ELSE cv END AS crawler_version,
        |  CASE WHEN rst OR fresh THEN 'llm2' ELSE origin END AS origin,
        |  CASE WHEN seen THEN 'v2' ELSE lsv END AS last_seen_version,
        |  CASE WHEN rst OR fresh THEN 'v2' ELSE mv END AS modified_version,
        |  CASE WHEN rst OR fresh THEN 'crawler' ELSE mb END AS modified_by
        |FROM j""".stripMargin),

    // Gopher document-quality rules (Rae et al. 2021 A1.1) — the
    // heuristic filter suite between C4's line rules (q128) and the
    // model-based scorers (q129): word-count bounds, mean word length,
    // symbol-to-word ratio, alphabetic-word fraction, stop-word
    // presence, and the two line-level rules (bullet / ellipsis line
    // fractions) over deterministically manufactured lines. Overlays
    // plant symbol runs (doc%4), numeric words (doc%6), stop words
    // (doc%3), all-bullet docs (doc%11) so every rule fires both ways;
    // the oracle replays overlays, line manufacture, and each signal.
    decl("q149_gopher_quality",
      (s, d) => {
        val doc = col("doc_id")
        val pt0 = concat(col("text"),
          when(doc % 4 === 0, lit(" ### ## #")).otherwise(lit("")),
          when(doc % 6 === 0, lit(" 111 222 333 444 555")).otherwise(lit("")),
          when(doc % 3 === 0, lit(" of the and with")).otherwise(lit("")))
        val base = t(s, d, "documents")
          .select(doc, pt0.as("pt"))
          .select(doc, col("pt"), split(col("pt"), " ").as("w"))
        val wc = size(col("w"))
        val nchunks = ((wc + lit(6)) / lit(7)).cast("int")
        val lines = transform(sequence(lit(1), nchunks), c =>
          concat(
            when(doc % 11 === 0 || (doc + c) % 5 === 0, lit("- ")).otherwise(lit("")),
            concat_ws(" ", slice(col("w"), (c - 1) * 7 + 1,
              least(lit(7), wc - (c - 1) * 7))),
            when((doc + c) % 3 === 0, lit("...")).otherwise(lit(""))))
        base
          .select(doc, TextAnalysis.gopherSignals(col("pt"), lines).as("g"))
          .select(doc,
            col("g.n_words").as("n_words"),
            col("g.mean_word_len").as("mean_word_len"),
            col("g.symbol_ratio").as("symbol_ratio"),
            col("g.alpha_frac").as("alpha_frac"),
            col("g.stop_hits").as("stop_hits"),
            col("g.bullet_frac").as("bullet_frac"),
            col("g.ellipsis_frac").as("ellipsis_frac"),
            TextAnalysis.gopherKeep(col("g")).as("keep"))
      },
      """WITH d0 AS (
        |  SELECT doc_id,
        |    text || CASE WHEN doc_id % 4 = 0 THEN ' ### ## #' ELSE '' END
        |         || CASE WHEN doc_id % 6 = 0 THEN ' 111 222 333 444 555' ELSE '' END
        |         || CASE WHEN doc_id % 3 = 0 THEN ' of the and with' ELSE '' END AS pt
        |  FROM documents),
        |w AS (SELECT doc_id, pt, string_split(pt, ' ') AS w FROM d0),
        |lined AS (
        |  SELECT doc_id, pt, w,
        |    list_transform(generate_series(1, ((len(w) + 6) // 7)), c ->
        |      CASE WHEN doc_id % 11 = 0 OR (doc_id + c) % 5 = 0 THEN '- ' ELSE '' END
        |      || array_to_string(w[(c-1)*7+1 : least(c*7, len(w))], ' ')
        |      || CASE WHEN (doc_id + c) % 3 = 0 THEN '...' ELSE '' END) AS lines
        |  FROM w),
        |sig AS (
        |  SELECT doc_id,
        |    len(w)::BIGINT AS n_words,
        |    CAST(CAST(list_sum(list_transform(w, x -> length(x)))::DOUBLE
        |      / len(w) AS DECIMAL(9,6)) AS DOUBLE) AS mean_word_len,
        |    CAST(CAST((
        |      (length(pt) - length(replace(pt, '#', '')))
        |      + (length(pt) - length(replace(pt, '...', ''))) // 3
        |      )::DOUBLE / len(w) AS DECIMAL(9,6)) AS DOUBLE) AS symbol_ratio,
        |    CAST(CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
        |      / len(w) AS DECIMAL(9,6)) AS DOUBLE) AS alpha_frac,
        |    len(list_intersect(w,
        |      ['the','be','to','of','and','that','have','with']))::BIGINT AS stop_hits,
        |    CAST(CAST(len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '* %'))::DOUBLE
        |      / len(lines) AS DECIMAL(9,6)) AS DOUBLE) AS bullet_frac,
        |    CAST(CAST(len(list_filter(lines, l -> l LIKE '%...'))::DOUBLE
        |      / len(lines) AS DECIMAL(9,6)) AS DOUBLE) AS ellipsis_frac
        |  FROM lined)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
        |  stop_hits, bullet_frac, ellipsis_frac,
        |  coalesce(n_words BETWEEN 50 AND 100000
        |    AND mean_word_len BETWEEN 3.0 AND 10.0
        |    AND symbol_ratio < 0.1 AND alpha_frac > 0.8 AND stop_hits >= 2
        |    AND bullet_frac < 0.9 AND ellipsis_frac < 0.3, false) AS keep
        |FROM sig""".stripMargin),

    // Trained logistic quality classifier (the DCLM/fastText filter
    // stage): hashed bag-of-words into 64 buckets, TWO full-batch GD
    // rounds trained in-engine on half the corpus (doc_id%4 < 2),
    // whole corpus scored. The label is balanced (doc_id parity) and
    // carried by planted marker vocabulary — positives end in quality
    // prose markers, negatives in junk markers; the markers were
    // CHOSEN to hash into buckets disjoint from the 31-word base
    // vocabulary AND from each other (hash60 is deterministic, so this
    // is checkable up front) — the trained probe must separate the
    // plant, and predictions flip per doc, not one global sign. The
    // oracle replays BOTH training rounds: round 1 starts from w = 0
    // (z = 0, p = 0.5 exactly on any engine), every margin and weight
    // update round-trips DECIMAL(12,4) so double-sum order and libm
    // exp ulps cannot flip the hash (the q129 ln precedent).
    decl("q150_logistic_quality",
      (s, d) => {
        val doc = col("doc_id")
        val docs = t(s, d, "documents").select(doc,
          concat(col("text"),
            when(doc % 2 === 0, lit(" crisp lucid prose"))
              .otherwise(lit(" spammy vapid filler"))).as("pt"))
        val w = TextAnalysis.logisticWeights(docs, doc, col("pt"),
          doc % 2 === 0, doc % 4 < 2, buckets = 64, rounds = 2, lr = 100.0)
        TextAnalysis.logisticScores(docs, doc, col("pt"), w, buckets = 64)
      },
      logisticFixtureCtes +
        """
          |SELECT doc_id, CAST(CAST(CAST(SUM(CAST(w * cnt AS DECIMAL(30,12))) AS DOUBLE) AS DECIMAL(12,4)) AS DOUBLE) AS score,
          |  CAST(CAST(CAST(SUM(CAST(w * cnt AS DECIMAL(30,12))) AS DOUBLE) AS DECIMAL(12,4)) AS DOUBLE) > 0 AS predicted
          |FROM x JOIN w2 USING (b) GROUP BY doc_id""".stripMargin),

    // Host-level curation (the FineWeb domain step): per-host doc and
    // token volume, corpus-wide exact-duplicate fraction, mean lexical
    // diversity, and the keep/blocklist decision. URLs ride the q131
    // manufacture (hosts example0..19.com); host example3.com is
    // poisoned with one constant boilerplate text (dup_frac 1.0, floor
    // diversity) so the blocklist branch provably fires.
    decl("q151_host_curation",
      (s, d) => {
        val doc = col("doc_id")
        val raw = when(doc % 4 === 0,
          concat(lit("HTTPS://WWW.Example"), (doc % 20).cast("string"),
            lit(".COM:443/Articles/"), (doc % 50).cast("string"),
            lit("/?utm_source=feed&b=2&a=1&utm_campaign=x#frag")))
          .when(doc % 4 === 1,
            concat(lit("http://example"), (doc % 20).cast("string"),
              lit(".com/Articles/"), (doc % 50).cast("string"), lit("/")))
          .when(doc % 4 === 2,
            concat(lit("https://www.example"), (doc % 20).cast("string"),
              lit(".com/articles/"), (doc % 50).cast("string"), lit("?a=1&b=2")))
          .otherwise(concat(lit("https://Example"), (doc % 20).cast("string"),
            lit(".com")))
        val pt = when(doc % 20 === 3,
          lit("the same boilerplate line repeated again and again"))
          .otherwise(col("text"))
        val docs = t(s, d, "documents").select(doc, raw.as("url"), pt.as("pt"))
        Curation.hostReport(docs, doc, col("url"), col("pt"))
      },
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'HTTPS://WWW.Example' || (doc_id % 20)::VARCHAR || '.COM:443/Articles/' || (doc_id % 50)::VARCHAR || '/?utm_source=feed&b=2&a=1&utm_campaign=x#frag'
        |      WHEN 1 THEN 'http://example' || (doc_id % 20)::VARCHAR || '.com/Articles/' || (doc_id % 50)::VARCHAR || '/'
        |      WHEN 2 THEN 'https://www.example' || (doc_id % 20)::VARCHAR || '.com/articles/' || (doc_id % 50)::VARCHAR || '?a=1&b=2'
        |      ELSE 'https://Example' || (doc_id % 20)::VARCHAR || '.com'
        |    END AS raw,
        |    CASE WHEN doc_id % 20 = 3
        |      THEN 'the same boilerplate line repeated again and again'
        |      ELSE text END AS pt
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(regexp_extract(raw, '^[A-Za-z]+://([^/?#]+)', 1)), '^www\.|:443$|:80$', '', 'g') AS host,
        |    md5(regexp_replace(trim(lower(pt)), '\s+', ' ', 'g')) AS fp,
        |    (length(pt) - length(replace(pt, ' ', '')) + 1)::BIGINT AS n_tok,
        |    CAST(CAST(len(list_distinct(string_split(pt, ' ')))::DOUBLE
        |      / len(string_split(pt, ' ')) AS DECIMAL(9,6)) AS DOUBLE) AS word_ratio
        |  FROM u),
        |fpn AS (SELECT fp, COUNT(*) AS fp_n FROM d GROUP BY fp),
        |agg AS (
        |  SELECT host, COUNT(*)::BIGINT AS n_docs, SUM(n_tok)::BIGINT AS n_tokens,
        |    SUM(CASE WHEN fp_n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
        |    CAST(CAST(CAST(SUM(CAST(word_ratio AS DECIMAL(20,6))) AS DOUBLE)
        |      / COUNT(*) AS DECIMAL(9,6)) AS DOUBLE) AS mean_word_ratio
        |  FROM d JOIN fpn USING (fp) GROUP BY host)
        |SELECT host, n_docs, n_tokens, n_dup_docs,
        |  CAST(CAST(n_dup_docs::DOUBLE / n_docs AS DECIMAL(9,6)) AS DOUBLE) AS dup_frac,
        |  mean_word_ratio,
        |  CASE WHEN CAST(CAST(n_dup_docs::DOUBLE / n_docs AS DECIMAL(9,6)) AS DOUBLE) >= 0.5
        |         OR mean_word_ratio < 0.4
        |    THEN 'blocklist' ELSE 'keep' END AS decision
        |FROM agg""".stripMargin),

    // Incremental exact dedup: a fresh crawl drop (ids shifted +1e6)
    // deduped against the existing corpus WITHOUT re-deduping the base.
    // Planted classes: doc%3=0 → verbatim base copy (dup_of_base, the
    // keeper is the smallest base id of that content — the base's own
    // planted dup groups exercise the min), doc%3=1 → one of 7 novel
    // texts (dup_in_new chains, smallest fresh id keeps), doc%3=2 →
    // uniquely suffixed (kept). Oracle replays both fingerprint tables
    // and the two-join decision.
    decl("q152_incremental_dedup",
      (s, d) => {
        val docs = t(s, d, "documents")
        val fresh = docs.select((col("doc_id") + 1000000L).as("fid"),
          when(col("doc_id") % 3 === 0, col("text"))
            .when(col("doc_id") % 3 === 1,
              concat(lit("fresh content block "), (col("doc_id") % 7).cast("string")))
            .otherwise(concat(col("text"), lit(" unique suffix "),
              col("doc_id").cast("string"))).as("ftext"))
        Dedup.incrementalExact(docs, col("doc_id"), col("text"),
          fresh, col("fid"), col("ftext"))
      },
      """WITH fresh AS (
        |  SELECT doc_id + 1000000 AS id,
        |    CASE doc_id % 3
        |      WHEN 0 THEN text
        |      WHEN 1 THEN 'fresh content block ' || (doc_id % 7)::VARCHAR
        |      ELSE text || ' unique suffix ' || doc_id::VARCHAR END AS ftext
        |  FROM documents),
        |b AS (SELECT md5(text) AS content_hash, MIN(doc_id) AS base_keeper
        |      FROM documents GROUP BY 1),
        |f AS (SELECT id, md5(ftext) AS content_hash FROM fresh),
        |fk AS (SELECT content_hash, MIN(id) AS fresh_keeper FROM f GROUP BY 1)
        |SELECT f.id, f.content_hash,
        |  CASE WHEN b.base_keeper IS NOT NULL THEN 'dup_of_base'
        |       WHEN fk.fresh_keeper != f.id THEN 'dup_in_new'
        |       ELSE 'kept' END AS status,
        |  coalesce(b.base_keeper,
        |    CASE WHEN fk.fresh_keeper != f.id THEN fk.fresh_keeper ELSE f.id END) AS keeper_id
        |FROM f LEFT JOIN b USING (content_hash) JOIN fk USING (content_hash)""".stripMargin),

    // Curriculum packing: the q150 classifier's scores tier the corpus
    // (fixed thresholds — quantile tiers would need a corpus sort; tier
    // cutoffs are config in production), and the packer lays tokens out
    // stage-by-stage (stage 0 = highest tier first) with the same
    // two-phase prefix sum as q132/q148 — the oracle's single global
    // cumsum over (stage, doc_id) proves the staged decomposition
    // exact. Composes: train classifier → score → tier → pack.
    decl("q153_curriculum_packing",
      (s, d) => {
        val doc = col("doc_id")
        val docs = t(s, d, "documents").select(doc,
          concat(col("text"),
            when(doc % 2 === 0, lit(" crisp lucid prose"))
              .otherwise(lit(" spammy vapid filler"))).as("pt"))
        val w = TextAnalysis.logisticWeights(docs, doc, col("pt"),
          doc % 2 === 0, doc % 4 < 2, buckets = 64, rounds = 2, lr = 100.0)
        val scored = TextAnalysis.logisticScores(docs, doc, col("pt"), w, buckets = 64)
        val toks = docs
          .select(doc, TextAnalysis.tokenCount(col("pt")).as("n_tokens"))
          .join(scored.select(col("doc_id"), col("score")), "doc_id")
          .select(col("doc_id"), col("n_tokens"),
            when(col("score") >= 0.08, 0)
              .when(col("score") >= -0.08, 1)
              .otherwise(2).cast("int").as("stage"))
        Packing.curriculumPackManifest(toks, seqLen = 512L, bucketSize = 100L)
      },
      logisticFixtureCtes + """,
        |sc AS (SELECT doc_id, CAST(CAST(CAST(SUM(CAST(w * cnt AS DECIMAL(30,12))) AS DOUBLE) AS DECIMAL(12,4)) AS DOUBLE) AS score
        |       FROM x JOIN w2 USING (b) GROUP BY doc_id),
        |st AS (SELECT d0.doc_id,
        |  (length(d0.text) - length(replace(d0.text, ' ', '')) + 1)::BIGINT AS n_tokens,
        |  CASE WHEN score >= 0.08 THEN 0 WHEN score >= -0.08 THEN 1 ELSE 2 END AS stage
        |  FROM d0 JOIN sc USING (doc_id)),
        |packed AS (SELECT doc_id, stage, n_tokens,
        |  (SUM(n_tokens) OVER (ORDER BY stage, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)::BIGINT AS off_start
        |  FROM st)
        |SELECT doc_id, stage, n_tokens, off_start,
        |  (off_start // 512)::BIGINT AS seq_first,
        |  ((off_start + n_tokens - 1) // 512)::BIGINT AS seq_last
        |FROM packed""".stripMargin),

    // Incremental NEAR-dedup: the fresh drop of q152 at MinHash
    // granularity — exact copies (doc%5=0) and truncated near-copies
    // (doc%5=1, last two words dropped) must match their base doc
    // through the cross-corpus banded join; word-reversed docs
    // (doc%5∈{2,3,4}) share tokens but no 3-shingles and stay kept.
    // Oracle rebuilds BOTH sides' signatures (per-side df caps), all 8
    // band buckets, the estimate, and the best-match tie-break.
    decl("q154_incremental_neardup",
      (s, d) => {
        val doc = col("doc_id")
        val base = t(s, d, "documents").select(doc, col("text"))
        val w = split(col("text"), " ")
        val ftext = when(doc % 5 === 0, col("text"))
          .when(doc % 5 === 1,
            concat_ws(" ", slice(w, lit(1), greatest(size(w) - 2, lit(1)))))
          .otherwise(concat_ws(" ", reverse(w)))
        val fresh = t(s, d, "documents")
          .select((doc + 1000000L).as("fid"), ftext.as("ftext"))
        Dedup.incrementalNearDup(base, doc, col("text"),
          fresh, col("fid"), col("ftext"),
          n = 3, maxDf = 50, bands = 8, rowsPerBand = 4, minEstJaccard = 0.5)
      },
      incrementalNearDupSql)
  ) :+ epochPlanDecl :+ sourceOverlapDecl :+ classifierEvalDecl :+ rocCurveDecl :+ prefixJaccardDecl :+ editDistDecl :+ percentileGateDecl :+ curationPipelineDecl :+ phashDecl :+ phashWideDecl :+ phashAutoDecl

  // q288 (round-14): the END-TO-END CURATION PIPELINE as one
  // oracle-gated composition — the full corpus DAG a pretraining data
  // team runs, each stage an operator the suite already gates alone:
  // MinHash-LSH near-dup pairs (q42) → connected components (q253) →
  // canonical-document election (q283) → a length quality gate →
  // whitespace token counts → the two-phase-prefix packing manifest
  // (q132). One drifting stage breaks the final packed offsets, so
  // the hash gates the INTERACTION of five operators, not just each
  // alone — the composition discipline of q223 (composed ER) applied
  // to the document pipeline. Scale shape inherits the pieces': band
  // equi-joins, mergeable election aggregate, no global window
  // anywhere (the oracle's corpus-wide cumsum replays the two-phase
  // prefix sum exactly).
  private def curationPipelineDecl: Decl =
    decl("q288_curation_pipeline",
      (s, d) => {
        val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
        val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"),
          n = 3, maxDf = 50, bands = 8, rowsPerBand = 4, minEstJaccard = 0.5)
        val labels = ConnectedComponents.run(
          docs.select(col("doc_id").as("id")),
          pairs.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        val withLen = labels.join(
          docs.select(col("doc_id").as("id"),
            size(split(col("text"), " ")).cast("long").as("len")), "id")
        val elect = withLen.groupBy("component")
          .agg(max_by(col("id"), struct(col("len"), -col("id")))
            .as("canonical_id"))
        val kept = withLen.join(elect, "component")
          .filter(col("id") === col("canonical_id"))
          .select(col("id").as("doc_id"), col("len"))
        val quality = kept.filter(col("len") >= 20 && col("len") <= 5000)
        val toks = quality.select(col("doc_id"),
          (col("len") + 1L).as("n_tokens"))
        Packing.packManifestFromCounts(toks, seqLen = 512L, bucketSize = 100L)
      },
      s"""WITH RECURSIVE $minhashSigCtes,
         |prs AS (
         |  SELECT a.doc AS da, b.doc AS db
         |  FROM sig a JOIN sig b ON a.doc < b.doc
         |  WHERE ($minhashBandEq)
         |    AND ($minhashEqSum)::DOUBLE / 32.0 >= 0.5),
         |sym AS (SELECT da AS x, db AS y FROM prs
         |        UNION SELECT db, da FROM prs),
         |reach(id, m) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.id, s.y FROM reach r JOIN sym s ON r.m = s.x),
         |comp AS (SELECT id, MIN(m) AS component FROM reach GROUP BY id),
         |wl AS (SELECT comp.id, comp.component,
         |       len(string_split(d.text, ' '))::BIGINT AS len
         |       FROM comp JOIN documents d ON comp.id = d.doc_id),
         |rk AS (SELECT id, component, len,
         |       ROW_NUMBER() OVER (PARTITION BY component
         |         ORDER BY len DESC, id ASC) AS rn
         |       FROM wl),
         |kept AS (SELECT id AS doc_id, len FROM rk WHERE rn = 1),
         |toks AS (SELECT doc_id, (len + 1)::BIGINT AS n_tokens FROM kept
         |         WHERE len BETWEEN 20 AND 5000),
         |run AS (SELECT doc_id, n_tokens,
         |        SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
         |          AS cum FROM toks)
         |SELECT doc_id, n_tokens,
         |  (cum - n_tokens)::BIGINT AS off_start,
         |  ((cum - n_tokens) // 512)::BIGINT AS seq_first,
         |  ((cum - 1) // 512)::BIGINT AS seq_last
         |FROM run""".stripMargin)

  /** DuckDB oracle for q154: per-side MinHash signature chains (same
    * permutation constants and df cap as the Spark operator), the 8
    * per-band md5 bucket keys, the cross-corpus candidate join, and the
    * (est DESC, base id) best-match rule. */
  private def incrementalNearDupSql: String = {
    val m = Dedup.PermModulus
    val mins = (0 until 32).map { i =>
      val (a, b) = Dedup.perm(i)
      s"min((h * $a + $b) % $m) AS m$i"
    }.mkString(",\n    ")
    def sigChain(pfx: String, srcSql: String): String =
      s"""${pfx}words AS (SELECT id AS doc, string_split(txt, ' ') w FROM ($srcSql)),
         |${pfx}sh0 AS (SELECT DISTINCT doc, unnest(list_transform(generate_series(1, len(w)-2),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) s
         |  FROM ${pfx}words WHERE len(w) >= 3),
         |${pfx}sh AS (SELECT ${pfx}sh0.doc, ${pfx}sh0.s FROM ${pfx}sh0
         |  JOIN (SELECT s, COUNT(*) df FROM ${pfx}sh0 GROUP BY s) f
         |    ON ${pfx}sh0.s = f.s AND f.df <= 50),
         |${pfx}hs AS (SELECT doc, ${sqlHash60("s")} % $m AS h FROM ${pfx}sh),
         |${pfx}sig AS (SELECT doc,
         |    $mins
         |  FROM ${pfx}hs GROUP BY doc)""".stripMargin
    def bandUnion(pfx: String): String =
      (0 until 8).map { b =>
        val cols = (0 until 4).map(r => s"m${b * 4 + r}::VARCHAR").mkString(" || '_' || ")
        s"SELECT doc, $b AS band, md5($cols) AS bucket FROM ${pfx}sig"
      }.mkString("\n  UNION ALL ")
    val matches = (0 until 32)
      .map(i => s"CASE WHEN fs.m$i = bs.m$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH fresh AS (
       |  SELECT doc_id + 1000000 AS id,
       |    CASE
       |      WHEN doc_id % 5 = 0 THEN text
       |      WHEN doc_id % 5 = 1 THEN array_to_string(
       |        string_split(text, ' ')[1:greatest(len(string_split(text, ' ')) - 2, 1)], ' ')
       |      ELSE array_to_string(list_reverse(string_split(text, ' ')), ' ')
       |    END AS txt
       |  FROM documents),
       |${sigChain("b", "SELECT doc_id AS id, text AS txt FROM documents")},
       |${sigChain("f", "SELECT id, txt FROM fresh")},
       |bband AS (
       |  ${bandUnion("b")}),
       |fband AS (
       |  ${bandUnion("f")}),
       |cands AS (SELECT DISTINCT f.doc AS fid, b.doc AS bid
       |          FROM fband f JOIN bband b USING (band, bucket)),
       |est AS (SELECT c.fid, c.bid, ($matches)::DOUBLE / 32.0 AS est
       |        FROM cands c JOIN fsig fs ON c.fid = fs.doc JOIN bsig bs ON c.bid = bs.doc),
       |best AS (SELECT fid, bid, est,
       |           row_number() OVER (PARTITION BY fid ORDER BY est DESC, bid) AS rn
       |         FROM est WHERE est >= 0.5)
       |SELECT fresh.id,
       |  CASE WHEN b1.bid IS NOT NULL THEN 'near_dup_of_base' ELSE 'kept' END AS status,
       |  b1.bid AS matched_base_id, b1.est AS est_jaccard
       |FROM fresh LEFT JOIN (SELECT fid, bid, est FROM best WHERE rn = 1) b1
       |  ON fresh.id = b1.fid""".stripMargin
  }

  /** q155's extra decls live here so the shared logistic fixture CTEs
    * stay single-sourced. */
  private[queries] def epochPlanDecl: Q.Decl =
    decl("q155_epoch_plan",
      (s, d) => {
        val doc = col("doc_id")
        val docs = t(s, d, "documents").select(doc,
          concat(col("text"),
            when(doc % 2 === 0, lit(" crisp lucid prose"))
              .otherwise(lit(" spammy vapid filler"))).as("pt"))
        val w = TextAnalysis.logisticWeights(docs, doc, col("pt"),
          doc % 2 === 0, doc % 4 < 2, buckets = 64, rounds = 2, lr = 100.0)
        val scored = TextAnalysis.logisticScores(docs, doc, col("pt"), w, buckets = 64)
        val toks = docs
          .select(doc, TextAnalysis.tokenCount(col("pt")).as("n_tokens"))
          .join(scored.select(col("doc_id"), col("score")), "doc_id")
          .select(col("doc_id"), col("n_tokens"),
            when(col("score") >= 0.08, 0)
              .when(col("score") >= -0.08, 1)
              .otherwise(2).cast("int").as("tier"))
        Sampling.epochPlan(toks, budget = 35000L, maxEpochs = 4, salt = "ep")
      },
      logisticFixtureCtes + s""",
        |sc AS (SELECT doc_id, CAST(CAST(CAST(SUM(CAST(w * cnt AS DECIMAL(30,12))) AS DOUBLE) AS DECIMAL(12,4)) AS DOUBLE) AS score
        |       FROM x JOIN w2 USING (b) GROUP BY doc_id),
        |st AS (SELECT d0.doc_id,
        |  (length(d0.text) - length(replace(d0.text, ' ', '')) + 1)::BIGINT AS n_tokens,
        |  CASE WHEN score >= 0.08 THEN 0 WHEN score >= -0.08 THEN 1 ELSE 2 END AS tier
        |  FROM d0 JOIN sc USING (doc_id)),
        |ms AS (SELECT tier, SUM(n_tokens)::BIGINT AS m FROM st GROUP BY 1),
        |pl AS (SELECT tier, m,
        |  coalesce(SUM(m * 4) OVER (ORDER BY tier
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS prefix_full
        |  FROM ms),
        |pl2 AS (SELECT tier, m,
        |  least(m * 4, greatest(35000 - prefix_full, 0))::BIGINT AS used FROM pl),
        |pl3 AS (SELECT tier, (used // m)::BIGINT AS epochs,
        |  (used - (used // m) * m)::BIGINT AS partial_tokens FROM pl2),
        |hd AS (SELECT doc_id, tier, n_tokens,
        |  ${sqlHash60("('ep|' || doc_id::VARCHAR)")} AS h FROM st),
        |cum AS (SELECT doc_id, tier, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY tier ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS run
        |  FROM hd)
        |SELECT c.doc_id, c.tier, c.n_tokens, p.epochs,
        |  (p.partial_tokens > 0 AND c.run <= p.partial_tokens) AS in_partial,
        |  (p.epochs * c.n_tokens
        |    + CASE WHEN p.partial_tokens > 0 AND c.run <= p.partial_tokens
        |        THEN c.n_tokens ELSE 0 END)::BIGINT AS planned_tokens
        |FROM cum c JOIN pl3 p USING (tier)""".stripMargin)

  /** DuckDB CTE prefix shared by the q150/q153 oracles: the
    * planted-marker logistic fixture — d0 (marker-overlaid text,
    * parity labels, doc_id%4<2 train split), length-normalized hashed
    * features `x` (64 buckets), train slice `xt`, and TWO unrolled GD
    * rounds (lr = 100) ending in the weight table `w2`. Round 1 starts
    * from w = 0 (z = 0, p = 0.5 exactly); every margin/weight
    * round-trips DECIMAL(12,4). Callers append scoring CTEs or the
    * final SELECT. */
  /** q165: the q150 classifier evaluated IN-ENGINE — exact AUC via the
    * Mann-Whitney statistic in integer arithmetic (u2 = 2U keeps score
    * ties integral), confusion counts and P/R/F1 at threshold 0. The
    * label construction makes the classifier genuinely good but not
    * perfect (hash-bucket collisions mix the planted marker words), so
    * AUC lands strictly inside (0.5, 1) and the tie/interpolation paths
    * are exercised. The oracle replays scoring, the rank statistic on a
    * plain global cumsum (proving the engine's two-phase bucket
    * decomposition), and every metric division. */
  private[queries] def classifierEvalDecl: Q.Decl =
    decl("q165_classifier_eval",
      (s, d) => graft.operators.Eval.binaryEval(classifierScored(s, d),
        col("score"), col("doc_id") % 2 === 0),
      classifierScoredCtes + """,
        |gp AS (SELECT s, SUM(CASE WHEN yy THEN 1 ELSE 0 END)::BIGINT AS pos_at,
        |       SUM(CASE WHEN yy THEN 0 ELSE 1 END)::BIGINT AS neg_at
        |       FROM lb GROUP BY 1),
        |cw AS (SELECT s, pos_at, neg_at,
        |       CAST(SUM(neg_at) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
        |         AS BIGINT) AS negcum FROM gp),
        |ag AS (SELECT SUM(pos_at)::BIGINT AS n_pos, SUM(neg_at)::BIGINT AS n_neg,
        |       SUM(pos_at * (2 * (negcum - neg_at) + neg_at))::BIGINT AS u2,
        |       SUM(CASE WHEN s > 0 THEN pos_at ELSE 0 END)::BIGINT AS tp,
        |       SUM(CASE WHEN s > 0 THEN neg_at ELSE 0 END)::BIGINT AS fp,
        |       SUM(CASE WHEN s <= 0 THEN pos_at ELSE 0 END)::BIGINT AS fn,
        |       SUM(CASE WHEN s <= 0 THEN neg_at ELSE 0 END)::BIGINT AS tn
        |       FROM cw)
        |SELECT n_pos, n_neg, u2, tp, fp, fn, tn,
        |  CAST(CAST(u2::DOUBLE / (2.0 * n_pos * n_neg) AS DECIMAL(10,6)) AS DOUBLE) AS auc,
        |  CAST(CAST(tp::DOUBLE / (tp + fp) AS DECIMAL(10,6)) AS DOUBLE) AS prec,
        |  CAST(CAST(tp::DOUBLE / (tp + fn) AS DECIMAL(10,6)) AS DOUBLE) AS rec,
        |  CAST(CAST((2.0 * tp) / (2.0 * tp + fp + fn) AS DECIMAL(10,6)) AS DOUBLE) AS f1
        |FROM ag""".stripMargin)

  /** q173: exact edit-distance-1 join via deletion neighborhoods
    * (FastSS) over customer names — numbered names make a dense but
    * bounded distance-1 structure (names differing in exactly one
    * digit), and the all-pairs BRUTE-FORCE oracle proves the
    * deletion-neighborhood pruning is complete: where the phonetic and
    * bigram blockers' recall is measured (q142), this one's is a
    * theorem, and the hash match demonstrates it. */
  private[queries] def editDistDecl: Q.Decl =
    decl("q173_editdist_join",
      (s, d) => graft.operators.Blocking.editDistanceJoin(
        t(s, d, "customer"), col("c_custkey").cast("long"), col("c_name")),
      """WITH c AS (SELECT c_custkey::BIGINT AS nid, c_name AS nm FROM customer)
        |SELECT a.nid AS a, b.nid AS b, levenshtein(a.nm, b.nm)::BIGINT AS dist
        |FROM c a JOIN c b ON a.nid < b.nid
        |WHERE levenshtein(a.nm, b.nm) <= 1""".stripMargin)

  /** The q150 classifier fixture scored over the whole corpus — one
    * definition for the training/scoring chain so q165/q170 (and any
    * future metric query) cannot drift from each other. */
  private def classifierScored(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val doc = col("doc_id")
    val docs = t(s, d, "documents").select(doc,
      concat(col("text"),
        when(doc % 2 === 0, lit(" crisp lucid prose"))
          .otherwise(lit(" spammy vapid filler"))).as("pt"))
    val w = TextAnalysis.logisticWeights(docs, doc, col("pt"),
      doc % 2 === 0, doc % 4 < 2, buckets = 64, rounds = 2, lr = 100.0)
    TextAnalysis.logisticScores(docs, doc, col("pt"), w, buckets = 64)
  }

  /** Oracle twin of [[classifierScored]]: fixture + scoring + labels as
    * CTEs `sc` (doc_id, s) and `lb` (doc_id, s, yy). */
  private def classifierScoredCtes: String =
    logisticFixtureCtes + """,
      |sc AS (SELECT x.doc_id AS doc_id,
      |       CAST(CAST(CAST(SUM(CAST(w * cnt AS DECIMAL(30,12))) AS DOUBLE) AS DECIMAL(12,4)) AS DOUBLE) AS s
      |       FROM x JOIN w2 USING (b) GROUP BY 1),
      |lb AS (SELECT sc.doc_id, sc.s, d0.y = 1.0 AS yy
      |       FROM sc JOIN d0 USING (doc_id))""".stripMargin

  /** q174: percentile-gated curation — the FineWeb-style "keep the top
    * (1−q) of each language by quality score" cutoff, composed from the
    * trained classifier (q150) and the deterministic histogram quantile
    * sketch (q164): per-language p25 estimates gate every document.
    * Mergeable-histogram percentiles mean the cutoff is computable in
    * one pass at any corpus scale and is bit-stable under partitioning;
    * the oracle replays scoring, the per-language histogram
    * interpolation, and the gate. */
  private[queries] def percentileGateDecl: Q.Decl =
    decl("q174_percentile_gate",
      (s, d) => {
        val scored = classifierScored(s, d)
          .join(t(s, d, "documents").select(col("doc_id"), col("lang")), "doc_id")
        val p25 = graft.operators.Quantiles.histQuantiles(scored,
            col("lang"), col("score"), buckets = 64, qs = Seq(0.25))
          .select(col("group").as("lang"), col("est").as("p25"))
        scored.join(broadcast(p25), "lang")
          .select(col("doc_id"), col("lang"), col("score"), col("p25"),
            (col("score") >= col("p25")).as("kept"))
      },
      classifierScoredCtes + """,
        |sl AS (SELECT sc.doc_id AS doc_id, d.lang AS lang, sc.s AS v
        |       FROM sc JOIN documents d USING (doc_id)),
        |bounds AS (SELECT lang, MIN(v) AS lo, MAX(v) AS hi FROM sl GROUP BY 1),
        |h AS (SELECT lang, CASE WHEN hi = lo THEN 0
        |      ELSE LEAST(63, floor((v - lo) * 64.0 / (hi - lo))::BIGINT) END AS bkt,
        |      COUNT(*)::BIGINT AS cnt
        |      FROM sl JOIN bounds USING (lang) GROUP BY 1, 2),
        |c AS (SELECT lang, bkt, cnt,
        |      CAST(SUM(cnt) OVER (PARTITION BY lang ORDER BY bkt
        |        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM h),
        |nl AS (SELECT lang, SUM(cnt)::BIGINT AS nn FROM h GROUP BY 1),
        |sel AS (SELECT c.lang, c.bkt, c.cnt, c.cum - c.cnt AS cumb, c.cum,
        |        CAST(ceil(0.25 * nl.nn) AS BIGINT) AS target
        |        FROM c JOIN nl USING (lang)),
        |p25 AS (SELECT sel.lang AS lang,
        |  CAST(CAST(lo + (bkt::DOUBLE + (target - cumb)::DOUBLE / cnt::DOUBLE)
        |    * (hi - lo) / 64.0 AS DECIMAL(18,4)) AS DOUBLE) AS p25
        |  FROM sel JOIN bounds ON sel.lang = bounds.lang
        |  WHERE cum >= target AND cumb < target)
        |SELECT sl.doc_id AS doc_id, sl.lang AS lang, sl.v AS score,
        |  p25.p25 AS p25, sl.v >= p25.p25 AS kept
        |FROM sl JOIN p25 USING (lang)""".stripMargin)

  /** q171: EXACT Jaccard similarity join with the prefix-filter
    * completeness guarantee — the complement of q41's df-capped
    * candidates (which can miss a pair whose every shingle is hot).
    * Tokens are word trigrams in a rarest-first canonical order;
    * candidates share a token within each side's
    * |s|−⌈t·|s|⌉+1 prefix; verification and the 0.6 threshold are pure
    * integer arithmetic (5·inter ≥ 3·union). The oracle is the
    * BRUTE-FORCE all-shared-token join with the same integer test, so a
    * hash match proves the pruning lost nothing. */
  private[queries] def prefixJaccardDecl: Q.Decl =
    decl("q171_prefix_jaccard_join",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("ws"))
          .where(size(col("ws")) >= 3)
          .select(col("doc_id").as("doc"), explode(expr(
            """array_distinct(transform(sequence(1, size(ws) - 2), i ->
              |  concat_ws('_', element_at(ws, CAST(i AS INT)),
              |    element_at(ws, CAST(i + 1 AS INT)),
              |    element_at(ws, CAST(i + 2 AS INT)))))""".stripMargin)).as("tok"))
        Dedup.prefixJaccardJoin(toks, num = 3, den = 5)
      },
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |tk AS (SELECT DISTINCT doc_id AS doc,
        |       unnest(list_transform(generate_series(1, len(ws) - 2),
        |         i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2])) AS tok
        |       FROM w WHERE len(ws) >= 3),
        |sz AS (SELECT doc, COUNT(*)::BIGINT AS sz FROM tk GROUP BY 1),
        |it AS (SELECT a.doc AS a, b.doc AS b, COUNT(*)::BIGINT AS inter
        |       FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc < b.doc GROUP BY 1, 2)
        |SELECT it.a AS a, it.b AS b, inter,
        |  (sa.sz + sb.sz - inter)::BIGINT AS union_sz
        |FROM it JOIN sz sa ON it.a = sa.doc JOIN sz sb ON it.b = sb.doc
        |WHERE inter * 5 >= (sa.sz + sb.sz - inter) * 3""".stripMargin)

  /** q170: ROC operating points for the q150 classifier from a
    * two-class 32-bucket score histogram — the curve a curation team
    * reads to pick the keep threshold. The histogram is a plain groupBy
    * (mergeable, O(buckets) state at any corpus size); thresholds are
    * bucket edges; tp/fp are reverse-cumulative integer counts and
    * every rate is one division of exact integers, all replayed by the
    * oracle. */
  private[queries] def rocCurveDecl: Q.Decl =
    decl("q170_roc_curve",
      (s, d) => graft.operators.Eval.rocPoints(classifierScored(s, d),
        col("score"), col("doc_id") % 2 === 0, buckets = 32),
      classifierScoredCtes + """,
        |bounds AS (SELECT MIN(s) AS lo, MAX(s) AS hi FROM lb),
        |h AS (SELECT CASE WHEN hi = lo THEN 0
        |      ELSE LEAST(31, floor((s - lo) * 32.0 / (hi - lo))::BIGINT) END AS b,
        |      SUM(CASE WHEN yy THEN 1 ELSE 0 END)::BIGINT AS pos_at,
        |      SUM(CASE WHEN yy THEN 0 ELSE 1 END)::BIGINT AS neg_at
        |      FROM lb, bounds GROUP BY 1),
        |tt AS (SELECT SUM(pos_at)::BIGINT AS p, SUM(neg_at)::BIGINT AS n FROM h),
        |cw2 AS (SELECT b,
        |        CAST(SUM(pos_at) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
        |        CAST(SUM(neg_at) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
        |        FROM h)
        |SELECT b AS bucket,
        |  CAST(CAST(lo + b::DOUBLE * (hi - lo) / 32.0 AS DECIMAL(16,9)) AS DOUBLE) AS thr,
        |  tp, fp,
        |  CAST(CAST(tp::DOUBLE / tt.p AS DECIMAL(10,6)) AS DOUBLE) AS tpr,
        |  CAST(CAST(fp::DOUBLE / tt.n AS DECIMAL(10,6)) AS DOUBLE) AS fpr,
        |  CASE WHEN tp + fp = 0 THEN 0.0
        |       ELSE CAST(CAST(tp::DOUBLE / (tp + fp) AS DECIMAL(10,6)) AS DOUBLE) END AS prec
        |FROM cw2, tt, bounds""".stripMargin)

  private def logisticFixtureCtes: String =
    s"""WITH d0 AS (
       |  SELECT doc_id,
       |    text || CASE WHEN doc_id % 2 = 0 THEN ' crisp lucid prose'
       |                 ELSE ' spammy vapid filler' END AS text,
       |    doc_id % 4 < 2 AS tr,
       |    CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.0 END AS y
       |  FROM documents),
       |tok AS (SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS l,
       |        unnest(string_split(text, ' ')) AS wo FROM d0),
       |x AS (SELECT doc_id, ${sqlHash60("wo")} % 64 AS b,
       |        COUNT(*)::DOUBLE / min(l) AS cnt
       |      FROM tok GROUP BY 1, 2),
       |xt AS (SELECT x.* FROM x JOIN d0 USING (doc_id) WHERE tr),
       |n AS (SELECT COUNT(*)::DOUBLE AS n FROM d0 WHERE tr),
       |bk AS (SELECT unnest(generate_series(0, 63)) AS b),
       |g1 AS (SELECT b, CAST(SUM(CAST((y - 0.5) * cnt AS DECIMAL(30,12))) AS DOUBLE) AS g
       |       FROM xt JOIN d0 USING (doc_id) GROUP BY b),
       |w1 AS (SELECT bk.b, CAST(CAST(100.0 * coalesce(g1.g, 0) / n.n AS DECIMAL(12,4)) AS DOUBLE) AS w
       |       FROM bk LEFT JOIN g1 ON bk.b = g1.b CROSS JOIN n),
       |z2 AS (SELECT doc_id, CAST(CAST(CAST(SUM(CAST(w * cnt AS DECIMAL(30,12))) AS DOUBLE) AS DECIMAL(12,4)) AS DOUBLE) AS z
       |       FROM xt JOIN w1 USING (b) GROUP BY doc_id),
       |r2 AS (SELECT d0.doc_id, d0.y - 1.0 / (1.0 + exp(-z2.z)) AS r
       |       FROM d0 JOIN z2 USING (doc_id) WHERE tr),
       |g2 AS (SELECT b, CAST(SUM(CAST(r * cnt AS DECIMAL(30,12))) AS DOUBLE) AS g
       |       FROM xt JOIN r2 USING (doc_id) GROUP BY b),
       |w2 AS (SELECT w1.b, CAST(CAST(w1.w + 100.0 * coalesce(g2.g, 0) / n.n AS DECIMAL(12,4)) AS DOUBLE) AS w
       |       FROM w1 LEFT JOIN g2 ON w1.b = g2.b CROSS JOIN n)""".stripMargin

  /** q156: the q127 contamination check generalized to every pair of
    * sources — the mixing audit for a multi-source corpus. The fixture
    * assigns four sources by doc_id%4 and plants the q127 phrase on
    * doc_id%9 docs (9 ⊥ 4, so the phrase lands in all four sources and
    * every pair shares at least its 8 shingles); the corpus's own
    * planted dup groups also straddle sources. */
  private[queries] def sourceOverlapDecl: Q.Decl = {
    val phrase = "benchmark question answer pair leaks verbatim into " +
      "the training corpus and must be caught"
    decl("q156_source_overlap",
      (s, d) => {
        val doc = col("doc_id")
        val docs = t(s, d, "documents").select(doc,
          concat(col("text"),
            when(doc % 9 === 0, lit(" " + phrase)).otherwise(lit(""))).as("pt"),
          concat(lit("s"), (doc % 4).cast("string")).as("src"))
        Contamination.sourceOverlapMatrix(docs, col("pt"), col("src"))
      },
      s"""WITH d0 AS (
         |  SELECT doc_id,
         |    text || CASE WHEN doc_id % 9 = 0 THEN ' $phrase' ELSE '' END AS pt,
         |    's' || (doc_id % 4)::VARCHAR AS src
         |  FROM documents),
         |w AS (SELECT src, string_split(pt, ' ') AS w FROM d0),
         |sh AS (SELECT DISTINCT src, unnest(list_transform(generate_series(1, len(w) - 7),
         |       i -> array_to_string(w[i:i+7], ' '))) AS shingle FROM w WHERE len(w) >= 8),
         |tot AS (SELECT src, COUNT(*)::BIGINT AS total FROM sh GROUP BY 1),
         |shr AS (SELECT a.src AS src_a, b.src AS src_b, COUNT(*)::BIGINT AS shared
         |        FROM sh a JOIN sh b USING (shingle) WHERE a.src < b.src GROUP BY 1, 2),
         |ap AS (SELECT ta.src AS src_a, ta.total AS total_a, tb.src AS src_b, tb.total AS total_b
         |       FROM tot ta, tot tb WHERE ta.src < tb.src)
         |SELECT ap.src_a AS source_a, ap.src_b AS source_b,
         |  coalesce(shr.shared, 0)::BIGINT AS shared, ap.total_a, ap.total_b,
         |  coalesce(CAST(CAST(shr.shared::DOUBLE / least(ap.total_a, ap.total_b)
         |    AS DECIMAL(9,6)) AS DOUBLE), 0.0) AS containment
         |FROM ap LEFT JOIN shr ON ap.src_a = shr.src_a AND ap.src_b = shr.src_b""".stripMargin)
  }

  /** DuckDB CTE prefix: train `rounds` BPE merges on the even-doc_id
    * split (t0..tN mirror the trainer's corpus; winI the rank-I rule)
    * and apply each rule in rank order to the WHOLE corpus
    * (e0..eN). Ends after the eN CTE — callers append the final
    * SELECT. Same list_reduce greedy-merge lambda as the q137 oracle. */
  private def bpeSplitTrainSql(rounds: Int): String = {
    def mergeReduce(win: String, from: String): String =
      s"""SELECT doc_id, list_reduce(list_transform(syms, s -> [s]),
         |  (acc, nxt) -> CASE WHEN len(acc) > 0 AND acc[-1] = $win.a AND nxt[1] = $win.b
         |    THEN acc[1:len(acc)-1] || [$win.m] ELSE acc || nxt END) AS syms
         |  FROM $from, $win""".stripMargin
    val ctes = (1 to rounds).map { i =>
      s"""p$i AS (SELECT syms[j] AS a, syms[j+1] AS b FROM
         |  (SELECT syms, unnest(generate_series(1, len(syms) - 1)) AS j FROM t${i - 1})),
         |c$i AS (SELECT a, b, COUNT(*)::BIGINT AS cnt FROM p$i GROUP BY 1, 2),
         |win$i AS (SELECT a, b, cnt, a || '_' || b AS m FROM c$i ORDER BY cnt DESC, a, b LIMIT 1),
         |t$i AS (SELECT doc_id, syms FROM (${mergeReduce(s"win$i", s"t${i - 1}")})),
         |e$i AS (SELECT doc_id, syms FROM (${mergeReduce(s"win$i", s"e${i - 1}")}))""".stripMargin
    }
    "WITH d AS (SELECT doc_id, string_split(text, ' ') AS syms FROM documents),\n" +
      "t0 AS (SELECT doc_id, syms FROM d WHERE doc_id % 2 = 0),\n" +
      "e0 AS (SELECT doc_id, syms FROM d),\n" +
      ctes.mkString(",\n")
  }

  // q321 (round-15): PERCEPTUAL-HASH IMAGE NEAR-DUP — the multimodal
  // dedup arm: dHash gradient bits over each image's 9×8 luminance
  // grid (here the deterministic decode-seam stand-in: a grid derived
  // by integer hash arithmetic — the q50 FakeCodec discipline — with
  // planted near-identical pairs: even/odd part keys share a grid,
  // the odd one perturbed in ONE cell, moving ≤ 2 of the 64 bits),
  // then the Hamming-ball candidate join: exact equi-join per 16-bit
  // band (pigeonhole guarantees recall at distance ≤ 3 — no
  // probabilistic miss), exact Σ bit_count(xor) verify. All integer
  // arithmetic; the oracle replays grid, comparisons, band packing,
  // banding join, and popcount distance from first principles. Every
  // planted pair must surface; unrelated grids (~32 bits apart) must
  // not survive the verify.
  /** The planted-near-dup luminance-grid fixture shared by q321/q324:
    * even/odd part keys share a hash-derived 9×8 grid, the odd one
    * perturbed in one cell (≤ 2 dHash bits). */
  private def phashGrid(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import graft.operators.Dedup
    t(s, d, "part")
      .select(col("p_partkey").cast("long").as("id"),
        expr("CAST(p_partkey AS BIGINT) div 2").as("bse"))
      .select(col("id"),
        transform(sequence(lit(0), lit(71)), i =>
          pmod(Dedup.hash60(concat(lit("px|"),
            col("bse").cast("string"), lit("|"), i.cast("string"))),
            lit(256L))
            + when(pmod(col("id"), lit(2L)) === 1L
                && i.cast("long") === pmod(col("bse"), lit(72L)),
              lit(96L)).otherwise(lit(0L))).as("px"))
  }

  private def phashDecl: Decl =
    decl("q321_phash_neardup",
      (s, d) => {
        import graft.operators.Multimodal
        Multimodal.phashNearDup(phashBands(s, d), maxHamming = 3)
      },
      phashOracle)

  /** Shared banded-hash frame for the phash family — query-scoped
    * cached (round-17, guide §2.4): the band frame is referenced up to
    * 6× per near-dup arm (4 band projections + 2 verify sides) and the
    * grid synthesis behind it costs 72 hash60 calls per row per
    * evaluation; the cache computes it once per query, released by the
    * harness boundary sweep. */
  private def phashBands(s: SparkSession, d: String): DataFrame =
    graft.operators.QueryScoped.cached(
      graft.operators.Multimodal.dHashBands(phashGrid(s, d),
        col("id"), col("px")))

  // q324 (round-15): the SCALE path of q321 — multi-index Hamming
  // search (two 32-bit bands, exact key + 32 one-bit probes per band):
  // the 16-bit banding's candidate volume grows as n²/2¹⁶ from
  // birthday collisions alone (measured superlinear on the decade),
  // while the probe-side pigeonhole keeps the same guaranteed recall
  // at Hamming ≤ 3 with bucket occupancy n/2³² — candidates track TRUE
  // near-dups, not n². Gated against the SAME oracle as q321: both
  // variants must return the identical pair set, so the re-banding and
  // the probe enumeration are cross-checked, not just plausible.
  private def phashWideDecl: Decl =
    decl("q324_phash_neardup_mih",
      (s, d) => {
        import graft.operators.Multimodal
        Multimodal.phashNearDupWide(phashBands(s, d), maxHamming = 3)
      },
      phashOracle)

  // q331 (round-16): the phash family's SIZE-GATED ROUTER — closing
  // the round-15 "scale story is prose, not code" finding: q321's
  // banding and q324's MIH are cross-gated to identical pairs, and
  // phashNearDupAuto now picks between them by corpus count (the
  // q181 ANN-router pattern applied to the image arm). TWO arms run
  // through the SAME auto entry with different thresholds so both
  // branches are exercised in one gate at every scale — the default
  // 100k threshold (narrow at verify scale; flips to MIH across the
  // decade fixtures as the part table passes it) and a forced-low 64
  // threshold (MIH at any fixture ≥ 65 parts). The oracle computes
  // the pair set once (both arms return it identically) and replays
  // both routing decisions from the corpus count.
  private def phashAutoDecl: Decl =
    decl("q331_phash_neardup_auto",
      (s, d) => {
        import graft.operators.Multimodal
        val bands = phashBands(s, d)
        def arm(tag: String, thr: Long) =
          Multimodal.phashNearDupAuto(bands, maxHamming = 3, narrowMaxN = thr)
            .select(lit(tag).as("arm"), col("route"), col("n_corpus"),
              col("id_a"), col("id_b"), col("hamming"))
        arm("default", 100000L).unionByName(arm("low_threshold", 64L))
      },
      s"""WITH arms(arm, thr) AS (VALUES ('default', 100000),
         |  ('low_threshold', 64)),
         |pairs AS ($phashOracle),
         |nc AS (SELECT COUNT(*)::BIGINT AS n_corpus FROM part)
         |SELECT arms.arm,
         |  CASE WHEN nc.n_corpus <= arms.thr THEN 'narrow' ELSE 'mih' END
         |    AS route,
         |  nc.n_corpus, p.id_a, p.id_b, p.hamming
         |FROM arms, nc, pairs p""".stripMargin)

  // lazy: referenced by decls during object init, declared below it
  private lazy val phashOracle: String =
      s"""WITH ids AS (SELECT p_partkey::BIGINT AS id FROM part),
         |px AS (SELECT id, gx,
         |  (${sqlHash60("('px|' || (id // 2)::VARCHAR || '|' || gx::VARCHAR)")} % 256
         |   + CASE WHEN id % 2 = 1 AND gx = (id // 2) % 72
         |          THEN 96 ELSE 0 END) AS p
         |  FROM ids, (SELECT unnest(generate_series(0, 71)) AS gx)),
         |bits AS (SELECT cur.id, b.b,
         |  CASE WHEN nxt.p > cur.p THEN 1::BIGINT ELSE 0::BIGINT END AS bit
         |  FROM (SELECT unnest(generate_series(0, 63)) AS b) b
         |  JOIN px cur ON cur.gx = (b.b // 8) * 9 + (b.b % 8)
         |  JOIN px nxt ON nxt.id = cur.id
         |              AND nxt.gx = (b.b // 8) * 9 + (b.b % 8) + 1),
         |bands AS (SELECT id, (b // 16)::BIGINT AS band_idx,
         |  SUM(bit << (b % 16))::BIGINT AS band_val FROM bits GROUP BY 1, 2),
         |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx
         |   AND a.band_val = b.band_val AND a.id < b.id),
         |wide AS (SELECT id,
         |  MAX(CASE WHEN band_idx = 0 THEN band_val END) AS b0,
         |  MAX(CASE WHEN band_idx = 1 THEN band_val END) AS b1,
         |  MAX(CASE WHEN band_idx = 2 THEN band_val END) AS b2,
         |  MAX(CASE WHEN band_idx = 3 THEN band_val END) AS b3
         |  FROM bands GROUP BY 1),
         |scored AS (SELECT c.id_a, c.id_b,
         |  (bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
         |   + bit_count(xor(wa.b2, wb.b2))
         |   + bit_count(xor(wa.b3, wb.b3)))::BIGINT AS hamming
         |  FROM cand c JOIN wide wa ON wa.id = c.id_a
         |  JOIN wide wb ON wb.id = c.id_b)
         |SELECT id_a, id_b, hamming FROM scored WHERE hamming <= 3""".stripMargin
}
