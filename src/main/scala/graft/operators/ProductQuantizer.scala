package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the memory half of ANN serving at 100 TB.
  * The coarse quantizer ([[AnnIndex]], IVF cells) bounds how much of
  * the corpus a probe READS; PQ bounds how much memory each member
  * COSTS while it is read: a dim-64 float64 vector is 512 bytes, its
  * PQ code under (m=8 subspaces × 16 codes) is 8 small ints — 4 bits
  * of information each — so a code table holds ~100× more vectors per
  * byte of executor memory than the raw embeddings, and the asymmetric
  * scoring pass moves only (query_id, member_id, partial) scalars.
  *
  * Training, encoding and scoring are all engine-portable by
  * construction, the property every oracle-gated operator here shares:
  *
  *  - codebooks train per-subspace with the SAME hash-seeded
  *    deterministic Lloyd protocol as the coarse quantizer
  *    ([[Similarity.seedCentroids]]' hash60 pick, fixed rounds, no
  *    early stop), keyed by (subspace, code) — one relational trainer
  *    run, not m separate jobs;
  *  - encoding ranks codes by the L2-equivalent score
  *    2·⟨s,c⟩ − ⟨c,c⟩ (argmin ‖s−c‖² with the ⟨s,s⟩ constant dropped)
  *    — dot products are sequential folds in index order, identical on
  *    both engines, ties broken by code id;
  *  - ADC scoring sums per-subspace partials through the DECIMAL
  *    barrier (the [[TextAnalysis]] dsum pattern), so the sum is exact
  *    and order-independent — an unordered float sum would make the
  *    candidate cut nondeterministic across engines, executor counts
  *    and retries.
  *
  * The approximate cosine ranks candidates; the exact re-rank
  * (full-precision vectors, only for the top-r) restores true
  * ordering — the standard ADC + re-rank serving shape (Jégou et al.,
  * PQ for nearest neighbor search; FAISS's IVFPQ default). q195 gates
  * the full train → encode → ADC → re-rank lifecycle against a DuckDB
  * replay on both seeds. */
object ProductQuantizer {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** (id, sub, svec): the m disjoint width-(dim/m) slices of each
    * vector — the relational form every PQ stage runs over. */
  def subvectors(corpus: DataFrame, dim: Int, m: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim $dim not divisible by m $m")
    val w = dim / m
    corpus.toDF("id", "vec")
      .select(col("id"), asDouble(col("vec")).as("vec"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(m - 1)), s =>
          transform(sequence(lit(1), lit(w)), j =>
            element_at(col("vec"), (s * w + j).cast("int"))))))
      .toDF("id", "sub", "svec")
  }

  /** The encode/assignment ranking key: argmin ‖s−c‖² over codes ≡
    * argmax 2·⟨s,c⟩ − ⟨c,c⟩ (the ⟨s,s⟩ term is constant per (id,sub)).
    * Kept as ONE expression so both Lloyd assignment and final encoding
    * rank by bit-identical doubles. */
  private def codeScore(svec: Column, cvec: Column): Column =
    lit(2.0) * Similarity.dot(svec, cvec) - Similarity.dot(cvec, cvec)

  /** Train per-subspace codebooks: (sub, code, cvec) with code in
    * 0..k-1. One hash-ordered seed id set serves every subspace (the
    * j-th seed vector's slice seeds code j of each codebook); then
    * `iterations` Lloyd rounds run keyed by (sub, code) — the m
    * codebooks train in one relational pass. Deterministic: fixed
    * rounds, no early stop, hash60 seed order, (score desc, code asc)
    * assignment tie-break, by-id ordered mean folds. */
  def trainCodebooks(corpus: DataFrame, dim: Int, m: Int, k: Int = 16,
      iterations: Int = 2): DataFrame = {
    require(k >= 1 && iterations >= 0)
    val w = dim / m
    val sv = subvectors(corpus, dim, m)
    val seedIds = corpus.toDF("id", "vec")
      .select(col("id"), Dedup.hash60(col("id").cast("string")).as("h"))
      .orderBy(col("h"), col("id")).limit(k)
      .select((row_number().over(Window.orderBy(col("h"), col("id"))) - 1)
        .cast("long").as("code"), col("id"))
    var cb = sv.join(broadcast(seedIds), "id")
      .select(col("sub"), col("code"), col("svec").as("cvec"))
    var it = 0
    while (it < iterations) {
      val assigned = sv.join(broadcast(cb), "sub")
        .withColumn("score", codeScore(col("svec"), col("cvec")))
        .groupBy(col("id"), col("sub"))
        .agg(min_by(struct(col("svec"), col("code")),
          struct(negate(col("score")), col("code"))).as("best"))
        .select(col("id"), col("sub"), col("best.svec").as("svec"),
          col("best.code").as("code"))
      cb = assigned
        .groupBy(col("sub"), col("code"))
        .agg(sort_array(collect_list(
          struct(col("id").as("i"), col("svec").as("v")))).as("vs"))
        .select(col("sub"), col("code"),
          transform(sequence(lit(1), lit(w)), d =>
            aggregate(col("vs"), lit(0.0),
              (acc, x) => acc + element_at(x.getField("v"), d)) /
              size(col("vs"))).as("cvec"))
        .localCheckpoint() // per-round barrier, same as kmeansCentroids
      it += 1
    }
    cb
  }

  /** (id, sub, code): the per-subspace code assignment — the stage
    * shared by the array encoding ([[encode]]) and the packed IVFPQ
    * encoding ([[packedCodes]]). One broadcast join against the
    * codebooks, reduced by a partial min_by aggregate. */
  def encodeSubCodes(corpus: DataFrame, codebooks: DataFrame, dim: Int,
      m: Int): DataFrame =
    subvectors(corpus, dim, m)
      .join(broadcast(codebooks.toDF("sub", "code", "cvec")), "sub")
      .withColumn("score", codeScore(col("svec"), col("cvec")))
      .groupBy(col("id"), col("sub"))
      .agg(min_by(col("code"), struct(negate(col("score")), col("code")))
        .as("code"))

  /** Encode every vector as its m-code array: (id, codes array<long>),
    * codes ordered by subspace. The 100 TB artifact: this table at
    * (m=8, k=16) carries ~4 information bytes per vector where the
    * embedding carried 512. */
  def encode(corpus: DataFrame, codebooks: DataFrame, dim: Int,
      m: Int): DataFrame =
    encodeSubCodes(corpus, codebooks, dim, m)
      .groupBy(col("id"))
      .agg(transform(sort_array(collect_list(
          struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))

  /** Bits per code for a k-entry codebook: ⌈log₂ k⌉, min 1. */
  def bitsFor(k: Int): Int =
    math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(1, k - 1)))

  /** Encode every vector as ONE BIGINT: subspace s's code occupies
    * bits [bs, bs+b), b = [[bitsFor]](k) — with (m=8, k=16) the whole
    * member code is 32 bits of one long, the literal "~4 bytes per
    * member" the IVFPQ memory story rests on; (m=8, k=128) spends
    * 56 bits for the finer per-subspace resolution the low-cos regime
    * needs (an array<long> of codes would carry m longs plus array
    * overhead per member either way — an order of magnitude looser).
    * Requires m·b ≤ 60 so codes never collide bits and the pack stays
    * positive in a signed long. Decode is pure integer arithmetic
    * ((pq_code >> bs) & (2^b − 1)) that any SQL engine replays
    * bit-for-bit. Returns (id, pq_code). */
  def packedCodes(corpus: DataFrame, codebooks: DataFrame, dim: Int,
      m: Int, k: Int = 16): DataFrame = {
    val b = bitsFor(k)
    require(b * m <= 60, s"packedCodes: $m×$b-bit codes exceed a signed long")
    encodeSubCodes(corpus, codebooks, dim, m)
      .groupBy(col("id"))
      // sum of disjoint-bit terms == bitwise OR of the shifted codes
      .agg(sum(expr(s"code * (cast(1 as bigint) << cast($b * sub as int))"))
        .as("pq_code"))
  }

  /** Per-query ADC lookup tables against a codebook frame:
    * (query_id, sub, code, ip = ⟨q_s, c_s⟩, cn2 = ⟨c_s, c_s⟩) —
    * |queries|·m·k rows, always broadcast-sized. Shared by the
    * full-corpus [[adcTopK]] and the cell-scoped
    * [[AnnIndex.queryPqFrame]]. */
  def queryLut(queries: DataFrame, codebooks: DataFrame, dim: Int,
      m: Int): DataFrame =
    subvectors(queries.toDF("query_id", "qvec")
        .select(col("query_id"), asDouble(col("qvec")).as("qvec")),
        dim, m).toDF("query_id", "sub", "qsub")
      .join(broadcast(codebooks.toDF("sub", "code", "cvec")), "sub")
      .select(col("query_id"), col("sub"), col("code"),
        Similarity.dot(col("qsub"), col("cvec")).as("ip"),
        Similarity.dot(col("cvec"), col("cvec")).as("cn2"))

  /** Re-rank pool size for a corpus of n: a FRACTION rule with a
    * floor, the same calibration shape as [[Similarity.nprobeFor]] —
    * a FIXED pool decays with n exactly like fixed LSH tables did
    * (measured, ProbeAnnRecall pq mode on the low-cos synthetic arm:
    * r=50 gives recall 0.43 → 0.22 → 0.14 across the 1×/5×/25× decade,
    * r=n/40 gives 0.43 → 0.51 → 0.69 at the SAME wall — the ADC scan,
    * not the re-rank, is the cost). n/40 exact scores per query is
    * 2.5% of brute force; low-cos regimes that need more should
    * compose with IVF cells (rank within probed cells) rather than
    * deepen the pool. */
  def rFor(n: Long): Int = math.max(50L, n / 40L).toInt

  /** Approximate-then-exact top-k over a PQ-coded corpus: ADC ranks
    * every coded member per query (approximate cosine =
    * Σ⟨q_s, c_s⟩ / (‖q‖·√Σ‖c_s‖²), both sums exact decimal), the top
    * `r` per query are re-ranked with their full-precision vectors
    * (one id-join back to the corpus — the only touch of raw
    * embeddings), and the exact top-k comes out. Shuffle discipline:
    * the per-query lookup tables (|queries|·m·k rows) broadcast; the
    * scoring exchange carries (query_id, id, partial) scalars; the
    * re-rank exchange carries the usual scored triple. Self-matches
    * (query drawn from the corpus) are excluded, like every ANN
    * entry point here. */
  def adcTopK(queries: DataFrame, codes: DataFrame, codebooks: DataFrame,
      corpus: DataFrame, dim: Int, m: Int, k: Int, r: Int = 50): DataFrame = {
    require(r >= k, s"re-rank pool r=$r must cover k=$k")
    val q = queries.toDF("query_id", "qvec")
      .select(col("query_id"), asDouble(col("qvec")).as("qvec"))
    val lut = queryLut(q, codebooks, dim, m)
    val codeRows = codes.toDF("id", "codes")
      .select(col("id"), posexplode(col("codes")))
      .toDF("id", "sub", "code")
    val scored = codeRows.join(broadcast(lut), Seq("sub", "code"))
      .groupBy(col("query_id"), col("id"))
      // exact decimal sums: order-independent across engines/retries
      .agg(sum(col("ip").cast("decimal(30,12)")).as("ddot"),
        sum(col("cn2").cast("decimal(30,12)")).as("dn2"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id"),
        (col("ddot").cast("double") / sqrt(col("dn2").cast("double")))
          .as("ascore"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("ascore").desc, col("id").asc)
    val cand = scored.withColumn("arank", row_number().over(w))
      .filter(col("arank") <= r)
      .select(col("query_id"), col("id").as("neighbor_id"))
    val full = cand
      .join(corpus.toDF("neighbor_id", "nvec"), "neighbor_id")
      .join(broadcast(q), "query_id")
      .select(col("query_id"), col("qvec"), col("neighbor_id"),
        asDouble(col("nvec")).as("nvec"))
    Similarity.rankCandidates(full, k)
  }
}
