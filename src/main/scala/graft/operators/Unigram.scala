package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) Viterbi segmentation — the OTHER
  * tokenizer family next to BPE (q137/q140): instead of applying merge
  * rules greedily, pick the GLOBALLY cheapest split of each unit under
  * a unigram piece prior. Everything is integer arithmetic so the DP is
  * bit-identical on any engine:
  *
  *  - piece cost = (64 − bitlength(freq)) · 10⁶ — an integer −log₂ of
  *    the piece's corpus frequency (`length(bin(freq))` is portable
  *    SQL); unknown single characters get a flat penalty;
  *  - DP state packs (total_cost, n_pieces) as `cost·1024 + pieces`,
  *    so states ADD when extending a path and `min` breaks cost ties
  *    toward fewer pieces — one long per position, no structs;
  *  - the Viterbi recurrence runs as ONE codegen-able `aggregate` HOF
  *    over positions per DISTINCT unit (segment each type once, join
  *    counts back — types ≪ tokens at any corpus scale), with the
  *    vocab broadcast as a single map row (the q140 BPE-encode
  *    pattern). No UDF, no shuffle inside the DP.
  *
  * The oracle replays vocabulary building and the full DP as unrolled
  * per-position CTEs (DuckDB lambdas cannot capture outer lambda
  * variables, so the engine's nested-lambda fold becomes a CTE chain
  * there — same arithmetic, independently expressed).
  */
object Unigram {

  private val Inf = 4611686018427387904L // 2^62: unreachable-state cost
  private val BigPieceCost = 4611686018427387L // non-unit OOV: effectively bans

  /** Train the piece vocabulary: all substrings of length 1..maxPieceLen
    * of the distinct units, frequency-weighted by unit corpus counts;
    * keep pieces with freq >= minFreq. Returns (p, cost). */
  def trainVocab(units: DataFrame, unit: Column, maxPieceLen: Int = 6,
      minFreq: Long = 20L): DataFrame = {
    val cw = units.select(unit.as("c")).where(length(col("c")) > 0)
      .groupBy("c").agg(count(lit(1)).as("cnt"))
    cw.select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(c)), i ->
           |  transform(sequence(1, $maxPieceLen), l ->
           |    CASE WHEN i + l - 1 <= length(c)
           |         THEN substring(c, i, l) END)))""".stripMargin)).as("p"))
      .where(col("p").isNotNull)
      .groupBy("p").agg(sum("cnt").as("freq"))
      .where(col("freq") >= minFreq)
      .select(col("p"),
        ((lit(64) - length(bin(col("freq")))) * lit(1000000L)).as("cost"))
  }

  /** Per-document segmentation report under a trained vocab:
    * (doc_id, n_units, n_pieces, total_cost). `units` carries one row
    * per unit OCCURRENCE; the DP runs once per distinct unit. Units
    * longer than maxUnitLen fall back to all-unknown-chars (defined,
    * engine-local — keep fixtures within the bound for oracle use).
    *
    * The piece-cost lookup is RELATIONAL, not a map probe: every
    * (unit, start, len) candidate piece joins the vocab as an ordinary
    * hash join — the shape that scales with vocab size — and the DP
    * then reads an O(1)-indexed per-unit cost array. (A broadcast-map
    * `element_at` probe is a LINEAR scan of the map per lookup in
    * Spark; with a corpus-grown vocab that turned the DP superlinear —
    * measured at the 5× stress point: exponent 1.64 / 134.7 s before
    * this shape, 0.21 / 7.4 s after.) */
  def segmentReport(units: DataFrame, docId: Column, unit: Column,
      vocab: DataFrame, maxPieceLen: Int = 6, maxUnitLen: Int = 16,
      unkCost: Long = 60000000L): DataFrame = {
    // the DP path's packed state stores piece counts in 10 bits; the
    // over-length fallback bypasses packing entirely (below), so only
    // the DP-covered range needs the bound
    require(maxUnitLen >= 1 && maxUnitLen <= 1000, s"maxUnitLen: $maxUnitLen")
    val occ = units.select(docId.as("doc_id"), unit.as("c"))
    val cw = occ.groupBy("c").agg(count(lit(1)).as("n_occ"))
    // every candidate (start i, len l) of every distinct unit, with a
    // flat slot index idx = (i-1)*L + (l-1); pieces past the unit end
    // stay null (their slots are never read by the DP); empty units
    // produce no slots (sequence(1, 0) would DESCEND in Spark) and are
    // reported as 0 pieces / 0 cost
    val slots = cw.select(col("c"), explode(expr(
        s"""CASE WHEN length(c) = 0 THEN array()
           |ELSE flatten(transform(sequence(1, least(length(c), $maxUnitLen)), i ->
           |  transform(sequence(1, $maxPieceLen), l ->
           |    struct((CAST(i AS INT) - 1) * $maxPieceLen + CAST(l AS INT) - 1 AS idx,
           |      CASE WHEN i + l - 1 <= length(c)
           |           THEN substring(c, CAST(i AS INT), CAST(l AS INT)) END AS p))))
           |END""".stripMargin)).as("e"))
      .select(col("c"), col("e.idx").as("idx"), col("e.p").as("p"))
    val looked = slots.join(broadcast(vocab), slots("p") === vocab("p"), "left")
      .select(col("c"), col("idx"),
        coalesce(col("cost"),
          when(col("idx") % maxPieceLen === 0, lit(unkCost))
            .otherwise(lit(BigPieceCost))).as("pcost"))
    val costArr = looked.groupBy("c").agg(
      expr("transform(array_sort(collect_list(struct(idx, pcost))), x -> x.pcost)")
        .as("costs"))
    val viterbi =
      s"""CASE WHEN length(c) = 0 OR length(c) > $maxUnitLen THEN 0L
         |  ELSE element_at(
         |    aggregate(
         |      sequence(1, length(c)),
         |      concat(array(0L),
         |        transform(sequence(1, length(c)), z -> ${Inf}L)),
         |      (acc, i) -> transform(sequence(0, length(c)), p ->
         |        CASE WHEN p != i THEN element_at(acc, p + 1)
         |        ELSE array_min(transform(
         |          sequence(greatest(0, i - $maxPieceLen), i - 1), j ->
         |            element_at(acc, j + 1) +
         |            (element_at(costs, CAST(j * $maxPieceLen + i - j AS INT))
         |              * 1024L + 1L)))
         |        END)),
         |    length(c) + 1)
         |END""".stripMargin
    // over-length units fall back to one unk piece per character,
    // computed OUTSIDE the packed state (the 10-bit piece field would
    // silently wrap past 1023 characters); empty units report zeros
    cw.join(costArr, Seq("c"), "left")
      .withColumn("state", expr(viterbi))
      .withColumn("u_pieces", expr(
        s"""CASE WHEN length(c) = 0 THEN 0L
           |WHEN length(c) > $maxUnitLen THEN CAST(length(c) AS BIGINT)
           |ELSE state % 1024 END""".stripMargin))
      .withColumn("u_cost", expr(
        s"""CASE WHEN length(c) = 0 THEN 0L
           |WHEN length(c) > $maxUnitLen THEN CAST(length(c) AS BIGINT) * ${unkCost}L
           |ELSE state div 1024 END""".stripMargin))
      .join(occ, "c")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_units"),
        sum(col("u_pieces")).as("n_pieces"),
        sum(col("u_cost")).as("total_cost"))
  }
}
