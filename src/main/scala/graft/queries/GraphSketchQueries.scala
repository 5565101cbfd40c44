package graft.queries

import graft.functions.Sketches
import graft.operators.{Centrality, Dedup}
import org.apache.spark.sql.functions._
import Q._
import PipelineQueries.sqlHash60

/** Sketch aggregation and graph centrality at query level: the KMV
  * distinct sketch (bounded-state, exactly mergeable — unlike HLL its
  * estimator is deterministic integer arithmetic, so the ORACLE can
  * replay the estimate itself), and fixed-round integer PageRank over
  * the customer↔supplier trade graph (the host-trust / entity-reach
  * centrality signal, engine-portable because every round is floor
  * division and integer sums).
  */
object GraphSketchQueries {

  private val Scale = 1000000000000L

  /** Unrolled PageRank round CTEs r1..rN over base CTEs e/nn/n/r0. */
  private def prRounds(rounds: Int): String =
    (1 to rounds).map { r =>
      s"""c$r AS (SELECT e.dst AS node,
         |  SUM(((85 * p.rank) // 100) // p.outdeg)::BIGINT AS inmass
         |  FROM r${r - 1} p JOIN e ON p.node = e.src
         |  WHERE p.outdeg > 0 GROUP BY 1),
         |r$r AS (SELECT nn.node AS node, nn.outdeg AS outdeg,
         |  (${15 * Scale / 100} // n.n) + COALESCE(c$r.inmass, 0) AS rank
         |  FROM nn LEFT JOIN c$r USING (node), n)""".stripMargin
    }.mkString(",\n")

  val decls: Seq[Decl] = Seq(

    // KMV distinct-users-per-event-type: the sketch keeps the 64
    // smallest distinct user hashes per group — O(k) state however
    // large the group, exactly mergeable across partitions (map-side
    // combine is bit-identical to one pass). The oracle ranks the
    // distinct hashes per group in SQL and recomputes the (k-1)*2^60/h_k
    // integer estimator, so the sketch CONTENT and the estimate are
    // both hash-checked against exact replay.
    decl("q160_kmv_distinct",
      (s, d) => {
        val ev = t(s, d, "events").select(col("event_type"), col("user_id"))
          .withColumn("h",
            Dedup.hash60(concat(lit("kmv|"), col("user_id").cast("string"))))
        ev.groupBy("event_type")
          .agg(Sketches.kmvDistinct(col("h"), 64).as("s"),
            countDistinct(col("h")).as("exact_distinct"),
            count(lit(1)).as("n_rows"))
          .select(col("event_type"), col("n_rows"), col("exact_distinct"),
            col("s.est_distinct").as("est_distinct"),
            col("s.kth_hash").as("kth_hash"),
            col("s.n_kept").as("n_kept"))
      },
      s"""WITH h AS (SELECT DISTINCT event_type,
         |  ${sqlHash60("('kmv|' || user_id::VARCHAR)")} AS h FROM events),
         |r AS (SELECT event_type, h,
         |      row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk FROM h),
         |kk AS (SELECT event_type,
         |       MAX(CASE WHEN rk <= 64 THEN h END) AS kth_hash,
         |       LEAST(COUNT(*), 64)::INT AS n_kept,
         |       COUNT(*)::BIGINT AS exact_distinct FROM r GROUP BY 1),
         |base AS (SELECT event_type, COUNT(*)::BIGINT AS n_rows FROM events GROUP BY 1)
         |SELECT kk.event_type AS event_type, base.n_rows AS n_rows,
         |  kk.exact_distinct AS exact_distinct,
         |  CASE WHEN kk.n_kept < 64 THEN kk.n_kept::BIGINT
         |       ELSE CAST((63::HUGEINT * ${1L << 60}::HUGEINT) // kk.kth_hash AS BIGINT)
         |  END AS est_distinct,
         |  kk.kth_hash AS kth_hash, kk.n_kept AS n_kept
         |FROM kk JOIN base USING (event_type)""".stripMargin),

    // Integer PageRank, 3 rounds, over the bidirected customer↔supplier
    // trade graph (suppliers offset by 10^6). Bidirection makes every
    // node's outdegree >= 1, so the engine's dangling-mass term is
    // provably zero and the oracle's unrolled rounds omit it. All
    // arithmetic is floor division on scale^-1 units — summation order
    // cannot move a single bit in either engine.
    decl("q161_pagerank_trade",
      (s, d) => {
        val eo = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").cast("long").as("c"),
            (lit(1000000L) + col("l_suppkey")).as("sup"))
          .distinct()
        val edges = eo.select(col("c").as("src"), col("sup").as("dst"))
          .union(eo.select(col("sup").as("src"), col("c").as("dst")))
        Centrality.pageRank(edges, rounds = 3, scale = Scale)
      },
      s"""WITH eo AS (SELECT DISTINCT o_custkey::BIGINT AS c,
         |  (1000000 + l_suppkey)::BIGINT AS sup
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS (SELECT c AS src, sup AS dst FROM eo
         |      UNION ALL SELECT sup, c FROM eo),
         |od AS (SELECT src, COUNT(*)::BIGINT AS outdeg FROM e GROUP BY 1),
         |nodes AS (SELECT DISTINCT src AS node FROM e
         |          UNION SELECT DISTINCT dst FROM e),
         |nn AS (SELECT node, COALESCE(od.outdeg, 0)::BIGINT AS outdeg
         |       FROM nodes LEFT JOIN od ON node = od.src),
         |n AS (SELECT COUNT(*)::BIGINT AS n FROM nn),
         |r0 AS (SELECT node, outdeg, $Scale // n.n AS rank FROM nn, n),
         |${prRounds(3)}
         |SELECT node, outdeg, CAST(rank AS BIGINT) AS rank FROM r3""".stripMargin))
}
