package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val gs = Seq("g1", "g2")

  test("comparison-vector counts aggregate patterns exactly") {
    val pairs = Seq(
      (true, true), (true, true), (true, false), (false, false))
      .toDF("g1", "g2")
    val vc = Linkage.comparisonVectorCounts(pairs, gs)
      .as[(Boolean, Boolean, Long)].collect().toSet
    assert(vc == Set((true, true, 2L), (true, false, 1L), (false, false, 1L)))
  }

  test("EM recovers planted m/u/lambda within tolerance (K=3, identified)") {
    // Planted generative model: 30% matches with m=(0.9, 0.8, 0.7);
    // non-matches with u=(0.1, 0.2, 0.3). Three binary fields give
    // 2^3−1 = 7 free cells for 7 parameters — the smallest identified
    // FS model (K=2 is UNDERidentified: 5 params, 3 cells — EM then
    // converges to a solution matching the cells but not the plan,
    // which is a property of the model, not a bug).
    val g3s = Seq("g1", "g2", "g3")
    val rnd = Seq(new scala.util.Random(101), new scala.util.Random(202),
      new scala.util.Random(303), new scala.util.Random(404))
    val rows = (0 until 6000).map { _ =>
      val isMatch = rnd(0).nextInt(10) < 3
      def bit(j: Int, pm: Int, pu: Int) =
        rnd(j).nextInt(100) < (if (isMatch) pm else pu)
      (bit(1, 90, 10), bit(2, 80, 20), bit(3, 70, 30))
    }
    val vc = Linkage.comparisonVectorCounts(rows.toDF("g1", "g2", "g3"), g3s)
    val p = Linkage.fellegiSunterEm(vc, g3s, rounds = 20).head()
    val got = Seq("lambda", "m_g1", "m_g2", "m_g3", "u_g1", "u_g2", "u_g3")
      .map(c => c -> p.getAs[Double](c)).toMap
    val want = Map("lambda" -> 0.3, "m_g1" -> 0.9, "m_g2" -> 0.8,
      "m_g3" -> 0.7, "u_g1" -> 0.1, "u_g2" -> 0.2, "u_g3" -> 0.3)
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 0.08, s"$k=${got(k)} want≈$v in $got")
    }
  }

  test("scored patterns: probability rises with agreement; weight sign splits") {
    val rows = (0 until 2000).map { i =>
      val isMatch = i % 4 == 0
      val r = (i * 2654435761L >>> 8) % 100
      val g1 = if (isMatch) r < 90 else r < 10
      val g2 = if (isMatch) r < 85 else r < 15
      (g1, g2)
    }
    val vc = Linkage.comparisonVectorCounts(rows.toDF("g1", "g2"), gs)
    val params = Linkage.fellegiSunterEm(vc, gs, rounds = 8)
    val scored = Linkage.fsScorePatterns(vc, gs, params)
      .select(col("g1"), col("g2"), col("match_probability"), col("match_weight"))
      .as[(Boolean, Boolean, Double, Double)].collect()
      .map { case (a, b, p, w) => (a, b) -> ((p, w)) }.toMap
    val pTT = scored((true, true))._1
    val pFF = scored((false, false))._1
    assert(pTT > 0.9, s"p(TT)=$pTT")
    assert(pFF < 0.1, s"p(FF)=$pFF")
    assert(scored((true, true))._2 > 0)   // positive evidence
    assert(scored((false, false))._2 < 0) // negative evidence
    // determinism: re-training yields identical bytes
    val again = Linkage.fellegiSunterEm(vc, gs, rounds = 8).head()
    assert(again == params.head())
  }
}
