package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unigram Viterbi segmentation: DP optimality, tie-breaking, unknown
  * and over-length fallbacks, and the type-level dedup shape. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def vocabOf(pairs: (String, Long)*) = pairs.toDF("p", "cost")

  private def segment1(unit: String, vocab: Seq[(String, Long)]): (Long, Long) = {
    val units = Seq((1L, unit)).toDF("doc_id", "c")
    val r = Unigram.segmentReport(units, col("doc_id"), col("c"),
      vocabOf(vocab: _*)).head()
    (r.getAs[Long]("n_pieces"), r.getAs[Long]("total_cost"))
  }

  test("viterbi picks the globally cheapest split, not the greedy one") {
    // greedy longest-first would take 'abc' (cost 90) + 'd'(unk);
    // optimal is 'ab' + 'cd' = 20
    val v = Seq(("abc", 90L), ("ab", 10L), ("cd", 10L), ("a", 50L),
      ("b", 50L), ("c", 50L), ("d", 50L))
    assert(segment1("abcd", v) === ((2L, 20L)))
  }

  test("cost ties break toward fewer pieces") {
    // 'abab': 'abab'(20) vs 'ab'+'ab'(10+10) — equal cost, whole wins
    val v = Seq(("abab", 20L), ("ab", 10L))
    assert(segment1("abab", v) === ((1L, 20L)))
  }

  test("unknown characters fall back to the unk penalty") {
    val v = Seq(("ab", 10L))
    // 'abx' = 'ab' + unk('x')
    assert(segment1("abx", v) === ((2L, 10L + 60000000L)))
  }

  test("units beyond maxUnitLen take the defined all-unk path") {
    val long = "x" * 20
    val v = Seq(("xx", 1L))
    assert(segment1(long, v) === ((20L, 20L * 60000000L)))
  }

  test("trained vocab rediscovers word boundaries in glued compounds") {
    // corpus: two words glued in all 4 orders, many times over
    val words = Seq("spark", "query")
    val units = (for {
      a <- words; b <- words; i <- 1 to 30
    } yield (i.toLong, a + b)).toDF("doc_id", "c")
    val vocab = Unigram.trainVocab(units, col("c"), maxPieceLen = 6, minFreq = 20)
    val rep = Unigram.segmentReport(units, col("doc_id"), col("c"), vocab)
      .agg(sum("n_pieces"), sum("n_units")).head()
    // every compound splits into exactly its two constituent words
    assert(rep.getLong(0) === 2L * rep.getLong(1))
  }

  test("the DP runs per distinct unit (type-level dedup before the join)") {
    val units = (1 to 10000).map(i => (i.toLong, s"w${i % 7}")).toDF("doc_id", "c")
    val vocab = vocabOf(("w0", 5L))
    val plan = Unigram.segmentReport(units, col("doc_id"), col("c"), vocab)
      .queryExecution.optimizedPlan.toString
    // the aggregate HOF must sit above the distinct-unit aggregate, not
    // the raw occurrence scan: exactly one occurrence of the fold
    assert(plan.split("aggregate\\(sequence").length == 2, plan.take(1200))
  }
}
