package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  // 40 vectors in dim 16, four planted directions + per-id wiggle
  private def corpus(ids: Range, offset: Long = 0L) = ids.map { i =>
    (i.toLong + offset, Array.tabulate(16)(d =>
      (if (d % 4 == i % 4) 1.0 else 0.05 * ((i + d) % 3)) + 0.001 * (i % 7)))
  }.toDF("id", "vec")

  test("subvectors slice without loss and in order") {
    val c = corpus(0 until 5)
    val sv = ProductQuantizer.subvectors(c, dim = 16, m = 4)
    assert(sv.count() === 20)
    val back = sv.groupBy("id")
      .agg(flatten(transform(sort_array(collect_list(
          struct(col("sub"), col("svec")))),
        x => x.getField("svec"))).as("rebuilt"))
      .join(c, "id")
      .filter(col("rebuilt") =!= col("vec").cast("array<double>"))
    assert(back.count() === 0)
  }

  test("training and encoding are deterministic; identical vectors share codes") {
    val c = corpus(0 until 40)
      .unionByName(corpus(0 until 4, offset = 100L)) // 100+i duplicates i's pattern? no — distinct wiggle
    val cb1 = ProductQuantizer.trainCodebooks(c, dim = 16, m = 4, k = 8)
    val cb2 = ProductQuantizer.trainCodebooks(c, dim = 16, m = 4, k = 8)
    assert(cb1.collect().map(_.toString).sorted.toSeq ===
      cb2.collect().map(_.toString).sorted.toSeq)
    // every (sub) has at most k codes and trains all m subspaces
    val bySub = cb1.groupBy("sub").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bySub.keySet === Set(0, 1, 2, 3))
    assert(bySub.values.forall(_ <= 8))
    val codes = ProductQuantizer.encode(c, cb1, dim = 16, m = 4)
    assert(codes.count() === c.count())
    assert(codes.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(4))
    // truly identical vectors encode identically
    val twin = Seq((500L, Array.tabulate(16)(_.toDouble)),
      (501L, Array.tabulate(16)(_.toDouble))).toDF("id", "vec")
    val tc = ProductQuantizer.encode(twin, cb1, dim = 16, m = 4)
      .select("codes").collect().map(_.getSeq[Long](0))
    assert(tc(0) === tc(1))
  }

  test("bitsFor and wide-codebook packing round-trip (k=32: 5-bit codes)") {
    assert(ProductQuantizer.bitsFor(2) === 1)
    assert(ProductQuantizer.bitsFor(16) === 4)
    assert(ProductQuantizer.bitsFor(17) === 5)
    assert(ProductQuantizer.bitsFor(128) === 7)
    // k=32 on the spec corpus: 5-bit codes, 4 subspaces → 20 bits/long
    val c = corpus(0 until 40)
    val cb = ProductQuantizer.trainCodebooks(c, dim = 16, m = 4, k = 32,
      iterations = 1)
    val arr = ProductQuantizer.encode(c, cb, dim = 16, m = 4)
      .as[(Long, Seq[Long])].collect().toMap
    val packed = ProductQuantizer.packedCodes(c, cb, dim = 16, m = 4, k = 32)
      .as[(Long, Long)].collect().toMap
    arr.foreach { case (id, codes) =>
      codes.zipWithIndex.foreach { case (code, s) =>
        assert(((packed(id) >> (5 * s)) & 31L) === code, s"id=$id sub=$s")
      }
    }
    // and the guard: 16 nibble-coded subspaces would need 64 bits
    intercept[IllegalArgumentException] {
      ProductQuantizer.packedCodes(c, cb, dim = 16, m = 16, k = 128)
    }
  }

  test("ADC with a full re-rank pool equals exact brute-force top-k") {
    val c = corpus(0 until 40)
    val qs = c.filter(col("id") % 10 === 0)
    val cb = ProductQuantizer.trainCodebooks(c, dim = 16, m = 4, k = 8)
    val codes = ProductQuantizer.encode(c, cb, dim = 16, m = 4)
    val viaPq = ProductQuantizer.adcTopK(qs, codes, cb, c,
        dim = 16, m = 4, k = 5, r = 40)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val exact = Similarity.cosineTopK(qs, c, k = 5)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(viaPq === exact)
    assert(viaPq.nonEmpty)
  }

  test("ADC cut keeps a planted near-identical twin at rank 1") {
    val base = corpus(0 until 40)
    val twin = base.filter(col("id") === 7L)
      .select(lit(999L).as("id"),
        transform(col("vec"), x => x + lit(0.0005)).as("vec"))
    val c = base.unionByName(twin)
    val cb = ProductQuantizer.trainCodebooks(c, dim = 16, m = 4, k = 8)
    val codes = ProductQuantizer.encode(c, cb, dim = 16, m = 4)
    val top = ProductQuantizer.adcTopK(
        base.filter(col("id") === 7L), codes, cb, c,
        dim = 16, m = 4, k = 1, r = 5)
      .select("neighbor_id").collect().map(_.getLong(0))
    assert(top.toSeq === Seq(999L))
  }
}
