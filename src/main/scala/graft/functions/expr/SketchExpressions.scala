package graft.functions.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native typed
  * aggregate. The sketch keeps the k smallest DISTINCT 60-bit hash
  * values seen; because "k smallest of a set" is order-insensitive and
  * loss-free under union, the sketch is exactly mergeable — partial
  * aggregation (map-side combine) produces bit-identical results to a
  * single pass, which is what makes it a sketch for 100 TB: per-group
  * state is O(k) regardless of group size, and a shuffle carries k
  * longs instead of the value set.
  *
  * Unlike HLL (Spark's `approx_count_distinct`), every step here is
  * deterministic integer arithmetic on an explicit hash column, so any
  * SQL engine can replay it exactly (rank the distinct hashes, take the
  * k-th): the estimator itself is oracle-checkable. Estimate:
  * `n < k` → exact n; otherwise `(k-1) * 2^60 / h_k` with integer
  * division (the classic KMV estimator on the [0, 2^60) hash space —
  * Bar-Yossef et al. 2002; same family the reference relies on via its
  * DB's distinct-count statistics, `zavod/zavod/stateful/model.py`
  * aggregate views).
  *
  * Input: a LongType column of non-negative 60-bit hashes (compute with
  * `Dedup.hash60` so the oracle's md5 replay matches). Nulls ignored.
  * Output struct: (est_distinct: long, kth_hash: long — max of the kept
  * set, n_kept: int).
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2 && k <= (1 << 20), s"k out of range: $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("est_distinct", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = true),
    StructField("n_kept", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch needs a LongType hash input, got ${child.dataType}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size
    if (n == 0) InternalRow(0L, null, 0)
    else {
      val kth = buf.last().longValue()
      // clamp instead of BigInt.toLong truncation: an out-of-contract
      // input (hashes below the 60-bit domain, kth < ~8) would wrap to
      // a negative estimate; saturating keeps the failure visible and
      // deterministic
      val est =
        if (n < k) n.toLong
        else if (kth <= 0L) Long.MaxValue
        else ((BigInt(k - 1) << 60) / kth).min(BigInt(Long.MaxValue)).toLong
      InternalRow(est, kth, n)
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
  override def prettyName: String = "graft_kmv_sketch"
}
