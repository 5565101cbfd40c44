package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the dense-vector inner loops of the
  * similarity operators. The HOF composition they replace
  * (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) allocates a zipped
  * array and runs an interpreted fold per pair — at millions of
  * candidate pairs × 64 dims that interpreted loop IS the query wall.
  * These generate a plain fused Java loop (one pass, zero allocation)
  * and keep the scoring projection inside whole-stage codegen.
  *
  * Null semantics mirror the HOF form exactly so the swap is
  * bit-identical: length mismatch → null (zip_with pads the short side
  * with null and the fold poisons), any null element → null, empty
  * arrays → 0.0 dot (cosine then 0/0 = NaN). The reference scores
  * embedding vectors the same dense-loop way (numpy dot) —
  * zavod/zavod/extract/names/clean.py context; this is the Tungsten
  * form. */
private[graft] trait VectorBinaryExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> inputs")
    }
  override def dataType: DataType = DoubleType
  // null is produced for length mismatches / null elements even when
  // both inputs are non-null
  override def nullable: Boolean = true
}

/** Dot product of two double arrays: sum_i a_i * b_i, accumulated left
  * to right (bit-identical to the sequential HOF fold it replaced). */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $dot += $a.getDouble($i) * $b.getDouble($i);
          }
          if (!${ev.isNull}) ${ev.value} = $dot;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity in ONE pass: dot, |a|² and |b|² accumulate in the
  * same loop, then dot / (sqrt(|a|²) * sqrt(|b|²)) — the identical
  * arithmetic (and therefore identical floating-point result) as the
  * three-fold HOF composition dot/(norm*norm) it replaced. Zero-norm
  * inputs yield NaN in both forms. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            double $x = $a.getDouble($i);
            double $y = $b.getDouble($i);
            $dot += $x * $y;
            $na += $x * $x;
            $nb += $y * $y;
          }
          if (!${ev.isNull}) ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
