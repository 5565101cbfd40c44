package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared scalar implementation — ONE definition used by both the
  * interpreted path and generated code (codegen emits a static call to
  * [[JaroWinklerImpl.jw]]), so the two paths cannot drift. */
object JaroWinklerImpl {
  /** The string decoded to Unicode CODE POINTS — one comparison unit
    * per character even outside the BMP. Iterating UTF-16 code units
    * (charAt) would split astral characters into surrogate halves and
    * mis-score any non-ASCII name (diacritics and Cyrillic survive as
    * single units either way, but the window/prefix lengths still
    * shift whenever a supplementary character appears). */
  private def codePoints(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n)
    var ci = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(ci)
      out(i) = cp
      ci += Character.charCount(cp)
      i += 1
    }
    out
  }

  /** Classic Jaro–Winkler: match window floor(max/2)−1, transpositions
    * = half the out-of-order matches, Winkler prefix boost (scale 0.1,
    * prefix capped at 4) applied only above the 0.7 boost threshold,
    * and 0.0 when either side is empty — the exact variant DuckDB's
    * jaro_winkler_similarity implements, which is what lets an
    * external-engine oracle replay scores. Operates on Unicode code
    * points (== DuckDB's comparison units for ASCII; codepoint-correct
    * for the diacritic/Cyrillic/CJK names of the sanctions domain). */
  def jw(sa: String, sb: String): Double = {
    if (sa.isEmpty || sb.isEmpty) return 0.0
    if (sa == sb) return 1.0
    val a = codePoints(sa)
    val b = codePoints(sb)
    val la = a.length
    val lb = b.length
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a(prefix) == b(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

/** Native codegen'd Jaro–Winkler similarity — the workhorse string
  * comparator of probabilistic record linkage (the per-field agreement
  * γ feeding [[graft.operators.Linkage]]'s Fellegi–Sunter model is
  * classically "JW ≥ 0.9"). A HOF-lambda encoding of the two-pointer
  * match scan is impossible with built-ins (mutable match flags), and
  * a Scala UDF would break whole-stage codegen; this stays inside the
  * generated plan as a static call. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires string inputs")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.jw(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c1, c2) =>
      s"${ev.value} = graft.functions.expr.JaroWinklerImpl.jw(" +
        s"$c1.toString(), $c2.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}
