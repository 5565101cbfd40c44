package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the checksum folds that built-in
  * functions can only express as higher-order-function lambdas — and
  * HOF lambdas disable whole-stage codegen for the projection. These
  * generate a plain Java loop instead, so identifier validation of
  * billions of statements stays inside codegen (the reference's rigour
  * checksums — zavod/zavod/runtime/cleaning.py:19-63 — are plain loops
  * too; this is their Tungsten form).
  */

/** ISO 7064 mod-97 residue of a decimal-digit string (LEI/IBAN):
  * left fold acc = (acc * 10 + digit) % 97. Non-digit bytes contribute
  * (byte - '0') like the expression-composition form, keeping the two
  * implementations bit-identical on any input. */
case class Mod97Digits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_mod97"

  protected override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    var acc = 0
    var i = 0
    while (i < b.length) {
      acc = (acc * 10 + (b(i) - '0')) % 97
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
        byte[] $bytes = $c.getBytes();
        int $acc = 0;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $acc = ($acc * 10 + ($bytes[$i] - '0')) % 97;
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Mod97Digits =
    copy(child = newChild)
}

/** Luhn (mod-10) validity of a decimal-digit string including its
  * trailing check digit: from the right, every second digit doubles
  * (minus 9 when > 9); valid iff the sum ≡ 0 (mod 10). */
case class LuhnValid(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_luhn"

  protected override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    var sum = 0
    var pos = 1
    var i = b.length - 1
    while (i >= 0) {
      var d = b(i) - '0'
      if (pos % 2 == 0) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      pos += 1
      i -= 1
    }
    // an empty digit string carries no checksum evidence
    b.length > 0 && sum % 10 == 0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val sum = ctx.freshName("sum")
      val pos = ctx.freshName("pos")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
        byte[] $bytes = $c.getBytes();
        int $sum = 0;
        int $pos = 1;
        for (int $i = $bytes.length - 1; $i >= 0; $i--, $pos++) {
          int $d = $bytes[$i] - '0';
          if ($pos % 2 == 0) { $d *= 2; if ($d > 9) $d -= 9; }
          $sum += $d;
        }
        ${ev.value} = ($bytes.length > 0 && $sum % 10 == 0);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LuhnValid =
    copy(child = newChild)
}
