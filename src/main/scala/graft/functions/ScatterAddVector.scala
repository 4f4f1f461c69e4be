package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructType}

/** Native scatter-add of `array<struct<b:int, s:double>>` into a dense
  * `dim`-slot `array<double>`: out(b) += s for every element, one
  * O(elements) loop inside whole-stage codegen.
  *
  * Replaces the `aggregate(keyed, array_repeat(0.0, dim), transform...)`
  * fold in [[graft.functions.TextFunctions.hashedVector]]: Catalyst
  * higher-order functions are interpreted (no codegen) and that fold
  * re-evaluated a `when` over ALL `dim` accumulator slots — plus a fresh
  * `dim`-element array allocation — per token, an O(tokens x dim)
  * interpreted inner loop per row. The per-token hashing stays in
  * Catalyst expressions in the caller, so the pluggable hash column
  * (xxhash64 / md5TokenHash60 cross-engine replay) is untouched.
  *
  * Parity with the fold it replaces is with its OBSERVABLE output (the
  * ScatterAddVectorSpec differential), branch for branch:
  *   - input array null -> null (the fold is null-intolerant too);
  *   - element null or bucket null -> no slot's `i === b` matches ->
  *     element skipped;
  *   - bucket outside [0, dim) -> no slot matches -> skipped (pmod in
  *     the caller makes this unreachable, kept for parity);
  *   - sign null on an in-range bucket: the fold's `x + null` nulls the
  *     slot internally and `null + s` keeps it null for every later
  *     element — but the fold's DECLARED type is its accumulator's
  *     `array_repeat(lit(0.0), dim)` type, `array<double>` with
  *     containsNull = false, so the internal null reads back as 0.0.
  *     This expression reproduces exactly that: a null sign zeroes the
  *     slot and freezes it against later adds (unreachable from the
  *     caller's when/otherwise sign, kept for parity);
  *   - otherwise left-to-right `out(b) += s` — same FP addition order as
  *     the sequential fold, so results are bit-identical.
  *
  * Because no observable slot is ever null, the result is a primitive
  * `UnsafeArrayData` (no per-slot boxing), containsNull = false — the
  * same element nullability the fold declared.
  */
case class ScatterAddVector(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1 && dim <= 65536, s"scatter_add_vector dim out of range: $dim")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 && fields(0).dataType == IntegerType &&
            fields(1).dataType == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<struct<int, double>>, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "scatter_add_vector"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val vals = new Array[Double](dim)
    val frozen = new Array[Boolean](dim)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val e = arr.getStruct(i, 2)
        if (!e.isNullAt(0)) {
          val b = e.getInt(0)
          if (b >= 0 && b < dim && !frozen(b)) {
            if (e.isNullAt(1)) { frozen(b) = true; vals(b) = 0.0 }
            else vals(b) += e.getDouble(1)
          }
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(vals)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val uadCls = classOf[UnsafeArrayData].getName
      val rowCls = classOf[InternalRow].getName
      val n = ctx.freshName("n")
      val vals = ctx.freshName("vals")
      val frozen = ctx.freshName("frozen")
      val i = ctx.freshName("i")
      val e = ctx.freshName("e")
      val b = ctx.freshName("b")
      s"""
         |final int $n = $a.numElements();
         |final double[] $vals = new double[$dim];
         |final boolean[] $frozen = new boolean[$dim];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    final $rowCls $e = $a.getStruct($i, 2);
         |    if (!$e.isNullAt(0)) {
         |      final int $b = $e.getInt(0);
         |      if ($b >= 0 && $b < $dim && !$frozen[$b]) {
         |        if ($e.isNullAt(1)) { $frozen[$b] = true; $vals[$b] = 0.0; }
         |        else $vals[$b] += $e.getDouble(1);
         |      }
         |    }
         |  }
         |}
         |${ev.value} = $uadCls.fromPrimitiveArray($vals);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ScatterAddVector =
    copy(child = newChild)
}
