package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Native Catalyst symmetric-ADC cosine over two SQ8 code arrays
  * (`array<tinyint>`, the -128-shifted 0..255 codes
  * [[graft.operators.Similarity.knnGraphQuantized]] ships through its
  * verify joins) against the broadcast SQ8 range parameters
  * (`mins`/`widths`, both `array<double>`).
  *
  * Semantically identical to dequantize-then-cosine —
  * `cosine(transform(a, dq), transform(b, dq))` with
  * `dq(c, i) = mins[i] + (double)(c + 128) * widths[i] / 255.0` — but
  * that formulation is a higher-order-function chain: interpreted per
  * ELEMENT, two fresh double arrays allocated per candidate pair, and
  * a codegen fence in the hottest loop of the kNN-graph verify stage
  * (the [[ArrayDotProduct]] lesson, SQ8 flavor). This expression fuses
  * dequantization and the three inner products into one branch-free
  * allocation-free loop inside whole-stage codegen.
  *
  * IEEE parity contract: per index ascending, `va = mn + (double)(ca +
  * 128) * wd / 255.0` (multiply, then divide, then add — the SQL
  * twin's left-association), accumulating `dot += va*vb`, `na +=
  * va*va`, `nb += vb*vb` from 0.0 in element order, result
  * `dot / (sqrt(na) * sqrt(nb))` — bitwise identical to the
  * materialized-transform formulation it replaced and to the DuckDB
  * oracle's `list_inner_product` replay. Mismatched lengths use the
  * common prefix (zip semantics); any null input -> null; null
  * elements are not supported (codes and params are dense by
  * construction) and read as 0.
  */
case class Sq8AdcCosine(
    codesA: Expression,
    codesB: Expression,
    mins: Expression,
    widths: Expression
) extends QuaternaryExpression {

  override def first: Expression = codesA
  override def second: Expression = codesB
  override def third: Expression = mins
  override def fourth: Expression = widths

  override def checkInputDataTypes(): TypeCheckResult =
    (codesA.dataType, codesB.dataType, mins.dataType, widths.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _),
            ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, m, w) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<tinyint>, array<tinyint>, " +
            s"array<double>, array<double>), got ${a.sql}, ${b.sql}, ${m.sql}, ${w.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "sq8_adc_cosine"

  override def nullSafeEval(a: Any, b: Any, m: Any, w: Any): Any = {
    val ca = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val mn = m.asInstanceOf[ArrayData]
    val wd = w.asInstanceOf[ArrayData]
    val n = math.min(math.min(ca.numElements(), cb.numElements()),
      math.min(mn.numElements(), wd.numElements()))
    var dot = 0.0d; var na = 0.0d; var nb = 0.0d
    var i = 0
    while (i < n) {
      val m0 = mn.getDouble(i); val w0 = wd.getDouble(i)
      val va = m0 + (ca.getByte(i) + 128).toDouble * w0 / 255.0
      val vb = m0 + (cb.getByte(i) + 128).toDouble * w0 / 255.0
      dot += va * vb; na += va * va; nb += vb * vb
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, m, w) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val m0 = ctx.freshName("m0")
      val w0 = ctx.freshName("w0")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      s"""
         |final int $n = java.lang.Math.min(
         |  java.lang.Math.min($a.numElements(), $b.numElements()),
         |  java.lang.Math.min($m.numElements(), $w.numElements()));
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $m0 = $m.getDouble($i);
         |  final double $w0 = $w.getDouble($i);
         |  final double $va = $m0 + (double) ($a.getByte($i) + 128) * $w0 / 255.0;
         |  final double $vb = $m0 + (double) ($b.getByte($i) + 128) * $w0 / 255.0;
         |  $dot += $va * $vb; $na += $va * $va; $nb += $vb * $vb;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Sq8AdcCosine =
    copy(codesA = newFirst, codesB = newSecond,
      mins = newThird, widths = newFourth)
}
