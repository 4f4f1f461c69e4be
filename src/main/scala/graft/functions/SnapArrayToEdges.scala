package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst bin-snap of a packed feature array: element i of the
  * input `array<double>` is snapped to the smallest edge `e` in
  * `edges(i)` with `v <= e` (edges sorted ascending), `+Infinity` past
  * the last edge, identity for slots with no edges.
  *
  * Replaces one [[graft.tree.SplitSearch.snapToEdges]] `when`-chain PER
  * FEATURE in the melted-histogram pipeline's projection
  * ([[graft.tree.SplitSearch.meltedHistogramIdx]]): at the wide fit's
  * 190 features x 32 edges that chain was ~6,000 branch expressions —
  * a plan Catalyst must analyze per tree level and codegen must split
  * into dozens of spill methods, and O(F x B) comparisons per row — and
  * it measured 142-222 s for the wide190 pipeline fit (r20 probe). This
  * expression is ONE plan node carrying the edge matrix as a reference
  * object, a tight O(F log B) binary-search loop inside whole-stage
  * codegen.
  *
  * Exact semantic parity with the `when`-chain, branch for branch:
  *   - element null -> `+Infinity` when the slot HAS edges (a CaseWhen
  *     null condition skips every branch and falls into the
  *     `otherwise(+Inf)`), null when it does not (identity);
  *   - NaN -> `+Infinity` (NaN fails every `<=`; Spark's nan-safe
  *     LessThanOrEqual orders NaN greatest, same FALSE the primitive
  *     Java `<=` yields against finite edges);
  *   - otherwise the first ascending edge with `v <= e`, `+Infinity`
  *     when none. The binary search's invariant is the same predicate
  *     `v <= e`, so the chosen edge is bit-identical.
  *
  * Result element nullability: only identity slots can emit null, but
  * the container keeps `containsNull = true` (matches the `array(...)`
  * the caller builds either way).
  */
case class SnapArrayToEdges(
    child: Expression,
    edges: Seq[Seq[Double]]
) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<double>, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "snap_array_to_edges"

  // sorted, dense matrix the generated code indexes; empty row = identity
  @transient private lazy val edgeMatrix: Array[Array[Double]] =
    edges.map(_.sorted.toArray).toArray

  /** The per-element snap, shared verbatim by eval and (inlined) codegen:
    * smallest edge >= v, +Inf beyond, caller handles null/identity. */
  private def snap(v: Double, es: Array[Double]): Double = {
    var lo = 0
    var hi = es.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= es(mid)) hi = mid else lo = mid + 1
    }
    if (lo < es.length) es(lo) else Double.PositiveInfinity
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val es = if (i < edgeMatrix.length) edgeMatrix(i) else Array.empty[Double]
      if (es.isEmpty) {
        out(i) = if (arr.isNullAt(i)) null else java.lang.Double.valueOf(arr.getDouble(i))
      } else if (arr.isNullAt(i)) {
        out(i) = java.lang.Double.valueOf(Double.PositiveInfinity)
      } else {
        out(i) = java.lang.Double.valueOf(snap(arr.getDouble(i), es))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mtxCls = "double[][]"
      val mtx = ctx.addReferenceObj("snapEdges", edgeMatrix, mtxCls)
      val gadCls = classOf[GenericArrayData].getName
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val es = ctx.freshName("es")
      val v = ctx.freshName("v")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |final int $n = $a.numElements();
         |final Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  final double[] $es = $i < $mtx.length ? $mtx[$i] : new double[0];
         |  if ($es.length == 0) {
         |    $out[$i] = $a.isNullAt($i) ? null : (Object) $a.getDouble($i);
         |  } else if ($a.isNullAt($i)) {
         |    $out[$i] = (Object) Double.POSITIVE_INFINITY;
         |  } else {
         |    final double $v = $a.getDouble($i);
         |    int $lo = 0; int $hi = $es.length;
         |    while ($lo < $hi) {
         |      final int $mid = ($lo + $hi) >>> 1;
         |      if ($v <= $es[$mid]) $hi = $mid; else $lo = $mid + 1;
         |    }
         |    $out[$i] = (Object) ($lo < $es.length ? $es[$lo] : Double.POSITIVE_INFINITY);
         |  }
         |}
         |${ev.value} = new $gadCls($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SnapArrayToEdges =
    copy(child = newChild)
}
