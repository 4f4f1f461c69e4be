package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst membership probe of a string column against a
  * broadcast [[org.apache.spark.util.sketch.BloomFilter]] (the sketch
  * `df.stat.bloomFilter` builds).
  *
  * This was the repo's ONE Scala UDF
  * ([[graft.operators.Dedup.newDocsViaBloom]]'s
  * `udf(fp => bc.value.mightContainString(fp))`): Spark's own
  * `might_contain` only accepts `bloom_filter_agg` sketches, not the
  * `util.sketch` filter, so the probe needed wrapping — but a UDF is a
  * codegen fence plus a per-row `UTF8String -> java.lang.String`
  * conversion on the incremental-dedup hot path. This expression stays
  * inside whole-stage codegen and probes the filter directly with the
  * value's UTF-8 bytes: the sketch's `putString`/`mightContainString`
  * are defined as `putBinary`/`mightContainBinary` over
  * `getBytes(UTF_8)` (spark/common/sketch `BloomFilterImpl`), and
  * `UTF8String.getBytes` yields exactly those bytes with no String
  * allocation — parity is pinned by `DedupSpec`'s bloom tests and the
  * `dedup_incremental_bloom` oracle entry.
  *
  * The broadcast HANDLE is what serializes with the plan; each executor
  * materializes the filter once per codegen instance (a mutable-state
  * init reading `bc.value()`), not per row. Null input -> false (a null
  * fingerprint is never "maybe present"), so the result is
  * non-nullable, matching the UDF it replaces.
  */
case class BloomMightContainString(
    child: Expression,
    bloom: Broadcast[BloomFilter]
) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string argument, got ${t.sql}")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain_string"

  @transient private lazy val filter: BloomFilter = bloom.value

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null && filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val bcRef = ctx.addReferenceObj("bloomBc", bloom, bcCls)
    val bloomTerm = ctx.addMutableState(bfCls, "graftBloom",
      v => s"$v = ($bfCls) $bcRef.value();")
    val childGen = child.genCode(ctx)
    val resultCode =
      code"""
        |${childGen.code}
        |boolean ${ev.value} = false;
        |if (!${childGen.isNull}) {
        |  ${ev.value} = $bloomTerm.mightContainBinary(${childGen.value}.getBytes());
        |}
      """.stripMargin
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainString =
    copy(child = newChild)
}
