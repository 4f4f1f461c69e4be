package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ArrayDotProduct

/** SQL-surface registration for the custom Catalyst expressions, via the
  * stock extension mechanism:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * then `SELECT array_dot(a, b)` / `array_cosine(a, b)` work in plain SQL,
  * along with the text-pipeline functions `graft_lang_id`,
  * `graft_quality`, `graft_fingerprint`, `graft_ws_tokens`,
  * `graft_scrub_pii`, `graft_dup_token_frac`, `graft_dup_line_frac`,
  * `graft_symbol_ratio`, and `graft_normalize_text` (each the exact
  * expression tree the Column API builds — one implementation, two
  * surfaces).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Register a 1-arg function whose body is a Column-API expression
    * builder — the SQL surface reuses the library's codegen'd column
    * functions verbatim. */
  private def injectUnary(
      ext: SparkSessionExtensions,
      name: String,
      build: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (children: Seq[Expression]) => {
        require(children.size == 1, s"$name(text) takes one argument")
        import org.apache.spark.sql.graft.ColumnBridge
        ColumnBridge.catalystExpression(build(ColumnBridge.column(children.head)))
      }))

  override def apply(ext: SparkSessionExtensions): Unit = {
    injectUnary(ext, "graft_lang_id", graft.functions.TextFunctions.langId)
    injectUnary(ext, "graft_quality", graft.functions.TextFunctions.qualityScore)
    injectUnary(ext, "graft_fingerprint", graft.functions.TextFunctions.fingerprint)
    injectUnary(ext, "graft_ws_tokens", graft.functions.TextFunctions.wsTokenCount)
    injectUnary(ext, "graft_scrub_pii", graft.functions.TextFunctions.scrubPii)
    injectUnary(ext, "graft_dup_token_frac", graft.functions.TextFunctions.dupTokenFraction)
    injectUnary(ext, "graft_dup_line_frac", graft.functions.TextFunctions.dupLineFraction)
    injectUnary(ext, "graft_symbol_ratio", graft.functions.TextFunctions.symbolRatio)
    injectUnary(ext, "graft_normalize_text", graft.functions.TextFunctions.normalizeText)
    ext.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "array_dot(a, b) takes two array<double> arguments")
        ArrayDotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("array_cosine"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_cosine"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "array_cosine(a, b) takes two array<double> arguments")
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        val (a, b) = (children.head, children(1))
        Divide(ArrayDotProduct(a, b),
          Multiply(Sqrt(ArrayDotProduct(a, a)), Sqrt(ArrayDotProduct(b, b))))
      }))
  }
}
