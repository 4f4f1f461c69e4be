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
  * then `SELECT array_dot(a, b)` / `array_cosine(a, b)` work in plain SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
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
