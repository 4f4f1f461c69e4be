package graft.tree

import org.apache.spark.sql.DataFrame

/** Caller-side data preparation helpers mirroring what the reference's
  * examples do before `fit` (reference: examples/amex_default.py:23,34,
  * examples/heart_disease.py:34 — `fill_null(0.0)` on every feature).
  */
object Prep {

  /** Replace nulls with `value` in `cols` (all numeric columns when empty) —
    * the reference's `fill_null(0.0)` (P9). Delegates to `DataFrameNaFunctions`
    * so the replacement stays inside codegen'd projections. */
  def fillNull(df: DataFrame, value: Double, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.na.fill(value) else df.na.fill(value, cols)
}
