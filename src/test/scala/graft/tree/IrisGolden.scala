package graft.tree

/** The reference's verbatim golden fixture
  * (reference: tests/integration/test_tree.py:12-64).
  *
  * - `data`: the public-domain 150-row iris table in the Fisher/R variant
  *   sklearn ships (its docs note the UCI copy has two wrong points; rows
  *   35 and 38, 1-indexed, are the corrected ones here). Column order:
  *   sepal length, sepal width, petal length, petal width, class (0/1/2 =
  *   setosa/versicolor/virginica), in sklearn's canonical row order.
  * - `trainIdx`/`testIdx`: the exact indices of sklearn's
  *   `train_test_split(test_size=0.3, random_state=42)` (test_tree.py:18),
  *   reproduced offline: sklearn's ShuffleSplit draws
  *   `RandomState(42).permutation(150)` and takes the first 45 as test,
  *   the next 105 as train — regenerated with numpy's MT19937 and embedded
  *   as literals (this container has numpy but not sklearn).
  * - golden prediction lists copied verbatim from test_tree.py:37-56.
  *
  * Sanity anchors: the class labels at trainIdx/testIdx reproduce the
  * golden lists' leading values exactly (a depth-4 tree is near-perfect on
  * iris), and the entropy/gini train lists differ only at positions 39 and
  * 53 — borderline versicolor rows 77 and 5th-from-34 in the permutation.
  */
object IrisGolden {

  /** sepal_length sepal_width petal_length petal_width class */
  private val raw = """
    5.1 3.5 1.4 0.2 0 | 4.9 3.0 1.4 0.2 0 | 4.7 3.2 1.3 0.2 0 | 4.6 3.1 1.5 0.2 0
    5.0 3.6 1.4 0.2 0 | 5.4 3.9 1.7 0.4 0 | 4.6 3.4 1.4 0.3 0 | 5.0 3.4 1.5 0.2 0
    4.4 2.9 1.4 0.2 0 | 4.9 3.1 1.5 0.1 0 | 5.4 3.7 1.5 0.2 0 | 4.8 3.4 1.6 0.2 0
    4.8 3.0 1.4 0.1 0 | 4.3 3.0 1.1 0.1 0 | 5.8 4.0 1.2 0.2 0 | 5.7 4.4 1.5 0.4 0
    5.4 3.9 1.3 0.4 0 | 5.1 3.5 1.4 0.3 0 | 5.7 3.8 1.7 0.3 0 | 5.1 3.8 1.5 0.3 0
    5.4 3.4 1.7 0.2 0 | 5.1 3.7 1.5 0.4 0 | 4.6 3.6 1.0 0.2 0 | 5.1 3.3 1.7 0.5 0
    4.8 3.4 1.9 0.2 0 | 5.0 3.0 1.6 0.2 0 | 5.0 3.4 1.6 0.4 0 | 5.2 3.5 1.5 0.2 0
    5.2 3.4 1.4 0.2 0 | 4.7 3.2 1.6 0.2 0 | 4.8 3.1 1.6 0.2 0 | 5.4 3.4 1.5 0.4 0
    5.2 4.1 1.5 0.1 0 | 5.5 4.2 1.4 0.2 0 | 4.9 3.1 1.5 0.2 0 | 5.0 3.2 1.2 0.2 0
    5.5 3.5 1.3 0.2 0 | 4.9 3.6 1.4 0.1 0 | 4.4 3.0 1.3 0.2 0 | 5.1 3.4 1.5 0.2 0
    5.0 3.5 1.3 0.3 0 | 4.5 2.3 1.3 0.3 0 | 4.4 3.2 1.3 0.2 0 | 5.0 3.5 1.6 0.6 0
    5.1 3.8 1.9 0.4 0 | 4.8 3.0 1.4 0.3 0 | 5.1 3.8 1.6 0.2 0 | 4.6 3.2 1.4 0.2 0
    5.3 3.7 1.5 0.2 0 | 5.0 3.3 1.4 0.2 0
    7.0 3.2 4.7 1.4 1 | 6.4 3.2 4.5 1.5 1 | 6.9 3.1 4.9 1.5 1 | 5.5 2.3 4.0 1.3 1
    6.5 2.8 4.6 1.5 1 | 5.7 2.8 4.5 1.3 1 | 6.3 3.3 4.7 1.6 1 | 4.9 2.4 3.3 1.0 1
    6.6 2.9 4.6 1.3 1 | 5.2 2.7 3.9 1.4 1 | 5.0 2.0 3.5 1.0 1 | 5.9 3.0 4.2 1.5 1
    6.0 2.2 4.0 1.0 1 | 6.1 2.9 4.7 1.4 1 | 5.6 2.9 3.6 1.3 1 | 6.7 3.1 4.4 1.4 1
    5.6 3.0 4.5 1.5 1 | 5.8 2.7 4.1 1.0 1 | 6.2 2.2 4.5 1.5 1 | 5.6 2.5 3.9 1.1 1
    5.9 3.2 4.8 1.8 1 | 6.1 2.8 4.0 1.3 1 | 6.3 2.5 4.9 1.5 1 | 6.1 2.8 4.7 1.2 1
    6.4 2.9 4.3 1.3 1 | 6.6 3.0 4.4 1.4 1 | 6.8 2.8 4.8 1.4 1 | 6.7 3.0 5.0 1.7 1
    6.0 2.9 4.5 1.5 1 | 5.7 2.6 3.5 1.0 1 | 5.5 2.4 3.8 1.1 1 | 5.5 2.4 3.7 1.0 1
    5.8 2.7 3.9 1.2 1 | 6.0 2.7 5.1 1.6 1 | 5.4 3.0 4.5 1.5 1 | 6.0 3.4 4.5 1.6 1
    6.7 3.1 4.7 1.5 1 | 6.3 2.3 4.4 1.3 1 | 5.6 3.0 4.1 1.3 1 | 5.5 2.5 4.0 1.3 1
    5.5 2.6 4.4 1.2 1 | 6.1 3.0 4.6 1.4 1 | 5.8 2.6 4.0 1.2 1 | 5.0 2.3 3.3 1.0 1
    5.6 2.7 4.2 1.3 1 | 5.7 3.0 4.2 1.2 1 | 5.7 2.9 4.2 1.3 1 | 6.2 2.9 4.3 1.3 1
    5.1 2.5 3.0 1.1 1 | 5.7 2.8 4.1 1.3 1
    6.3 3.3 6.0 2.5 2 | 5.8 2.7 5.1 1.9 2 | 7.1 3.0 5.9 2.1 2 | 6.3 2.9 5.6 1.8 2
    6.5 3.0 5.8 2.2 2 | 7.6 3.0 6.6 2.1 2 | 4.9 2.5 4.5 1.7 2 | 7.3 2.9 6.3 1.8 2
    6.7 2.5 5.8 1.8 2 | 7.2 3.6 6.1 2.5 2 | 6.5 3.2 5.1 2.0 2 | 6.4 2.7 5.3 1.9 2
    6.8 3.0 5.5 2.1 2 | 5.7 2.5 5.0 2.0 2 | 5.8 2.8 5.1 2.4 2 | 6.4 3.2 5.3 2.3 2
    6.5 3.0 5.5 1.8 2 | 7.7 3.8 6.7 2.2 2 | 7.7 2.6 6.9 2.3 2 | 6.0 2.2 5.0 1.5 2
    6.9 3.2 5.7 2.3 2 | 5.6 2.8 4.9 2.0 2 | 7.7 2.8 6.7 2.0 2 | 6.3 2.7 4.9 1.8 2
    6.7 3.3 5.7 2.1 2 | 7.2 3.2 6.0 1.8 2 | 6.2 2.8 4.8 1.8 2 | 6.1 3.0 4.9 1.8 2
    6.4 2.8 5.6 2.1 2 | 7.2 3.0 5.8 1.6 2 | 7.4 2.8 6.1 1.9 2 | 7.9 3.8 6.4 2.0 2
    6.4 2.8 5.6 2.2 2 | 6.3 2.8 5.1 1.5 2 | 6.1 2.6 5.6 1.4 2 | 7.7 3.0 6.1 2.3 2
    6.3 3.4 5.6 2.4 2 | 6.4 3.1 5.5 1.8 2 | 6.0 3.0 4.8 1.8 2 | 6.9 3.1 5.4 2.1 2
    6.7 3.1 5.6 2.4 2 | 6.9 3.1 5.1 2.3 2 | 5.8 2.7 5.1 1.9 2 | 6.8 3.2 5.9 2.3 2
    6.7 3.3 5.7 2.5 2 | 6.7 3.0 5.2 2.3 2 | 6.3 2.5 5.0 1.9 2 | 6.5 3.0 5.2 2.0 2
    6.2 3.4 5.4 2.3 2 | 5.9 3.0 5.1 1.8 2
  """

  /** (sepalLen, sepalWid, petalLen, petalWid, class) in sklearn row order. */
  val data: Vector[(Double, Double, Double, Double, Int)] = {
    val rows = raw.split("[|\n]").map(_.trim).filter(_.nonEmpty).toVector
    require(rows.size == 150, s"iris fixture must have 150 rows, got ${rows.size}")
    rows.map { r =>
      val f = r.split("\\s+")
      (f(0).toDouble, f(1).toDouble, f(2).toDouble, f(3).toDouble, f(4).toInt)
    }
  }

  /** RandomState(42).permutation(150)[:45] — sklearn's test indices. */
  val testIdx: Vector[Int] = Vector(
    73, 18, 118, 78, 76, 31, 64, 141, 68, 82, 110, 12, 36, 9, 19, 56, 104, 69, 55, 132,
    29, 127, 26, 128, 131, 145, 108, 143, 45, 30, 22, 15, 65, 11, 42, 146, 51, 27, 4, 32,
    142, 85, 86, 16, 10)

  /** RandomState(42).permutation(150)[45:] — sklearn's train indices. */
  val trainIdx: Vector[Int] = Vector(
    81, 133, 137, 75, 109, 96, 105, 66, 0, 122, 67, 28, 40, 44, 60, 123, 24, 25, 23, 94,
    39, 95, 117, 47, 97, 113, 33, 138, 101, 62, 84, 148, 53, 5, 93, 111, 49, 35, 80, 77,
    34, 114, 7, 43, 70, 98, 120, 83, 134, 135, 89, 8, 13, 119, 125, 3, 17, 38, 72, 136,
    6, 112, 100, 2, 63, 54, 126, 50, 115, 46, 139, 61, 147, 79, 59, 91, 41, 58, 90, 48,
    88, 107, 124, 21, 57, 144, 129, 37, 140, 1, 52, 130, 103, 99, 116, 87, 74, 121, 149,
    20, 71, 106, 14, 92, 102)

  // golden prediction lists, verbatim (reference: test_tree.py:37-56)
  val trainPredictionsEntropy: Vector[Int] = Vector(
    1, 2, 2, 1, 2, 1, 2, 1, 0, 2, 1, 0, 0, 1, 1, 2, 1, 0, 0, 1, 0, 1, 2, 0, 1, 2, 0, 2, 2, 1, 1, 2, 1, 0, 1, 2,
    0, 0, 1, 1, 0, 2, 0, 0, 2, 1, 2, 2, 2, 2, 1, 0, 0, 1, 2, 0, 0, 0, 1, 2, 0, 2, 2, 0, 1, 1, 2, 1, 2, 0, 2, 1,
    2, 1, 1, 1, 0, 1, 1, 0, 1, 2, 2, 0, 1, 2, 2, 0, 2, 0, 1, 2, 2, 1, 2, 1, 1, 2, 2, 0, 1, 2, 0, 1, 2)

  val testPredictionsEntropy: Vector[Int] = Vector(
    1, 0, 2, 1, 1, 0, 1, 2, 1, 1, 2, 0, 0, 0, 0, 1, 2, 1, 1, 2, 0, 2, 0, 2, 2, 2, 2, 2, 0, 0, 0, 0, 1, 0, 0, 2,
    1, 0, 0, 0, 2, 2, 1, 0, 0)

  val trainPredictionsGini: Vector[Int] = Vector(
    1, 2, 2, 1, 2, 1, 2, 1, 0, 2, 1, 0, 0, 1, 1, 2, 1, 0, 0, 1, 0, 1, 2, 0, 1, 2, 0, 2, 2, 1, 1, 2, 1, 0, 1, 2,
    0, 0, 1, 2, 0, 2, 0, 0, 2, 1, 2, 2, 2, 2, 1, 0, 0, 2, 2, 0, 0, 0, 1, 2, 0, 2, 2, 0, 1, 1, 2, 1, 2, 0, 2, 1,
    2, 1, 1, 1, 0, 1, 1, 0, 1, 2, 2, 0, 1, 2, 2, 0, 2, 0, 1, 2, 2, 1, 2, 1, 1, 2, 2, 0, 1, 2, 0, 1, 2)

  val testPredictionsGini: Vector[Int] = Vector(
    1, 0, 2, 1, 1, 0, 1, 2, 1, 1, 2, 0, 0, 0, 0, 1, 2, 1, 1, 2, 0, 2, 0, 2, 2, 2, 2, 2, 0, 0, 0, 0, 1, 0, 0, 2,
    1, 0, 0, 0, 2, 2, 1, 0, 0)

  /** The reference's feature names, verbatim incl. spaces/parens
    * (test_tree.py:21 uses sklearn's iris.feature_names). */
  val featureNames: Seq[String] = Seq(
    "sepal length (cm)", "sepal width (cm)", "petal length (cm)", "petal width (cm)")

  val labelStr: Map[Int, String] = Map(0 -> "setosa", 1 -> "versicolor", 2 -> "virginica")
}
