package graft.tree

import org.apache.spark.sql.types.{DataType, IntegerType, LongType, DoubleType, StringType}

/** Splitting criterion.
  *
  * Mirrors the reference's `Criterion` enum
  * (reference: efficient_trees/enums.py:8-14).
  */
sealed trait Criterion { def name: String }
object Criterion {
  case object Entropy extends Criterion { val name = "entropy" }
  case object Gini extends Criterion { val name = "gini" }
  def fromName(s: String): Criterion = s match {
    case "entropy" => Entropy
    case "gini"    => Gini
    case other     => throw new IllegalArgumentException(s"unknown criterion: $other")
  }
}

/** Fitted decision tree, as a Scala ADT.
  *
  * The reference models this as a recursive plain dict with keys
  * {type, feature, threshold, information_gain, criterion_value,
  * target_distribution, left, right} for internal nodes and
  * {type, value} for leaves (reference: efficient_trees/tree.py:374-385,203).
  *
  * Leaf values carry the target's runtime type (Int/Long/Double/String) —
  * the reference supports both int and string targets
  * (reference: tests/integration/test_tree.py:23-29).
  */
sealed trait TreeNode {
  /** Number of leaves under (and including) this node. */
  def numLeaves: Int = this match {
    case _: LeafNode  => 1
    case s: SplitNode => s.left.numLeaves + s.right.numLeaves
  }
  def depth: Int = this match {
    case _: LeafNode  => 0
    case s: SplitNode => 1 + math.max(s.left.depth, s.right.depth)
  }
}

final case class SplitNode(
    feature: String,
    threshold: Double,
    informationGain: Double,
    criterionValue: Double,
    targetDistribution: Seq[Long],
    left: TreeNode,
    right: TreeNode
) extends TreeNode

final case class LeafNode(value: Any) extends TreeNode

/** The fitted-model envelope: tree + categorical mappings, matching the
  * reference's two-field pickle payload (reference: efficient_trees/tree.py:41-65).
  * `targetType` is recorded so predictions can be cast back to the exact
  * input target type (the reference gets this for free from Python dynamism).
  *
  * Categorical mapping keys are the *string rendering* of the original
  * category value (we compare via `cast(StringType)` at apply time); values
  * are the ordinal codes assigned by ascending target-mean rank
  * (reference: efficient_trees/tree.py:96-105).
  */
final case class DecisionTreeModel(
    tree: TreeNode,
    categoricalMappings: Map[String, Map[String, Int]],
    targetType: DataType
) {
  def save(path: String): Unit = ModelIO.save(this, path)
}

/** JSON persistence of the model. The reference pickles; we use JSON
  * (reference: efficient_trees/tree.py:41-65). Uses Jackson, which ships
  * with Spark's jars.
  */
object ModelIO {
  import com.fasterxml.jackson.databind.{ObjectMapper, JsonNode}
  import com.fasterxml.jackson.databind.node.{ObjectNode, JsonNodeFactory}
  import java.nio.file.{Files, Paths}

  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  private def valueToJson(o: ObjectNode, field: String, v: Any): Unit = v match {
    case i: Int     => o.put(field, i)
    case l: Long    => o.put(field, l)
    case d: Double  => o.put(field, d)
    case f: Float   => o.put(field, f.toDouble)
    case s: String  => o.put(field, s)
    case b: Boolean => o.put(field, b)
    case null       => o.putNull(field)
    case other      => o.put(field, other.toString)
  }

  private def treeToJson(node: TreeNode): ObjectNode = node match {
    case LeafNode(value) =>
      val o = nf.objectNode()
      o.put("type", "leaf")
      valueToJson(o, "value", value)
      o
    case SplitNode(feature, threshold, gain, crit, dist, left, right) =>
      val o = nf.objectNode()
      o.put("type", "node")
      o.put("feature", feature)
      o.put("threshold", threshold)
      o.put("information_gain", gain)
      o.put("criterion_value", crit)
      val arr = o.putArray("target_distribution")
      dist.foreach(arr.add)
      o.set[ObjectNode]("left", treeToJson(left))
      o.set[ObjectNode]("right", treeToJson(right))
      o
  }

  private def jsonValue(n: JsonNode, targetType: DataType): Any =
    if (n.isNull) null
    else targetType match {
      case IntegerType => n.asInt()
      case LongType    => n.asLong()
      case DoubleType  => n.asDouble()
      case StringType  => n.asText()
      case _           => n.asText()
    }

  private def jsonToTree(n: JsonNode, targetType: DataType): TreeNode =
    if (n.get("type").asText() == "leaf") LeafNode(jsonValue(n.get("value"), targetType))
    else {
      val dist = {
        val it = n.get("target_distribution").elements()
        val buf = Seq.newBuilder[Long]
        while (it.hasNext) buf += it.next().asLong()
        buf.result()
      }
      SplitNode(
        n.get("feature").asText(),
        n.get("threshold").asDouble(),
        n.get("information_gain").asDouble(),
        n.get("criterion_value").asDouble(),
        dist,
        jsonToTree(n.get("left"), targetType),
        jsonToTree(n.get("right"), targetType)
      )
    }

  def save(model: DecisionTreeModel, path: String): Unit = {
    val root = nf.objectNode()
    root.put("target_type", model.targetType.catalogString)
    root.set[ObjectNode]("tree", treeToJson(model.tree))
    val maps = root.putObject("categorical_mappings")
    model.categoricalMappings.foreach { case (col, m) =>
      val mo = maps.putObject(col)
      m.foreach { case (k, v) => mo.put(k, v) }
    }
    Files.writeString(Paths.get(path), mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  def load(path: String): DecisionTreeModel = {
    val root = mapper.readTree(Files.readString(Paths.get(path)))
    val targetType = DataType.fromDDL(root.get("target_type").asText())
    val tree = jsonToTree(root.get("tree"), targetType)
    val maps = scala.collection.mutable.Map[String, Map[String, Int]]()
    val it = root.get("categorical_mappings").fields()
    while (it.hasNext) {
      val e = it.next()
      val inner = scala.collection.mutable.Map[String, Int]()
      val it2 = e.getValue.fields()
      while (it2.hasNext) { val e2 = it2.next(); inner(e2.getKey) = e2.getValue.asInt() }
      maps(e.getKey) = inner.toMap
    }
    DecisionTreeModel(tree, maps.toMap, targetType)
  }
}
