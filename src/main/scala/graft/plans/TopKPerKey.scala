package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy

/** Per-key top-k as a first-class operator: the full custom-operator
  * ladder (SURVEY.md §4 option (c)) — LogicalPlan node → Strategy →
  * two-phase SparkPlan.
  *
  * Why a custom operator: the declarative formulation
  * (`row_number().over(Window.partitionBy(keys).orderBy(ord))` +
  * filter) must shuffle EVERY row and fully sort each key partition.
  * This operator keeps a bounded buffer of k rows per key per input
  * partition (partial phase), so only ≤ k·|keys| rows per partition
  * reach the shuffle, and the final phase never sorts more than the
  * survivors.  At 100 TB with small k this is the difference between
  * shuffling terabytes and shuffling megabytes.
  */
final case class TopKPerKeyNode(keys: Seq[Expression], orders: Seq[SortOrder], k: Int,
                                child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  require(orders.nonEmpty, "at least one sort order")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, orders, k, child) =>
      // float/double keys must be normalized like Spark's own
      // Aggregate/Join keys (NormalizeFloatingNumbers only rewrites
      // known node types, not custom ones): without this, -0.0 vs 0.0
      // and distinct NaN bit patterns form SEPARATE groups in the raw
      // UnsafeRow key map and can even hash to different partitions.
      // Spark's recursive normalizer (via the bridge) also reaches
      // floats NESTED in struct/array keys — a top-level-only check
      // would leave struct<x:double> keys split on -0.0/NaN bytes.
      val normKeys = keys.map(GraftBridge.normalizeFloatKey)
      TopKPerKeyExec(normKeys, orders, k, partial = false,
        TopKPerKeyExec(normKeys, orders, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Physical per-key top-k.  The partial instance runs before the
  * shuffle (UnspecifiedDistribution) and bounds each partition's
  * output; the final instance requires clustering on the keys, which
  * EnsureRequirements satisfies with a hash exchange over the already
  * -bounded rows.
  *
  * Memory bound (documented, no spill): each task holds at most 2k
  * rows per DISTINCT KEY in its partition, so worst case is
  * O(2k · keys-per-task) heap — a few MB in the intended regime
  * (small k, moderate cardinality: "top 5 per group").  If k ×
  * cardinality is large enough to need spilling, use the window
  * formulation (row_number() <= k), which goes through Spark's
  * spillable external sorter instead. */
final case class TopKPerKeyExec(keys: Seq[Expression], orders: Seq[SortOrder], k: Int,
                                partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrders = orders
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(sortOrders, childOutput)
      val buffers = scala.collection.mutable.LinkedHashMap.empty[InternalRow, scala.collection.mutable.ArrayBuffer[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val buf = buffers.get(key) match {
          case Some(b) => b
          case None =>
            val b = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
            buffers.put(key.copy(), b)
            b
        }
        buf += row.copy()
        // amortized bound: compact to the best k whenever we reach 2k
        if (buf.length >= 2 * limit) {
          val kept = buf.sorted(rowOrd.asInstanceOf[Ordering[InternalRow]]).take(limit)
          buf.clear(); buf ++= kept
        }
      }
      buffers.iterator.flatMap { case (_, buf) =>
        buf.sorted(rowOrd.asInstanceOf[Ordering[InternalRow]]).take(limit)
      }
    }
  }
}

/** User-facing surface. */
object TopK {
  /** Top-k rows per key group ordered by `orderBy`.  Key and order
    * columns are passed by name so the analyzer resolves them inside
    * the custom node (a Column's node-expression wrapper stays
    * Unevaluable).  Registers the strategy on the session
    * (idempotent). */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: String, k: Int,
             descending: Boolean = false): DataFrame =
    perKeyOrdered(df, keyCols, Seq(orderBy -> descending), k)

  /** Multi-column ordering variant: `orders` is (column, descending)
    * pairs evaluated lexicographically — e.g. (score desc, id asc) for
    * a deterministic tiebreak. */
  def perKeyOrdered(df: DataFrame, keyCols: Seq[String],
                    orders: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    val spark = df.sparkSession
    // synchronized check-then-append (the ConeZonePushdown.install
    // pattern): two concurrent registrars would otherwise read the
    // same old Seq and one registration would be lost
    synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKStrategy))
        spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKStrategy
    }
    val keyExprs: Seq[Expression] = keyCols.map(n => UnresolvedAttribute.quotedString(n))
    val sortOrders = orders.map { case (name, desc) =>
      SortOrder(UnresolvedAttribute.quotedString(name), if (desc) Descending else Ascending)
    }
    GraftBridge.ofRows(spark, TopKPerKeyNode(keyExprs, sortOrders, k, GraftBridge.logicalPlan(df)))
  }
}
