package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples,
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator per-key top-k — the tier-(c) custom operator
  * (SURVEY §7.3): a `LogicalPlan` node, a `SparkStrategy`, and a physical
  * operator, instead of the `Window(row_number) → Filter(rn <= k)`
  * composition.
  *
  * Why the built-ins genuinely can't express this shape (the bar §7.3
  * sets for going custom): Spark's own group-limit path
  * (`InferWindowGroupLimit` → `WindowGroupLimitExec`) still SORTS every
  * partition's full input — O(n log n) rows materialized per partition —
  * because it must leave rows positioned for the downstream rank window.
  * When the caller only wants the top-k SET per key (an ANN shortlist, a
  * per-query candidate cut), that sort is pure overhead: bounded heaps
  * retain k rows per key in one O(n log k) streaming pass and nothing is
  * ever sorted. [[graft.ops.Similarity]] proved the win with a hand-rolled
  * `mapPartitions` heap; this operator is that trick as a first-class
  * plan node any DataFrame can use.
  *
  * Physical shape mirrors partial/final aggregation: a PARTIAL exec with
  * no distribution requirement runs heaps inside each input partition
  * (map-side: at most partitions×keys×k rows survive — the shuffle
  * reduction), then a FINAL exec requires `ClusteredDistribution(keys)`
  * — `EnsureRequirements` inserts the hash exchange — and re-heaps each
  * key's survivors to the global top-k. Same total order as the window
  * twin (`orderBy` columns, caller supplies deterministic tie-breaks),
  * so the output SET is identical; within-key emission order is
  * unspecified, exactly like any exchange output.
  *
  * Memory contract: one partition holds heaps for its keys — keys/
  * partition × k rows, the same bound `WindowGroupLimitExec` needs for
  * its per-partition state, and orders of magnitude under the sort
  * buffer it replaces.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial heaps → (exchange via
  * EnsureRequirements) → final heaps. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // keys = Nil is GLOBAL top-k: ClusteredDistribution(Nil) is rejected by
    // Spark 4.1.2's require(clustering.nonEmpty); AllTuples (single
    // partition) is the correct final-stage demand — each partial heap
    // already cut its input to ≤ k rows, so the gather is k×partitions rows
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "rowsRetained" -> SQLMetrics.createMetric(sparkContext,
      "rows retained by per-partition heaps"))

  override protected def doExecute(): RDD[InternalRow] = {
    val retained = longMetric("rowsRetained")
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = RowOrdering.create(sortOrder, childOutput)
      // PriorityQueue dequeues the MAX under the ordering; with "compare
      // < 0 = ranks first", max = the worst retained row — heap head
      val ord: Ordering[InternalRow] = rowOrd.asInstanceOf[Ordering[InternalRow]]
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        // copy the (reused) projection buffer only when the key is new —
        // getOrElseUpdate would allocate a key copy per input row
        val h = heaps.get(key) match {
          case Some(existing) => existing
          case None =>
            val fresh = new scala.collection.mutable.PriorityQueue[InternalRow]()(ord)
            heaps.put(key.copy(), fresh)
            fresh
        }
        if (h.size < limit) h.enqueue(row.copy())
        else if (ord.compare(row, h.head) < 0) { h.dequeue(); h.enqueue(row.copy()) }
      }
      retained.add(heaps.valuesIterator.map(_.size.toLong).sum)
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** User-facing constructor. Self-registering: the strategy rides
  * `spark.experimental.extraStrategies` so ANY session can plan the node
  * (no `spark.sql.extensions` opt-in needed — the same imperative path
  * `GraftFunctions.register` uses for the SQL functions); sessions built
  * via [[graft.Graft.session]] get it from `GraftExtensions` too. */
object TopK {
  /** Top `k` rows per `keyCols` group under `orderCols` (e.g.
    * `col("score").desc, col("id")`). Caller supplies a deterministic
    * total order (tie-break on a unique column) for a deterministic
    * result set. */
  def perKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
             k: Int): DataFrame = {
    val spark = df.sparkSession
    // synchronized: concurrent first-callers on one session would race the
    // read-append (a duplicate entry is harmless but pointless)
    TopK.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    import org.apache.spark.sql.graftbridge.Bridge
    val keyExprs: Seq[Expression] =
      keyCols.map(n => Bridge.expression(org.apache.spark.sql.functions.col(n)))
    val order: Seq[SortOrder] = orderCols.map(Bridge.expression).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      TopKPerKey(keyExprs, order, k, df.queryExecution.analyzed))
  }
}
