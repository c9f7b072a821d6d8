package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import scala.collection.mutable

/** Memory-bounded heavy hitters — SpaceSaving (Metwally, Agrawal,
  * El Abbadi, "Efficient computation of frequent and top-k elements
  * in data streams", ICDT 2005) per partition, merged with rigorous
  * error intervals through ONE shuffle of bounded size.
  *
  * Why it exists at 100 TB: a `groupBy(key).count().orderBy(...)` over
  * URLs / n-grams / user ids shuffles EVERY distinct key to build a
  * table nobody reads past the head.  Here each task keeps a summary
  * of `capacity` counters regardless of distinct-key cardinality, so
  * the shuffle moves ≤ numPartitions·capacity rows total and executor
  * state never grows with the key space.
  *
  * Error accounting (the mergeable-summaries bound): in a partition
  * whose summary tracks the item, count−err ≤ true ≤ count; in a
  * partition whose summary does NOT track it, 0 ≤ true ≤ that
  * summary's minimum counter.  Summing over partitions gives
  * [n_lower, n_upper] per item, computed exactly in the merge — when
  * no partition ever evicted (per-partition distinct ≤ capacity),
  * n_lower == n_upper == the exact count, which is how the oracle
  * gates the machinery; the approximate regime is spec-bounded.
  */
object HeavyHitters {

  /** SpaceSaving summary: `capacity` counters, lazy-deletion min-heap
    * so a high-cardinality stream pays O(log capacity) per eviction,
    * not a capacity scan. */
  final class SpaceSaving(val capacity: Int) {
    require(capacity >= 1, s"capacity >= 1, got $capacity")
    val counts = mutable.HashMap.empty[String, Long]
    val errs = mutable.HashMap.empty[String, Long]
    // min-heap of (countAtPush, item); stale entries skipped on pop
    private val heap = mutable.PriorityQueue.empty[(Long, String)](
      Ordering.by[(Long, String), Long](_._1).reverse)
    private[graft] def heapSize: Int = heap.size // spec surface for the bound

    def offer(item: String, inc: Long = 1L): Unit = counts.get(item) match {
      case Some(c) =>
        counts(item) = c + inc
        heap.enqueue((c + inc, item))
        // compact the lazy-deletion heap: every tracked-item increment
        // enqueues a fresh entry, so a few hot keys streaming 10^9
        // occurrences would grow the heap with the STREAM, not the
        // capacity — rebuilding from `counts` restores the O(capacity)
        // bound at amortized O(1) per offer
        if (heap.size > 4 * capacity) {
          heap.clear()
          counts.foreach { case (i2, c2) => heap.enqueue((c2, i2)) }
        }
      case None if counts.size < capacity =>
        counts(item) = inc; errs(item) = 0L
        heap.enqueue((inc, item))
      case None =>
        // evict the current minimum (pop stale heap entries first)
        var top = heap.dequeue()
        while (!counts.get(top._2).contains(top._1)) top = heap.dequeue()
        val (minC, minI) = top
        counts.remove(minI); errs.remove(minI)
        counts(item) = minC + inc; errs(item) = minC
        heap.enqueue((minC + inc, item))
    }

    /** Upper bound on the count of any UNTRACKED item: 0 while the
      * summary has spare capacity (nothing was ever evicted), else the
      * current minimum counter. */
    def absentBound: Long =
      if (counts.size < capacity) 0L
      else {
        while (!counts.get(heap.head._2).contains(heap.head._1)) heap.dequeue()
        heap.head._1
      }
  }

  /** Top-k heavy hitters of `key` with exact error intervals:
    * (item, n_lower, n_upper), the k largest by upper bound
    * (ties broken by item for determinism).  Null keys are ignored.
    *
    * Plan shape: scan-stage mapPartitions summaries (bounded state) →
    * one shuffle of ≤ numPartitions·capacity rows → broadcast one-row
    * total of the per-partition absent-bounds → TakeOrdered.  No stage
    * ever holds more than `capacity` counters per task. */
  def topK(df: DataFrame, key: Column, k: Int, capacity: Int): DataFrame = {
    require(k >= 1 && capacity >= k, s"need capacity >= k >= 1, got k=$k capacity=$capacity")
    require(capacity <= (1 << 16), s"capacity <= 2^16 keeps summaries task-bounded, got $capacity")
    val spark = df.sparkSession
    import spark.implicits._
    val partials = df.select(key.cast(StringType).as("item"))
      .filter(col("item").isNotNull).as[String]
      .mapPartitions { it =>
        val ss = new SpaceSaving(capacity)
        it.foreach(ss.offer(_))
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val bound = ss.absentBound
        ss.counts.iterator.map { case (item, c) =>
          (item, c, ss.errs(item), bound, pid)
        }
      }.toDF("item", "c", "err", "p_min", "pid")
      // persist: the frame feeds TWO branches (total-min and the item
      // aggregate); unpersisted, the whole scan + SpaceSaving pass
      // would run twice — and a nondeterministically-ordered upstream
      // could give the two runs DIFFERENT summaries, mixing bounds
      // from different executions into one interval.  Bounded at
      // partitions x capacity rows.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Σ_p absentBound_p as a broadcast one-row frame (bounded agg)
    val totalMin = partials.select(col("pid"), col("p_min")).distinct()
      .agg(coalesce(sum(col("p_min")), lit(0L)).as("total_min"))
    partials.groupBy(col("item"))
      .agg(sum(col("c")).as("c_sum"),
        sum(col("c") - col("err")).as("n_lower"),
        sum(col("p_min")).as("mins_present"))
      .crossJoin(broadcast(totalMin))
      .select(col("item"), col("n_lower"),
        (col("c_sum") + (col("total_min") - col("mins_present"))).as("n_upper"))
      .orderBy(col("n_upper").desc, col("item"))
      .limit(k)
  }
}
