package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured-Streaming extension (beyond-reference; SURVEY.md §2.9):
  * the reference is batch-only, but the driver corpus ships a
  * stream-shaped `events` table, so the engine exposes the standard
  * event-time toolkit — watermarked tumbling/sliding/session windows
  * and within-watermark dedup.  All builders are sink-agnostic: they
  * transform a (possibly streaming) DataFrame, so the same code path
  * serves batch backfill and live streams.
  */
object EventStreams {

  /** Tumbling event-time window aggregation with watermark. */
  def tumbling(events: DataFrame, ts: String, watermark: String, width: String,
               keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events
      .withWatermark(ts, watermark)
      .groupBy(window(col(ts), width) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding windows: width + slide interval. */
  def sliding(events: DataFrame, ts: String, watermark: String, width: String, slide: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events
      .withWatermark(ts, watermark)
      .groupBy(window(col(ts), width, slide) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows with an inactivity gap (closest analog to a
    * user-session rollup over `events.user_id`). */
  def sessions(events: DataFrame, ts: String, watermark: String, gap: String,
               keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events
      .withWatermark(ts, watermark)
      .groupBy(session_window(col(ts), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Exactly-once-flavored dedup on an id column, bounded by the
    * watermark so state does not grow forever (the streaming analog of
    * [[graft.operators.Dedup.exact]]). */
  def dedupWithinWatermark(events: DataFrame, ts: String, watermark: String,
                           idCols: Seq[String]): DataFrame =
    events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(idCols)

  /** Custom stateful processing: running per-key count + running sum
    * maintained in explicit state via flatMapGroupsWithState — the
    * escape hatch for session logic the built-in windows can't express
    * (per SURVEY.md §2.9 the reference has nothing comparable; this is
    * the engine's `KeyValueGroupedDataset` surface). */
  def runningTotals(events: org.apache.spark.sql.Dataset[(Long, Double)]):
      org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.Encoders
    implicit val stateEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Double)], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          Iterator((key, n, s))
      }
  }
}
