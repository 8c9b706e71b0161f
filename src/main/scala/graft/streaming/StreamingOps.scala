package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TileFunctions

/** Structured Streaming operators: the streaming siblings of the batch
  * queries (EventQueries / HeatmapQueries share the same logical semantics).
  *
  * The reference is batch-only — its entry point is literally named
  * `batchMain` (heatmap.py:152), implying a streaming sibling that was never
  * written; its timespan bucketing is dead code (heatmap.py:38–52). Here the
  * same pipeline runs incrementally: readStream → filter/quantize/fan-out →
  * watermarked windowed aggregation → sink, with state bounded by the
  * watermark.
  *
  * Scale notes: streaming aggregation state is partitioned by group key
  * exactly like the batch shuffle; the watermark bounds state size (late
  * events beyond 1h are dropped); `foreachBatch`/parquet sinks give
  * exactly-once via checkpointing. The custom-state sessionizer keeps one
  * small record per active (user) key and emits on event-time timeout.
  */
object StreamingOps {

  /** Event row shape for typed streaming ops (events.parquet schema). */
  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long)

  /** Watermarked tumbling-window counts per event type (streaming form of
    * EventQueries.winTumbling). */
  def tumblingCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** The reference pipeline as a stream: filter (heatmap.py:28 analog),
    * Mercator quantization, user-group fan-out (heatmap.py:62–70), windowed
    * counts per tile. One watermarked aggregation; per-zoom rollups derive
    * downstream exactly like the batch pyramid. */
  def streamingHeatmap(events: DataFrame, zoom: Int, lat: Column, lon: Column,
      perUser: Column, window_ : String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .filter(col("event_type") =!= "view")
      .select(col("ts"), lat.as("lat"), lon.as("lon"), perUser.as("per_user"))
      .withColumn("user_group", explode(array(lit("all"), col("per_user"))))
      .filter(col("user_group").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("user_group"),
        TileFunctions.tileId(col("lat"), col("lon"), zoom).as("tile_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("user_group"),
        col("tile_id"), col("cnt"))

  /** Streaming deduplication: drop replayed events by id, with state
    * bounded by the watermark (an id older than the watermark can no longer
    * collide, so its state is dropped — the streaming sibling of the batch
    * dedup family; at 100 TB the state store holds one key per id inside
    * the lateness horizon, not the full history). */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Built-in session windows (30-min gap) — the declarative sessionizer. */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n_events"))

  /** Custom stateful sessionizer via flatMapGroupsWithState: one
    * (start, end, count) record per active user; emits a Session when the
    * 30-min gap elapses in event time. Demonstrates arbitrary state where
    * session_window's fixed semantics don't fit (e.g. value-dependent gaps). */
  def sessionizeStateful(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[Session] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Long, Long), Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[(Long, Long, Long)]) =>
          if (rows.isEmpty && state.hasTimedOut) {
            val (start, end, n) = state.get
            state.remove()
            Iterator.single(Session(userId, start, end, n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var emitted = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some((start, end, n)) if t - end <= gapMs =>
                  cur = Some((start, math.max(end, t), n + 1))
                case Some((start, end, n)) =>
                  emitted ::= Session(userId, start, end, n)
                  cur = Some((t, t, 1L))
                case None =>
                  cur = Some((t, t, 1L))
              }
            }
            cur.foreach { c =>
              state.update(c)
              state.setTimeoutTimestamp(c._2 + gapMs)
            }
            emitted.reverseIterator
          }
      }
  }
}
