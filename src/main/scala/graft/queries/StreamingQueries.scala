package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.streaming.StreamingOps

/** Oracle-checked STREAMING executions — unlike graft.streaming's unit
  * coverage (StreamingSpec asserts batch/streaming parity on fixtures),
  * these entries run a real Structured Streaming query to completion inside
  * the driver's correctness gate, so the incremental engine path itself is
  * DuckDB-verified, not just its batch twin.
  */
object StreamingQueries {

  /** [[StreamingOps.tumblingCounts]] executed as an actual stream: the
    * events parquet is replayed through a file stream source (every file is
    * a micro-batch trigger unit — the same listing-based split a production
    * log directory gets), the watermarked tumbling aggregation runs
    * incrementally, and the COMPLETE-mode memory sink holds the final state,
    * which must match the same aggregation DuckDB computes over the table at
    * rest. Complete mode keeps every window — the stream-vs-batch row sets
    * coincide exactly, watermark or no — and the memory sink is only ever
    * asked for a FINISHED query's result (processAllAvailable + stop), so
    * the comparison is deterministic. */
  val streamTumbling = QuerySpec(
    "stream_tumbling",
    "tumbling 1-hour windows computed by a real streaming execution",
    Some("""SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           |  event_type,
           |  CAST(COUNT(*) AS BIGINT) AS n_events
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, dir) => {
      // schema discovery must go through Tables (events.ts is parquet
      // TIMESTAMP(NANOS) — nanosAsLong + truncate-to-micros, like DuckDB)
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawSchema = s.read.parquet(s"$dir/events.parquet").schema
      // the corpus table is a single parquet FILE; the file stream source
      // accepts files only via glob patterns (a literal path must be a
      // directory), so quote one character to force glob handling
      val raw = s.readStream.schema(rawSchema)
        .parquet(s"$dir/events.parque[t]")
      val events =
        if (rawSchema.exists(f => f.name == "ts" && f.dataType == LongType))
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        else raw

      val sinkName = "stream_tumbling_sink"
      val q = StreamingOps.tumblingCounts(events)
        .writeStream.format("memory").queryName(sinkName)
        .outputMode("complete")
        .start()
      try {
        q.processAllAvailable()
        require(q.exception.isEmpty, s"streaming query failed: ${q.exception}")
      } finally q.stop()

      s.table(sinkName)
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n_events"))
        .orderBy("hour_start", "event_type")
    })

  val all: Seq[QuerySpec] = Seq(streamTumbling)
}
