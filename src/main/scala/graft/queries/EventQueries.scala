package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / event-stream queries over `events` (FIXTURES.md §B).
  *
  * The reference carries timestamps but never consumes them (heatmap.py:33;
  * its year/month/day bucketing is dead code, heatmap.py:38–52) — these
  * queries make windowing, sessionization and JSON extraction real. Each is
  * the batch form of a Structured Streaming query; graft.streaming hosts the
  * incremental variants with watermarks (same logical semantics, verified in
  * StreamingSpec).
  *
  * Time determinism: all engine-to-oracle comparisons run on integer epoch
  * milliseconds (`unix_millis` / `epoch_ms` both truncate micros→ms) or on
  * formatted strings — never raw timestamp equality.
  */
object EventQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  private def cents(c: Column): Column = floor(c * 100)

  /** JSON decode (absent in the reference, which only ever encodes —
    * heatmap.py:129): extract props.k, bucket it, aggregate. */
  val jsonExtract = QuerySpec(
    "json_extract",
    "JSON field extraction + bucketed aggregation over events.props",
    // TRY_CAST + NULLS FIRST keep the oracle total over malformed props:
    // Spark's cast nulls non-numeric k and sorts NULLs first, while a plain
    // DuckDB CAST would hard-error and its default NULL ordering is LAST
    Some("""SELECT CAST(TRY_CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS BIGINT) AS k_bucket,
           |  CAST(COUNT(*) AS BIGINT) AS n_events,
           |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
           |FROM events GROUP BY k_bucket ORDER BY k_bucket NULLS FIRST""".stripMargin),
    (s, dir) =>
      events(s, dir)
        .groupBy((get_json_object(col("props"), "$.k").cast("long") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"))
        .orderBy("k_bucket"))

  /** The 30-MINUTE SESSION LAW has ONE definition — this CTE chain (oracle
    * side) and [[sessionized]] (Spark side) — shared by `events_sessionize`,
    * `events_trajectories`, and `win_session`'s oracle, so a change to the
    * gap constant or the (ms, event_id) tie-break cannot drift between
    * entries while each one's own gate stays green (the
    * DedupQueries.minhashPairsCtes convention). The chain carries
    * `event_type` through for the consumers that need it; the others
    * simply don't select it. */
  private[queries] val sessionCtes: String =
    """e AS (SELECT user_id, event_id, event_type, EPOCH_MS(ts) AS ms FROM events),
      |l AS (SELECT *, LAG(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS prev FROM e),
      |f AS (SELECT *, CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS is_new FROM l),
      |s AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM f)""".stripMargin

  /** Spark twin of [[sessionCtes]]: events with `(user_id, event_id,
    * event_type, ms, sess)` where `sess` is the per-user session index —
    * one user-keyed window pass; downstream per-(user, sess) aggregations
    * reuse its shuffle (sess is a function of the window's partition
    * key). */
  private[queries] def sessionized(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ms", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_millis(col("ts")).as("ms"))
      .withColumn("prev", lag(col("ms"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev").isNull || col("ms") - col("prev") > 1800000, 1).otherwise(0))
      .withColumn("sess", sum(col("is_new")).over(cum))
  }

  /** Sessionization with a 30-minute inactivity gap: lag → new-session flag →
    * running sum = session index; one window + one aggregation, both keyed by
    * user (scales: all state is per-user-partition). */
  val sessionize = QuerySpec(
    "events_sessionize",
    "30-min-gap sessionization via lag + cumulative sum",
    Some(s"""WITH $sessionCtes
           |SELECT user_id, CAST(sess AS BIGINT) AS session_idx,
           |  CAST(COUNT(*) AS BIGINT) AS n_events,
           |  CAST(MAX(ms) - MIN(ms) AS BIGINT) AS duration_ms,
           |  CAST(MIN(event_id) AS BIGINT) AS first_event
           |FROM s GROUP BY user_id, sess ORDER BY user_id, session_idx""".stripMargin),
    (s, dir) =>
      sessionized(s, dir)
        .groupBy(col("user_id"), col("sess").as("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("ms")) - min(col("ms"))).as("duration_ms"),
          min(col("event_id")).as("first_event"))
        .orderBy("user_id", "session_idx"))

  /** Tumbling 1-hour windows (Spark `window()`; oracle date_trunc). */
  val winTumbling = QuerySpec(
    "win_tumbling",
    "tumbling 1-hour window aggregation",
    Some("""SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           |  event_type,
           |  CAST(COUNT(*) AS BIGINT) AS n_events,
           |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, dir) =>
      events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"))
        .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n_events"), col("value_cents"))
        .orderBy("hour_start", "event_type"))

  /** Sliding windows (1 h size, 15 min slide) via exact epoch-ms arithmetic:
    * each event lands in exactly size/slide = 4 windows — the same window
    * assignment Spark's window(ts, size, slide) generates. */
  val winSliding = QuerySpec(
    "win_sliding",
    "sliding 1h/15min window aggregation via epoch-ms arithmetic",
    Some("""SELECT CAST(((EPOCH_MS(ts) // 900000) - k) * 900000 AS BIGINT) AS window_start_ms,
           |  CAST(COUNT(*) AS BIGINT) AS n_events
           |FROM events CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS k)
           |GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) =>
      events(s, dir)
        .select(unix_millis(col("ts")).as("ms"))
        .withColumn("k", explode(sequence(lit(0), lit(3))))
        .groupBy((((col("ms") - (col("ms") % 900000)) / 900000).cast("long") - col("k"))
          .*(lit(900000L)).as("window_start_ms"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy("window_start_ms"))

  /** Conversion funnel: each user's first signup, first purchase at-or-after
    * it, and whether conversion happened within 7 days. One aggregation +
    * one broadcast-size join — the funnel shape that scales (no per-user
    * event replay). */
  val funnel = QuerySpec(
    "events_funnel",
    "signup -> purchase conversion funnel (7-day window)",
    Some("""WITH s AS (
           |  SELECT user_id, MIN(EPOCH_MS(ts)) AS signup_ms FROM events
           |  WHERE event_type = 'signup' GROUP BY user_id),
           |p AS (SELECT user_id, EPOCH_MS(ts) AS pms FROM events WHERE event_type = 'purchase'),
           |conv AS (
           |  SELECT s.user_id, s.signup_ms, MIN(p.pms) AS first_purchase_ms
           |  FROM s LEFT JOIN p ON p.user_id = s.user_id AND p.pms >= s.signup_ms
           |  GROUP BY s.user_id, s.signup_ms)
           |SELECT user_id, signup_ms, first_purchase_ms,
           |  (first_purchase_ms - signup_ms) // 86400000 AS days_to_convert,
           |  COALESCE(first_purchase_ms - signup_ms <= 604800000, FALSE) AS converted_7d
           |FROM conv ORDER BY user_id""".stripMargin),
    (s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
      val signups = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ms")).as("signup_ms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ms").as("pms"))
      signups
        .join(purchases, col("p_user") === col("user_id") && col("pms") >= col("signup_ms"),
          "left")
        .groupBy(col("user_id"), col("signup_ms"))
        .agg(min(col("pms")).as("first_purchase_ms"))
        .select(col("user_id"), col("signup_ms"), col("first_purchase_ms"),
          expr("(first_purchase_ms - signup_ms) div 86400000").as("days_to_convert"),
          coalesce(col("first_purchase_ms") - col("signup_ms") <= 604800000L, lit(false))
            .as("converted_7d"))
        .orderBy("user_id")
    })

  /** Cohort retention: users grouped by first-seen week, activity counted
    * per week offset — the classic retention triangle. Weeks are integer
    * epoch-day-div-7 indices (pure integer arithmetic, engine-identical;
    * date_trunc('week') start-of-week conventions are NOT relied on).
    *
    * Plan shape at scale: NO join at all. `collect_set(wk)` per user (one
    * shuffle, map-side partial — per-user state is the set of distinct
    * active weeks, bounded by the calendar, not by event count) yields both
    * the cohort week (`array_min`) and the activity weeks to explode; the
    * triangle is then one plain count (user×week already distinct). The
    * earlier form joined events back to a per-user first-seen table with an
    * unconditional broadcast() — an O(users) table that would OOM the
    * driver at corpus scale. */
  val retention = QuerySpec(
    "events_retention",
    "cohort retention triangle: first-seen week x week offset x active users",
    Some("""WITH w AS (
           |  SELECT user_id, EPOCH_MS(ts) // 86400000 // 7 AS wk FROM events),
           |first AS (SELECT user_id, MIN(wk) AS cohort_wk FROM w GROUP BY user_id)
           |SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
           |  CAST(wk - cohort_wk AS BIGINT) AS week_offset,
           |  CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS active_users
           |FROM w JOIN first ON w.user_id = first.user_id
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    (s, dir) =>
      events(s, dir)
        .select(col("user_id"), expr("unix_millis(ts) div 86400000 div 7").as("wk"))
        .groupBy("user_id").agg(collect_set(col("wk")).as("wks"))
        .select(array_min(col("wks")).as("cohort_wk"), explode(col("wks")).as("wk"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(count(lit(1)).as("active_users"))
        .orderBy("cohort_wk", "week_offset"))

  /** Spark's BUILT-IN session_window in batch mode, checked against the
    * independent lag+cumulative-sum formulation (same 30-min gap as
    * [[sessionize]] — the two queries share one oracle family but disjoint
    * engine paths: sessionize exercises window functions, this exercises
    * the native session-window aggregation, whose end is defined as last
    * event + gap). */
  val winSession = QuerySpec(
    "win_session",
    "built-in session_window (30-min gap) vs lag/cumsum oracle",
    Some(s"""WITH $sessionCtes
           |SELECT user_id, CAST(MIN(ms) AS BIGINT) AS session_start_ms,
           |  CAST(MAX(ms) + 1800000 AS BIGINT) AS session_end_ms,
           |  CAST(COUNT(*) AS BIGINT) AS n_events
           |FROM s GROUP BY user_id, sess ORDER BY user_id, session_start_ms""".stripMargin),
    (s, dir) =>
      events(s, dir)
        // session_window merges at MICROSECOND precision while the oracle's
        // EPOCH_MS gaps are millisecond-truncated: a gap of 30min + 500µs
        // splits here but merges there. Truncate to ms first so both
        // engines decide every boundary identically (corpus timestamps
        // carry sub-ms components).
        .withColumn("ts_ms", timestamp_millis(unix_millis(col("ts"))))
        .groupBy(session_window(col("ts_ms"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("session_start_ms"),
          unix_millis(col("session_window.end")).as("session_end_ms"),
          col("n_events"))
        .orderBy("user_id", "session_start_ms"))

  /** CDC / changelog application — MERGE INTO semantics done Spark-first:
    * events are a change stream keyed by user_id ('error' = DELETE, anything
    * else = UPSERT of `value`), and the query materializes the
    * last-writer-wins snapshot. (ts, event_id) is a TOTAL order, so "last"
    * is unambiguous on any partitioning.
    *
    * Plan shape at scale: NOT a window. ROW_NUMBER over user partitions
    * sorts every user's full history; `max_by(payload, (ms, event_id))`
    * is an aggregate, so executors keep ONE candidate row per user and
    * map-side partial aggregation collapses each input partition before the
    * single shuffle — per-key state is O(1) regardless of history length,
    * the same reason the streaming twin can run this with
    * flatMapGroupsWithState. The oracle takes the window formulation — an
    * independent path to the same snapshot. Deleted keys (last op = error)
    * drop out, exactly like MERGE ... WHEN MATCHED AND op='delete' THEN
    * DELETE. */
  val cdcMerge = QuerySpec(
    "cdc_merge",
    "CDC changelog apply: last-writer-wins upsert/delete snapshot per key",
    Some("""WITH e AS (SELECT user_id, event_id, event_type, value, EPOCH_MS(ts) AS ms FROM events),
           |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
           |    ORDER BY ms DESC, event_id DESC) AS rn FROM e),
           |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ops,
           |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
           |  FROM e GROUP BY 1)
           |SELECT r.user_id AS user_id, r.event_type AS last_type, r.value AS last_value,
           |  CAST(r.ms AS BIGINT) AS last_ms, a.n_ops, a.n_deletes
           |FROM r JOIN a ON a.user_id = r.user_id
           |WHERE r.rn = 1 AND r.event_type <> 'error'
           |ORDER BY r.user_id""".stripMargin),
    (s, dir) =>
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          unix_millis(col("ts")).as("ms"))
        .groupBy("user_id")
        .agg(
          max_by(struct(col("event_type"), col("value"), col("ms")),
            struct(col("ms"), col("event_id"))).as("last"),
          count(lit(1)).as("n_ops"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_deletes"))
        .filter(col("last.event_type") =!= "error")
        .select(col("user_id"), col("last.event_type").as("last_type"),
          col("last.value").as("last_value"), col("last.ms").as("last_ms"),
          col("n_ops"), col("n_deletes"))
        .orderBy("user_id"))

  /** SCD2 (type-2 slowly-changing-dimension) history build — the TEMPORAL
    * twin of [[cdcMerge]]: where cdc_merge keeps only the latest state per
    * key, SCD2 keeps EVERY version with its validity interval, the shape
    * warehouses store for as-of-time joins and audits. Each upsert opens a
    * version valid [ms, next-event ms); a delete ('error') closes the prior
    * version without opening one (hard-delete semantics — a deleted key has
    * no current row); the last open version has NULL valid_to and
    * is_current = true.
    *
    * Plan shape: BOTH windows (the valid_to LEAD over all events and the
    * version ROW_NUMBER over surviving upserts) share the same
    * (user_id) partitioning and (ms, event_id) ordering, and the filter
    * between them preserves both — so the whole history builds in ONE
    * shuffle + ONE sort (PlanSpec-pinned), exactly the cost of cdc_merge's
    * aggregation. (ms, event_id) is a unique total order, so intervals are
    * deterministic under ties. */
  val cdcScd2 = QuerySpec(
    "cdc_scd2",
    "SCD2 version history: validity intervals per key from the CDC log",
    Some("""WITH e AS (SELECT user_id, event_id, event_type, value, EPOCH_MS(ts) AS ms FROM events),
           |v AS (SELECT *, LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS next_ms FROM e),
           |u AS (SELECT user_id, event_type, value, ms, next_ms,
           |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ms, event_id) AS version_no
           |  FROM v WHERE event_type <> 'error')
           |SELECT user_id, CAST(version_no AS BIGINT) AS version_no,
           |  event_type AS attr_type, value AS attr_value,
           |  CAST(ms AS BIGINT) AS valid_from_ms,
           |  CAST(next_ms AS BIGINT) AS valid_to_ms,
           |  next_ms IS NULL AS is_current
           |FROM u ORDER BY user_id, version_no""".stripMargin),
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ms", "event_id")
      events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
          unix_millis(col("ts")).as("ms"))
        .withColumn("next_ms", lead(col("ms"), 1).over(w))
        .filter(col("event_type") =!= "error")
        .withColumn("version_no", row_number().over(w).cast("long"))
        .select(col("user_id"), col("version_no"),
          col("event_type").as("attr_type"), col("value").as("attr_value"),
          col("ms").as("valid_from_ms"), col("next_ms").as("valid_to_ms"),
          col("next_ms").isNull.as("is_current"))
        .orderBy("user_id", "version_no")
    })

  /** First-order Markov TRANSITION MATRIX over each user's event stream —
    * the behavioral fingerprint next to the funnel/retention pair: which
    * state follows which, with transition rates in exact ppm. One
    * corpus-sized window (lag per user — the sessionize shuffle class)
    * collapses immediately to the ≤ types² pair table; the per-from-state
    * totals join back within that bounded table. Each user's FIRST event
    * has no predecessor and is excluded, identically in both engines. */
  val eventsTransitions = QuerySpec(
    "events_transitions",
    "per-user event-type transition matrix with exact ppm rates",
    Some("""WITH e AS (SELECT user_id, event_type, EPOCH_MS(ts) AS ms, event_id FROM events),
           |l AS (SELECT event_type AS to_state,
           |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS from_state
           |  FROM e),
           |p AS (SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
           |  FROM l WHERE from_state IS NOT NULL GROUP BY 1, 2),
           |t AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS from_total FROM p GROUP BY 1)
           |SELECT p.from_state, p.to_state, p.n, t.from_total,
           |  (1000000 * p.n) // t.from_total AS ppm
           |FROM p JOIN t USING (from_state)
           |ORDER BY p.from_state, p.to_state""".stripMargin),
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
      val p = events(s, dir)
        .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"),
          col("event_id"))
        .select(col("event_type").as("to_state"),
          lag("event_type", 1).over(w).as("from_state"))
        .filter(col("from_state").isNotNull)
        .groupBy("from_state", "to_state")
        .agg(count(lit(1)).as("n"))
      val t = p.groupBy("from_state").agg(sum("n").as("from_total"))
      p.join(broadcast(t), "from_state")
        .select(col("from_state"), col("to_state"), col("n"), col("from_total"),
          expr("(1000000 * n) div from_total").as("ppm"))
        .orderBy("from_state", "to_state")
    })

  /** LAST-TOUCH CHANNEL ATTRIBUTION — the reporting form of the as-of
    * join: every purchase is attributed to the event TYPE of its user's
    * most recent prior non-purchase touch, stale touches (> 30 days)
    * falling to 'organic', then rolled up to the bounded per-channel
    * conversion/revenue report a marketing team reads. The attribution
    * itself is [[graft.operators.AsOfJoin]]'s one linear union+window
    * shuffle (never a range join); the rollup is ≤ channels+1 rows.
    * Same-millisecond touches are visible to the purchase (the as-of
    * "at-or-before" contract), mirrored by the oracle's side ordering. */
  val eventsAttribution = QuerySpec(
    "events_attribution",
    "last-touch attribution: purchases credited to the latest prior touch channel",
    Some("""WITH l AS (SELECT event_id, user_id, EPOCH_MS(ts) AS ms,
           |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
           |  FROM events WHERE event_type = 'purchase'),
           |r AS (SELECT user_id, event_type AS channel, EPOCH_MS(ts) AS ms
           |  FROM events WHERE event_type <> 'purchase'),
           |u AS (
           |  SELECT user_id, ms, 1 AS side, cents,
           |    CAST(NULL AS VARCHAR) AS channel, CAST(NULL AS BIGINT) AS rms FROM l
           |  UNION ALL
           |  SELECT user_id, ms, 0, CAST(NULL AS BIGINT), channel, ms FROM r),
           |wdw AS (SELECT user_id, ms, side, cents,
           |    LAST_VALUE(channel IGNORE NULLS) OVER w AS channel,
           |    LAST_VALUE(rms IGNORE NULLS) OVER w AS touch_ms
           |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ms, side
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           |a AS (SELECT CASE WHEN touch_ms IS NOT NULL AND ms - touch_ms <= 2592000000
           |      THEN channel ELSE 'organic' END AS channel, cents
           |  FROM wdw WHERE side = 1)
           |SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conversions,
           |  CAST(SUM(cents) AS BIGINT) AS value_cents
           |FROM a GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      val ev = events(s, dir).select(col("event_id"), col("user_id"),
        col("event_type"), col("value"), unix_millis(col("ts")).as("ms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ms"),
          cents(col("value")).cast("long").as("cents"))
      val touches = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("event_type").as("channel"),
          col("ms").as("touch_ms"))
      graft.operators.AsOfJoin.joinAsOf(purchases, touches, key = "user_id",
        leftTime = "ms", rightTime = "touch_ms",
        rightCols = Seq("channel", "touch_ms"),
        tolerance = Some(30L * 24 * 3600 * 1000))
        .select(coalesce(col("channel"), lit("organic")).as("channel"),
          col("cents"))
        .groupBy("channel")
        .agg(count(lit(1)).as("n_conversions"), sum("cents").as("value_cents"))
        .orderBy("channel")
    })

  /** TRAJECTORY EXPORT — the event log serialized into per-session ordered
    * action sequences: the training-document shape for behavioral /
    * agent-trajectory modeling (each session becomes one sequence sample,
    * the event-stream analog of `corpus_pack`'s doc→sequence stage). Uses
    * the SAME 30-min session law as `events_sessionize`; the sequence is
    * the '>'-joined event types in (ms, event_id) order — a deterministic
    * total order both engines reproduce exactly.
    *
    * Scale shape: the sessionize window and the sequence aggregation share
    * ONE user-keyed shuffle (the second groupBy's keys are a function of
    * the window's partition key, so no re-exchange); collect_list is
    * bounded by session length — a per-user-session payload, the same
    * bound class as hm_blobs' per-tile maps, never corpus-sized. */
  val eventsTrajectories = QuerySpec(
    "events_trajectories",
    "per-session ordered action sequences: the trajectory training-sample export",
    Some(s"""WITH $sessionCtes
           |SELECT user_id, CAST(sess AS BIGINT) AS session_idx,
           |  STRING_AGG(event_type, '>' ORDER BY ms, event_id) AS trajectory,
           |  CAST(COUNT(*) AS BIGINT) AS n_steps,
           |  CAST(MAX(ms) - MIN(ms) AS BIGINT) AS duration_ms
           |FROM s GROUP BY user_id, sess ORDER BY user_id, session_idx""".stripMargin),
    (s, dir) => {
      sessionized(s, dir)
        .groupBy(col("user_id"), col("sess").as("session_idx"))
        .agg(
          array_join(transform(
            array_sort(collect_list(struct(col("ms"), col("event_id"), col("event_type")))),
            e => e.getField("event_type")), ">").as("trajectory"),
          count(lit(1)).as("n_steps"),
          (max(col("ms")) - min(col("ms"))).as("duration_ms"))
        .orderBy("user_id", "session_idx")
    })

  val all: Seq[QuerySpec] = Seq(jsonExtract, sessionize, winTumbling, winSliding,
    funnel, retention, winSession, cdcMerge, cdcScd2, eventsTransitions,
    eventsAttribution, eventsTrajectories)
}
