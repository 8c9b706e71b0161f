package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Data-quality / migration-validation operators — the first thing a user
  * switching engines (the library's whole premise) has to run: prove the
  * new engine holds the SAME table, and profile it column by column.
  *
  *   - `dq_checksum`: order-independent table fingerprints per group. The
  *     fingerprint layers row count + two modular hash sums + hash min/max;
  *     a single changed/dropped/duplicated row moves at least the sums
  *     (and usually all five). Sums are taken over `h48 % p` (p ≈ 1e5), so
  *     the BIGINT accumulator is exact up to ~9×10¹³ rows per group — a
  *     plain SUM(h48) would overflow 2⁶³ at ~33k rows (h48 < 2^48), the
  *     kind of silent wrap a fingerprint must not have. (DuckDB SUM
  *     promotes to HUGEINT — the overflow would also be a cross-engine
  *     divergence, not just a wrap.)
  *   - `dq_profile`: per-column null/distinct/min/max profile, one row per
  *     column via a unioned aggregate — each branch is a partial-agg-
  *     friendly single pass; Catalyst unions them into one scan per branch
  *     with no shuffle beyond the final 1-row-per-branch exchange.
  *
  * Both are exact, engine-neutral arithmetic (the portable MD5-prefix hash,
  * integer mods, binary string comparison) — the same determinism contract
  * as the dedup family.
  */
object DataQualityQueries {

  private val P1 = 100003L
  private val P2 = 99991L

  private val canonicalSql =
    "CONCAT_WS('|', CAST(event_id AS VARCHAR), CAST(user_id AS VARCHAR), " +
      "event_type, CAST(EPOCH_US(ts) AS VARCHAR))"

  val dqChecksum = QuerySpec(
    "dq_checksum",
    "order-independent per-group table fingerprint (count + modular hash sums + extrema)",
    Some(s"""WITH h AS (
            |  SELECT event_type,
            |    ${PortableHash.h48Sql(canonicalSql)} AS h
            |  FROM events)
            |SELECT event_type,
            |  CAST(COUNT(*) AS BIGINT) AS n_rows,
            |  CAST(SUM(h % $P1) AS BIGINT) AS chk1,
            |  CAST(SUM(h % $P2) AS BIGINT) AS chk2,
            |  MIN(h) AS h_min, MAX(h) AS h_max
            |FROM h GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) => {
      val canonical = concat_ws("|",
        col("event_id").cast("string"), col("user_id").cast("string"),
        col("event_type"), unix_micros(col("ts")).cast("string"))
      Tables(s, dir, "events")
        .select(col("event_type"), PortableHash.h48(canonical).as("h"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("h") % P1).as("chk1"),
          sum(col("h") % P2).as("chk2"),
          min(col("h")).as("h_min"), max(col("h")).as("h_max"))
        .orderBy("event_type")
    })

  /** Columns profiled; (name, is-numeric) — min/max render as strings so
    * one schema fits every column. */
  private val ProfileCols = Seq("doc_id", "lang", "source", "n_chars")

  val dqProfile = QuerySpec(
    "dq_profile",
    "per-column profile: rows, nulls, distinct count, min/max",
    Some(ProfileCols.map(c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_null,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_val,
         |  CAST(MAX($c) AS VARCHAR) AS max_val
         |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
    (s, dir) => {
      // ONE scan for the whole profile (a per-column union would scan the
      // table once per column — 4× the IO at 100 TB): every column's five
      // aggregates compute in a single Aggregate (the multiple
      // count-distincts plan as one Expand ×4, still one pass over the
      // data), then the 1-row result unpivots to a row per column
      val docs = Tables(s, dir, "documents")
      val aggs = ProfileCols.flatMap { c =>
        Seq(count(lit(1)).as(s"${c}__n"),
          (count(lit(1)) - count(col(c))).as(s"${c}__nn"),
          countDistinct(col(c)).as(s"${c}__nd"),
          min(col(c)).cast("string").as(s"${c}__mn"),
          max(col(c)).cast("string").as(s"${c}__mx"))
      }
      val one = docs.agg(aggs.head, aggs.tail: _*)
      one.select(explode(array(ProfileCols.map(c =>
        struct(lit(c).as("col_name"), col(s"${c}__n").as("n_rows"),
          col(s"${c}__nn").as("n_null"), col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__mn").as("min_val"), col(s"${c}__mx").as("max_val"))): _*))
        .as("p"))
        .select(col("p.*"))
        .orderBy("col_name")
    })

  /** Grouped anomaly detection with EXACT integer arithmetic — flag users
    * whose per-type event count sits more than 2 standard deviations above
    * their type's mean (the abnormal-activity / bot-traffic screen every
    * event pipeline runs before trusting its data).
    *
    * Float mean/stddev are order-dependent under distributed summation, so
    * the 2σ test is algebraically cleared of division and floats:
    *
    *   (x − S/n)² > 4·(n·S2 − S²)/n²   ⇔   (n·x − S)² > 4·(n·S2 − S²)
    *
    * with S = Σx, S2 = Σx² per group — pure BIGINT, identical on any
    * engine, any partitioning. Overflow headroom: |n·x| must stay under
    * ~3×10⁹ (counts here are ≤ 10²; even 10⁸ users × 10-digit counts
    * needs only a demean-per-group or DECIMAL(38) upgrade, documented not
    * silent — DuckDB would promote to HUGEINT while Spark wraps, so a wrap
    * is also a cross-engine divergence the gate would catch).
    *
    * Plan shape at scale: two aggregations (user-counts, then 5-row group
    * moments) + a broadcast of the moments back onto the counts — the
    * detection predicate is a codegen'd filter, no second pass over raw
    * events. */
  val dqAnomaly = QuerySpec(
    "dq_anomaly",
    "activity anomaly: users > 2 sigma above their event-type mean (integer-exact)",
    Some("""WITH c AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_events
           |  FROM events GROUP BY 1, 2),
           |s AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
           |    CAST(SUM(n_events) AS BIGINT) AS s, CAST(SUM(n_events * n_events) AS BIGINT) AS s2
           |  FROM c GROUP BY 1)
           |SELECT c.event_type, c.user_id, c.n_events, s.n_users,
           |  s.n_users * c.n_events - s.s AS dev_num
           |FROM c JOIN s ON s.event_type = c.event_type
           |WHERE (s.n_users * c.n_events - s.s) * (s.n_users * c.n_events - s.s)
           |    > 4 * (s.n_users * s.s2 - s.s * s.s)
           |  AND s.n_users * c.n_events > s.s
           |ORDER BY c.event_type, c.user_id""".stripMargin),
    (s, dir, scope) => {
      // persisted (scope-owned): the (type, user) counts feed the moments
      // aggregation AND the detection join — without the cache the raw-
      // events aggregation runs twice
      val c = scope.track(Tables(s, dir, "events")
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("n_events")))
      // one row per event type: bounded by the type enum, broadcast is
      // structurally safe (like nation/region)
      val stats = broadcast(c.groupBy("event_type").agg(
        count(lit(1)).as("n_users"),
        sum(col("n_events")).as("s"),
        sum(col("n_events") * col("n_events")).as("s2")))
      c.join(stats, "event_type")
        .filter(expr("(n_users * n_events - s) * (n_users * n_events - s) > 4 * (n_users * s2 - s * s)") &&
          col("n_users") * col("n_events") > col("s"))
        .select(col("event_type"), col("user_id"), col("n_events"), col("n_users"),
          (col("n_users") * col("n_events") - col("s")).as("dev_num"))
        .orderBy("event_type", "user_id")
    })

  /** EVENT-TIME COMPLETENESS / gap detection — the freshness check a
    * pipeline team runs on an arriving log: which HOURS inside the
    * stream's observed span produced zero events (an upstream outage, a
    * stuck producer, a dropped partition), reported as consecutive-run
    * GAPS (gaps-and-islands), not per-hour noise. Scoped to one event
    * class ('purchase' — the sparse business stream where a silent gap
    * costs money; the full firehose masks per-class outages).
    *
    * Scale shape: the expected-hour spine is `sequence()` off the 1-row
    * global min/max aggregate — its size is the SPAN (8760 rows/year),
    * independent of data volume — and the actual-hours side partial-
    * aggregates to the same bound before the anti-join, so the only
    * corpus-sized work is one map-side scan into a bounded groupBy. The
    * islands window orders ≤ span rows on one partition — bounded by
    * construction, the same justification as the budget histogram. */
  val dqGaps = QuerySpec(
    "dq_gaps",
    "event-time completeness: zero-event hour runs inside the observed span",
    Some("""WITH e AS (SELECT ts FROM events WHERE event_type = 'purchase'),
           |b AS (SELECT DATE_TRUNC('hour', MIN(ts)) AS h0,
           |    DATE_TRUNC('hour', MAX(ts)) AS h1 FROM e),
           |ex AS (SELECT UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS hr FROM b),
           |ac AS (SELECT DISTINCT DATE_TRUNC('hour', ts) AS hr FROM e),
           |mi AS (SELECT ex.hr FROM ex LEFT JOIN ac ON ac.hr = ex.hr
           |  WHERE ac.hr IS NULL),
           |r AS (SELECT hr, EPOCH_MS(hr) // 3600000
           |    - ROW_NUMBER() OVER (ORDER BY hr) AS grp FROM mi)
           |SELECT STRFTIME(MIN(hr), '%Y-%m-%d %H:%M:%S') AS gap_start,
           |  STRFTIME(MAX(hr), '%Y-%m-%d %H:%M:%S') AS gap_end,
           |  CAST(COUNT(*) AS BIGINT) AS n_hours
           |FROM r GROUP BY grp ORDER BY 1""".stripMargin),
    (s, dir) => {
      val e = Tables(s, dir, "events")
        .filter(col("event_type") === "purchase").select(col("ts"))
      val bounds = e.agg(date_trunc("hour", min("ts")).as("h0"),
        date_trunc("hour", max("ts")).as("h1"))
      val expected = bounds
        .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hr"))
      val actual = e.groupBy(date_trunc("hour", col("ts")).as("hr")).count()
      val w = org.apache.spark.sql.expressions.Window.orderBy("hr")
      expected.join(actual, Seq("hr"), "left_anti")
        .withColumn("grp",
          (unix_millis(col("hr")) / 3600000L) - row_number().over(w))
        .groupBy("grp")
        .agg(date_format(min("hr"), "yyyy-MM-dd HH:mm:ss").as("gap_start"),
          date_format(max("hr"), "yyyy-MM-dd HH:mm:ss").as("gap_end"),
          count(lit(1)).as("n_hours"))
        .select(col("gap_start"), col("gap_end"), col("n_hours"))
        .orderBy("gap_start")
    })

  /** Score-distribution DRIFT between two corpus versions — the monitoring
    * twin of `corpus_diff`: that entry answers "which DOCS changed status",
    * this one answers "did the corpus DISTRIBUTION move" (the PSI-style
    * check a data team alerts on when a new crawl shifts quality mass).
    * Versions follow corpus_diff's convention: v1 = the deterministic
    * `doc_id % 5 <> 4` slice (yesterday), v2 = the full table.
    *
    * Shape: one corpus scan computes the quality band (score div 100 ∈
    * 0..10) and aggregates BOTH versions' counts in the same pass
    * (conditional aggregation — v1 membership is a row predicate, so no
    * second scan); ≤ 11 band rows cross the shuffle map-side combined, the
    * static band spine left-joins the bounded table, totals broadcast
    * back. Per band: counts, parts-per-million rates, and an integer
    * log-likelihood-ratio via [[graft.functions.TextFunctions.intLog2]]
    * on +1-smoothed products (llr ≈ log2(p2/p1) within ±1 bit; products
    * < 2^62 through ~10^9-doc versions, past which production shifts to
    * float logs). drift_ppm_bits = (ppm_v2 − ppm_v1) · llr_bits is the
    * PSI-style per-band contribution: both factors share sign direction,
    * so mass moving INTO a band and mass moving OUT both contribute
    * positively (up to the ±1-bit floor-log edge, which is deterministic
    * on both engines). */
  val dqDrift = QuerySpec(
    "dq_drift",
    "PSI-style quality-score distribution drift between two corpus versions",
    Some {
      import graft.functions.TextFunctions.intLog2Sql
      s"""WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents),
         |sc AS (SELECT doc_id, ${graft.functions.TextFunctions.qualityScoreSql} // 100 AS band FROM t),
         |ag AS (SELECT band, SUM(CASE WHEN doc_id % 5 <> 4 THEN 1 END) AS c1,
         |    COUNT(*) AS c2 FROM sc GROUP BY band),
         |bc AS (SELECT sp.band, CAST(COALESCE(ag.c1, 0) AS BIGINT) AS n_v1,
         |    CAST(COALESCE(ag.c2, 0) AS BIGINT) AS n_v2
         |  FROM (SELECT UNNEST(GENERATE_SERIES(0, 10)) AS band) sp
         |  LEFT JOIN ag ON ag.band = sp.band),
         |tot AS (SELECT CAST(SUM(n_v1) AS BIGINT) AS t1,
         |    CAST(SUM(n_v2) AS BIGINT) AS t2 FROM bc),
         |x AS (SELECT band, n_v1, n_v2,
         |    (1000000 * n_v1) // t1 AS ppm_v1, (1000000 * n_v2) // t2 AS ppm_v2,
         |    ${intLog2Sql("(n_v2 + 1) * (t1 + 11)")}
         |      - ${intLog2Sql("(n_v1 + 1) * (t2 + 11)")} AS llr_bits
         |  FROM bc CROSS JOIN tot)
         |SELECT CAST(band AS BIGINT) AS band, n_v1, n_v2,
         |  CAST(ppm_v1 AS BIGINT) AS ppm_v1, CAST(ppm_v2 AS BIGINT) AS ppm_v2,
         |  CAST(llr_bits AS BIGINT) AS llr_bits,
         |  CAST((ppm_v2 - ppm_v1) * llr_bits AS BIGINT) AS drift_ppm_bits
         |FROM x ORDER BY band""".stripMargin
    },
    (s, dir) => {
      import graft.functions.TextFunctions
      val sc = Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.qualityScore(TextFunctions.words(col("text"))).as("score"))
        .select(col("doc_id"), expr("score div 100").as("band"))
      val ag = sc.groupBy("band").agg(
        sum(when(col("doc_id") % 5 =!= 4, 1L)).as("c1"),
        count(lit(1)).as("c2"))
      driftPublish(s, ag)
    })

  /** Drift PUBLICATION math — band spine, totals, ppm rates, integer LLR,
    * per-band PSI contribution — over a `(band, c1, c2)` count table. ONE
    * definition shared by `dq_drift` (batch counts) and `stream_drift`
    * (the same counts maintained by a streaming aggregation), so the two
    * execution modes cannot drift from each other. `ag` is bounded (≤ 11
    * band rows), so everything here is spine-join + broadcast arithmetic. */
  private[queries] def driftPublish(s: SparkSession,
      ag: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextFunctions
    val bc = s.range(11).toDF("band")
      .join(ag, Seq("band"), "left")
      .select(col("band"), coalesce(col("c1"), lit(0L)).as("n_v1"),
        coalesce(col("c2"), lit(0L)).as("n_v2"))
    val tot = bc.agg(sum("n_v1").as("t1"), sum("n_v2").as("t2"))
    bc.crossJoin(broadcast(tot))
      .select(col("band"), col("n_v1"), col("n_v2"),
        expr("(1000000 * n_v1) div t1").as("ppm_v1"),
        expr("(1000000 * n_v2) div t2").as("ppm_v2"),
        (TextFunctions.intLog2((col("n_v2") + 1) * (col("t1") + 11))
          - TextFunctions.intLog2((col("n_v1") + 1) * (col("t2") + 11)))
          .as("llr_bits"))
      .withColumn("drift_ppm_bits", (col("ppm_v2") - col("ppm_v1")) * col("llr_bits"))
      .orderBy("band")
  }

  /** Per-stream FRESHNESS — the staleness check `dq_gaps` doesn't cover:
    * gaps find silent hours INSIDE the span, freshness asks whether each
    * logical stream (event_type here — the bounded producer key) is still
    * CURRENT relative to the corpus watermark. A producer that died
    * yesterday shows no new gap rows until the span is re-read, but its
    * lag vs max(ts) grows every hour — this is the alert a data team pages
    * on. One scan partial-aggregates to ≤ n_types rows (count + max ms per
    * type), the global watermark is the 1-row max over THAT bounded table
    * (not a second corpus pass), and it broadcasts back. Integer epoch-ms
    * arithmetic throughout; the stale flag fires at 24h lag. */
  val dqFreshness = QuerySpec(
    "dq_freshness",
    "per-event-type freshness: lag vs corpus watermark + 24h stale flag",
    Some("""WITH a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           |    CAST(MAX(EPOCH_MS(ts)) AS BIGINT) AS last_ms
           |  FROM events GROUP BY 1),
           |g AS (SELECT MAX(last_ms) AS max_ms FROM a)
           |SELECT event_type, n_events, last_ms,
           |  CAST((g.max_ms - last_ms) // 3600000 AS BIGINT) AS lag_hours,
           |  (g.max_ms - last_ms) // 3600000 >= 24 AS is_stale
           |FROM a CROSS JOIN g ORDER BY event_type""".stripMargin),
    (s, dir) => {
      val a = Tables(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          max(unix_millis(col("ts"))).as("last_ms"))
      val g = a.agg(max("last_ms").as("max_ms"))
      a.crossJoin(broadcast(g))
        .select(col("event_type"), col("n_events"), col("last_ms"),
          expr("(max_ms - last_ms) div 3600000").as("lag_hours"))
        .withColumn("is_stale", col("lag_hours") >= 24)
        .orderBy("event_type")
    })

  /** One referential-integrity audit branch: child.fk → parent.pk.
    *
    * Scale shape: the child side pre-aggregates to ONE ROW PER DISTINCT FK
    * (map-side combined) before anything joins — the anti-join then carries
    * |distinct keys| rows, not |child| rows (lineitem→orders at 100 TB is
    * billions of rows but only ~1/4 as many distinct order keys, and the
    * join degrades gracefully however the ratio moves). The parent side is
    * a pruned single-column distinct. Constant-size parents (nation) take
    * an unconditional broadcast, growing parents the measured
    * [[Broadcasting.maybeBroadcast]] guard. NULL FKs follow SQL FK
    * semantics — never orphans — but are REPORTED (`n_null`) from the same
    * single child scan (the null group of the per-key aggregate). */
  private def fkAudit(name: String, child: DataFrame,
      fk: String, parent: DataFrame, pk: String,
      constParent: Boolean): DataFrame = {
    val keyed = child.groupBy(col(fk).as("fk")).agg(count(lit(1)).as("n"))
    val pkeys = parent.select(col(pk).as("fk")).distinct()
    val psmall = if (constParent) broadcast(pkeys)
      else Broadcasting.maybeBroadcast(pkeys)
    val orphans = keyed.filter(col("fk").isNotNull)
      .join(psmall, Seq("fk"), "left_anti")
    val tot = keyed.agg(
      coalesce(sum(when(col("fk").isNotNull, col("n"))), lit(0L)).as("child_rows"),
      count(col("fk")).as("child_keys"),
      coalesce(sum(when(col("fk").isNull, col("n"))), lit(0L)).as("n_null"))
    val orph = orphans.agg(coalesce(sum("n"), lit(0L)).as("orphan_rows"),
      count(lit(1)).as("orphan_keys"))
    tot.crossJoin(orph).select(lit(name).as("rel_name"),
      col("child_rows"), col("child_keys"), col("n_null"),
      col("orphan_rows"), col("orphan_keys"),
      (col("orphan_rows") > 0L).as("is_violated"))
  }

  private def fkAuditSql(name: String, childSql: String, fk: String,
      parentSql: String, pk: String): String =
    s"""SELECT '$name' AS rel_name,
       |  (SELECT CAST(COALESCE(SUM(CASE WHEN $fk IS NOT NULL THEN 1 END), 0) AS BIGINT) FROM $childSql) AS child_rows,
       |  (SELECT CAST(COUNT(DISTINCT $fk) AS BIGINT) FROM $childSql) AS child_keys,
       |  (SELECT CAST(COALESCE(SUM(CASE WHEN $fk IS NULL THEN 1 END), 0) AS BIGINT) FROM $childSql) AS n_null,
       |  COALESCE((SELECT CAST(SUM(n) AS BIGINT) FROM (
       |     SELECT c.$fk, COUNT(*) AS n FROM $childSql c
       |     WHERE c.$fk IS NOT NULL AND c.$fk NOT IN (SELECT $pk FROM $parentSql)
       |     GROUP BY 1)), 0) AS orphan_rows,
       |  (SELECT CAST(COUNT(DISTINCT c.$fk) AS BIGINT) FROM $childSql c
       |     WHERE c.$fk IS NOT NULL AND c.$fk NOT IN (SELECT $pk FROM $parentSql)) AS orphan_keys,
       |  COALESCE((SELECT CAST(SUM(n) AS BIGINT) FROM (
       |     SELECT c.$fk, COUNT(*) AS n FROM $childSql c
       |     WHERE c.$fk IS NOT NULL AND c.$fk NOT IN (SELECT $pk FROM $parentSql)
       |     GROUP BY 1)), 0) > 0 AS is_violated""".stripMargin

  /** REFERENTIAL-INTEGRITY audit — the migration check `dq_checksum`
    * doesn't cover: fingerprints prove each table survived the move,
    * this proves the tables still JOIN (a partially-loaded parent is the
    * classic silent migration failure — every child row still exists, but
    * a fraction of joins drop). Five relationships: the four TPC-H FK
    * edges (all clean — zero orphans IS the assertion), plus a SIMULATED
    * partial parent load (`c_custkey % 97 <> 0` — a dropped ingest
    * partition, the `corpus_diff` versioning convention) proving the
    * detector fires with exact orphan accounting. */
  val dqReferential = QuerySpec(
    "dq_referential",
    "FK orphan audit: per-relationship child/orphan counts incl. a simulated partial parent",
    Some(Seq(
      fkAuditSql("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      fkAuditSql("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      fkAuditSql("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      fkAuditSql("orders_customer_partial", "orders", "o_custkey",
        "(SELECT * FROM customer WHERE c_custkey % 97 <> 0)", "c_custkey"),
      fkAuditSql("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY rel_name")),
    (s, dir) => {
      val nation = Tables(s, dir, "nation")
      val customer = Tables(s, dir, "customer")
      val orders = Tables(s, dir, "orders")
      Seq(
        fkAudit("customer_nation", customer, "c_nationkey", nation, "n_nationkey", constParent = true),
        fkAudit("lineitem_orders", Tables(s, dir, "lineitem"), "l_orderkey", orders, "o_orderkey", constParent = false),
        fkAudit("orders_customer", orders, "o_custkey", customer, "c_custkey", constParent = false),
        fkAudit("orders_customer_partial", orders, "o_custkey",
          customer.filter(col("c_custkey") % 97 =!= 0), "c_custkey", constParent = false),
        fkAudit("supplier_nation", Tables(s, dir, "supplier"), "s_nationkey", nation, "n_nationkey", constParent = true))
        .reduce(_.unionAll(_))
        .orderBy("rel_name")
    })

  /** Columns profiled by the drift audit (all documents columns with
    * bounded-ish domains — the ones whose distinct/null movement signals
    * an upstream change). */
  private val DriftCols = Seq("lang", "source", "n_chars")

  /** PER-COLUMN PROFILE DRIFT between two corpus versions — `dq_profile`
    * answers "what does this table look like", this answers "did its
    * SHAPE move between yesterday's build and today's" (a new null burst,
    * a language column collapsing to one value, a distinct-count
    * explosion — the classic symptoms of an upstream schema/encoding
    * change that row counts alone never show). Versions follow the
    * corpus_diff convention: v1 = the `doc_id % 5 <> 4` slice, v2 = the
    * full table.
    *
    * Scale shape: ONE corpus scan computes BOTH versions' profiles for
    * every column — v1 membership is a row predicate, so each column's
    * six aggregates are conditional aggregation in a single Aggregate
    * node (the distincts plan as one Expand, still one data pass), and
    * the 1-row result unpivots to a row per column exactly like
    * `dq_profile`. The drift ratio is integer permille over exact
    * counts. */
  val dqProfileDrift = QuerySpec(
    "dq_profile_drift",
    "per-column profile drift between corpus versions: rows/nulls/distincts + permille shift",
    Some(DriftCols.map(c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(SUM(CASE WHEN doc_id % 5 <> 4 THEN 1 ELSE 0 END) AS BIGINT) AS rows_v1,
         |  CAST(COUNT(*) AS BIGINT) AS rows_v2,
         |  CAST(SUM(CASE WHEN doc_id % 5 <> 4 AND $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_v1,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_v2,
         |  CAST(COUNT(DISTINCT CASE WHEN doc_id % 5 <> 4 THEN $c END) AS BIGINT) AS distinct_v1,
         |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS distinct_v2,
         |  CAST((1000 * ABS(COUNT(DISTINCT $c) - COUNT(DISTINCT CASE WHEN doc_id % 5 <> 4 THEN $c END)))
         |    // GREATEST(COUNT(DISTINCT CASE WHEN doc_id % 5 <> 4 THEN $c END), 1) AS BIGINT) AS distinct_shift_pml
         |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val v1 = col("doc_id") % 5 =!= 4
      // row counts don't depend on the profiled column — computed ONCE and
      // referenced from every per-column output struct
      val aggs = Seq(
        sum(when(v1, 1L).otherwise(0L)).as("__r1"),
        count(lit(1)).as("__r2")) ++
        DriftCols.flatMap { c =>
          Seq(sum(when(v1 && col(c).isNull, 1L).otherwise(0L)).as(s"${c}__n1"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__n2"),
            countDistinct(when(v1, col(c))).as(s"${c}__d1"),
            countDistinct(col(c)).as(s"${c}__d2"))
        }
      val one = docs.agg(aggs.head, aggs.tail: _*)
      one.select(explode(array(DriftCols.map(c =>
        struct(lit(c).as("col_name"),
          col("__r1").as("rows_v1"), col("__r2").as("rows_v2"),
          col(s"${c}__n1").as("null_v1"), col(s"${c}__n2").as("null_v2"),
          col(s"${c}__d1").as("distinct_v1"), col(s"${c}__d2").as("distinct_v2"),
          expr(s"(1000 * abs(${c}__d2 - ${c}__d1)) div greatest(${c}__d1, 1)")
            .as("distinct_shift_pml"))): _*)).as("p"))
        .select(col("p.*"))
        .orderBy("col_name")
    })

  /** KEY-UNIQUENESS audit — the third leg of the migration stool next to
    * `dq_checksum` (content) and `dq_referential` (joins): prove declared
    * keys are still keys. A double-loaded partition duplicates rows with
    * identical content, which fingerprint SUM layers can miss only if the
    * whole group doubles — the per-key count is the direct detector.
    * Three audits: events.event_id and orders.o_orderkey (clean — zero
    * duplicates IS the assertion), plus a SIMULATED double-load (events
    * unioned with its `event_id % 101 = 0` slice — a re-ingested file)
    * proving exact duplicate accounting.
    *
    * Scale shape: per-key counts partial-aggregate map-side (the shuffle
    * carries distinct keys), then a bounded second aggregate reduces to
    * ONE row per audit — nothing key-shaped ever reaches the driver. */
  val dqUniqueness = QuerySpec(
    "dq_uniqueness",
    "key-uniqueness audit: duplicate-key accounting incl. a simulated double-load",
    Some {
      def one(name: String, childSql: String, key: String) =
        s"""SELECT '$name' AS audit_name,
           |  CAST(SUM(n) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) AS BIGINT) AS n_keys,
           |  CAST(COALESCE(SUM(CASE WHEN n > 1 THEN 1 END), 0) AS BIGINT) AS n_dup_keys,
           |  CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n - 1 END), 0) AS BIGINT) AS n_extra_rows,
           |  COALESCE(SUM(CASE WHEN n > 1 THEN 1 END), 0) > 0 AS is_violated
           |FROM (SELECT $key, COUNT(*) AS n FROM $childSql GROUP BY 1)""".stripMargin
      Seq(
        one("events_event_id", "events", "event_id"),
        one("events_reloaded",
          "(SELECT event_id FROM events UNION ALL SELECT event_id FROM events WHERE event_id % 101 = 0)",
          "event_id"),
        one("orders_orderkey", "orders", "o_orderkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY audit_name")
    },
    (s, dir) => {
      def audit(name: String, keyed: DataFrame): DataFrame = {
        val perKey = keyed.groupBy("k").agg(count(lit(1)).as("n"))
        perKey.agg(
          sum("n").as("n_rows"), count(lit(1)).as("n_keys"),
          coalesce(sum(when(col("n") > 1, 1L)), lit(0L)).as("n_dup_keys"),
          coalesce(sum(when(col("n") > 1, col("n") - 1L)), lit(0L)).as("n_extra_rows"))
          .select(lit(name).as("audit_name"), col("n_rows"), col("n_keys"),
            col("n_dup_keys"), col("n_extra_rows"),
            (col("n_dup_keys") > 0L).as("is_violated"))
      }
      val ev = Tables(s, dir, "events").select(col("event_id").as("k"))
      Seq(
        audit("events_event_id", ev),
        audit("events_reloaded",
          ev.unionAll(ev.filter(col("k") % 101 === 0))),
        audit("orders_orderkey",
          Tables(s, dir, "orders").select(col("o_orderkey").as("k"))))
        .reduce(_.unionAll(_))
        .orderBy("audit_name")
    })

  /** One declarative expectation: a violation predicate (Spark + DuckDB
    * twin — identical NULL semantics: a NULL predicate counts as NOT
    * violated, with a dedicated not-null rule catching the nulls
    * themselves) and the pass threshold in permille of table rows.
    *
    * The id is interpolated RAW into generated `v_<id>` column aliases on
    * both engines (SqlText.lit quotes string LITERALS, not identifiers),
    * so it must be identifier-safe — enforced here at construction, the
    * one place every rule passes through, rather than trusted at each of
    * the three interpolation sites. */
  private[graft] final case class Expectation(id: String, desc: String,
      viol: org.apache.spark.sql.Column, violSql: String, thrPermille: Long) {
    require(id.matches("[A-Za-z][A-Za-z0-9_]*"),
      s"Expectation id '$id' is not identifier-safe ([A-Za-z][A-Za-z0-9_]*): " +
        "it is spliced into generated column aliases on both engines, where " +
        "a space, quote, or dash would corrupt the SQL")
  }

  /** The suite — config, not code: adding a rule adds one counter column
    * to the fused aggregation, never a scan. The cutoff rule is
    * deliberately breached by the corpus (~12% of lineitem ships past
    * 2001-01-01 at every SF) so the output exercises BOTH verdict paths. */
  private def expectations: Seq[Expectation] = Seq(
    Expectation("r1_qty_not_null", "l_quantity IS NOT NULL",
      col("l_quantity").isNull, "l_quantity IS NULL", 0L),
    Expectation("r2_qty_range", "l_quantity in [1, 50]",
      !col("l_quantity").between(1, 50),
      "NOT (l_quantity BETWEEN 1 AND 50)", 0L),
    Expectation("r3_disc_range", "l_discount in [0, 0.10]",
      !col("l_discount").between(0.0, 0.10),
      "NOT (l_discount BETWEEN 0.0::DOUBLE AND 0.10::DOUBLE)", 0L),
    Expectation("r4_flag_domain", "l_returnflag in (A, N, R)",
      !col("l_returnflag").isin("A", "N", "R"),
      "l_returnflag NOT IN ('A', 'N', 'R')", 0L),
    Expectation("r5_price_positive", "l_extendedprice > 0",
      !(col("l_extendedprice") > 0),
      "NOT (l_extendedprice > 0)", 0L),
    Expectation("r6_tax_range", "l_tax in [0, 0.08]",
      !col("l_tax").between(0.0, 0.08),
      "NOT (l_tax BETWEEN 0.0::DOUBLE AND 0.08::DOUBLE)", 0L),
    Expectation("r7_ship_cutoff", "l_shipdate before 2001-01-01",
      !(col("l_shipdate") < lit("2001-01-01 00:00:00").cast("timestamp")),
      "NOT (l_shipdate < TIMESTAMP '2001-01-01 00:00:00')", 50L),
    Expectation("r8_line_bounds", "l_linenumber in [1, 7]",
      !col("l_linenumber").between(1, 7),
      "NOT (l_linenumber BETWEEN 1 AND 7)", 0L))

  /** DECLARATIVE EXPECTATION SUITE — the Great-Expectations-style contract
    * check a pipeline runs at every ingest gate, engine-native: the rule
    * TABLE above compiles into ONE fused aggregation pass over the fact
    * table (count + one conditional counter per rule, all map-side
    * partial-aggregated), and the per-rule verdict rows are derived from
    * that single 1-row result by a literal explode. Rule count scales the
    * aggregation WIDTH only: 8 rules or 800 cost the same single scan —
    * the property that matters when the fact table is 100 TB and the
    * naive loop would re-scan it per rule.
    *
    * Output: one audit row per rule (id, the human-readable contract,
    * exact violation counts, integer permille, threshold, verdict; the
    * verdict cross-multiplies 1000·v ≤ thr·n exactly — the floored
    * permille is reporting only, so a zero-tolerance rule cannot absorb
    * sub-0.1% violations) —
    * rules with zero violations INCLUDED, the full-coverage convention
    * (a report listing only breaches cannot prove the rest were
    * checked). The corpus breaches exactly the cutoff rule, so both
    * verdict paths are hash-gated. */
  /** The suite-compile law, table-generic — ONE definition shared by the
    * batch gate (`dq_expectations` over lineitem) and the streaming
    * ingest contract (`stream_expectations` over arriving events), so
    * the two can never fork. [[expectationCounters]] is the fused
    * single-pass aggregation (count + one conditional counter per rule
    * — the half that must run incrementally in a stream);
    * [[expectationVerdicts]] derives the per-rule verdict rows from the
    * 1-row counter frame by literal explode (pure publication
    * arithmetic). [[expectationOracleSql]] is the DuckDB twin of the
    * composition over any table name. */
  private[queries] def expectationCounters(df: DataFrame,
      es: Seq[Expectation]): DataFrame = {
    val aggs = es.map(e => sum(when(e.viol, 1L).otherwise(0L)).as(s"v_${e.id}"))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  private[queries] def expectationVerdicts(one: DataFrame,
      es: Seq[Expectation]): DataFrame = {
    val verdicts = es.map(e => struct(
      lit(e.id).as("rule_id"), lit(e.desc).as("rule"),
      col(s"v_${e.id}").as("n_violations"),
      lit(e.thrPermille).as("threshold_permille")))
    one.select(col("n_rows"), explode(array(verdicts: _*)).as("r"))
      .select(col("r.rule_id"), col("r.rule"), col("n_rows"),
        col("r.n_violations"),
        expr("(1000 * r.n_violations) div n_rows").as("viol_permille"),
        col("r.threshold_permille"),
        // verdict cross-multiplies EXACTLY: the floored permille above is
        // reporting only — comparing it would let a zero-tolerance rule
        // absorb up to ~0.1% violations (5000 NULLs in 6M rows floor to
        // 0‰). 1000·v and thr·n both stay in BIGINT to ~9×10¹⁵ rows.
        (expr("1000 * r.n_violations") <= col("r.threshold_permille") * col("n_rows"))
          .as("passed"))
      .orderBy("rule_id")
  }

  private[queries] def expectationOracleSql(from: String,
      es: Seq[Expectation]): String = {
    val counters = es.map(e =>
      s"CAST(SUM(CASE WHEN ${e.violSql} THEN 1 ELSE 0 END) AS BIGINT) AS v_${e.id}")
      .mkString(",\n    ")
    // rule id/desc are caller-provided strings: quote through the shared
    // SqlText law so an apostrophe in a description ("shipper's cutoff")
    // cannot corrupt the generated oracle (the blocklistInSql bug class)
    val rows = es.map(e =>
      s"""SELECT ${graft.functions.SqlText.lit(e.id)} AS rule_id, ${graft.functions.SqlText.lit(e.desc)} AS rule, n_rows,
         |  v_${e.id} AS n_violations,
         |  (1000 * v_${e.id}) // n_rows AS viol_permille,
         |  CAST(${e.thrPermille} AS BIGINT) AS threshold_permille,
         |  1000 * v_${e.id} <= ${e.thrPermille} * n_rows AS passed
         |FROM a""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH a AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    $counters
       |  FROM $from)
       |$rows
       |ORDER BY rule_id""".stripMargin
  }

  /** The ingest-contract rule table for the EVENTS stream (the
    * `stream_expectations` twin's config): schema presence, domains,
    * ranges, and a value cap the corpus deliberately breaches at ~133‰
    * against a 50‰ tolerance — stable across every SF, so the failed
    * verdict path is hash-gated wherever the gate runs. */
  private[queries] def eventExpectations: Seq[Expectation] = Seq(
    Expectation("e1_value_not_null", "value IS NOT NULL",
      col("value").isNull, "value IS NULL", 0L),
    Expectation("e2_value_positive", "value > 0",
      !(col("value") > 0), "NOT (value > 0)", 0L),
    Expectation("e3_type_domain", "event_type in (click, view, purchase, signup, error)",
      !col("event_type").isin("click", "view", "purchase", "signup", "error"),
      "event_type NOT IN ('click', 'view', 'purchase', 'signup', 'error')", 0L),
    Expectation("e4_user_range", "user_id in [0, 99999]",
      !col("user_id").between(0, 99999),
      "NOT (user_id BETWEEN 0 AND 99999)", 0L),
    Expectation("e5_ts_window", "ts within the 2024 H1 ingest window",
      !(col("ts") >= lit("2024-01-01 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-07-01 00:00:00").cast("timestamp")),
      "NOT (ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-07-01 00:00:00')", 0L),
    Expectation("e6_value_cap", "value <= 100",
      !(col("value") <= 100), "NOT (value <= 100)", 50L))

  val dqExpectations = QuerySpec(
    "dq_expectations",
    "declarative expectation suite: rule table -> one fused scan -> per-rule verdicts",
    Some(expectationOracleSql("lineitem", expectations)),
    (s, dir) =>
      expectationVerdicts(
        expectationCounters(Tables(s, dir, "lineitem"), expectations),
        expectations))

  /** k-anonymity floor the audit checks classes against — shared with the
    * streaming twin so the two gates cannot fork on the threshold. */
  private[queries] val KAnonymityK = 5L

  /** The quasi-identifier balance bucket — ONE definition shared by the
    * batch audit, the streaming twin, and the generalization ladder
    * (like [[KAnonymityK]], so the class law cannot fork): floor of the
    * width-scaled balance, giving uniformly width-wide buckets INCLUDING
    * on the negative side (at width 1000, bucket −1 = [−1000, 0)). The
    * earlier floor-then-integer-div form truncated toward zero, silently
    * merging (−999, 0) into the positive bucket 0 — a double-width class
    * that can mask sub-k groups identically on both engines, where the
    * hash gate cannot see it. The width PARAMETER is the generalization
    * knob: the audit runs it at 1000, the ladder at every rung. */
  private[graft] def kAnonBalBucket(width: Int): org.apache.spark.sql.Column = {
    require(width > 0, s"kAnonBalBucket width must be positive, got $width")
    expr(s"cast(floor(c_acctbal / $width) as bigint)")
  }

  /** DuckDB twin of [[kAnonBalBucket]]. */
  private[graft] def kAnonBalBucketSql(width: Int): String = {
    require(width > 0, s"kAnonBalBucketSql width must be positive, got $width")
    s"CAST(FLOOR(c_acctbal / $width) AS BIGINT)"
  }

  /** K-ANONYMITY AUDIT (Sweeney 2002) — the re-identification screen a
    * team runs before releasing or training on structured records: every
    * EQUIVALENCE CLASS of the quasi-identifier tuple (here market segment
    * × coarsened account-balance bucket — the attacker-joinable columns)
    * is sized, classes smaller than k are flagged as re-identification
    * risks, and the dataset's k-anonymity level (the global minimum class
    * size) rides every row. The balance bucket IS the generalization
    * step of the k-anonymity recipe: production iterates exactly this
    * audit under progressively coarser generalizations (wider buckets,
    * dropped columns) until the level clears its target, so the audit
    * and the anonymization loop are the same operator. Bucketing is
    * [[kAnonBalBucket]] — floor of the scaled balance, uniform
    * 1000-wide classes on both sides of zero, one definition with the
    * streaming twin.
    *
    * Full-coverage output (the dq_expectations argument): one row per
    * class including the passing ones — a violations-only list cannot
    * prove the rest were checked. Flag behavior is SF-dependent and the
    * gate verifies both regimes: at the sparse sf0.001 corpus the
    * balance tails leave sub-k classes (46 of 54 flagged, level 1 — a
    * blocked release), while from sf0.01 up every class fattens past k
    * (level 18+ — a clean release); the level and class-size columns
    * carry the law either way (the dedup_semantic flags-false
    * convention). Scale shape: ONE map-side-combinable groupBy over
    * the fact table into ≤ |segments|·|buckets| classes; the 1-row
    * global minimum broadcasts back onto the class table, which is
    * cached for its two consumers. */
  val dqKanonymity = QuerySpec(
    "dq_kanonymity",
    "k-anonymity audit: quasi-identifier equivalence classes, sub-k flags, global anonymity level",
    Some(s"""WITH g AS MATERIALIZED (SELECT c_mktsegment,
            |    ${kAnonBalBucketSql(1000)} AS bal_bucket,
            |    CAST(COUNT(*) AS BIGINT) AS class_n
            |  FROM customer GROUP BY 1, 2),
            |t AS (SELECT CAST(MIN(class_n) AS BIGINT) AS k_anonymity FROM g)
            |SELECT g.c_mktsegment, g.bal_bucket, g.class_n,
            |  g.class_n < $KAnonymityK AS is_violation, t.k_anonymity
            |FROM g CROSS JOIN t
            |ORDER BY g.c_mktsegment, g.bal_bucket""".stripMargin),
    (s, dir, scope) => {
      // cached: the class table feeds the audit rows AND the 1-row level
      val g = scope.track(Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"), kAnonBalBucket(1000).as("bal_bucket"))
        .agg(count(lit(1)).as("class_n")))
      val t = broadcast(g.agg(min("class_n").as("k_anonymity")))
      g.crossJoin(t)
        .select(col("c_mktsegment"), col("bal_bucket"), col("class_n"),
          (col("class_n") < KAnonymityK).as("is_violation"),
          col("k_anonymity"))
        .orderBy("c_mktsegment", "bal_bucket")
    })

  /** l-diversity floor — the sensitive-value diversity each class must
    * carry (like [[KAnonymityK]], one shared definition). */
  private[queries] val LDiversityL = 3L

  /** L-DIVERSITY AUDIT (Machanavajjhala et al. 2007) — the screen that
    * catches what k-anonymity famously cannot: a class can be k-large
    * yet HOMOGENEOUS in its sensitive attribute, so membership alone
    * discloses the secret (the "homogeneity attack"). Same
    * quasi-identifier classes as [[dqKanonymity]] (one shared
    * [[kAnonBalBucket]] law — the two audits must agree on what a class
    * IS), sensitive attribute = nation key: per class, exact size AND
    * distinct-sensitive count; classes with fewer than
    * [[LDiversityL]] distinct nations are flagged; the dataset's
    * l-diversity (the global minimum distinct count) rides every row —
    * the dqKanonymity output convention, so the release checklist reads
    * the two audits identically. Distinct-l is the paper's base
    * instantiation; entropy-l refines it but needs the same per-class
    * distinct machinery this gates.
    *
    * Scale shape: ONE map-side-combinable two-key aggregation into
    * ≤ |segments|·|buckets| classes (COUNT(DISTINCT nation) shuffles the
    * class key + nation pair — bounded by |classes|·|nations|, never
    * corpus-sized); the 1-row global minimum broadcasts back onto the
    * cached class table. */
  val dqLdiversity = QuerySpec(
    "dq_ldiversity",
    "l-diversity audit: per-class distinct-sensitive counts, homogeneity flags, global l-diversity level",
    Some(s"""WITH g AS MATERIALIZED (SELECT c_mktsegment,
            |    ${kAnonBalBucketSql(1000)} AS bal_bucket,
            |    CAST(COUNT(*) AS BIGINT) AS class_n,
            |    CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_sensitive
            |  FROM customer GROUP BY 1, 2),
            |t AS (SELECT CAST(MIN(n_sensitive) AS BIGINT) AS l_diversity FROM g)
            |SELECT g.c_mktsegment, g.bal_bucket, g.class_n, g.n_sensitive,
            |  g.n_sensitive < $LDiversityL AS is_violation, t.l_diversity
            |FROM g CROSS JOIN t
            |ORDER BY g.c_mktsegment, g.bal_bucket""".stripMargin),
    (s, dir, scope) => {
      val g = scope.track(Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"), kAnonBalBucket(1000).as("bal_bucket"))
        .agg(count(lit(1)).as("class_n"),
          countDistinct(col("c_nationkey")).as("n_sensitive")))
      ldiversityPublish(g)
    })

  /** The l-diversity publication arithmetic — flags + the global level
    * over a per-class (c_mktsegment, bal_bucket, class_n, n_sensitive)
    * frame, ONE definition consumed by the batch audit and the streaming
    * twin (the expectationVerdicts pattern: shared constants alone don't
    * stop a fork in the verdict arithmetic; a shared function does). */
  private[graft] def ldiversityPublish(classes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val t = broadcast(classes.agg(min("n_sensitive").as("l_diversity")))
    classes.crossJoin(t)
      .select(col("c_mktsegment"), col("bal_bucket"), col("class_n"),
        col("n_sensitive"),
        (col("n_sensitive") < LDiversityL).as("is_violation"),
        col("l_diversity"))
      .orderBy("c_mktsegment", "bal_bucket")
  }

  /** t-closeness ceiling in permille of total-variation distance (like
    * [[KAnonymityK]]/[[LDiversityL]], one shared definition). 400‰
    * straddles the fixture's per-class TVD range at sf0.01 (263–519‰),
    * so BOTH verdict paths ride one gated run there; sf0.001 blocks
    * everywhere (580–973‰), sf0.1 clears everywhere (72–154‰). */
  private[queries] val TclosenessT = 400L

  /** T-CLOSENESS AUDIT (Li, Li & Venkatasubramanian 2007) — the third
    * screen of the canonical privacy trilogy, catching what l-diversity
    * cannot: a class can carry l distinct sensitive values yet have a
    * DISTRIBUTION so far from the table's that membership still leaks
    * (the skewness attack — 49 "flu" + 1 "HIV" in a class is 2-diverse
    * and still disclosive). Same quasi-identifier classes as
    * [[dqKanonymity]]/[[dqLdiversity]] (the one [[kAnonBalBucket]] law),
    * sensitive attribute = nation key, distance = total variation
    * (the categorical-attribute instantiation; EMD refines it for
    * ordered attributes on the same per-class machinery): per class,
    * TVD(class, table) = Σ_v |cnt_cv·N − g_v·n_c| / (2·n_c·N), kept
    * INTEGER-EXACT — the emitted `tvd_num` is the exact numerator, the
    * violation verdict cross-multiplies 1000·num > 2·t·n_c·N with no
    * division anywhere (the dq_expectations convention: floored
    * `tvd_permille` and the global max are reporting only). All
    * arithmetic fits BIGINT to ~10⁶ rows per 10³ classes with 10⁶×
    * headroom.
    *
    * Scale shape: ONE corpus scan into the finest (class, sensitive)
    * count table; the class sizes, the global sensitive histogram, AND
    * the table total all FOLD that ≤ |classes|·|nations| table (the
    * generalization-ladder argument), and the TVD grid is a broadcast
    * cross of two tiny relations — the fact table is never touched
    * again. */
  val dqTcloseness = QuerySpec(
    "dq_tcloseness",
    "t-closeness audit: per-class total-variation distance from the table's sensitive distribution, integer-exact",
    Some(s"""WITH tc_c AS MATERIALIZED (SELECT c_mktsegment,
            |    ${kAnonBalBucketSql(1000)} AS bal_bucket, c_nationkey,
            |    CAST(COUNT(*) AS BIGINT) AS cnt
            |  FROM customer GROUP BY 1, 2, 3),
            |tc_s AS (SELECT c_mktsegment, bal_bucket, CAST(SUM(cnt) AS BIGINT) AS n_c
            |  FROM tc_c GROUP BY 1, 2),
            |tc_n AS (SELECT c_nationkey, CAST(SUM(cnt) AS BIGINT) AS g FROM tc_c GROUP BY 1),
            |tc_t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS nn FROM tc_c),
            |tc_g AS (SELECT s.c_mktsegment, s.bal_bucket, s.n_c, n.c_nationkey, n.g,
            |    COALESCE(c.cnt, 0) AS cnt
            |  FROM tc_s s CROSS JOIN tc_n n
            |  LEFT JOIN tc_c c ON c.c_mktsegment = s.c_mktsegment
            |    AND c.bal_bucket = s.bal_bucket AND c.c_nationkey = n.c_nationkey),
            |tc_v AS MATERIALIZED (SELECT g.c_mktsegment, g.bal_bucket, g.n_c,
            |    CAST(SUM(ABS(g.cnt * t.nn - g.g * g.n_c)) AS BIGINT) AS tvd_num
            |  FROM tc_g g CROSS JOIN tc_t t GROUP BY 1, 2, 3),
            |tc_m AS (SELECT CAST(MAX((1000 * v.tvd_num) // (2 * v.n_c * t.nn)) AS BIGINT)
            |    AS t_max_permille FROM tc_v v CROSS JOIN tc_t t)
            |SELECT v.c_mktsegment, v.bal_bucket, v.n_c AS class_n, v.tvd_num,
            |  CAST((1000 * v.tvd_num) // (2 * v.n_c * t.nn) AS BIGINT) AS tvd_permille,
            |  1000 * v.tvd_num > 2 * $TclosenessT * v.n_c * t.nn AS is_violation,
            |  m.t_max_permille
            |FROM tc_v v CROSS JOIN tc_t t CROSS JOIN tc_m m
            |ORDER BY v.c_mktsegment, v.bal_bucket""".stripMargin),
    (s, dir, scope) => {
      // ONE corpus scan: the finest (class, sensitive) count table,
      // cached for its three fold consumers + the grid
      val cls = scope.track(Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"), kAnonBalBucket(1000).as("bal_bucket"),
          col("c_nationkey"))
        .agg(count(lit(1)).as("cnt")))
      tclosenessPublish(cls, scope.track)
    })

  /** The t-closeness derivation from the finest (class, sensitive, cnt)
    * table to the published audit — ONE definition consumed by the batch
    * audit and the streaming twin (the [[ldiversityPublish]] argument:
    * shared constants don't stop an arithmetic fork; a shared function
    * does). `track` lets a scoped batch caller cache the TVD table for
    * its two consumers; the streaming twin publishes over an
    * already-materialized sink and passes identity. */
  private[graft] def tclosenessPublish(cls: org.apache.spark.sql.DataFrame,
      track: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity)
      : org.apache.spark.sql.DataFrame = {
    val cs = cls.groupBy(col("c_mktsegment"), col("bal_bucket"))
      .agg(sum(col("cnt")).as("n_c"))
    val nat = cls.groupBy(col("c_nationkey")).agg(sum(col("cnt")).as("g"))
    val tot = cls.agg(sum(col("cnt")).as("nn"))
    val grid = cs.crossJoin(broadcast(nat))
      .join(cls.select(col("c_mktsegment").as("cm2"), col("bal_bucket").as("bb2"),
          col("c_nationkey").as("nk2"), col("cnt")),
        col("cm2") === col("c_mktsegment") && col("bb2") === col("bal_bucket")
          && col("nk2") === col("c_nationkey"), "left")
      .select(col("c_mktsegment"), col("bal_bucket"), col("n_c"), col("g"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val tv = track(grid.crossJoin(broadcast(tot))
      .groupBy(col("c_mktsegment"), col("bal_bucket"), col("n_c"), col("nn"))
      .agg(sum(abs(col("cnt") * col("nn") - col("g") * col("n_c"))).as("tvd_num")))
    val permille = call_function("div",
      lit(1000L) * col("tvd_num"), lit(2L) * col("n_c") * col("nn"))
    val m = broadcast(tv.agg(max(permille).as("t_max_permille")))
    tv.crossJoin(m)
      .select(col("c_mktsegment"), col("bal_bucket"), col("n_c").as("class_n"),
        col("tvd_num"), permille.as("tvd_permille"),
        (lit(1000L) * col("tvd_num") >
          lit(2L) * lit(TclosenessT) * col("n_c") * col("nn")).as("is_violation"),
        col("t_max_permille"))
      .orderBy("c_mktsegment", "bal_bucket")
  }

  /** The generalization ladder's rungs — bounded and unrolled at compile
    * time (the txt_contamination_13g convention: a fixed config literal,
    * never a data-coupled loop). Doublings of the audit's 1000 width, so
    * every coarser rung is a pure FOLD of the finest class table. */
  private[queries] val KAnonWidths = Seq(1000, 2000, 4000, 8000)

  /** THE K-ANONYMITY GENERALIZATION LOOP — the promise in
    * [[dqKanonymity]]'s scaladoc made true: production iterates exactly
    * that audit under progressively coarser generalizations until the
    * level clears its target, and this entry IS that iteration, bounded
    * and unrolled: the [[KAnonWidths]] doubling rungs, then the TERMINAL
    * rung of Sweeney's generalization hierarchy — SUPPRESSION of the
    * balance column (classes = segment alone; bucket_width 0 is the
    * suppressed sentinel). Suppression is not decoration: floor
    * bucketing never merges negative balances with positive ones at ANY
    * width (floor(−999/w) = −1 for every w > 999), so on a corpus whose
    * sub-k classes sit in the negative tail no finite rung can clear —
    * the algorithm must be able to give the column up, exactly as the
    * recipe's hierarchy tops out at '*'. Output: one row per rung (rung
    * index, width, class count, k-anonymity level, clears-k verdict)
    * plus CHOSEN_RUNG — the LEAST generalization whose level ≥ k, the
    * anonymization the release ships with (−1 sentinel when even
    * suppression fails, keeping the output NULL-free). The sparse
    * sf0.001 corpus exercises a REAL promotion (every finite rung stays
    * at level 1 — singleton negative-tail classes — and suppression
    * clears at level ≥ k); from sf0.01 up the finest rung already clears
    * and the ladder proves it need not coarsen — both regimes
    * gate-verified.
    *
    * Scale shape — the reason this is not five audits: the fact table is
    * scanned ONCE into the FINEST class table (≤ |segments|·|buckets|
    * rows, map-side-combinable), and every coarser rung FOLDS that class
    * table — floor(x/2000) = floor(floor(x/1000)/2) exactly (floor
    * division composes, negatives included), and suppression is the fold
    * by segment alone — so class counts add up the ladder without
    * touching the corpus again. The oracle re-derives every rung
    * INDEPENDENTLY from the raw table (five direct groupBys), so the
    * hash gate PROVES the folds are lossless rather than assuming it. */
  val dqKanonymityGeneralize = QuerySpec(
    "dq_kanonymity_generalize",
    "k-anonymity generalization ladder: widen the quasi-identifier bucket, then suppress, until the level clears k",
    Some {
      val finite = KAnonWidths.zipWithIndex.map { case (w, i) =>
        s"""kg$w AS (SELECT CAST(${i + 1} AS BIGINT) AS rung,
           |    CAST($w AS BIGINT) AS bucket_width,
           |    CAST(COUNT(*) AS BIGINT) AS n_classes,
           |    CAST(MIN(class_n) AS BIGINT) AS k_anonymity
           |  FROM (SELECT c_mktsegment, ${kAnonBalBucketSql(w)} AS b,
           |      COUNT(*) AS class_n
           |    FROM customer GROUP BY 1, 2))""".stripMargin
      }.mkString(",\n")
      val suppressed =
        s"""kg0 AS (SELECT CAST(${KAnonWidths.size + 1} AS BIGINT) AS rung,
           |    CAST(0 AS BIGINT) AS bucket_width,
           |    CAST(COUNT(*) AS BIGINT) AS n_classes,
           |    CAST(MIN(class_n) AS BIGINT) AS k_anonymity
           |  FROM (SELECT c_mktsegment, COUNT(*) AS class_n
           |    FROM customer GROUP BY 1))""".stripMargin
      val union = (KAnonWidths.map(w => s"SELECT * FROM kg$w") :+
        "SELECT * FROM kg0").mkString(" UNION ALL ")
      s"""WITH $finite,
         |$suppressed,
         |kgu AS MATERIALIZED ($union),
         |kgc AS (SELECT CAST(COALESCE(MIN(CASE WHEN k_anonymity >= $KAnonymityK
         |    THEN rung END), -1) AS BIGINT) AS chosen_rung FROM kgu)
         |SELECT u.rung, u.bucket_width, u.n_classes, u.k_anonymity,
         |  u.k_anonymity >= $KAnonymityK AS clears_k, c.chosen_rung
         |FROM kgu u CROSS JOIN kgc c ORDER BY u.rung""".stripMargin
    },
    (s, dir, scope) => {
      // ONE corpus scan: the finest class table, cached for its
      // |rungs| fold consumers + the chosen-rung derivation
      val g1 = scope.track(Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"), kAnonBalBucket(KAnonWidths.head).as("b"))
        .agg(count(lit(1)).as("class_n")))
      def rungRow(folded: DataFrame, rung: Int, width: Long): DataFrame =
        folded.agg(count(lit(1)).as("n_classes"),
            min(col("class_n")).as("k_anonymity"))
          .select(lit(rung.toLong).as("rung"), lit(width).as("bucket_width"),
            col("n_classes"), col("k_anonymity"))
      val finite = KAnonWidths.zipWithIndex.map { case (w, i) =>
        val folded =
          if (w == KAnonWidths.head) g1
          else g1.groupBy(col("c_mktsegment"),
              expr(s"cast(floor(b / ${w / KAnonWidths.head}) as bigint)").as("b"))
            .agg(sum(col("class_n")).as("class_n"))
        rungRow(folded, i + 1, w.toLong)
      }
      val suppressed = rungRow(
        g1.groupBy(col("c_mktsegment")).agg(sum(col("class_n")).as("class_n")),
        KAnonWidths.size + 1, 0L)
      val ladder = scope.track((finite :+ suppressed).reduce(_.unionAll(_)))
      val chosen = broadcast(ladder.agg(coalesce(
        min(when(col("k_anonymity") >= KAnonymityK, col("rung"))),
        lit(-1L)).as("chosen_rung")))
      ladder.crossJoin(chosen)
        .select(col("rung"), col("bucket_width"), col("n_classes"),
          col("k_anonymity"),
          (col("k_anonymity") >= KAnonymityK).as("clears_k"),
          col("chosen_rung"))
        .orderBy("rung")
    })

  /** EMD t-closeness ceiling in permille (the ordered-attribute analog of
    * [[TclosenessT]]). Chosen to exercise both verdict regimes across the
    * SFs like the TVD ceiling (measured and documented at the entry). */
  private[queries] val TclosenessEmdT = 170L

  /** EMD T-CLOSENESS FOR THE ORDERED ATTRIBUTE (Li, Li &
    * Venkatasubramanian 2007 §4.2) — the refinement [[dqTcloseness]]'s
    * scaladoc concedes TVD cannot provide: for an ORDERED sensitive
    * attribute, distributional distance should charge for HOW FAR
    * probability mass must move, not just how much differs — a class
    * whose balances are all one bucket above the table's is nearly
    * indistinguishable under EMD but looks maximal under TVD. The paper's
    * worked example is salary; here the sensitive attribute IS the
    * ordered balance bucket (the same [[kAnonBalBucket]] law, now on the
    * sensitive side), and the quasi-identifier class is (market segment ×
    * nation) — the attacker-joinable pair that remains once balance is
    * the secret.
    *
    * THE INTEGER-EXACT LAW: for an ordered domain of m values with unit
    * adjacent ground distance, EMD(class, table) = Σᵢ |Dᵢ| /
    * (n_c·N·(m−1)) where Dᵢ = Σ_{j≤i} (cnt_cj·N − g_j·n_c) is the
    * cumulative count-cross difference — ONE window over the dense
    * (class × bucket) grid, prefix sums of integers, no division
    * anywhere until the reporting edge. The emitted `emd_num` = Σ|Dᵢ| is
    * exact; the violation verdict cross-multiplies 1000·emd_num >
    * t·n_c·N·(m−1) (the [[tclosenessPublish]] convention); the floored
    * `emd_permille` and global max are reporting only. The last
    * cumulative term D_m is identically 0 (both distributions sum to 1),
    * so including it changes nothing; GREATEST(m−1, 1) guards the
    * degenerate one-bucket domain where every Dᵢ = 0 anyway. The 170‰
    * ceiling straddles the fixture: sf0.001 blocks broadly (singleton
    * classes far from the table), sf0.1 clears broadly, sf0.01 rides
    * both paths — the TclosenessT regime discipline.
    *
    * Scale shape: ONE corpus scan into the finest (class, bucket) count
    * table; class sizes, the global bucket histogram, and the total all
    * FOLD it; the grid is |classes|·m rows (bounded by config, never
    * corpus-sized); the window partitions are m rows each. BIGINT
    * headroom: |Dᵢ| ≤ n_c·N ≤ N², emd_num ≤ m·N² — exact to ~10⁷ rows
    * per 30-bucket domain with 10³× headroom; under the pinned ANSI mode
    * an overflow THROWS (the emb_outliers convention — the remedy is a
    * coarser bucket width). */
  val dqTclosenessEmd = QuerySpec(
    "dq_tcloseness_emd",
    "EMD t-closeness for the ordered balance attribute: cumulative-difference prefix sums, integer-exact",
    Some(s"""WITH em_c AS MATERIALIZED (SELECT c_mktsegment, c_nationkey,
            |    ${kAnonBalBucketSql(1000)} AS bal_bucket,
            |    CAST(COUNT(*) AS BIGINT) AS cnt
            |  FROM customer GROUP BY 1, 2, 3),
            |em_s AS (SELECT c_mktsegment, c_nationkey, CAST(SUM(cnt) AS BIGINT) AS n_c
            |  FROM em_c GROUP BY 1, 2),
            |em_b AS (SELECT bal_bucket, CAST(SUM(cnt) AS BIGINT) AS g FROM em_c GROUP BY 1),
            |em_t AS (SELECT CAST(SUM(g) AS BIGINT) AS nn, CAST(COUNT(*) AS BIGINT) AS m FROM em_b),
            |em_g AS (SELECT s.c_mktsegment, s.c_nationkey, s.n_c, b.bal_bucket, b.g,
            |    COALESCE(c.cnt, 0) AS cnt
            |  FROM em_s s CROSS JOIN em_b b
            |  LEFT JOIN em_c c ON c.c_mktsegment = s.c_mktsegment
            |    AND c.c_nationkey = s.c_nationkey AND c.bal_bucket = b.bal_bucket),
            |em_d AS (SELECT g.c_mktsegment, g.c_nationkey, g.n_c, t.nn, t.m,
            |    SUM(g.cnt * t.nn - g.g * g.n_c) OVER (
            |      PARTITION BY g.c_mktsegment, g.c_nationkey ORDER BY g.bal_bucket) AS d
            |  FROM em_g g CROSS JOIN em_t t),
            |em_v AS MATERIALIZED (SELECT c_mktsegment, c_nationkey, n_c, nn, m,
            |    CAST(SUM(ABS(d)) AS BIGINT) AS emd_num
            |  FROM em_d GROUP BY 1, 2, 3, 4, 5),
            |em_m AS (SELECT CAST(MAX((1000 * emd_num) // (n_c * nn * GREATEST(m - 1, 1))) AS BIGINT)
            |    AS emd_max_permille FROM em_v)
            |SELECT v.c_mktsegment, v.c_nationkey, v.n_c AS class_n, v.emd_num,
            |  CAST((1000 * v.emd_num) // (v.n_c * v.nn * GREATEST(v.m - 1, 1)) AS BIGINT) AS emd_permille,
            |  1000 * v.emd_num > $TclosenessEmdT * v.n_c * v.nn * GREATEST(v.m - 1, 1) AS is_violation,
            |  m.emd_max_permille
            |FROM em_v v CROSS JOIN em_m m
            |ORDER BY v.c_mktsegment, v.c_nationkey""".stripMargin),
    (s, dir, scope) => {
      // ONE corpus scan: the finest (class, bucket) count table, cached
      // for its three fold consumers + the grid
      val cls = scope.track(Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"), col("c_nationkey"),
          kAnonBalBucket(1000).as("bal_bucket"))
        .agg(count(lit(1)).as("cnt")))
      val cs = cls.groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(sum(col("cnt")).as("n_c"))
      val gb = cls.groupBy(col("bal_bucket")).agg(sum(col("cnt")).as("g"))
      val tot = gb.agg(sum(col("g")).as("nn"), count(lit(1)).as("m"))
      val grid = cs.crossJoin(broadcast(gb))
        .join(cls.select(col("c_mktsegment").as("cm2"), col("c_nationkey").as("nk2"),
            col("bal_bucket").as("bb2"), col("cnt")),
          col("cm2") === col("c_mktsegment") && col("nk2") === col("c_nationkey")
            && col("bb2") === col("bal_bucket"), "left")
        .select(col("c_mktsegment"), col("c_nationkey"), col("n_c"),
          col("bal_bucket"), col("g"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment", "c_nationkey").orderBy("bal_bucket")
      val tv = scope.track(grid.crossJoin(broadcast(tot))
        .withColumn("d", sum(col("cnt") * col("nn") - col("g") * col("n_c")).over(w))
        .groupBy(col("c_mktsegment"), col("c_nationkey"), col("n_c"),
          col("nn"), col("m"))
        .agg(sum(abs(col("d"))).as("emd_num")))
      val denom = col("n_c") * col("nn") * greatest(col("m") - 1, lit(1L))
      val permille = call_function("div", lit(1000L) * col("emd_num"), denom)
      val mrow = broadcast(tv.agg(max(permille).as("emd_max_permille")))
      tv.crossJoin(mrow)
        .select(col("c_mktsegment"), col("c_nationkey"), col("n_c").as("class_n"),
          col("emd_num"), permille.as("emd_permille"),
          (lit(1000L) * col("emd_num") > lit(TclosenessEmdT) * denom).as("is_violation"),
          col("emd_max_permille"))
        .orderBy("c_mktsegment", "c_nationkey")
    })

  /** THE TRILOGY-WIDE RELEASE LADDER — what [[dqKanonymityGeneralize]]
    * does for k alone, done for the whole privacy trilogy at once: a real
    * release must clear ALL THREE screens (k-anonymity, l-diversity,
    * t-closeness) under ONE shared generalization, because picking the
    * k-clearing rung and then separately auditing l and t on the
    * original classes audits a release nobody ships. Every rung of the
    * [[KAnonWidths]] ladder (plus the terminal suppression rung) emits
    * its k level, l level, exact t-violation count, and max-TVD permille;
    * `chosen_rung` is the LEAST rung clearing all three thresholds (the
    * −1 sentinel when none does — on this fixture suppression merges the
    * sensitive distributions toward the table's, so coarsening helps all
    * three screens monotonically, but the ladder does not assume it).
    * The t verdict is the exact cross-multiplied form (1000·tvd_num >
    * 2·t·n_c·N per class, counted per rung) — comparing the FLOORED max
    * permille against t would absorb sub-permille violations, the
    * dq_expectations lesson.
    *
    * Scale shape — the dqKanonymityGeneralize argument, one level finer:
    * the fact table is scanned ONCE into the finest (segment, bucket,
    * nation) count table; every rung FOLDS it (floor division composes;
    * suppression folds the bucket away — encoded as the constant bucket
    * 0, so all rungs share one class schema); the global nation histogram
    * and total are rung-independent folds computed once; each rung's TVD
    * grid is |classes|·|nations| rows, bounded by config. The oracle
    * re-derives every rung INDEPENDENTLY from the raw table (five direct
    * three-key groupBys), so the hash gate PROVES the folds lossless for
    * all three screens at once. */
  /** The ladder's rung table — (rung index, bucket width, bucket SQL),
    * suppression last — one definition for the decision chain, the apply
    * entry's release arm, and the Spark-side folds. */
  private def ladderRungs: Seq[(Int, Long, String)] =
    KAnonWidths.zipWithIndex.map { case (wd, i) =>
      (i + 1, wd.toLong, kAnonBalBucketSql(wd))
    } :+ ((KAnonWidths.size + 1, 0L, "CAST(0 AS BIGINT)"))

  /** The per-rung decision chain of the release ladder as ONE
    * prefix-parameterized SQL builder — [[dqReleaseLadder]] composes it
    * under `rl`, [[dqReleaseApply]] under `ra` (the pqCodesCtes argument:
    * a second hand-written chain could fork the decision law between the
    * audit and the shipped release). Ends in `{px}u` (one row per rung:
    * rung, bucket_width, n_classes, k_anonymity, l_diversity,
    * t_max_permille, n_t_violations) and `{px}c` (chosen_rung), with the
    * per-rung class tables `{px}{i}_s(c_mktsegment, b, n_c, n_sens)`
    * available for composition. */
  private def releaseLadderCtes(px: String): String = {
    val perRung = ladderRungs.map { case (i, wd, bexpr) =>
      s"""$px${i}_c AS MATERIALIZED (SELECT c_mktsegment, $bexpr AS b, c_nationkey,
         |    CAST(COUNT(*) AS BIGINT) AS cnt FROM customer GROUP BY 1, 2, 3),
         |$px${i}_s AS MATERIALIZED (SELECT c_mktsegment, b, CAST(SUM(cnt) AS BIGINT) AS n_c,
         |    CAST(COUNT(*) AS BIGINT) AS n_sens FROM $px${i}_c GROUP BY 1, 2),
         |$px${i}_v AS (SELECT s.c_mktsegment, s.b, s.n_c,
         |    CAST(SUM(ABS(COALESCE(c.cnt, 0) * t.nn - n.g * s.n_c)) AS BIGINT) AS tvd_num
         |  FROM $px${i}_s s CROSS JOIN ${px}_n n CROSS JOIN ${px}_t t
         |  LEFT JOIN $px${i}_c c ON c.c_mktsegment = s.c_mktsegment
         |    AND c.b = s.b AND c.c_nationkey = n.c_nationkey
         |  GROUP BY 1, 2, 3),
         |$px${i}_m AS (SELECT
         |    CAST(MAX((1000 * v.tvd_num) // (2 * v.n_c * t.nn)) AS BIGINT) AS t_max_permille,
         |    CAST(SUM(CASE WHEN 1000 * v.tvd_num > 2 * $TclosenessT * v.n_c * t.nn
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_t_violations
         |  FROM $px${i}_v v CROSS JOIN ${px}_t t),
         |$px${i}_k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
         |    CAST(MIN(n_c) AS BIGINT) AS k_anonymity,
         |    CAST(MIN(n_sens) AS BIGINT) AS l_diversity FROM $px${i}_s),
         |$px${i}_r AS (SELECT CAST($i AS BIGINT) AS rung, CAST($wd AS BIGINT) AS bucket_width,
         |    k.n_classes, k.k_anonymity, k.l_diversity, m.t_max_permille, m.n_t_violations
         |  FROM $px${i}_k k CROSS JOIN $px${i}_m m)""".stripMargin
    }.mkString(",\n")
    val union = ladderRungs.map { case (i, _, _) => s"SELECT * FROM $px${i}_r" }
      .mkString(" UNION ALL ")
    s"""${px}_n AS MATERIALIZED (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS g
       |  FROM customer GROUP BY 1),
       |${px}_t AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM customer),
       |$perRung,
       |${px}u AS MATERIALIZED ($union),
       |${px}c AS (SELECT CAST(COALESCE(MIN(CASE WHEN k_anonymity >= $KAnonymityK
       |    AND l_diversity >= $LDiversityL AND n_t_violations = 0
       |    THEN rung END), -1) AS BIGINT) AS chosen_rung FROM ${px}u)""".stripMargin
  }

  val dqReleaseLadder = QuerySpec(
    "dq_release_ladder",
    "trilogy-wide release ladder: per-rung k-anonymity, l-diversity, exact t-closeness verdicts; chosen rung clears all three",
    Some(s"""WITH ${releaseLadderCtes("rl")}
            |SELECT u.rung, u.bucket_width, u.n_classes, u.k_anonymity, u.l_diversity,
            |  u.t_max_permille, u.n_t_violations,
            |  u.k_anonymity >= $KAnonymityK AND u.l_diversity >= $LDiversityL
            |    AND u.n_t_violations = 0 AS clears_all,
            |  c.chosen_rung
            |FROM rlu u CROSS JOIN rlc c ORDER BY u.rung""".stripMargin),
    (s, dir, scope) => {
      // ONE corpus scan: the finest (segment, bucket, nation) count
      // table, cached for every rung's fold
      val g1 = scope.track(Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"), kAnonBalBucket(KAnonWidths.head).as("b"),
          col("c_nationkey"))
        .agg(count(lit(1)).as("cnt")))
      releaseLadderPublish(g1, scope.track)
    })

  /** The whole-ladder derivation from the finest (segment, bucket@1000,
    * nation, cnt) table to the published per-rung verdicts — ONE
    * definition consumed by the batch [[dqReleaseLadder]] and its
    * streaming twin (the [[tclosenessPublish]] argument, extended to the
    * full ladder: the streaming state IS the finest class table, so
    * everything above it is publication arithmetic that must not fork). */
  /** The fold-at-width law — from the finest (segment, bucket@1000,
    * nation, cnt) table to any rung's class-nation table: finest
    * passthrough, floor-division fold (composes exactly: floor(x/2000) =
    * floor(floor(x/1000)/2), negatives included), or suppression (the
    * bucket folded away, encoded as constant 0). ONE definition consumed
    * by the ladder's rungs AND the shipped release, so the class table a
    * release ships can never disagree with the classes its rung was
    * chosen by. */
  private def foldAtWidth(g1: org.apache.spark.sql.DataFrame,
      wd: Long): org.apache.spark.sql.DataFrame =
    if (wd == KAnonWidths.head.toLong) g1
    else if (wd == 0L)
      g1.groupBy(col("c_mktsegment"), lit(0L).as("b"), col("c_nationkey"))
        .agg(sum(col("cnt")).as("cnt"))
    else g1.groupBy(col("c_mktsegment"),
        expr(s"cast(floor(b / ${wd / KAnonWidths.head}) as bigint)").as("b"),
        col("c_nationkey"))
      .agg(sum(col("cnt")).as("cnt"))

  private[graft] def releaseLadderPublish(g1: org.apache.spark.sql.DataFrame,
      track: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity)
      : org.apache.spark.sql.DataFrame = {
    // rung-independent folds: the global sensitive histogram + total
    val nat = broadcast(g1.groupBy(col("c_nationkey")).agg(sum(col("cnt")).as("g")))
    val tot = broadcast(g1.agg(sum(col("cnt")).as("nn")))
    // EVERY rung's fold in ONE pass over the finest table: each finest row
    // explodes to its (rung, width, folded bucket) under the same
    // fold-at-width law, and a single (rung, segment, b, nation) aggregate
    // replaces the per-rung fold pipelines — the per-rung arithmetic below
    // is unchanged, it just carries `rung` as a grouping column instead of
    // running once per rung. Six parallel aggregate+join chains collapse
    // to one (plan: ~30 exchanges → ~7; the rung fan-out is bounded by the
    // config-sized ladder, so the exploded table is |rungs| × |finest|,
    // never corpus-scaled).
    val rungStructs = ladderRungs.map { case (i, wd, _) =>
      val fb =
        if (wd == KAnonWidths.head.toLong) col("b")
        else if (wd == 0L) lit(0L)
        else expr(s"cast(floor(b / ${wd / KAnonWidths.head}) as bigint)")
      struct(lit(i.toLong).as("rung"), lit(wd).as("bucket_width"),
        fb.cast("long").as("fb"))
    }
    val foldedAll = track(g1
      .select(explode(array(rungStructs: _*)).as("rw"),
        col("c_mktsegment"), col("c_nationkey"), col("cnt"))
      .groupBy(col("rw.rung").as("rung"), col("rw.bucket_width").as("bucket_width"),
        col("c_mktsegment"), col("rw.fb").as("b"), col("c_nationkey"))
      .agg(sum(col("cnt")).as("cnt")))
    val cs = track(foldedAll
      .groupBy(col("rung"), col("bucket_width"), col("c_mktsegment"), col("b"))
      .agg(sum(col("cnt")).as("n_c"), count(lit(1)).as("n_sens")))
    val grid = cs.crossJoin(nat)
      .join(foldedAll.select(col("rung").as("r2"), col("c_mktsegment").as("cm2"),
          col("b").as("b2"), col("c_nationkey").as("nk2"), col("cnt")),
        col("r2") === col("rung") && col("cm2") === col("c_mktsegment")
          && col("b2") === col("b") && col("nk2") === col("c_nationkey"), "left")
      .select(col("rung"), col("c_mktsegment"), col("b"), col("n_c"), col("g"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val tv = grid.crossJoin(tot)
      .groupBy(col("rung"), col("c_mktsegment"), col("b"), col("n_c"), col("nn"))
      .agg(sum(abs(col("cnt") * col("nn") - col("g") * col("n_c"))).as("tvd_num"))
    // ONE aggregate per rung for both t outputs (max is reporting,
    // the violation count is the exact verdict input)
    val tm = tv.groupBy(col("rung"))
      .agg(
        max(call_function("div", lit(1000L) * col("tvd_num"),
          lit(2L) * col("n_c") * col("nn"))).as("t_max_permille"),
        sum(when(lit(1000L) * col("tvd_num") >
          lit(2L) * lit(TclosenessT) * col("n_c") * col("nn"), 1L)
          .otherwise(0L)).as("n_t_violations"))
    val kl = cs.groupBy(col("rung"), col("bucket_width"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("n_c")).as("k_anonymity"),
        min(col("n_sens")).as("l_diversity"))
    val ladder = track(kl.join(tm, Seq("rung"))
      .select(col("rung"), col("bucket_width"), col("n_classes"),
        col("k_anonymity"), col("l_diversity"),
        col("t_max_permille"), col("n_t_violations")))
    val clears = col("k_anonymity") >= KAnonymityK &&
      col("l_diversity") >= LDiversityL && col("n_t_violations") === 0L
    val chosen = broadcast(ladder.agg(coalesce(
      min(when(clears, col("rung"))), lit(-1L)).as("chosen_rung")))
    ladder.crossJoin(chosen)
      .select(col("rung"), col("bucket_width"), col("n_classes"),
        col("k_anonymity"), col("l_diversity"), col("t_max_permille"),
        col("n_t_violations"), clears.as("clears_all"), col("chosen_rung"))
      .orderBy("rung")
  }

  /** THE RELEASE ITSELF — [[dqReleaseLadder]] picks the rung; this entry
    * SHIPS it: the anonymized quasi-identifier class table at exactly the
    * chosen generalization, the artifact a data-release team actually
    * hands over (classes, sizes, distinct-sensitive counts — never row
    * level). The chosen rung comes from the ladder's own published
    * derivation ([[releaseLadderPublish]] — one decision law, so apply
    * and audit cannot fork; a 1-row bounded collect, the nDocs-literal
    * convention), then ONE fold of the same finest class table at that
    * width (suppression = the bucket folded away, bucket 0). The oracle
    * re-derives the chosen rung independently (the full per-rung chain)
    * and selects the matching independently-derived class table, so the
    * gate proves decision AND application against raw-table re-derivation
    * at whichever rung this corpus promotes to — the three SFs exercise
    * different rungs (sf0.1 releases at the finest width 1000; sf0.001
    * and sf0.01 promote to suppression). Emits the −1 no-clearing
    * sentinel case as an EMPTY release (nothing clears, nothing ships) —
    * stated identically in both engines.
    *
    * Scale shape: the ladder decision is bounded publication arithmetic
    * over the cached finest table (see dq_release_ladder); the release
    * itself is one more fold of it. */
  val dqReleaseApply = QuerySpec(
    "dq_release_apply",
    "ship the anonymized release: the class table at the ladder's chosen rung, decision and application both oracle-proven",
    Some {
      // the decision chain is the ladder's own builder, ra-prefixed; the
      // release arm unions the chain's per-rung class tables and keeps
      // the chosen one
      val unionS = ladderRungs.map { case (i, wd, _) =>
        s"""SELECT CAST($i AS BIGINT) AS rung, CAST($wd AS BIGINT) AS bucket_width,
           |  c_mktsegment, b AS bal_bucket, n_c AS class_n, n_sens AS n_sensitive
           |FROM ra${i}_s""".stripMargin
      }.mkString(" UNION ALL ")
      s"""WITH ${releaseLadderCtes("ra")},
         |ras AS ($unionS)
         |SELECT s.rung, s.bucket_width, s.c_mktsegment, s.bal_bucket,
         |  s.class_n, s.n_sensitive
         |FROM ras s CROSS JOIN rac c WHERE s.rung = c.chosen_rung
         |ORDER BY s.c_mktsegment, s.bal_bucket""".stripMargin
    },
    (s, dir, scope) => {
      val g1 = scope.track(Tables(s, dir, "customer")
        .groupBy(col("c_mktsegment"), kAnonBalBucket(KAnonWidths.head).as("b"),
          col("c_nationkey"))
        .agg(count(lit(1)).as("cnt")))
      // the decision comes from the ladder's OWN publication — one law
      // for audit and apply; the ladder is 5 rows, so this collect is the
      // bounded-literal convention, not a driver-side loop
      val chosen = releaseLadderPublish(g1, scope.track)
        .select("chosen_rung").head().getLong(0)
      if (chosen < 1) {
        // nothing clears: nothing ships (the empty release, typed)
        s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(
            "rung BIGINT, bucket_width BIGINT, c_mktsegment STRING, " +
              "bal_bucket BIGINT, class_n BIGINT, n_sensitive BIGINT"))
      } else {
        // the width comes from the SAME rung table the decision chain and
        // the oracle are generated from — never a re-derived mapping
        val wd = ladderRungs.find(_._1 == chosen.toInt).get._2
        foldAtWidth(g1, wd).groupBy(col("c_mktsegment"), col("b"))
          .agg(sum(col("cnt")).as("class_n"), count(lit(1)).as("n_sensitive"))
          .select(lit(chosen).as("rung"), lit(wd).as("bucket_width"),
            col("c_mktsegment"), col("b").as("bal_bucket"),
            col("class_n"), col("n_sensitive"))
          .orderBy("c_mktsegment", "bal_bucket")
      }
    })

  val all: Seq[QuerySpec] = Seq(dqChecksum, dqProfile, dqAnomaly, dqGaps,
    dqDrift, dqFreshness, dqReferential, dqProfileDrift, dqUniqueness,
    dqExpectations, dqKanonymity, dqKanonymityGeneralize, dqLdiversity,
    dqTcloseness, dqTclosenessEmd, dqReleaseLadder, dqReleaseApply)
}
