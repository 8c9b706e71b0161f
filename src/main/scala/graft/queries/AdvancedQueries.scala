package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.operators.AsOfJoin

/** Advanced relational coverage: as-of join, exact statistical aggregates,
  * window frame functions, pivot, correlated subqueries, array scalars.
  *
  * Determinism follows the RelationalQueries rules (integer-exact inputs,
  * IEEE-deterministic derived doubles, full-tie-break ordering).
  */
object AdvancedQueries {

  private def tbl(s: SparkSession, dir: String)(name: String): DataFrame =
    Tables(s, dir, name)

  private def cents(c: Column): Column = floor(c * 100)

  /** Shared CTE prefix of the two as-of oracles: purchases (left) and
    * signups (right) unioned with side tags, signup payload carried forward
    * by LAST_VALUE IGNORE NULLS over (user, ms, side). One definition so
    * the plain and tolerance-bounded gates can never disagree about the
    * operator's carry-forward semantics. */
  private val asofCtes: String =
    """l AS (SELECT event_id, user_id, EPOCH_MS(ts) AS ms FROM events
      |  WHERE event_type = 'purchase'),
      |r AS (SELECT event_id AS signup_event, user_id, EPOCH_MS(ts) AS ms FROM events
      |  WHERE event_type = 'signup'),
      |u AS (
      |  SELECT user_id, ms, 1 AS side, event_id,
      |    CAST(NULL AS BIGINT) AS signup_event, CAST(NULL AS BIGINT) AS rms FROM l
      |  UNION ALL
      |  SELECT user_id, ms, 0, CAST(NULL AS BIGINT), signup_event, ms FROM r),
      |wdw AS (SELECT user_id, ms, side, event_id,
      |    LAST_VALUE(signup_event IGNORE NULLS) OVER w AS signup_event,
      |    LAST_VALUE(rms IGNORE NULLS) OVER w AS signup_ms
      |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ms, side
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))""".stripMargin

  /** As-of join (operators.AsOfJoin): each purchase event picks up the
    * latest signup of the same user at-or-before it — the union+window
    * form, one linear shuffle, no range-join explosion. Verified tie-safe:
    * the corpus has no same-user ms-level timestamp collisions. */
  val asofJoin = QuerySpec(
    "asof_join",
    "as-of join: latest signup at-or-before each purchase, per user",
    Some(s"""WITH $asofCtes
            |SELECT event_id, user_id, signup_event, ms - signup_ms AS ms_since_signup
            |FROM wdw WHERE side = 1 ORDER BY event_id""".stripMargin),
    (s, dir) => {
      val ev = tbl(s, dir)("events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_millis(col("ts")).as("ms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ms")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_event"), col("user_id"), col("ms").as("signup_ms"))
      AsOfJoin.joinAsOf(purchases, signups, key = "user_id",
        leftTime = "ms", rightTime = "signup_ms",
        rightCols = Seq("signup_event", "signup_ms"))
        .select(col("event_id"), col("user_id"), col("signup_event"),
          (col("ms") - col("signup_ms")).as("ms_since_signup"))
        .orderBy("event_id")
    })

  private val TolMs: Long = 7L * 24 * 3600 * 1000 // 7 days in epoch millis

  /** Tolerance-bounded as-of (pandas merge_asof `tolerance` semantics): the
    * latest signup is attached only when it is at most 7 days stale;
    * otherwise the as-of columns come back null. Same single-shuffle
    * union+window plan — the bound applies to the carried payload, never by
    * widening the join into a range join. */
  val asofTolerance = QuerySpec(
    "asof_tolerance",
    "as-of join with 7-day staleness bound (stale matches null out)",
    Some(s"""WITH $asofCtes
            |SELECT event_id, user_id,
            |  CASE WHEN ms - signup_ms <= $TolMs THEN signup_event END AS signup_event,
            |  CASE WHEN ms - signup_ms <= $TolMs THEN ms - signup_ms END AS ms_since_signup
            |FROM wdw WHERE side = 1 ORDER BY event_id""".stripMargin),
    (s, dir) => {
      val ev = tbl(s, dir)("events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_millis(col("ts")).as("ms"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ms")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_event"), col("user_id"), col("ms").as("signup_ms"))
      AsOfJoin.joinAsOf(purchases, signups, key = "user_id",
        leftTime = "ms", rightTime = "signup_ms",
        rightCols = Seq("signup_event", "signup_ms"), tolerance = Some(TolMs))
        .select(col("event_id"), col("user_id"), col("signup_event"),
          (col("ms") - col("signup_ms")).as("ms_since_signup"))
        .orderBy("event_id")
    })

  /** Mean/variance/stddev from exact integer sums (sum and sum-of-squares in
    * unbounded integers), so the derived doubles are order-independent —
    * raw stddev() aggregates are NOT reproducible across engines. */
  val aggStats = QuerySpec(
    "agg_stats",
    "statistical aggregates via exact sums (mean/var/stddev)",
    Some("""WITH c AS (SELECT l_returnflag, CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v
           |  FROM lineitem),
           |g AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(MIN(v) AS BIGINT) AS min_cents, CAST(MAX(v) AS BIGINT) AS max_cents,
           |    CAST(SUM(v) AS DOUBLE) AS s1, CAST(SUM(v * v) AS DOUBLE) AS s2
           |  FROM c GROUP BY 1)
           |SELECT l_returnflag, n, min_cents, max_cents,
           |  s1 / n AS mean_cents,
           |  s2 / n - (s1 / n) * (s1 / n) AS var_cents,
           |  SQRT(s2 / n - (s1 / n) * (s1 / n)) AS stddev_cents
           |FROM g ORDER BY l_returnflag""".stripMargin),
    (s, dir) => {
      val c = tbl(s, dir)("lineitem")
        .select(col("l_returnflag"), cents(col("l_extendedprice")).as("v"))
      val g = c.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        min(col("v")).as("min_cents"), max(col("v")).as("max_cents"),
        sum(col("v").cast("decimal(38,0)")).cast("double").as("s1"),
        sum((col("v") * col("v")).cast("decimal(38,0)")).cast("double").as("s2"))
      g.select(col("l_returnflag"), col("n"), col("min_cents"), col("max_cents"),
        (col("s1") / col("n")).as("mean_cents"),
        (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))).as("var_cents"),
        sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))).as("stddev_cents"))
        .orderBy("l_returnflag")
    })

  /** Window frame functions: first/last/nth over full-partition frames,
    * ntile, lead, percent_rank, cume_dist. */
  val winFrames = QuerySpec(
    "win_frames",
    "window frame functions (first/last/nth/ntile/lead/percent_rank)",
    Some("""SELECT o_custkey, o_orderkey, cents,
           |  FIRST_VALUE(cents) OVER w AS biggest,
           |  LAST_VALUE(cents) OVER (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS smallest,
           |  NTH_VALUE(cents, 2) OVER (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_biggest,
           |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           |  LEAD(cents) OVER w AS next_cents,
           |  PERCENT_RANK() OVER w AS pct_rank,
           |  CUME_DIST() OVER w AS cume
           |FROM (SELECT o_custkey, o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
           |      FROM orders)
           |WINDOW w AS (PARTITION BY o_custkey ORDER BY cents DESC, o_orderkey)
           |ORDER BY o_custkey, cents DESC, o_orderkey""".stripMargin),
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("cents").desc, col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      tbl(s, dir)("orders")
        .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("cents"))
        .select(col("o_custkey"), col("o_orderkey"), col("cents"),
          first(col("cents")).over(w).as("biggest"),
          last(col("cents")).over(wFull).as("smallest"),
          nth_value(col("cents"), 2).over(wFull).as("second_biggest"),
          ntile(4).over(w).cast("long").as("quartile"),
          lead(col("cents"), 1).over(w).as("next_cents"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy(col("o_custkey"), col("cents").desc, col("o_orderkey"))
    })

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: per-user event-type count matrix (Catalyst rewrites to a single
    * aggregation with conditional counts — the oracle spells that out). */
  val pivotType = QuerySpec(
    "pivot_type",
    "pivot event types to columns per user",
    Some(s"""SELECT user_id,
            |${eventTypes.map(t => s"  CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS $t").mkString(",\n")}
            |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
    (s, dir) => {
      val p = tbl(s, dir)("events")
        .groupBy("user_id")
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
      p.select(col("user_id") +: eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    })

  /** Correlated scalar subquery: orders priced above the cents-sum of their
    * own lineitems (8.7k rows at sf0.01). Catalyst decorrelates to a join. */
  val subCorrelated = QuerySpec(
    "sub_correlated",
    "correlated scalar subquery (decorrelated by Catalyst)",
    Some("""SELECT o_orderkey,
           |  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS order_cents,
           |  (SELECT CAST(COALESCE(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)), 0) AS BIGINT)
           |   FROM lineitem WHERE l_orderkey = o_orderkey) AS li_cents
           |FROM orders
           |WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) >
           |  (SELECT COALESCE(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)), 0)
           |   FROM lineitem WHERE l_orderkey = o_orderkey)
           |ORDER BY o_orderkey""".stripMargin),
    (s, dir) => {
      tbl(s, dir)("orders").createOrReplaceTempView("orders")
      tbl(s, dir)("lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT o_orderkey,
        |  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS order_cents,
        |  (SELECT CAST(COALESCE(SUM(FLOOR(l_extendedprice * 100)), 0) AS BIGINT)
        |   FROM lineitem WHERE l_orderkey = o_orderkey) AS li_cents
        |FROM orders
        |WHERE FLOOR(o_totalprice * 100) >
        |  (SELECT COALESCE(SUM(FLOOR(l_extendedprice * 100)), 0)
        |   FROM lineitem WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)
    })

  /** Array scalar family over the tokenized documents. */
  val scalarArray = QuerySpec(
    "scalar_array",
    "array scalar functions (slice/contains/sort/reverse/distinct)",
    Some("""WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS ws FROM documents)
           |SELECT doc_id,
           |  ARRAY_TO_STRING(ws[1:3], ' ') AS first3,
           |  LIST_CONTAINS(ws, 'the') AS has_the,
           |  LIST_SORT(ws)[1] AS alpha_first,
           |  LIST_REVERSE(ws)[1] AS last_word,
           |  CAST(LEN(LIST_DISTINCT(ws)) AS BIGINT) AS n_distinct,
           |  LIST_SORT(LIST_DISTINCT(ws))[1] || '/' || LIST_SORT(LIST_DISTINCT(ws))[-1] AS alpha_span
           |FROM t ORDER BY doc_id""".stripMargin),
    (s, dir) => {
      val ws = col("ws")
      tbl(s, dir)("documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"),
          array_join(slice(ws, 1, 3), " ").as("first3"),
          array_contains(ws, "the").as("has_the"),
          element_at(array_sort(ws), 1).as("alpha_first"),
          element_at(reverse(ws), 1).as("last_word"),
          size(array_distinct(ws)).cast("long").as("n_distinct"),
          concat(element_at(array_sort(array_distinct(ws)), 1), lit("/"),
            element_at(array_sort(array_distinct(ws)), -1)).as("alpha_span"))
        .orderBy("doc_id")
    })

  /** Per-group top-k via the typed Aggregator UDAF (operators.TopKAggregator)
    * — identical semantics to win_topk's window form, but with a bounded
    * k-row buffer and map-side combine instead of a per-partition sort. */
  val aggTopkUdaf = QuerySpec(
    "agg_topk_udaf",
    "top-3 per group via typed Aggregator UDAF (bounded-buffer combine)",
    Some("""SELECT o_custkey, o_orderkey, total_cents, CAST(rn AS BIGINT) AS rn FROM (
           |  SELECT o_custkey, o_orderkey,
           |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents,
           |    ROW_NUMBER() OVER (PARTITION BY o_custkey
           |      ORDER BY CAST(FLOOR(o_totalprice * 100) AS BIGINT) DESC, o_orderkey) AS rn
           |  FROM orders)
           |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin),
    (s, dir) => {
      val topk = udaf(new graft.operators.TopKAggregator(3))
      tbl(s, dir)("orders")
        .select(col("o_custkey"), cents(col("o_totalprice")).as("cents"), col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(topk(col("cents"), col("o_orderkey")).as("tk"))
        .select(col("o_custkey"), posexplode(col("tk")).as(Seq("pos", "entry")))
        .select(col("o_custkey"), col("entry._2").as("o_orderkey"),
          col("entry._1").as("total_cents"), (col("pos") + 1).cast("long").as("rn"))
        .orderBy("o_custkey", "rn")
    })

  /** Two-phase salted aggregation (operators.SaltedAgg): hot-key skew
    * spread over 16 salt buckets; result identical to a plain GROUP BY. */
  val aggSalted = QuerySpec(
    "agg_salted",
    "salted two-phase aggregation (skew-spread hot keys)",
    Some("""SELECT event_type AS k, CAST(COUNT(*) AS BIGINT) AS cnt,
           |  CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS total
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
    (s, dir) =>
      graft.operators.SaltedAgg.countSumSalted(
        tbl(s, dir)("events"), col("event_type"), cents(col("value")), 16)
        .orderBy("k"))

  /** Exact median on integer cents via the row_number midpoint method —
    * engine-independent (value-sorted midpoints are deterministic even when
    * duplicate values make row assignment arbitrary), unlike
    * percentile_cont whose interpolation varies across engines. */
  val aggMedian = QuerySpec(
    "agg_median",
    "exact median via sorted midpoint rows (portable)",
    Some("""WITH c AS (SELECT l_returnflag AS rf,
           |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem),
           |r AS (SELECT rf, v,
           |    ROW_NUMBER() OVER (PARTITION BY rf ORDER BY v) AS rn,
           |    COUNT(*) OVER (PARTITION BY rf) AS n
           |  FROM c)
           |SELECT rf, CAST(n AS BIGINT) AS n,
           |  CAST(SUM(CASE WHEN rn = (n + 1) // 2 OR rn = (n + 2) // 2 THEN v ELSE 0 END) AS DOUBLE)
           |    / (CASE WHEN (n + 1) // 2 = (n + 2) // 2 THEN 1 ELSE 2 END) AS median_cents
           |FROM r GROUP BY rf, n ORDER BY rf""".stripMargin),
    (s, dir) => {
      val byV = Window.partitionBy("rf").orderBy("v")
      val whole = Window.partitionBy("rf")
      tbl(s, dir)("lineitem")
        .select(col("l_returnflag").as("rf"), cents(col("l_extendedprice")).as("v"))
        .withColumn("rn", row_number().over(byV))
        .withColumn("n", count(lit(1)).over(whole))
        .groupBy(col("rf"), col("n"))
        .agg((sum(when(col("rn") === expr("(n + 1) div 2") ||
            col("rn") === expr("(n + 2) div 2"), col("v")).otherwise(0L)).cast("double") /
          when(expr("(n + 1) div 2") === expr("(n + 2) div 2"), 1).otherwise(2))
          .as("median_cents"))
        .select(col("rf"), col("n"), col("median_cents"))
        .orderBy("rf")
    })


  /** UNPIVOT (melt): the pivoted per-user count matrix flattened back to
    * (user, type, cnt) rows — zero cells included, which is exactly what
    * distinguishes unpivot from the original group-by. */
  val pivotUnpivot = QuerySpec(
    "pivot_unpivot",
    "unpivot the pivoted event-type matrix back to rows (zeros kept)",
    Some(s"""WITH counts AS (
            |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS cnt
            |  FROM events GROUP BY 1, 2)
            |SELECT u.user_id AS user_id, t.event_type AS event_type, COALESCE(c.cnt, 0) AS cnt
            |FROM (SELECT DISTINCT user_id FROM events) u
            |CROSS JOIN (SELECT UNNEST(${eventTypes.map(t => s"'$t'").mkString("[", ", ", "]")}) AS event_type) t
            |LEFT JOIN counts c ON c.user_id = u.user_id AND c.event_type = t.event_type
            |ORDER BY u.user_id, t.event_type""".stripMargin),
    (s, dir) => {
      val pivoted = Tables(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
      val filled = pivoted.select(col("user_id") +:
        eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      filled.unpivot(Array(col("user_id")), eventTypes.map(col).toArray,
          "event_type", "cnt")
        .orderBy("user_id", "event_type")
    })

  /** Equi-width histogram as a pure hash aggregation: bucket = integer
    * division of exact cents — no global sort, no window, map-side combine
    * collapses each partition to ≤ n_buckets rows before the shuffle. This
    * is the histogram shape that survives 100 TB; the equi-DEPTH variant
    * (ntile) lives in `win_distribution`, partitioned so it never needs a
    * global ordering either. */
  val aggHistogram = QuerySpec(
    "agg_histogram",
    "equi-width order-price histogram ($50k buckets) via integer bucketing",
    Some("""WITH b AS (SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) // 5000000 AS bucket,
           |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents
           |  FROM orders)
           |SELECT CAST(bucket AS BIGINT) AS bucket,
           |  CAST(bucket * 5000000 AS BIGINT) AS bucket_lo_cents,
           |  CAST((bucket + 1) * 5000000 AS BIGINT) AS bucket_hi_cents,
           |  CAST(COUNT(*) AS BIGINT) AS n_orders,
           |  CAST(SUM(total_cents) AS BIGINT) AS sum_cents
           |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
    (s, dir) =>
      tbl(s, dir)("orders")
        .select(cents(col("o_totalprice")).as("total_cents"))
        .withColumn("bucket", expr("total_cents div 5000000"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"), sum(col("total_cents")).as("sum_cents"))
        .select(col("bucket"), (col("bucket") * 5000000L).as("bucket_lo_cents"),
          ((col("bucket") + 1) * 5000000L).as("bucket_hi_cents"),
          col("n_orders"), col("sum_cents"))
        .orderBy("bucket"))

  /** Scalar (uncorrelated) subquery: orders strictly above the global mean
    * price. The comparison runs on cross-multiplied exact integers
    * (total_cents · n > sum_cents — no division, no float threshold), and
    * the 1-row global aggregate broadcasts to every partition: one pass to
    * reduce, one map-side-filtered pass to select, nothing resembling a
    * join shuffle. */
  val subScalar = QuerySpec(
    "sub_scalar",
    "orders above the global average price (scalar subquery, integer-exact)",
    Some("""WITH g AS (SELECT CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           |    CAST(COUNT(*) AS BIGINT) AS n FROM orders)
           |SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS total_cents,
           |  CAST(sum_cents // n AS BIGINT) AS avg_cents_floor
           |FROM orders CROSS JOIN g
           |WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) * n > sum_cents
           |ORDER BY o_orderkey""".stripMargin),
    (s, dir) => {
      val orders = tbl(s, dir)("orders")
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))
      val g = orders.agg(sum(col("total_cents")).as("sum_cents"),
        count(lit(1)).as("n"))
      orders.crossJoin(broadcast(g))
        .filter(col("total_cents") * col("n") > col("sum_cents"))
        .select(col("o_orderkey"), col("total_cents"),
          expr("sum_cents div n").as("avg_cents_floor"))
        .orderBy("o_orderkey")
    })

  /** Count-Min sketch over the document word stream — the mergeable
    * heavy-hitter structure: depth×width (4×256) counters, each cell the
    * count of occurrences hashing into it, point estimate = MIN over the 4
    * rows (never under, over only on collisions). Unlike approx_count_
    * distinct's opaque HLL this sketch is built from the portable 48-bit
    * hash, so the DuckDB oracle reconstructs EVERY cell and estimate
    * bit-for-bit — a fully oracle-checked sketch, not a tolerance check.
    * Scale shape: the ×4 row fan collapses via map-side partial agg to ≤
    * 1024 cells per partition, so the shuffle carries O(depth·width)
    * regardless of corpus size — exactly how sketch partials merge on a
    * real cluster (sum cells cellwise). */
  /** Probe words for the count-min sketch — shared by the Spark builder and
    * the oracle SQL so the two sides can never drift. */
  private val CountminQueryWords =
    Seq("the", "data", "spark", "merge", "window", "zzz_absent")

  val aggCountmin = QuerySpec(
    "agg_countmin",
    "count-min sketch (4x256, portable hash): exact vs estimate per query word",
    Some {
      val qlist = CountminQueryWords.map(w => s"('$w')").mkString(", ")
      s"""WITH w AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents),
         |cells AS (
         |  SELECT d, ${PortableHash.h48Sql("'cm' || CAST(d AS VARCHAR) || ':' || w")} % 256 AS b,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM w CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS d)
         |  GROUP BY 1, 2),
         |q AS (SELECT * FROM (VALUES $qlist) AS t(qw)),
         |est AS (
         |  SELECT qw, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS est_cnt
         |  FROM q CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS qd) ds
         |  LEFT JOIN cells ON cells.d = ds.qd
         |    AND cells.b = ${PortableHash.h48Sql("'cm' || CAST(ds.qd AS VARCHAR) || ':' || qw")} % 256
         |  GROUP BY qw),
         |tru AS (SELECT qw, CAST(COUNT(w.w) AS BIGINT) AS true_cnt
         |  FROM q LEFT JOIN w ON w.w = qw GROUP BY qw)
         |SELECT q.qw AS word, tru.true_cnt, est.est_cnt,
         |  est.est_cnt - tru.true_cnt AS over_cnt
         |FROM q JOIN tru USING (qw) JOIN est USING (qw)
         |ORDER BY word""".stripMargin
    },
    (s, dir) => {
      val wrds = tbl(s, dir)("documents")
        .select(explode(split(col("text"), " ")).as("w"))
      def bucket(word: Column, d: Column): Column =
        PortableHash.h48(concat(lit("cm"), d.cast("string"), lit(":"), word)) % 256
      val cells = wrds
        .select(col("w"), explode(sequence(lit(0), lit(3))).as("d"))
        .groupBy(col("d"), bucket(col("w"), col("d")).as("b"))
        .agg(count(lit(1)).as("c"))
      val q = s.range(1).select(explode(
        array(CountminQueryWords.map(lit): _*)).as("qw"))
      val est = q
        .select(col("qw"), explode(sequence(lit(0), lit(3))).as("qd"))
        .withColumn("qb", bucket(col("qw"), col("qd")))
        .join(cells, col("qd") === col("d") && col("qb") === col("b"), "left")
        .groupBy("qw").agg(min(coalesce(col("c"), lit(0L))).as("est_cnt"))
      val tru = q.join(wrds, col("qw") === col("w"), "left")
        .groupBy("qw").agg(count(col("w")).as("true_cnt"))
      q.join(tru, "qw").join(est, "qw")
        .select(col("qw").as("word"), col("true_cnt"), col("est_cnt"),
          (col("est_cnt") - col("true_cnt")).as("over_cnt"))
        .orderBy("word")
    })

  val all: Seq[QuerySpec] = Seq(asofJoin, asofTolerance, aggStats, winFrames,
    pivotType, subCorrelated, scalarArray, aggTopkUdaf, aggSalted, aggMedian,
    pivotUnpivot, aggHistogram, subScalar, aggCountmin)
}
