package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TileFunctions

/** The reference's batch pipeline (heatmap.py `batchMain`, lines 152–158) as
  * a composable Spark-native API: a user of the reference can point this at
  * the same `locations` shape (latitude, longitude, source, user_id,
  * timestamp — FIXTURES.md §A) and get the same `heatmaps` output shape
  * (id = "group|timespan|rsTile", heatmap = JSON {fineTileId: count}).
  *
  * Differences from the reference, all deliberate:
  *   - single-pass pyramid (explode ancestors + ONE aggregation) instead of
  *     16 chained reduceByKey/groupByKey rounds — 1 shuffle vs 32
  *     (SURVEY.md §4.4.2);
  *   - intended user-group semantics: the fan-out applies exactly once, so
  *     `all`-group counts equal raw counts at every level, instead of the
  *     reference's exponential double-count (verified defect,
  *     SURVEY.md §2.11.2);
  *   - timespans (alltime/month/day) are live, not dead code
  *     (heatmap.py:38–52), and the early-return bug that dropped all but the
  *     first timespan (§2.11.1) does not exist by construction;
  *   - source/sink are any DataFrame reader/writer (the reference hardcodes
  *     Cassandra, heatmap.py:131–150).
  *
  * Scale: the one aggregation shuffles (group, timespan, zoom, tile) keys
  * with map-side combine; the `all` hot key is AQE-skew-splittable because
  * counts are decomposable sums (SURVEY.md §7.4).
  */
object HeatmapPipeline {

  /** Column bindings for a `locations`-shaped input. */
  final case class Config(
      lat: Column = col("latitude"),
      lon: Column = col("longitude"),
      source: Column = col("source"),
      userId: Column = col("user_id"),
      ts: Column = col("timestamp"),
      fineZoom: Int = 21,          // MAX_ZOOM 16 + DETAIL_ZOOM_DELTA 5 (heatmap.py:16–17)
      coarseZoom: Int = 6,         // pyramid floor (heatmap.py:110)
      detailZoomDelta: Int = 5,    // result-set tile offset (heatmap.py:17)
      dropSource: String = "background", // heatmap.py:28
      timespans: Boolean = false)  // enable month/day labels (alltime always on)

  /** Stage 1 — op #3 (heatmap.py:25–36): drop excluded sources, quantize to
    * the fine zoom, emit one observation per point with count 1.0. */
  def observations(locations: DataFrame, cfg: Config = Config()): DataFrame = {
    val base = locations
      .filter(cfg.source =!= cfg.dropSource)
      .select(
        TileFunctions.tileRow(cfg.lat, cfg.fineZoom).as("fine_row"),
        TileFunctions.tileCol(cfg.lon, cfg.fineZoom).as("fine_col"),
        cfg.userId.cast("string").as("user_id"),
        (if (cfg.timespans) {
          // a null timestamp cannot be bucketed: fail loudly, because the
          // silent alternative emits TWO null-timespan rows per point
          // (double-counting) and concat_ws later drops the null segment,
          // producing malformed 2-part blob ids downstream
          val ts = when(cfg.ts.isNull, raise_error(lit(
            "HeatmapPipeline: null timestamp with timespans enabled")))
            .otherwise(cfg.ts)
          array(lit("alltime"), date_format(ts, "yyyy-MM"), date_format(ts, "yyyy-MM-dd"))
        } else array(lit("alltime"))).as("timespans"),
        lit(1.0).as("count"))
    // user-group fan-out, applied exactly once (heatmap.py:62–70 intended):
    // 'all' + per-user, except 'x*' users (excluded) and 'rt-*' (→ 'route')
    base
      .withColumn("user_group", explode(array(lit("all"),
        when(col("user_id").startsWith("x"), lit(null))
          .when(col("user_id").startsWith("rt-"), lit("route"))
          .otherwise(col("user_id")))))
      .filter(col("user_group").isNotNull)
      .withColumn("timespan", explode(col("timespans")))
      .drop("timespans", "user_id")
  }

  /** Stage 2 — ops #4–#10 in one pass: counts per (group, timespan, zoom,
    * tile) for every zoom in [coarseZoom, fineZoom], via exact integer
    * ancestor arithmetic on the single fine quantization. */
  def pyramid(obs: DataFrame, cfg: Config = Config()): DataFrame =
    obs
      // pre-aggregate at the fine zoom first (the reference's level-from-
      // level insight, heatmap.py:117): coarser levels derive from the much
      // smaller fine aggregate, not from raw observations
      .groupBy(col("user_group"), col("timespan"), col("fine_row"), col("fine_col"))
      .agg(sum(col("count")).as("count"))
      .withColumn("zoom", explode(sequence(lit(cfg.coarseZoom), lit(cfg.fineZoom))))
      .groupBy(col("user_group"), col("timespan"), col("zoom"),
        expr(s"shiftright(fine_row, ${cfg.fineZoom} - zoom)").as("r"),
        expr(s"shiftright(fine_col, ${cfg.fineZoom} - zoom)").as("c"))
      .agg(sum(col("count")).as("count"))

  /** Stage 3 — ops #6–#7, #11–#12 (heatmap.py:79–90, 120–129, 157): package
    * each zoom level into result-set blobs keyed 5 zooms coarser; `heatmap`
    * is canonical JSON {fineTileId: count} with sorted keys via native
    * MapType + to_json. */
  def resultSetBlobs(pyr: DataFrame, cfg: Config = Config()): DataFrame =
    pyr
      .filter(col("zoom") - cfg.detailZoomDelta >= 0)
      .groupBy(
        col("user_group"), col("timespan"),
        concat_ws("_", col("zoom") - cfg.detailZoomDelta,
          expr(s"shiftright(r, ${cfg.detailZoomDelta})"),
          expr(s"shiftright(c, ${cfg.detailZoomDelta})")).as("rs_tile"))
      .agg(to_json(map_from_entries(array_sort(collect_list(
        struct(concat_ws("_", col("zoom"), col("r"), col("c")), col("count"))))))
        .as("heatmap"))
      .select(concat_ws("|", col("user_group"), col("timespan"), col("rs_tile")).as("id"),
        col("heatmap"))

  /** The full batchMain equivalent: locations in, heatmap blobs out. */
  def run(locations: DataFrame, cfg: Config = Config()): DataFrame =
    resultSetBlobs(pyramid(observations(locations, cfg), cfg), cfg)

  /** Incremental maintenance — the reference's read-add-write-back append
    * (heatmap.py:149–150) without recomputing the base period: merge two
    * blob tables of [[run]]'s output shape by summing per-fine-tile counts
    * over the key union (full-outer on blob id, `map_zip_with`), then
    * re-serialize through the SAME sorted-map construction as
    * [[resultSetBlobs]], so merged blobs are byte-identical to recomputed
    * ones. Counts are decomposable sums, so `merge(run(A), run(B)) ==
    * run(A ∪ B)` for ANY disjoint row split — associative and commutative,
    * fold daily deltas in any order (HeatmapPipelineSpec pins a 3-way
    * fold; the oracle-gated `hm_blob_merge` pins the corpus-scale variant).
    * At 100 TB the left side is the stored blob table read back from the
    * sink; only the delta touches raw locations. */
  def mergeBlobs(base: DataFrame, delta: DataFrame): DataFrame = {
    val mapType = org.apache.spark.sql.types.DataType.fromDDL("map<string,double>")
    // a malformed blob must FAIL the job, not vanish: from_json returns null
    // on parse failure, and a null map would silently null the merged row —
    // on a corrupt blob store that is data loss disguised as success
    def parsed(c: Column): Column = {
      val m = from_json(coalesce(c, lit("{}")), mapType)
      when(m.isNull, raise_error(concat(lit("mergeBlobs: malformed blob JSON for id "),
        col("id"), lit(": "), c))).otherwise(m)
    }
    val merged = map_zip_with(parsed(col("hb")), parsed(col("hd")),
      (_, v1, v2) => coalesce(v1, lit(0.0)) + coalesce(v2, lit(0.0)))
    base.select(col("id"), col("heatmap").as("hb"))
      .join(delta.select(col("id"), col("heatmap").as("hd")), Seq("id"), "full_outer")
      .select(col("id"),
        // map_zip_with appends right-only keys AFTER the left's — re-sort
        // entries so the JSON key order matches resultSetBlobs' writer
        to_json(map_from_entries(array_sort(map_entries(merged)))).as("heatmap"))
  }
}
