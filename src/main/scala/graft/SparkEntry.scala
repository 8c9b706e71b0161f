package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The catalog is assembled from themed QuerySpec groups; every spec pairs a
  * Spark-native plan with (where SQL-expressible) DuckDB oracle SQL whose
  * column names and row order match exactly.
  */
object SparkEntry {

  /** All registered query specs, grouped by theme. */
  def specs: Seq[QuerySpec] = {
    val all = HeatmapQueries.all ++ RelationalQueries.all ++ AdvancedQueries.all ++
      EventQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++ StreamingQueries.all ++
      GeoQueries.all ++ DataQualityQueries.all ++ CorpusPipeline.all ++
      PackingQueries.all ++ ConnectorQueries.all
    // a duplicate name would silently drop a query from the Map-based
    // driver contract — fail loudly instead
    val dup = all.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference pipeline output: result-set heatmap JSON blobs
    * (heatmap.py batchMain end-to-end, Spark-first). */
  def entry(spark: SparkSession): DataFrame =
    HeatmapQueries.hmBlobs.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(s => s.name -> s.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(s => s.oracle.map(s.name -> _)).toMap
}
