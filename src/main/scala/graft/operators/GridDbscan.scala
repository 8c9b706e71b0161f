package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid DBSCAN core — density clustering over an aggregated cell table
  * (the GriDBSCAN / grid-approximation family), factored out of the
  * `geo_dbscan` catalog entry so the clustering laws are testable on
  * planted grids independent of the Mercator quantization feeding it:
  *
  *   - CORE cells hold >= minPts points;
  *   - core cells connected through 8-neighbor adjacency form one cluster,
  *     labeled by the component's MINIMUM flat cell id (r·gridP + c);
  *   - occupied non-core cells adjacent to >= 1 core cell join as BORDER
  *     mass, ties to the minimum adjacent cluster label — classic DBSCAN
  *     leaves border assignment order-dependent; the grid form makes it
  *     deterministic, so it can sit under a hash gate;
  *   - adjacency does NOT wrap at grid edges: neighbor coordinates are
  *     bounds-checked BEFORE flattening to the single id, because
  *     r·gridP + c aliases (r, gridP−1)+east to (r+1, 0) otherwise.
  *
  * Scale shape: everything here runs on the OCCUPIED-CELL table (bounded
  * by gridP² and in practice by data density — the corpus-sized work is
  * the caller's one cell aggregation); adjacency is an equi-join on
  * exploded (r+dr, c+dc) keys, never a distance predicate, and the
  * component step is the shared large-star/small-star operator.
  */
object GridDbscan {

  /** @param cells aggregated occupied cells `(r: long, c: long, n: long)` —
    *        should already be cached by the caller's scope (it feeds core
    *        selection, the adjacency fan, AND border assignment)
    * @param gridP grid width (cell id = r·gridP + c; 0 <= r, c < gridP)
    * @param minPts core-cell density threshold
    * @param scope cache owner for the component labels' checkpoint blocks
    * @return one row per cluster: `(cluster_id, n_core_cells, core_points,
    *         n_border_cells, border_points)` ordered by nothing — callers
    *         render/order for presentation */
  def cluster(cells: DataFrame, gridP: Long, minPts: Long,
      scope: CacheScope = CacheScope.Unmanaged): DataFrame = {
    val core = scope.track(cells.filter(col("n") >= minPts)
      .withColumn("id", col("r") * gridP + col("c")))
    // 8-offset explode of the CELL table (never of raw points), equi-joined
    // back against core ids — the scalable form of the ABS-distance join
    val offsets = explode(array((for { dr <- -1 to 1; dc <- -1 to 1
      if dr != 0 || dc != 0 } yield struct(lit(dr.toLong).as("dr"), lit(dc.toLong).as("dc"))): _*))
    def neighborIds(df: DataFrame, keep: Seq[String]): DataFrame =
      df.select(keep.map(col) :+ offsets.as("o"): _*)
        .select(keep.map(col) :+ (col("r") + col("o.dr")).as("nr") :+
          (col("c") + col("o.dc")).as("nc"): _*)
        .filter(col("nr") >= 0 && col("nr") < gridP &&
          col("nc") >= 0 && col("nc") < gridP)
        .select(keep.map(col) :+ (col("nr") * gridP + col("nc")).as("nbr_id"): _*)
    val coreEdges = neighborIds(core, Seq("id", "r", "c"))
      .select(col("id").as("doc_a"), col("nbr_id").as("doc_b"))
      .join(core.select(col("id").as("doc_b")), Seq("doc_b"), "left_semi")
    val (ccLabels, _) = ConnectedComponents.run(coreEdges, scope = scope)
    // isolated core cells never enter the edge list; they label themselves
    val labels = core.select(col("id"), col("n"))
      .join(ccLabels, Seq("id"), "left")
      .select(col("id"), col("n"), coalesce(col("label"), col("id")).as("cluster_id"))
    val coreAgg = labels.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_core_cells"), sum("n").as("core_points"))
    val borderAgg = neighborIds(cells.filter(col("n") < minPts), Seq("r", "c", "n"))
      .withColumnRenamed("nbr_id", "id")
      .join(labels.select(col("id"), col("cluster_id")), Seq("id"))
      .groupBy("r", "c")
      .agg(min("n").as("n"), min("cluster_id").as("cluster_id"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n_border_cells"), sum("n").as("border_points"))
    coreAgg.join(borderAgg, Seq("cluster_id"), "left")
      .select(col("cluster_id"), col("n_core_cells"), col("core_points"),
        coalesce(col("n_border_cells"), lit(0L)).as("n_border_cells"),
        coalesce(col("border_points"), lit(0L)).as("border_points"))
  }
}
