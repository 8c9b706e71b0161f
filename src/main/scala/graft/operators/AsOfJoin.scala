package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the latest right row of the same
  * key with rightTime <= leftTime. Spark has no native operator for this;
  * the naive form (equi-join + range predicate + argmax) explodes
  * quadratically within hot keys.
  *
  * This implementation uses the union + last(ignoreNulls) window pattern:
  * tag both sides, union them, and carry the most recent right payload
  * forward within each key's time-ordered stream. Cost is ONE shuffle of
  * |L|+|R| rows and a per-key sort — the same plan shape Spark uses for any
  * window, so it scales like sessionization (linear, skew limited to single
  * keys), never like a range join.
  *
  * Tie behavior: a right row at exactly leftTime IS visible to that left row
  * (right sorts before left on equal timestamps).
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param key        join key column name present on both sides
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param rightCols  right columns to attach (as-of values); names must
    *                   not collide with left column names
    * @param tolerance  optional maximum staleness in the time columns' own
    *                   units (requires numeric time columns): a right row
    *                   older than leftTime - tolerance is NOT attached (the
    *                   as-of columns come back null), matching the
    *                   `tolerance` semantics of pandas merge_asof. Same
    *                   plan, same single shuffle — the bound is applied to
    *                   the carried payload, not by widening the join.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {
    val lCols = left.columns.toSeq
    // the right event time rides inside the payload struct so a tolerance
    // bound can compare it against the left time after the carry-forward
    val payCols = rightCols.map(col) :+ col(rightTime).as("_rt")
    val payType = right.select(struct(payCols: _*).as("_p")).schema("_p").dataType

    val lTagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_rpay", lit(null).cast(payType))
    val rTagged = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_rpay", struct(payCols: _*))
      .select(col(key), col("_t"), col("_side"), col("_rpay"))
    // align right rows to the left schema with null padding for the union
    val rAligned = lCols.filterNot(_ == key).foldLeft(rTagged) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rAligned.select(lTagged.columns.map(col): _*))
      .withColumn("_asof", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val inTol = tolerance match {
      case Some(tol) => col("_asof").isNotNull && (col("_t") - col("_asof._rt")) <= tol
      case None => col("_asof").isNotNull
    }
    carried.select(lCols.map(col) ++ rightCols.map(c =>
      when(inTol, col(s"_asof.$c")).otherwise(lit(null)).as(c)): _*)
  }
}
