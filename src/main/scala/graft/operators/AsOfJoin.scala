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
  * (right sorts before left on equal timestamps). Right rows tied on
  * (key, rightTime) resolve deterministically to the LARGEST payload tuple
  * (struct ordering) — pandas merge_asof's "last in input order" is not
  * reproducible under distributed shuffle, so a total order replaces it.
  * Right rows with a NULL rightTime are excluded (no event time = never
  * "as of" anything), matching merge_asof's dropna-on-time behavior.
  */
object AsOfJoin {

  private val Reserved = Seq("_t", "_side", "_rpay", "_rt", "_asof")

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
    // internal columns would silently shadow same-named user columns
    // (cf. SaltedJoin's identical guard)
    Reserved.foreach { r =>
      require(!lCols.contains(r) && !right.columns.contains(r),
        s"joinAsOf: input must not contain reserved column '$r'")
    }
    // the right event time rides inside the payload struct so a tolerance
    // bound can compare it against the left time after the carry-forward
    val payCols = rightCols.map(col) :+ col(rightTime).as("_rt")
    val payType = right.select(struct(payCols: _*).as("_p")).schema("_p").dataType

    val lTagged = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_rpay", lit(null).cast(payType))
    val rTagged = right
      // a null right time would sort NULLS FIRST and masquerade as the
      // earliest as-of match for every key — exclude it (doc: no event
      // time = never "as of" anything)
      .filter(col(rightTime).isNotNull)
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_rpay", struct(payCols: _*))
      .select(col(key), col("_t"), col("_side"), col("_rpay"))
    // align right rows to the left schema in ONE projection (a per-column
    // withColumn fold re-analyzes a growing plan — quadratic on wide tables)
    val rAligned = rTagged.select(
      col(key) +: lCols.filterNot(_ == key).map(c =>
        lit(null).cast(left.schema(c).dataType).as(c)) ++:
        Seq(col("_t"), col("_side"), col("_rpay")): _*)

    // _rpay last in the sort: right rows tied on (key, time) resolve to the
    // LARGEST payload struct — the documented deterministic tie-break
    // (left rows carry a null _rpay but their (_t, _side=1) never ties a
    // right row's (_t, _side=0) at the same time)
    val w = Window.partitionBy(key).orderBy(col("_t"), col("_side"), col("_rpay"))
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
