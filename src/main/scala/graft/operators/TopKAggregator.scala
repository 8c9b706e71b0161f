package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` computing the top-k (value, tag) pairs
  * per group — the custom-UDAF surface of the engine (SURVEY.md §2.x: the
  * reference's "UDFs" are Python lambdas; Spark-native custom aggregation is
  * an Aggregator with Encoders).
  *
  * The buffer is a bounded sorted list (size ≤ k), so partial aggregation
  * keeps shuffle traffic at k rows per group per partition — the same
  * map-side-combine contract as built-in aggregates, which is what makes
  * per-group top-k scale without a full window sort.
  *
  * Ordering: by value DESC, then tag ASC (deterministic under ties).
  */
class TopKAggregator(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private def insert(buf: Seq[(Long, Long)], v: (Long, Long)): Seq[(Long, Long)] = {
    // (-value, tag) ascending == value desc, tag asc
    val merged = (v +: buf).sortBy { case (value, tag) => (-value, tag) }
    if (merged.size > k) merged.take(k) else merged
  }

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    insert(buf, in)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sortBy { case (value, tag) => (-value, tag) }.take(k)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
