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

  // explicit comparator, NOT sortBy(-value, ...): negation overflows for
  // Long.MinValue (-Long.MinValue == Long.MinValue), which would rank the
  // smallest possible value first
  private val ord: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1) // value desc
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // tag asc
    }
  }

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(buf: Seq[(Long, Long)], in: (Long, Long)): Seq[(Long, Long)] =
    merge(buf, Seq(in))

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
