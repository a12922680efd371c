package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (`Aggregator[IN, BUF, OUT]`) — the engine's
  * user-defined-aggregate surface.
  *
  * TopKAgg is the scale-motivated one: exact top-k per group where the
  * BUFFER is bounded at k. Partial aggregation then ships at most
  * k·partitions rows per group instead of every row — the window
  * row_number() formulation (q_topk1) shuffles the full input. Same
  * answer, ~n/k less shuffle for hot groups.
  */
object Aggregators {

  /** Top-k (orderKey, payload) pairs per group, largest orderKey first,
    * ties impossible when callers build a composite tie-free key (see
    * q_topk2: cents-scaled price + inverted id).
    */
  class TopKAgg(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    private val ord: Ordering[(Long, Long)] = Ordering.by(t => (-t._1, t._2))

    override def zero: Seq[(Long, Long)] = Nil

    override def reduce(buf: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      // buf stays sorted + bounded: insertion is O(k), and k is small
      (a +: buf).sorted(ord).take(k)

    override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
      (x ++ y).sorted(ord).take(k)

    override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

    override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  }

  /** Exact weighted mean as a minimal two-field Aggregator example. */
  class WeightedMeanAgg extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Double, Double), y: (Double, Double)): (Double, Double) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
