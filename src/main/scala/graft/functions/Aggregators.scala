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

    // buf is always sorted (desc by key) and bounded at k; per-row work is a
    // short-circuit compare against the current minimum, then an O(k)
    // insertion — no per-row sort/alloc of the whole buffer
    override def reduce(buf: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] =
      if (buf.lengthCompare(k) >= 0 && ord.gteq(a, buf.last)) buf
      else insert(buf, a)

    private def insert(buf: Seq[(Long, Long)], a: (Long, Long)): Seq[(Long, Long)] = {
      val (before, after) = buf.span(ord.lt(_, a))
      val grown = (before :+ a) ++ after
      if (grown.lengthCompare(k) > 0) grown.init else grown
    }

    // merge of two sorted bounded buffers: linear merge, stop at k
    override def merge(x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val (ix, iy) = (x.iterator.buffered, y.iterator.buffered)
      while (out.length < k && (ix.hasNext || iy.hasNext)) {
        out += (if (!iy.hasNext || (ix.hasNext && ord.lteq(ix.head, iy.head))) ix.next()
                else iy.next())
      }
      out.toSeq
    }

    override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

    override def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  }

  /** [[TopKAgg]] over a raw DOUBLE order key (largest first, payload-asc
    * ties) for callers whose key has no exact integer grid — the IVF
    * cosine paths rank by the raw double. The comparator mirrors Spark's
    * `ORDER BY key DESC, payload ASC` sort semantics EXACTLY so the kept
    * set is provably the window formulation's: NaN sorts greatest
    * (nanSafeCompareDoubles) and -0.0 == 0.0 (UnsafeRow normalization) —
    * a plain `Ordering.by(-key)` would diverge on both corners.
    */
  class TopKAggD(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private def n0(d: Double): Double = if (d == 0.0) 0.0 else d // -0.0 -> 0.0
    private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        // java.lang.Double.compare: NaN greater than everything, matching
        // Spark's nanSafeCompareDoubles once -0.0 is normalized away
        val c = java.lang.Double.compare(n0(b._1), n0(a._1))
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

    override def zero: Seq[(Double, Long)] = Nil

    override def reduce(buf: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      if (buf.lengthCompare(k) >= 0 && ord.gteq(a, buf.last)) buf
      else insert(buf, a)

    private def insert(buf: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = {
      val (before, after) = buf.span(ord.lt(_, a))
      val grown = (before :+ a) ++ after
      if (grown.lengthCompare(k) > 0) grown.init else grown
    }

    override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      val (ix, iy) = (x.iterator.buffered, y.iterator.buffered)
      while (out.length < k && (ix.hasNext || iy.hasNext)) {
        out += (if (!iy.hasNext || (ix.hasNext && ord.lteq(ix.head, iy.head))) ix.next()
                else iy.next())
      }
      out.toSeq
    }

    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b

    override def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
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
