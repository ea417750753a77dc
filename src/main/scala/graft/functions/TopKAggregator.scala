package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.2 "UDAF"): bounded top-k by score with
  * a deterministic (score DESC, id ASC) order. The buffer never exceeds k
  * entries, so partial aggregation state is O(k) per group regardless of
  * group size — the property that makes per-group top-k safe at 100 TB
  * (contrast with collect_list + sort, whose state is unbounded).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  // score DESC, id ASC
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    val (hi, lo) = buf.span(better(_, x))
    (hi ++ (x +: lo)).take(k)
  }

  override def zero: Seq[(Double, Long)] = Seq.empty
  override def reduce(b: Seq[(Double, Long)], a: (Long, Double)): Seq[(Double, Long)] =
    insert(b, (a._2, a._1))
  override def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b2.foldLeft(b1)(insert)
  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
