package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Top-k (score, id) pairs per group as a typed `Aggregator` — the
  * scale-correct alternative to `row_number().over(partitionBy(...))` for
  * small k: the window form SORTS every group's full row set (one task per
  * group at any scale), while this aggregator keeps a bounded k-element
  * buffer that combines map-side, so the shuffle carries at most k rows
  * per group per partition.
  *
  * Ordering: score descending, id ascending on ties (deterministic).
  */
class TopKPerGroup(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def trim(xs: Seq[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) trim(buf :+ row)
    else if (better(row, buf.last)) trim(buf :+ row)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
