package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregator: the k (hash, id) pairs with the smallest hash per
  * group — bounded-buffer partial top-k.
  *
  * Why an Aggregator and not a window function: ROW_NUMBER over a
  * per-group window shuffles EVERY row to its group's partition before
  * ranking. This aggregator's buffer is capped at k, so map-side
  * partial aggregation reduces each partition's contribution to k rows
  * per group BEFORE the shuffle — at 100 TB the exchange carries
  * O(groups × k × partitions-touched) instead of O(rows). Semantics are
  * identical to min-k-by-hash sampling (deterministic: ties break on
  * id), verified against the same DuckDB oracle as the window version.
  */
case class HashId(h: Long, id: Long)

class MinKByHash(k: Int) extends Aggregator[HashId, Seq[HashId], Seq[HashId]] {

  private def ord: Ordering[HashId] = Ordering.by(x => (x.h, x.id))

  override def zero: Seq[HashId] = Seq.empty

  override def reduce(buf: Seq[HashId], a: HashId): Seq[HashId] = {
    // buf is kept sorted ascending; insert only if it can make the cut
    if (buf.length >= k && ord.gteq(a, buf.last)) buf
    else ((buf :+ a).sorted(ord)).take(k)
  }

  override def merge(a: Seq[HashId], b: Seq[HashId]): Seq[HashId] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[HashId]): Seq[HashId] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[HashId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashId]]()
  override def outputEncoder: Encoder[Seq[HashId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashId]]()
}
