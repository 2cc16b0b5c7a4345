package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored neighbor candidate: similarity, vector id, its label. */
case class ScoredNbr(cos: Double, id: Long, label: Int)

/** Typed aggregator: the k highest-scoring neighbors per group, ordered
  * (cos DESC, id ASC) — the kNN counterpart of [[MinKByHash]].
  *
  * Why an Aggregator and not a window function: ROW_NUMBER over a
  * per-query window shuffles EVERY scored (query, candidate) row to the
  * query's partition before ranking — for brute-force kNN that is
  * |corpus|·|queries| rows through one exchange. This buffer is capped
  * at k, so map-side partial aggregation cuts each partition's
  * contribution to k rows per query BEFORE the shuffle; the exchange
  * carries O(queries × k × partitions-touched). Deterministic: the
  * (cos DESC, id ASC) order ties IEEE-identical cosines on the vector
  * id, so merges commute and the result is partitioning-invariant.
  */
class BestKByScore(k: Int) extends Aggregator[ScoredNbr, Seq[ScoredNbr], Seq[ScoredNbr]] {

  private def ord: Ordering[ScoredNbr] = Ordering.by(x => (-x.cos, x.id))

  override def zero: Seq[ScoredNbr] = Seq.empty

  override def reduce(buf: Seq[ScoredNbr], a: ScoredNbr): Seq[ScoredNbr] = {
    if (buf.length >= k && ord.gteq(a, buf.last)) buf
    else ((buf :+ a).sorted(ord)).take(k)
  }

  override def merge(a: Seq[ScoredNbr], b: Seq[ScoredNbr]): Seq[ScoredNbr] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[ScoredNbr]): Seq[ScoredNbr] = r.sorted(ord)

  override def bufferEncoder: Encoder[Seq[ScoredNbr]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredNbr]]()
  override def outputEncoder: Encoder[Seq[ScoredNbr]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredNbr]]()
}
