package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch as a typed Aggregator —
  * the sketch-based approximate-distinct from SURVEY.md §7 Phase 3.
  *
  * The buffer is the k smallest DISTINCT 60-bit hashes seen; the
  * estimator is the classic KMV n̂ = (k-1) · 2^60 / h₍k₎ (exact count
  * when fewer than k distinct values exist). Bounded buffer ⇒ map-side
  * partial aggregation ships at most k longs per group per partition —
  * the shuffle is O(groups · k), independent of row count, the property
  * that makes a 100 TB COUNT(DISTINCT) cheap when ±2% error is fine.
  *
  * Unlike HLL, KMV over a fixed hash is fully DETERMINISTIC: the k
  * minima are a pure function of the value set (insertion- and
  * partition-order independent), and the estimate is one exact integer
  * product and ONE IEEE division — so this "approximate" operator has
  * an exact DuckDB oracle twin (the same k-th smallest distinct md5
  * hash fed through the same formula). Relative error ≈ 1/√(k-2):
  * k = 256 → ~6%.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Double] {

  /** 2^60, the hash range of TextOps.hash60 — exactly representable. */
  private val hashRange = 1152921504606846976.0

  override def zero: Seq[Long] = Seq.empty

  // buffer invariant: sorted ascending, distinct, length <= k
  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.length >= k && h >= buf.last) buf
    else if (buf.contains(h)) buf
    else ((buf :+ h).sorted).take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: Seq[Long]): Double =
    if (r.length < k) r.length.toDouble
    else (k - 1).toDouble * hashRange / r.last.toDouble

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
