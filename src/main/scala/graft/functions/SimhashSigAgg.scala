package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Fused 120-bit SimHash signature Aggregator: one Array[Long] buffer
  * of per-bit vote counters instead of 120 separate SUM aggregate
  * expressions. Same arithmetic bit-for-bit (votes are ±1 per token
  * occurrence summed in 64-bit like the oracle's BIGINT SUM; the sign
  * test packs `>= 0` exactly like the SQL twin), so swapping it under
  * `DedupOps.simhashCore` cannot change results — the DuckDB oracle
  * stays the per-bit-SUM formulation, and no per-document token count
  * can wrap the counter before the oracle's would.
  *
  * Why an imperative Aggregator here when the library prefers
  * declarative sums: the declarative form carries a 120-column
  * aggregation buffer (960 bytes of UnsafeRow per group) through
  * partial and final aggregation; this buffer is 960 bytes updated in
  * one tight loop per token. Per-row input is the two `half`-bit md5
  * halves; the caller passes `DedupOps.SimHashHalfBits` so a signature
  * retune cannot silently diverge this side from the oracle.
  */
class SimhashSigAgg(half: Int) extends Aggregator[(Long, Long), Array[Long], (Long, Long)] {

  private val Half = half

  override def zero: Array[Long] = new Array[Long](2 * Half)

  override def reduce(buf: Array[Long], h: (Long, Long)): Array[Long] = {
    var b = 0
    while (b < Half) {
      buf(b) += ((h._1 >>> b) & 1L) * 2L - 1L
      buf(Half + b) += ((h._2 >>> b) & 1L) * 2L - 1L
      b += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): (Long, Long) = {
    var lo = 0L; var hi = 0L; var b = 0
    while (b < Half) {
      if (r(b) >= 0) lo |= 1L << b
      if (r(Half + b) >= 0) hi |= 1L << b
      b += 1
    }
    (lo, hi)
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[(Long, Long)] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaLong)
}
