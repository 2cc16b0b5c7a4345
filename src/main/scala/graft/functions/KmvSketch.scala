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
  *
  * Hot-path cost: the buffer is a sorted primitive long array, so once
  * saturated the common case (h ≥ current k-th minimum) is one O(1)
  * compare, a duplicate check is one binary search, and only genuine
  * new minima pay the O(k) insert — per-row work is constant in the
  * steady state.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Double] {

  /** 2^60, the hash range of TextOps.hash60 — exactly representable. */
  private val hashRange = 1152921504606846976.0

  override def zero: Array[Long] = Array.emptyLongArray

  // buffer invariant: sorted ascending, distinct, length <= k
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    if (buf.length >= k && h >= buf(buf.length - 1)) return buf
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) return buf // already present
    val ins = -idx - 1
    val n = math.min(k, buf.length + 1)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // merge two sorted-distinct arrays, dedup, cap at k
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Double =
    if (r.length < k) r.length.toDouble
    else (k - 1).toDouble * hashRange / r(r.length - 1).toDouble

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] =
    org.apache.spark.sql.Encoders.scalaDouble
}
