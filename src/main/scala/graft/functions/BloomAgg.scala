package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom-filter build as a typed Aggregator: the buffer is the bit
  * array (packed longs), reduce sets [[BloomAgg.NumHashes]] positions
  * per key, merge is a word-wise OR — commutative and associative, so
  * the built filter is a pure function of the key SET (partition- and
  * order-independent, like every sketch in this library).
  *
  * Position arithmetic reduces the key below 2^31 FIRST and only then
  * multiplies, so every intermediate stays under 2^63 — overflow-free
  * by construction, not by wrapping. That matters because the probe
  * side is Catalyst column arithmetic under Spark's default ANSI mode,
  * where a wrapping multiply is a runtime ARITHMETIC_OVERFLOW error
  * (silent-wrap JVM code and ANSI SQL would disagree on any key above
  * ~2^31.7, e.g. this library's own 60-bit hash60 values). The same
  * exact arithmetic runs on both sides ([[BloomAgg.position]] ↔
  * `BloomJoin.mightContain`), so build and probe can never disagree.
  *
  * Scale rationale: a Bloom filter of the filtered dimension keys rides
  * to the fact-table scan as ONE broadcast row and rejects most
  * non-matching rows BEFORE they reach the join shuffle — the classic
  * runtime-filter pattern (Spark's own runtime bloom pushdown does the
  * same under AQE; this is the explicit, composable form). False
  * positives only cost work — the exact join afterwards removes them —
  * so query results stay exact.
  */
class BloomAgg(numBits: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits % 64 == 0, "numBits must pack into whole longs")

  override def zero: Array[Long] = new Array[Long](numBits / 64)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val pos = BloomAgg.position(key, i, numBits)
      buf(pos >> 6) |= 1L << (pos & 63)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object BloomAgg {
  /** Knuth multiplicative mixing constants (same family as the MinHash
    * permutations). */
  val MixA = 2654435761L
  val MixB = 40503L
  /** Keys are reduced mod 2^31 before mixing: (2^31−1)·MixA + i·MixB
    * < 2^63, so no intermediate can overflow on either engine. */
  val KeyRange: Long = 1L << 31

  /** Bit position of hash function `i` for `key` — the JVM-side twin of
    * the probe column built in `BloomJoin.mightContain` (identical
    * reduce-then-mix arithmetic, exact on both sides). */
  def position(key: Long, i: Int, numBits: Int): Int = {
    val k = java.lang.Math.floorMod(key, KeyRange)
    java.lang.Math.floorMod(k * MixA + i.toLong * MixB, numBits.toLong).toInt
  }
}
