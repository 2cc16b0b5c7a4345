package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom-filter build as a typed Aggregator: the buffer is the bit
  * array (packed longs), reduce sets [[BloomAgg.NumHashes]] positions
  * per key, merge is a word-wise OR — commutative and associative, so
  * the built filter is a pure function of the key SET (partition- and
  * order-independent, like every sketch in this library).
  *
  * Position arithmetic is plain 64-bit multiply-add (wrapping) followed
  * by floorMod — chosen because the SAME expression is computable as
  * Catalyst columns on the probe side ([[BloomAgg.mightContainPos]]
  * documents the pairing), so build and probe can never disagree.
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
    * permutations). Wrapping 64-bit arithmetic on both sides. */
  val MixA = 2654435761L
  val MixB = 40503L

  /** Bit position of hash function `i` for `key` — the JVM-side twin of
    * the probe column built in `BloomJoin.mightContain`. */
  def position(key: Long, i: Int, numBits: Int): Int =
    java.lang.Math.floorMod(key * MixA + i.toLong * MixB, numBits.toLong).toInt
}
