package graft

import graft.operators.DedupOps
import graft.sources.Tables

class DedupSpec extends SparkSpec {

  test("exact dedup: copy counts sum to the corpus size") {
    val total = DedupOps.dedupExact(spark, sf).collect().map(_.getAs[Long]("n_copies")).sum
    assert(total == Tables.documents(spark, sf).count())
  }

  test("minhash candidates: ordered pairs, 1..NumBands shared bands") {
    val rows = DedupOps.minhashCandidates(spark, sf).collect()
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(rows.forall { r =>
      val n = r.getAs[Long]("n_shared_bands"); n >= 1 && n <= DedupOps.NumBands
    })
  }

  test("jaccard near-dups are a subset of the LSH candidates") {
    val cand = DedupOps.minhashCandidates(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val dups = DedupOps.nearDupJaccard(spark, sf).collect()
    assert(dups.forall(r => cand((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))))
    assert(dups.forall { r =>
      val j = r.getAs[Double]("jaccard"); j >= DedupOps.JaccardThreshold && j <= 1.0
    })
  }

  test("simhash: one signature per doc, within SimHashBits bits") {
    val rows = DedupOps.simhashSignatures(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    assert(rows.forall { r =>
      val h = r.getAs[Long]("simhash"); h >= 0 && h < (1L << DedupOps.SimHashBits)
    })
  }

  test("simhash banding retrieves EVERY pair within the hamming bound (pigeonhole)") {
    val sigs = DedupOps.simhashSignatures(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      d = java.lang.Long.bitCount(sa ^ sb) if d <= DedupOps.SimHashMaxHamming
    } yield (ida, idb, d.toLong)).sortBy(p => (p._1, p._2))
    val banded = DedupOps.simhashNearDups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(banded.sameElements(brute),
      s"banded ${banded.length} pairs vs brute-force ${brute.length}")
  }

  test("no cartesian product in the candidate-pair plan") {
    val plan = DedupOps.minhashCandidates(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"plan has a cartesian product:\n$plan")
  }
}
