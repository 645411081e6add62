package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  test("minhash LSH finds exactly the exact-jaccard pairs at the 0.8 threshold") {
    val lsh = Dedup.minhashDedup(spark, sfDir).cache()
    val exact = Dedup.ngramJaccardPairs(spark, sfDir)
      .filter(col("jaccard") >= 0.8).cache()
    assert(lsh.count() == exact.count())
    assert(lsh.select("doc_a", "doc_b").except(exact.select("doc_a", "doc_b")).isEmpty)
    assert(exact.select("doc_a", "doc_b").except(lsh.select("doc_a", "doc_b")).isEmpty)
  }

  test("simhash pairs overlap the jaccard near-dups") {
    val sim = Dedup.simhashDedup(spark, sfDir).cache()
    // every simhash pair must be orderly and within the bit budget
    assert(sim.filter(col("doc_a") >= col("doc_b") || col("hamming") > 7).isEmpty)
  }

  test("pair lists are symmetric-free and deterministic") {
    val a = Dedup.ngramJaccardPairs(spark, sfDir).collect().toSeq
    val b = Dedup.ngramJaccardPairs(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.forall(r => r.getLong(0) < r.getLong(1)))
  }
}
