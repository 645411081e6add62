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

  test("shingle df-cap bounds hot-shingle fan-out without losing true near-dups") {
    import spark.implicits._
    // docs 1-2: true near-dups (identical text, many shared low-df shingles).
    // docs 10-19: share ONLY the hot leading trigram; their tails are unique.
    val dupText = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = (Seq((1L, dupText), (2L, dupText)) ++
      (10L to 19L).map(i => (i, s"HOTA HOTB HOTC u${i}a u${i}b u${i}c u${i}d")))
      .toDF("doc_id", "text")
    val sh = Dedup.shinglesOf(docs)
    // capped at 5: the hot shingle (df=10) leaves the index; the true pair
    // (every shingle df=2) survives untouched
    val capped = Dedup.ngramJaccardPairsFrom(sh, maxDf = 5).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(capped.head.getDouble(2) == 1.0)
    // uncapped: the hot shingle generates 45 candidate pairs, but none pass
    // the 0.5 threshold — same output, quadratically more candidate work
    val uncapped = Dedup.ngramJaccardPairsFrom(sh, maxDf = 1000).collect()
    assert(uncapped.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("pair lists are symmetric-free and deterministic") {
    val a = Dedup.ngramJaccardPairs(spark, sfDir).collect().toSeq
    val b = Dedup.ngramJaccardPairs(spark, sfDir).collect().toSeq
    assert(a == b)
    assert(a.forall(r => r.getLong(0) < r.getLong(1)))
  }
}
