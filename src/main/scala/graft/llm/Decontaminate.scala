package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Benchmark decontamination — the audit every pretraining pipeline runs
  * before a training corpus ships (beyond-reference surface; builder
  * brief): find training documents that share verbatim n-grams with the
  * held-out evaluation split, because an eval answer that leaks into the
  * training set invalidates the benchmark score.
  *
  * Composition, not new kernels: the eval set is [[Sampling.hashSplitFrom]]'s
  * `test` split (a leakage check must use the SAME split function the
  * training job uses, or it audits the wrong corpus), and the n-gram
  * definition is [[Dedup.shinglesOf]]'s distinct word-trigrams (same
  * tokenization as the dedup family, so "shares an n-gram" means the same
  * thing in both audits).
  *
  * Scale design (the 100 TB story):
  *  - The benchmark n-gram set is SMALL by construction — eval corpora
  *    are thousands of documents, not corpus-scale — so the distinct
  *    benchmark hash set sits well under the broadcast threshold and the
  *    semi-join plans as a broadcast hash semi-join: the train side
  *    streams through map tasks with NO shuffle of the exploded n-grams.
  *    If a benchmark ever outgrows the threshold, the identical plan
  *    degrades to a shuffled semi-join partitioned on the n-gram hash —
  *    still no pair expansion.
  *  - Unlike the inverted-index Jaccard join, a hot (boilerplate) n-gram
  *    cannot blow up here: a semi-join emits each train posting AT MOST
  *    once, so fan-out is linear in the train side at any skew. No df cap
  *    is needed on this path.
  *  - Join keys are `xxhash64(shingle)` — fixed-width longs, no shingle
  *    string leaves the scan stage (same 64-bit collision assumption as
  *    the dedup family, documented at [[Dedup.ngramJaccardPairsFrom]]).
  *  - Output is only the contaminated documents with their overlap
  *    counts; the caller's drop/quarantine step is an anti-join against
  *    this (small) set, mirroring the dedup-cluster contract.
  */
object Decontaminate {

  /** Train/val documents sharing ≥ 1 distinct word-trigram with the
    * `test` split: (doc_id, split, n_shingles, n_hit, overlap) where
    * `n_hit` counts the document's distinct shingles that also occur
    * anywhere in the test split and `overlap` = n_hit / n_shingles. */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = Sampling.hashSplitFrom(
      Dedup.shinglesOf(Tables.spread(Tables.documents(spark, dir))),
      col("doc_id"))
    // shingles are distinct per document (array_distinct upstream), so a
    // post-semi-join count(*) per doc IS the distinct-hit count
    val ex = sh.select(col("doc_id"), col("split"),
      size(col("shingles")).cast("long").as("n_shingles"),
      explode(expr("transform(shingles, s -> xxhash64(s))")).as("s"))
    val bench = ex.filter(col("split") === "test").select("s").distinct()
    ex.filter(col("split") =!= "test")
      .join(bench, Seq("s"), "left_semi")
      .groupBy("doc_id", "split", "n_shingles")
      .agg(count(lit(1)).as("n_hit"))
      .withColumn("overlap",
        round(col("n_hit").cast("double") / col("n_shingles"), 6))
      .orderBy("doc_id")
  }

  /** Oracle: identical split + shingle CTEs over raw shingle strings
    * (the engine joins on xxhash64 — shared collision assumption). */
  val decontaminateSql: String =
    s"""WITH ${Dedup.shinglesCteSql},
       |sp AS (
       |  SELECT doc_id, shingles, ${Sampling.splitBucketSql} AS bucket FROM sh
       |), spl AS (
       |  SELECT doc_id, shingles, ${Sampling.splitCaseSql} AS split FROM sp
       |), ex AS (
       |  SELECT doc_id, split, CAST(len(shingles) AS BIGINT) AS n_shingles,
       |         unnest(shingles) AS s
       |  FROM spl
       |), bench AS (
       |  SELECT DISTINCT s FROM ex WHERE split = 'test'
       |)
       |SELECT doc_id, split, n_shingles, count(*) AS n_hit,
       |       round(CAST(count(*) AS DOUBLE) / n_shingles, 6) AS overlap
       |FROM ex
       |WHERE split <> 'test' AND s IN (SELECT s FROM bench)
       |GROUP BY doc_id, split, n_shingles
       |ORDER BY doc_id""".stripMargin
}
