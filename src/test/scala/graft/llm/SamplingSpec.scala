package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {

  test("stratified sample is deterministic and respects per-language rates") {
    val s1 = Sampling.stratifiedSample(spark, sfDir)
    val s2 = Sampling.stratifiedSample(spark, sfDir)
    // pure function of the key: byte-identical across runs
    assert(s1.except(s2).isEmpty && s2.except(s1).isEmpty)
    // every kept bucket is under its language's rate
    val rates = Sampling.RatesPerMille.toMap
    val bad = s1.collect().filter { r =>
      r.getLong(3) >= rates.getOrElse(r.getString(1), 1000).toLong
    }
    assert(bad.isEmpty, bad.take(3).mkString(", "))
    // the dominant language is actually down-sampled (rate 300 ⇒ roughly
    // 30% kept; the arithmetic hash is uniform enough for a wide bound)
    val en = Tables.documents(spark, sfDir).filter(col("lang") === "en").count()
    val enKept = s1.filter(col("lang") === "en").count()
    assert(enKept > 0 && enKept < en * 6 / 10, s"$enKept of $en")
  }

  test("token budget select equals the naive global-window formulation") {
    val got = Sampling.tokenBudgetSelect(spark, sfDir)
    val d = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"),
        col("n_chars"))
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = d.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < 10000L)
      .select("doc_id", "lang", "n_tokens", "cum_tokens")
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
    assert(got.count() > 0)
  }

  test("token budget select is invariant to the partition count") {
    // the two-phase prefix sum must produce identical rows for any
    // range-partitioning, because the (n_chars, doc_id) ordering is total
    val base = Sampling.tokenBudgetSelect(spark, sfDir).collect().toSet
    for (parts <- Seq("1", "7")) {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts)
      val got = Sampling.tokenBudgetSelect(s, sfDir).collect().toSet
      assert(got == base, s"parts=$parts differs")
    }
  }
}
