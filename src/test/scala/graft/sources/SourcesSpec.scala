package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SourcesSpec extends SparkSpec {

  test("orc roundtrip equals the parquet-direct computation") {
    val got = Csv.orcRoundtrip(spark, sfDir)
    val direct = Tables.part(spark, sfDir)
      .filter(col("p_retailprice") > 905d)
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n_parts"),
        round(sum(col("p_retailprice").cast("decimal(18,2)")), 2)
          .cast("double").as("price_sum"))
    assert(got.count() > 0)
    assert(got.except(direct).isEmpty && direct.except(got).isEmpty)
  }

  test("orc scan pushes the price filter down to the reader") {
    val df = Csv.orcRoundtrip(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("Scan orc") || l.contains("FileScan orc"))
      .getOrElse("")
    assert(scanLine.contains("p_retailprice") || plan.contains("PushedFilters: [IsNotNull(p_retailprice), GreaterThan(p_retailprice"),
      plan.take(3000))
  }

  test("jsonl corrupt audit: exactly the corrupted lines quarantine, none vanish") {
    val r = Csv.jsonlCorruptAudit(spark, sfDir).head()
    val docs = graft.Tables.documents(spark, sfDir)
    val total = docs.count()
    val bad = docs.filter(col("doc_id") % 10 === 0).count()
    // PERMISSIVE must keep every line as a row: quarantined + clean = total
    assert(r.getAs[Long]("n_lines") == total)
    assert(r.getAs[Long]("n_quarantined") == bad)
    assert(r.getAs[Long]("n_clean") == total - bad)
    // a quarantined row contributes no typed fields
    val chars = docs.filter(col("doc_id") % 10 =!= 0)
      .agg(sum("n_chars")).head().getLong(0)
    assert(r.getAs[Long]("chars_clean") == chars)
  }
}
