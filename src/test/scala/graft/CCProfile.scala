package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manual profiling entry point for dedup_clusters phases; not run by the
  * test suite. `sbt "Test/runMain graft.llm.CCProfile"`. */
object CCProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "256")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    t("warm scan")(spark.read.parquet(dir + "/documents.parquet").count())
    t("pairs cold")(noop(Dedup.ngramJaccardPairs(spark, dir)))
    t("pairs warm")(noop(Dedup.ngramJaccardPairs(spark, dir)))
    spark.catalog.clearCache()
    t("clusters cold")(noop(Dedup.dedupClusters(spark, dir)))
    t("clusters warm")(noop(Dedup.dedupClusters(spark, dir)))
    spark.catalog.clearCache()
    t("minhash cold")(noop(Dedup.minhashDedup(spark, dir)))
    spark.catalog.clearCache()
    t("simhash cold")(noop(Dedup.simhashDedup(spark, dir)))
    spark.stop()
  }
}
