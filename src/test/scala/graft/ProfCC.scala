package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// scratch profiler — not committed
object ProfCC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "256")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    graft.llm.Dedup.dedupClusters(spark, dir).write.format("noop").mode("overwrite").save()
    t("full dedup_clusters warm") { graft.llm.Dedup.dedupClusters(spark, dir).write.format("noop").mode("overwrite").save() }
    val pairs = graft.llm.Dedup.ngramJaccardPairs(spark, dir)
    t("pairs alone") { pairs.write.format("noop").mode("overwrite").save() }
    t("pairs count") { println("  n_pairs=" + pairs.count()) }
    spark.stop()
  }
}
