package graft.llm

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual probe for the argmax-cell K ceiling (VERDICT r19 #1): prices
  * full-corpus centroid assignment at a given K through either the
  * native `argmax_cell` kernel or the r19 greatest-chain spelling, on
  * the 100× organic corpus (200k vectors). Not run by the test suite.
  *
  *   sbt "Test/runMain graft.llm.ArgmaxProbe native 4096"
  *   sbt "Test/runMain graft.llm.ArgmaxProbe chain 4096"
  *
  * The probe separates PLAN+COMPILE cost (first head(1) on a 1-row
  * slice — dominated by analysis/codegen at chain K, negligible data)
  * from EXECUTION (full-corpus assignment reduced to an occupancy
  * checksum, so output is tiny and the measured cost is the assignment
  * pass itself). The synthetic centroid model is deterministic in
  * (k, d) — both spellings fold the identical literals. */
object ArgmaxProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("native")
    val k = if (args.length > 1) args(1).toInt else 256
    val dir = if (args.length > 2) args(2) else "/tmp/sf100x0.1org"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.maxFields", "256")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.embeddings(spark, dir)
      .withColumn("ed", col("embedding").cast("array<double>"))
      .select("vec_id", "ed")
      .repartition(32).cache()
    val n = e.count()
    val cents: IndexedSeq[(Long, Seq[Double])] = (0 until k).map { c =>
      (c.toLong, (0 until 64).map { d =>
        math.sin(0.53 * c + 0.07 * d) + 0.5 * math.cos(1.31 * c * (d + 1))
      }.toSeq)
    }.toIndexedSeq
    def assignOf(df: org.apache.spark.sql.DataFrame) = mode match {
      case "native" => Similarity.argmaxCellLit(df, cents)
      case "chain" => Similarity.argmaxCellChain(df, cents)
      case other => sys.error(s"unknown mode $other")
    }
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $mode K=$k n=$n $label%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // plan+codegen cost on a 1-row slice: data cost ~zero, so this is
    // the compile-time ceiling the chain hits and the kernel lifts
    val one = e.limit(1).cache(); one.count()
    t("plan+compile")(assignOf(one).head(1))
    // full assignment, three repetitions (first = codegen warm already)
    for (r <- 1 to 3)
      t(s"assign#$r") {
        assignOf(e).groupBy("cell").count()
          .agg(count(lit(1)), sum(col("count")), max(col("count")))
          .collect()
      }
    spark.stop()
  }
}
