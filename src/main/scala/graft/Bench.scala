package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark entry: runs every registered query on SPARK_GRAFT_SF_DIR and
  * emits ONE machine-parseable JSON line on stdout (raw — build.sbt sets
  * run/outputStrategy := StdoutOutput so sbt does not prefix it) and also
  * writes it to BENCH_OUT (default bench_out.json) as a belt-and-braces
  * channel for the driver.
  *
  * Methodology (rounds 1-4 used one visit per query with best-of-2, which
  * produced cross-round swings up to 6× on unchanged code — the bench
  * could not resolve the effects it was asked to measure):
  *  - one warm-up pass over the whole suite (session/codegen/broadcast
  *    warm; populates per-query .cache() calls, all of which are
  *    dimension/document-sized and stay resident);
  *  - SPARK_GRAFT_BENCH_REPS (default 3) measured passes, INTERLEAVED:
  *    pass r runs the whole suite before pass r+1 touches any query, so
  *    slow environment drift (GC pressure, page cache, JIT recompiles)
  *    lands across all queries instead of biasing whichever query was
  *    visited at the wrong moment;
  *  - per-query reported time = median over passes; `total` = sum of
  *    medians; per-query spread (max-min) and a suite-level relative-noise
  *    summary ship in the same JSON line so a reader can tell signal from
  *    jitter before crediting any round-over-round delta.
  *
  * Each execution drives the full pipeline through the noop sink (final
  * sort included; nothing is collected to the driver).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // signature builders (minhash/simhash) are 60-64-column aggregates;
      // keep them inside whole-stage codegen (default maxFields=100)
      .config("spark.sql.codegen.maxFields", "256")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(exec) // warm-up pass (uncounted)
    val passes: Seq[Map[String, Double]] =
      (1 to reps).map(_ => names.map(n => n -> exec(n)).toMap)
    def samples(n: String): Seq[Double] = passes.map(_(n)).filter(_ >= 0).sorted
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0
      else if (xs.size % 2 == 1) xs(xs.size / 2)
      else (xs(xs.size / 2 - 1) + xs(xs.size / 2)) / 2
    val med = names.map(n => n -> median(samples(n)))
    val spreads = names.map { n =>
      val xs = samples(n)
      n -> (if (xs.isEmpty) -1.0 else xs.max - xs.min)
    }
    val relSpreads = names.flatMap { n =>
      val xs = samples(n)
      val m = median(xs)
      if (xs.nonEmpty && m > 0) Some((xs.max - xs.min) / m) else None
    }.sorted
    val total = med.map(_._2).filter(_ >= 0).sum
    def jmap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val noise =
      if (relSpreads.isEmpty) """{"rel_spread_median":-1,"rel_spread_max":-1}"""
      else s"""{"rel_spread_median":${median(relSpreads)},"rel_spread_max":${relSpreads.max}}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(med)},"sf":"$sfDir","mode":"warm","n_queries":${med.size},"reps":$reps,"spread_sec":${jmap(spreads)},"noise":$noise}"""
    println(line)
    val out = sys.env.getOrElse("BENCH_OUT", "bench_out.json")
    try Files.writeString(Paths.get(out), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
