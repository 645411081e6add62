package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Range (interval) join — points matched to `[lo, hi)` intervals — as a
  * BUCKETED EQUI-JOIN, the scale shape for an operator Spark would
  * otherwise execute as BroadcastNestedLoopJoin (beyond-reference
  * surface; the builder brief names range join as a canonical custom
  * operator).
  *
  * Shape: pick a fixed bucket width W; each interval explodes into the
  * buckets it overlaps (`sequence(floor(lo/W), floor(hi/W))` — varying
  * interval widths produce varying replication, computed per row, fully
  * distributed); each point hashes to `floor(p/W)`; the join is then a
  * plain EQUI-join on the bucket id with the range predicate left as a
  * residual filter. Catalyst picks broadcast-hash when one side is small
  * and shuffled-hash/sort-merge co-partitioned on the bucket when both
  * are huge — no nested loop in either regime, which is what survives a
  * 100 TB fact side against a billion-interval side. Replication factor =
  * avg(interval width / W + 1): W tunes the classic
  * replication-vs-selectivity trade; the residual filter keeps results
  * exact for ANY W.
  *
  * Points exactly on a shared boundary (p == hi_k == lo_{k+1}) match only
  * the upper interval ([lo, hi) semantics), identically on both engines:
  * both compare the same IEEE doubles loaded from the same parquet, so no
  * rounding contract is needed.
  */
object RangeJoin {

  /** Generic kernel: equi-join `points` to `intervals` on the W-bucket,
    * residual-filtered to `lo <= p < hi`. Interval columns must include
    * `lo` and `hi`; all columns of both frames survive. */
  def bucketed(
      points: DataFrame, p: Column,
      intervals: DataFrame, w: Double): DataFrame = {
    val pts = points.withColumn("_bkt", floor(p / w))
    val ivs = intervals.withColumn("_bkt",
      explode(sequence(floor(col("lo") / w).cast("long"),
        floor(col("hi") / w).cast("long"))))
    pts.join(ivs, Seq("_bkt"))
      .filter(p >= col("lo") && p < col("hi"))
      .drop("_bkt")
  }

  /** Geometric price bands [1000·2^i, 1000·2^(i+1)) for i = 0..8 —
    * deliberately NON-uniform so the bucket replication varies per
    * interval (the widest band covers ~32 buckets at W=8192, the
    * narrowest a single one). Shared literal-for-literal with the oracle
    * SQL; every bound is an exact double. */
  private val BandBase = 1000.0
  private val NumBands = 9
  private val BucketW = 8192.0
  private[operators] val bands: Seq[(Int, Double, Double)] =
    (0 until NumBands).map(i =>
      (i, BandBase * (1L << i), BandBase * (1L << (i + 1))))

  /** Registered entry: orders binned into the geometric price bands via
    * the bucketed range join, then aggregated per band (decimal-exact
    * revenue sum, the repo-wide order-independence contract). Bands with
    * no orders drop out (inner-join semantics) on both engines. */
  def rangeJoinBands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
    val iv = bands.toDF("band_id", "lo", "hi")
    bucketed(o, col("o_totalprice"), iv, BucketW)
      .groupBy("band_id", "lo", "hi")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"))
      .select(col("band_id"), col("lo").as("band_lo"), col("hi").as("band_hi"),
        col("n_orders"), col("sum_price"))
      .orderBy("band_id")
  }

  /** Oracle: the naive non-equi formulation over the same literal bands —
    * correct at any scale factor, quadratic in general, which is exactly
    * why the engine path buckets. */
  val rangeJoinBandsSql: String = {
    // DOUBLE casts in VALUES: DuckDB would otherwise type 1000.0 as
    // DECIMAL(5,1) and band_lo/band_hi would mismatch the Spark schema
    val values = bands
      .map { case (i, lo, hi) =>
        s"($i, CAST($lo AS DOUBLE), CAST($hi AS DOUBLE))" }.mkString(", ")
    s"""WITH bands(band_id, lo, hi) AS (VALUES $values)
       |SELECT band_id, lo AS band_lo, hi AS band_hi,
       |       count(*) AS n_orders,
       |       CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_price
       |FROM bands b JOIN orders o
       |  ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
       |GROUP BY band_id, lo, hi
       |ORDER BY band_id""".stripMargin
  }
}
