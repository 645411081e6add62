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

  /** Interval×interval OVERLAP join (closed intervals, integer bounds) —
    * the two-sided sibling of [[bucketed]]: both sides explode into the
    * W-buckets they cover (exact `DIV` on long bounds, no FP), the join
    * is a plain equi-join on the bucket id with the overlap predicate
    * (`a_lo <= b_hi && b_lo <= a_hi`) as a residual filter, and each
    * overlapping pair is emitted EXACTLY ONCE without any distinct
    * shuffle: only the bucket containing the overlap's start
    * (`greatest(a_lo, b_lo) DIV W`) keeps the pair — that bucket is
    * covered by both sides by construction, and it is unique per pair.
    * Same scale regime as [[bucketed]]: broadcast-hash when one side is
    * calendar-/dimension-bounded, co-partitioned shuffle when both are
    * huge; never a nested loop. */
  def overlapBucketed(
      a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String, w: Long): DataFrame = {
    val ea = a.withColumn("_bkt",
      explode(sequence(expr(s"$aLo DIV $w"), expr(s"$aHi DIV $w"))))
    val eb = b.withColumn("_bkt",
      explode(sequence(expr(s"$bLo DIV $w"), expr(s"$bHi DIV $w"))))
    ea.join(eb, Seq("_bkt"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("_bkt") === expr(s"greatest($aLo, $bLo) DIV $w"))
      .drop("_bkt")
  }

  /** Bucket width for [[intervalOverlapJoin]] (and the window-bound
    * unit): one hour in µs. */
  private val UsPerH = 3600L * 1000000L

  /** Registered entry: per-(user, day) activity intervals [first event,
    * last event] overlap-joined to the day's maintenance windows
    * (02:00-04:00 and 14:00-15:30, derived from the corpus date span) —
    * "whose sessions collided with maintenance, and for how long", the
    * impact analysis an ops team runs after every incident. Bounds are
    * exact event-µs integers; overlap durations sum exactly.
    *
    * The window side is calendar-bounded (2 rows/day) so it always
    * broadcasts; the session side replicates into ≤ 25 hour-buckets/day.
    * The oracle states the naive non-equi join — quadratic in general,
    * which is exactly why the engine path buckets. */
  def intervalOverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val s = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(unix_micros(min(col("ts"))).as("s_lo"),
        unix_micros(max(col("ts"))).as("s_hi"))
    val bounds = ev.agg(to_date(min(col("ts"))).as("d0"),
      to_date(max(col("ts"))).as("d1"))
    def at(h: Long): Column =
      unix_micros(col("wday").cast("timestamp")) + lit(h)
    val wins = bounds
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("wday"))
      .select(col("wday"), explode(array(
        struct(lit("nightly").as("kind"),
          at(2 * UsPerH).as("w_lo"), at(4 * UsPerH).as("w_hi")),
        struct(lit("midday").as("kind"),
          at(14 * UsPerH).as("w_lo"), at(15 * UsPerH + UsPerH / 2).as("w_hi"))))
        .as("w"))
      .select(col("wday"), col("w.kind").as("kind"),
        col("w.w_lo").as("w_lo"), col("w.w_hi").as("w_hi"))
    overlapBucketed(s, "s_lo", "s_hi", wins, "w_lo", "w_hi", UsPerH)
      .groupBy(col("wday").as("day"), col("kind"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(greatest(lit(0L),
          least(col("s_hi"), col("w_hi")) - greatest(col("s_lo"), col("w_lo"))))
          .as("overlap_us"))
      .orderBy("day", "kind")
  }

  val intervalOverlapJoinSql: String =
    """WITH s AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |         epoch_us(CAST(min(ts) AS TIMESTAMP)) AS s_lo,
      |         epoch_us(CAST(max(ts) AS TIMESTAMP)) AS s_hi
      |  FROM events GROUP BY 1, 2
      |), b AS (
      |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
      |), days AS (
      |  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |                                     CAST(d1 AS TIMESTAMP),
      |                                     INTERVAL 1 DAY)) AS DATE) AS wday
      |  FROM b
      |), w AS (
      |  SELECT wday, 'nightly' AS kind,
      |         epoch_us(CAST(wday AS TIMESTAMP)) + 7200000000 AS w_lo,
      |         epoch_us(CAST(wday AS TIMESTAMP)) + 14400000000 AS w_hi
      |  FROM days
      |  UNION ALL
      |  SELECT wday, 'midday',
      |         epoch_us(CAST(wday AS TIMESTAMP)) + 50400000000,
      |         epoch_us(CAST(wday AS TIMESTAMP)) + 55800000000
      |  FROM days
      |)
      |SELECT wday AS day, kind, count(*) AS n_sessions,
      |       CAST(sum(greatest(0, least(s_hi, w_hi) - greatest(s_lo, w_lo)))
      |            AS BIGINT) AS overlap_us
      |FROM s JOIN w ON s_lo <= w_hi AND w_lo <= s_hi
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
