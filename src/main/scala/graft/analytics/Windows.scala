package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Time-interval RANGE-frame windows — the rolling-metric family over
  * *irregular* event times. The dense-grid moving average
  * (`EventsStream.movingHourlyAvg`) rolls over a gap-filled calendar with a
  * ROWS frame; this file rolls directly over raw, unevenly-spaced rows with
  * a calendar-interval RANGE frame (`RANGE BETWEEN INTERVAL 30 DAYS
  * PRECEDING AND CURRENT ROW`), which is the correct tool when regularizing
  * the timeline first would be wasteful or wrong (per-entity sparse
  * activity: a customer orders a handful of times a year — a dense daily
  * grid per customer would be 100× the fact table).
  *
  * Reference anchor: the per-group windowed aggregates of
  * analysis.sql:84-108 (rank/row_number families, SURVEY §2.6 W1-W3) —
  * this extends the family to time-bounded frames.
  */
object Windows {

  /** 30-day rolling spend per customer over `orders`: for each order, the
    * sum of that customer's order totals in the 30 days up to and
    * including the order date.
    *
    * Scale shape: ONE hash exchange on o_custkey, sort within partitions
    * by date, then a linear sliding-frame pass — Spark's WindowExec keeps
    * the frame as two moving pointers, so cost is O(rows) per partition
    * regardless of frame width, and partitions are per-customer slices
    * (bounded), never the whole fact. The presentation orderBy is the
    * only other exchange and a pipeline consumer drops it.
    *
    * Determinism: RANGE frames include all peers of the current row's
    * order date, so same-day orders see each other symmetrically on both
    * engines no matter the intra-day tie order — this is WHY the entry is
    * a RANGE frame and not ROWS (a ROWS frame over tied dates is
    * tie-order-dependent and un-oracle-able). Money is summed as
    * DECIMAL(18,2) (exact, associative) and only cast to double at the
    * edge; the per-cent cast from double prices is tie-free (no double is
    * exactly halfway between two cents — .005 has no finite binary
    * expansion). */
  def rollingSpend30d(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
      expr("""CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |  PARTITION BY o_custkey ORDER BY o_orderdate
             |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
             |) AS DOUBLE)""".stripMargin).as("spend_30d"))
      .orderBy("o_orderkey")

  val rollingSpend30dSql: String =
    """SELECT o_orderkey, o_custkey, o_orderdate,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |         PARTITION BY o_custkey ORDER BY o_orderdate
      |         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
      |       ) AS DOUBLE) AS spend_30d
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Daily ingest-volume anomaly detection — the pipeline-health monitor
    * every ingestion runs: day-level event counts z-scored against the
    * corpus's own mean/stddev, days beyond ±2σ flagged. Determinism by
    * construction: the day counts are exact integers, the moments come
    * from exact integer sums (Σc, Σc² — never a float accumulation), and
    * both engines evaluate the IDENTICAL double formula on those exact
    * inputs, so the rounded z-scores cannot drift. Shape: one (day)
    * counter aggregate, one 1-row moment aggregate broadcast back — two
    * cheap passes over counter rows, not data. */
  def dailyVolumeAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val m = d.agg(count(lit(1)).as("n"),
      sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"))
    val mean = col("s1").cast("double") / col("n")
    val z = (col("c").cast("double") - mean) /
      sqrt(col("s2").cast("double") / col("n") - mean * mean)
    d.crossJoin(broadcast(m))
      .select(col("day"), col("c").as("n_events"),
        round(z, 6).as("z"), (abs(round(z, 6)) > 2d).as("is_anomaly"))
      .orderBy("day")
  }

  val dailyVolumeAnomalySql: String =
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY 1
      |), m AS (
      |  SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS s1,
      |         CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM d
      |)
      |SELECT day, c AS n_events,
      |       round((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
      |             / sqrt(CAST(s2 AS DOUBLE) / n
      |                    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)), 6) AS z,
      |       abs(round((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
      |             / sqrt(CAST(s2 AS DOUBLE) / n
      |                    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)), 6)) > 2
      |         AS is_anomaly
      |FROM d, m ORDER BY day""".stripMargin
}
