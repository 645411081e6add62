package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    val variance = col("s2").cast("double") / col("n") - mean * mean
    // Zero variance (all days identical): Spark's x/0 is NULL but DuckDB's
    // IEEE division is inf/NaN — guard the divisor so both engines emit
    // NULL z (and NULL is_anomaly) on a degenerate corpus.
    val z = when(variance > 0d,
      (col("c").cast("double") - mean) / sqrt(variance))
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
      |             / nullif(sqrt(CAST(s2 AS DOUBLE) / n
      |                    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)), 0), 6) AS z,
      |       abs(round((CAST(c AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
      |             / nullif(sqrt(CAST(s2 AS DOUBLE) / n
      |                    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)), 0), 6)) > 2
      |         AS is_anomaly
      |FROM d, m ORDER BY day""".stripMargin

  /** Per-group Pearson correlation (event value vs hour-of-day) — the
    * "does this metric track time-of-day" profiling stat, computed from
    * EXACT moments rather than Spark's `corr` aggregate: `corr` (and
    * DuckDB's) accumulates running double co-moments whose partition
    * merge order is nondeterministic — the same query can hash-diverge
    * from itself, let alone across engines. Here every moment is an
    * order-independent exact sum — values round to 6dp then cast to
    * DECIMAL(18,6) (the `embedding_quantize` idiom, exact at this data's
    * 2dp) so Σx, Σx², Σxh are decimal-exact; hours are integers so Σh,
    * Σh² are long-exact — and ONE deterministic double formula
    * (n·Σxh−Σx·Σh)/(√(n·Σx²−Σx²̂)·√(n·Σh²−Σh²̂)) evaluates on those
    * exact inputs identically in both engines.
    *
    * Shape at 100 TB: a single hash aggregate to 6 mergeable counters
    * per event_type — the shuffle carries one row per (map task, group);
    * the final arithmetic runs on a group-count-sized frame. */
  def valueHourCorr(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        round(col("value"), 6).cast("decimal(18,6)").as("x"),
        hour(col("ts")).cast("long").as("h"))
    val m = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("h")).as("sh"),
      sum(col("h") * col("h")).as("shh"),
      sum(col("x") * col("h")).as("sxh"))
    def d(c: Column) = c.cast("double")
    val corr = (d(col("n")) * d(col("sxh")) - d(col("sx")) * d(col("sh"))) /
      (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
        sqrt(d(col("n")) * d(col("shh")) - d(col("sh")) * d(col("sh"))))
    m.select(col("event_type"), col("n"), round(corr, 6).as("corr_value_hour"))
      .orderBy("event_type")
  }

  /** The full ranking-window family — dense_rank, percent_rank,
    * cume_dist, ntile(4) — in one pass over per-nation revenue. The
    * window is GLOBAL but dimension-sized BY DESIGN (the `q1_ratio_rank`
    * discipline): revenue aggregates to ≤ nation-count rows BEFORE the
    * window, so the single-partition sort ranks 25 rows at any fact
    * size — never the fact table (ranking raw customers globally would
    * be the single-task sort the quantile kernel exists to avoid).
    *
    * Determinism: the window orders by (revenue DESC, nation) — a total
    * order, which ntile needs (tile assignment depends on row position,
    * so a revenue tie without the tiebreak could split across engines);
    * percent_rank/cume_dist are then exact small-integer ratios,
    * rounded to 6dp. Revenue sums as DECIMAL(18,2) — exact, order-
    * independent — and is cast to rounded DOUBLE only at the output
    * edge (the registry-wide convention; ranks still order by the
    * exact decimal). */
  def nationRevenueRanks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir).select("o_custkey", "o_totalprice")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val rev = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val w = Window.orderBy(col("rev").desc, col("nation"))
    rev.select(col("nation"),
        round(col("rev"), 2).cast("double").as("revenue"),
        dense_rank().over(w).cast("long").as("drank"),
        round(percent_rank().over(w), 6).as("prank"),
        round(cume_dist().over(w), 6).as("cdist"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy("drank", "nation")
  }

  val nationRevenueRanksSql: String =
    """WITH rev AS (
      |  SELECT n_name AS nation,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name
      |)
      |SELECT nation, CAST(round(revenue, 2) AS DOUBLE) AS revenue,
      |       dense_rank()  OVER w AS drank,
      |       round(percent_rank() OVER w, 6) AS prank,
      |       round(cume_dist()    OVER w, 6) AS cdist,
      |       ntile(4)      OVER w AS quartile
      |FROM rev
      |WINDOW w AS (ORDER BY revenue DESC, nation)
      |ORDER BY drank, nation""".stripMargin

  val valueHourCorrSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(round(value, 6) AS DECIMAL(18,6)) AS x,
      |         CAST(hour(ts) AS BIGINT) AS h
      |  FROM events WHERE value IS NOT NULL
      |), m AS (
      |  SELECT event_type, count(*) AS n,
      |         sum(x) AS sx, sum(x*x) AS sxx,
      |         sum(h) AS sh, sum(h*h) AS shh, sum(x*h) AS sxh
      |  FROM e GROUP BY event_type
      |)
      |SELECT event_type, n,
      |       round((CAST(n AS DOUBLE) * CAST(sxh AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sh AS DOUBLE))
      |             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                * sqrt(CAST(n AS DOUBLE) * CAST(shh AS DOUBLE) - CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE))), 6)
      |         AS corr_value_hour
      |FROM m ORDER BY event_type""".stripMargin

  /** Per-group ordinary-least-squares fit (extended price ~ quantity per
    * return flag) — the REGR_SLOPE/REGR_INTERCEPT/REGR_R2 family, built
    * on the [[valueHourCorr]] discipline rather than the engines' regr_*
    * aggregates: running double co-moments merge in partition order and
    * can hash-diverge across engines (or across runs), so the moments
    * here are EXACT order-independent sums — price rounds to cents as
    * DECIMAL(18,2), quantity is integer-valued and sums as long — and
    * slope/intercept/R² evaluate as one deterministic double formula on
    * those exact inputs in both engines.
    *
    * Shape at 100 TB: one hash aggregate to six mergeable counters per
    * return flag (the shuffle carries a row per map task per group); the
    * regression arithmetic runs on a 3-row frame. */
  def priceQuantityRegression(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select(col("l_returnflag"),
      col("l_quantity").cast("long").as("x"),
      col("l_extendedprice").cast("decimal(18,2)").as("y"))
    val m = l.groupBy("l_returnflag").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y")).as("sy"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("y") * col("x")).as("sxy"))
    def d(c: Column) = c.cast("double")
    val varX = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val varY = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    val cov = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val slope = cov / varX
    m.select(col("l_returnflag").as("returnflag"), col("n"),
        round(slope, 6).as("slope"),
        round((d(col("sy")) - slope * d(col("sx"))) / d(col("n")), 6)
          .as("intercept"),
        round(cov * cov / (varX * varY), 6).as("r2"))
      .orderBy("returnflag")
  }

  val priceQuantityRegressionSql: String =
    """WITH m AS (
      |  SELECT l_returnflag AS returnflag, count(*) AS n,
      |         sum(CAST(l_quantity AS BIGINT)) AS sx,
      |         sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
      |         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS BIGINT)) AS sxy
      |  FROM lineitem GROUP BY l_returnflag
      |)
      |SELECT returnflag, n,
      |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
      |         AS slope,
      |       round((CAST(sy AS DOUBLE)
      |              - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                * CAST(sx AS DOUBLE))
      |             / CAST(n AS DOUBLE), 6) AS intercept,
      |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |             * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |         AS r2
      |FROM m ORDER BY returnflag""".stripMargin

  /** Percent-of-total contribution with a Pareto cut — each nation's
    * revenue share, the cumulative share walking down the revenue
    * ranking, and the 80/20 flag (nations inside the first 80% of
    * cumulative revenue are `core`). The ratio-to-report + ABC analysis
    * every revenue dashboard leads with.
    *
    * Shape at 100 TB: revenue aggregates to nation cardinality BEFORE
    * any window (the `q1_ratio_rank` discipline) — the fact-side cost is
    * one keyed sum with mergeable decimal partials; the share/cumulative
    * windows sort ≤ 25 rows at any fact size. Ordering is
    * (rev DESC, nation) — a total order, so the cumulative share is
    * deterministic under revenue ties. Revenue sums as DECIMAL(18,2),
    * shares divide decimal-over-decimal into exact doubles, and the
    * edge emits only rounded doubles (the registry-wide convention). */
  def revenueContribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(spark, dir).select("o_custkey", "o_totalprice")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
    val n = Tables.nation(spark, dir).select("n_nationkey", "n_name")
    val rev = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val w = Window.orderBy(col("rev").desc, col("nation"))
    val tot = Window.partitionBy()
    rev
      .withColumn("share",
        round(col("rev").cast("double") / sum(col("rev")).over(tot), 6))
      .withColumn("cum_share",
        round(sum(col("rev")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)).cast("double") /
          sum(col("rev")).over(tot), 6))
      .select(col("nation"), round(col("rev"), 2).cast("double").as("revenue"),
        col("share"), col("cum_share"),
        when(col("cum_share") <= 0.8, lit("core")).otherwise(lit("tail"))
          .as("pareto_class"))
      .orderBy(col("revenue").desc, col("nation"))
  }

  val revenueContributionSql: String =
    """WITH rev AS (
      |  SELECT n_name AS nation,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name
      |),
      |shares AS (
      |  SELECT nation, rev,
      |         round(CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE), 6)
      |           AS share,
      |         round(CAST(sum(rev) OVER (ORDER BY rev DESC, nation
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |               / CAST(sum(rev) OVER () AS DOUBLE), 6) AS cum_share
      |  FROM rev
      |)
      |SELECT nation, CAST(round(rev, 2) AS DOUBLE) AS revenue, share, cum_share,
      |       CASE WHEN cum_share <= 0.8 THEN 'core' ELSE 'tail' END AS pareto_class
      |FROM shares ORDER BY revenue DESC, nation""".stripMargin

  /** Per-brand price/size Pareto frontier (skyline) — the parts no
    * same-brand part strictly beats on BOTH axes (cheaper-or-equal AND
    * bigger-or-equal, strictly better on at least one). The classic
    * multi-criteria "best offers" query; ties on both axes are all kept
    * (neither dominates the other).
    *
    * Shape at 100 TB: the naive skyline is an all-pairs NOT EXISTS
    * anti-join — quadratic, never acceptable. For a 2-D skyline the
    * frontier is a single ordered sweep: collapse to per-(brand, price)
    * max size (any same-price smaller part is dominated in-cell), then
    * one window partitioned by brand and ordered by price keeps exactly
    * the cells whose size exceeds every strictly-cheaper cell's running
    * max. The cell frame is bounded by brands × the 2-decimal price
    * domain (not by part count), so the window partitions stay small no
    * matter how many parts land in each cell; the join back to parts is
    * a broadcast of that bounded frontier frame. */
  def brandSkyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(spark, dir)
    val cells = p.groupBy(col("p_brand"), col("p_retailprice"))
      .agg(max(col("p_size")).as("msize"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // one row per (brand, price) by construction, so the ROWS frame is
    // exactly "all strictly cheaper prices of this brand"
    val frontier = cells
      .withColumn("prev_max", max(col("msize")).over(w))
      .filter(col("prev_max").isNull || col("msize") > col("prev_max"))
      .select(col("p_brand"), col("p_retailprice"), col("msize"))
    p.join(broadcast(frontier.withColumnRenamed("msize", "p_size")),
        Seq("p_brand", "p_retailprice", "p_size"))
      .select(col("p_brand").as("brand"), col("p_partkey"), col("p_name"),
        col("p_size"), col("p_retailprice").as("price"))
      .orderBy("brand", "price", "p_partkey")
  }

  /** Oracle: identical cell collapse + sweep window. */
  val brandSkylineSql: String =
    """WITH cells AS (
      |  SELECT p_brand, p_retailprice, max(p_size) AS msize
      |  FROM part GROUP BY 1, 2
      |), f AS (
      |  SELECT p_brand, p_retailprice, msize,
      |         max(msize) OVER (PARTITION BY p_brand ORDER BY p_retailprice
      |                          ROWS BETWEEN UNBOUNDED PRECEDING
      |                          AND 1 PRECEDING) AS prev_max
      |  FROM cells
      |)
      |SELECT p.p_brand AS brand, p.p_partkey, p.p_name, p.p_size,
      |       p.p_retailprice AS price
      |FROM part p
      |JOIN f ON p.p_brand = f.p_brand AND p.p_retailprice = f.p_retailprice
      |      AND p.p_size = f.msize
      |WHERE prev_max IS NULL OR msize > prev_max
      |ORDER BY brand, price, p.p_partkey""".stripMargin

  /** Time-weighted average of `value` per user — each observation holds
    * until the user's NEXT event (step interpolation), so the weight is
    * the interval to the successor, and TWA = Σ vᵢ·Δtᵢ / Σ Δtᵢ. The
    * correct mean for irregularly sampled state (billing meters, sensor
    * readings, feature freshness): the plain average over-weights bursts,
    * exactly what this metric exists to fix. The user's last event has
    * no successor and carries no weight (a half-open observation
    * window); single-event users report NULL — no interval exists, and
    * the guard keeps Spark's ANSI division from aborting where DuckDB
    * would NULL.
    *
    * Shape at 100 TB: one user-keyed window (lead), then a per-user
    * map-side-combined collapse. Weights are exact microsecond longs;
    * the weighted sum accumulates v·Δt as 6dp-rounded decimals, so both
    * engines divide identical numbers. */
  def timeWeightedValue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("dt_us",
        unix_micros(col("next_ts")) - unix_micros(col("ts")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("dt_us")).as("span_us"),
        sum(round(col("value") * col("dt_us"), 6).cast("decimal(28,6)"))
          .as("vw"))
      .select(col("user_id"), col("n_events"),
        col("span_us"),
        when(col("span_us").isNull || col("span_us") === 0L,
          lit(null).cast("double"))
          .otherwise(round(col("vw").cast("double") / col("span_us"), 6))
          .as("twa_value"))
      .orderBy("user_id")
  }

  val timeWeightedValueSql: String =
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
      |         value
      |  FROM events WHERE value IS NOT NULL
      |), d AS (
      |  SELECT user_id, value,
      |         lead(tu) OVER (PARTITION BY user_id ORDER BY tu, event_id)
      |           - tu AS dt_us
      |  FROM t
      |), a AS (
      |  SELECT user_id, count(*) AS n_events,
      |         CAST(sum(dt_us) AS BIGINT) AS span_us,
      |         sum(CAST(round(value * dt_us, 6) AS DECIMAL(28,6))) AS vw
      |  FROM d GROUP BY 1
      |)
      |SELECT user_id, n_events, span_us,
      |       CASE WHEN span_us IS NULL OR span_us = 0 THEN NULL
      |            ELSE round(CAST(vw AS DOUBLE) / span_us, 6)
      |       END AS twa_value
      |FROM a ORDER BY user_id""".stripMargin

  /** Rows kept by name in [[topkWithOthers]]; the rest fold into OTHERS. */
  private val OthersTopK = 5

  /** Top-K with an OTHERS bucket — the BI presentation rollup every
    * dashboard pie/bar needs: the [[OthersTopK]] highest-revenue
    * nations by name, and everything else folded into one 'OTHERS' row
    * so the total is preserved (a bare top-K silently drops the tail;
    * the OTHERS row is what keeps the chart honest).
    *
    * Shape at 100 TB: revenue collapses to nation cells map-side
    * (dimension-bounded), the rank windows over that bounded frame, and
    * the fold is a second tiny aggregate. Ties at the K boundary break
    * by name — deterministic on both engines. */
  def topkWithOthers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byNation = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
        count(lit(1)).as("n_orders"))
    val rk = Window.orderBy(col("rev").desc, col("nation"))
    byNation
      .withColumn("bucket",
        when(row_number().over(rk) <= OthersTopK, col("nation"))
          .otherwise(lit("OTHERS")))
      .groupBy("bucket")
      .agg(sum(col("rev")).as("rev"),
        sum(col("n_orders")).as("n_orders"),
        count(lit(1)).as("n_nations"))
      .select(col("bucket"), round(col("rev"), 2).cast("double").as("revenue"),
        col("n_orders"), col("n_nations"))
      .orderBy(col("revenue").desc, col("bucket"))
  }

  val topkWithOthersSql: String =
    s"""WITH by_nation AS (
       |  SELECT n_name AS nation,
       |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
       |         count(*) AS n_orders
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1
       |), b AS (
       |  SELECT CASE WHEN row_number() OVER (ORDER BY rev DESC, nation)
       |                   <= $OthersTopK
       |              THEN nation ELSE 'OTHERS' END AS bucket,
       |         rev, n_orders
       |  FROM by_nation
       |)
       |SELECT bucket, CAST(round(sum(rev), 2) AS DOUBLE) AS revenue,
       |       CAST(sum(n_orders) AS BIGINT) AS n_orders,
       |       count(*) AS n_nations
       |FROM b GROUP BY bucket
       |ORDER BY revenue DESC, bucket""".stripMargin
}
