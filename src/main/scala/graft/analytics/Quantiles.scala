package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact grouped quantiles (median / p95 / p99 of event values per type) —
  * the distribution-profiling aggregate an analytics engine needs beyond
  * the reference's count/sum family.
  *
  * Engine path: SORT-BASED rank arithmetic, not Spark's built-in
  * `percentile` aggregate — `percentile` buffers every (distinct value,
  * count) of a group in the aggregation buffer, O(group) executor memory,
  * which is exactly what dies first on a 100 TB fact table. Here the group
  * is sorted once (shuffle + sort on (group, value), the same exchange a
  * sort-merge aggregation would pay), every row learns its rank and the
  * group size, and only the two rows flanking each requested quantile
  * position contribute to the final 5-row aggregate. Memory per task is
  * O(1); the sort is the cost, and it parallelizes by group.
  *
  * Linear interpolation (type-7, both engines): pos = (n-1)·q,
  * result = v_lo + (pos - floor(pos)) · (v_hi - v_lo), computed on the
  * same doubles in the same order as DuckDB's `quantile_cont`, rounded to
  * 6dp for engine-stable comparison.
  *
  * Per-group parallelism is bounded by group count (5 event types here);
  * at scale the knobs are `approx_percentile` (t-digest sketch, fixed
  * memory, bounded rank error — the spec pins its error against this
  * exact path) or a secondary-sort range partitioning within hot groups.
  */
object Quantiles {

  private val Qs: Seq[(String, Double)] =
    Seq("q50" -> 0.5, "q95" -> 0.95, "q99" -> 0.99)

  def valueQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
    val counts = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val ranked = ev
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("value"))).cast("long"))
      .join(broadcast(counts), Seq("event_type"))
    def pos(q: Double): Column = (col("n") - lit(1L)).cast("double") * lit(q)
    // per-q flanking values: only ranks floor(pos)+1 / ceil(pos)+1 survive
    // into the aggregate (row_number is 1-based)
    val flanks = Qs.flatMap { case (name, q) =>
      Seq(
        max(when(col("rk") === floor(pos(q)).cast("long") + 1, col("value")))
          .as(s"${name}_lo"),
        max(when(col("rk") === ceil(pos(q)).cast("long") + 1, col("value")))
          .as(s"${name}_hi"))
    }
    val agged = ranked.groupBy("event_type")
      .agg(first(col("n")).as("n"), flanks: _*)
    val posN = (col("n") - lit(1L)).cast("double")
    val qCols = Qs.map { case (name, q) =>
      val p = posN * lit(q)
      val frac = p - floor(p)
      round(col(s"${name}_lo") + frac * (col(s"${name}_hi") - col(s"${name}_lo")), 6)
        .as(name)
    }
    agged.select(col("event_type") +: col("n") +: qCols: _*)
      .orderBy("event_type")
  }

  val valueQuantilesSql: String =
    """SELECT event_type, count(*) AS n,
      |       round(quantile_cont(value, 0.5), 6) AS q50,
      |       round(quantile_cont(value, 0.95), 6) AS q95,
      |       round(quantile_cont(value, 0.99), 6) AS q99
      |FROM events WHERE value IS NOT NULL
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exact distinct cardinality per group (COUNT(DISTINCT user_id) by
    * event_type) — the other distribution-profiling aggregate. Spark
    * plans it as the two-phase Expand: partial distinct on (group, user)
    * map-side, then the final count — no per-group set is ever
    * materialized in one task, so the shape survives a fact-sized input.
    * The 100 TB knob when even the expanded shuffle is too much is
    * `approx_count_distinct` (HyperLogLog++, fixed sketch memory,
    * mergeable across partitions) — QuantilesSpec bounds its relative
    * error against this exact path. */
  def distinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  val distinctUsersSql: String =
    """SELECT event_type, count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
}
