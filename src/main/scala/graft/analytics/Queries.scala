package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Analytical query surface — Spark-native rebuilds of the reference's
  * analysis.sql Q1–Q3 shapes (reference: analysis.sql:13-238), mapped onto
  * the driver corpus per FIXTURES.md: company→supplier.s_name,
  * timely_response→(l_returnflag='N'), consumer_disputed→(l_linestatus='F').
  *
  * Design notes for 100 TB scale:
  *  - supplier/part/nation/region are dimension-sized → broadcast joins
  *    (no shuffle on the fact side).
  *  - the global (unpartitioned) RANK windows mirror analysis.sql:49-50;
  *    they run on the *aggregated* table (one row per company), which is
  *    dimension-sized even at 100 TB — the single-partition window is fine
  *    because the groupBy already reduced cardinality.
  *  - ratios are computed on raw doubles (deterministic IEEE division) and
  *    only rounded for presentation, so RANK ordering is engine-stable.
  */
object Queries {

  /** Q1a flagship (analysis.sql:13-57): per-company response counts,
    * filtered aggregates, HAVING floor, ratio projection, dual global RANK,
    * disjunctive rank filter, presentation ORDER BY.
    * Operators: A1 A2 A3 A5 A8 W1 P6 O1 F6 J1(broadcast). */
  def q1RatioRank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val sup = Tables.supplier(spark, dir)
    val agg = li
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(
        count(lit(1)).as("total_responses"),
        count(when(col("l_returnflag") === "N", 1)).as("timely_responses"),
        count(when(col("l_returnflag") =!= "N", 1)).as("untimely_responses"))
      .filter(col("total_responses") >= 10) // HAVING (analysis.sql:26-27)
    val raw = col("timely_responses") / col("total_responses")
    val ranked = agg
      .withColumn("timely_rank", rank().over(Window.orderBy(raw.desc)).cast("long"))
      .withColumn("untimely_rank", rank().over(Window.orderBy(raw.asc)).cast("long"))
    ranked
      .filter(col("timely_rank") <= 10 || col("untimely_rank") <= 10)
      .select(
        col("s_name"), col("total_responses"), col("timely_responses"),
        col("untimely_responses"),
        round(raw, 6).as("timely_response_ratio"),
        round(lit(1) - raw, 6).as("untimely_response_ratio"),
        col("timely_rank"), col("untimely_rank"))
      .orderBy(col("timely_rank"), col("s_name"))
  }

  val q1RatioRankSql: String =
    """WITH agg AS (
      |  SELECT s_name,
      |         count(*) AS total_responses,
      |         count(CASE WHEN l_returnflag = 'N' THEN 1 END) AS timely_responses,
      |         count(CASE WHEN l_returnflag <> 'N' THEN 1 END) AS untimely_responses
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY s_name
      |  HAVING count(*) >= 10
      |), ranked AS (
      |  SELECT agg.*,
      |         timely_responses / total_responses AS tr_raw,
      |         RANK() OVER (ORDER BY timely_responses / total_responses DESC) AS timely_rank,
      |         RANK() OVER (ORDER BY timely_responses / total_responses ASC)  AS untimely_rank
      |  FROM agg
      |)
      |SELECT s_name, total_responses, timely_responses, untimely_responses,
      |       round(tr_raw, 6) AS timely_response_ratio,
      |       round(1 - tr_raw, 6) AS untimely_response_ratio,
      |       timely_rank, untimely_rank
      |FROM ranked
      |WHERE timely_rank <= 10 OR untimely_rank <= 10
      |ORDER BY timely_rank, s_name""".stripMargin
}
