package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Fact-table builders — Spark-native rebuilds of the reference's fact
  * loads (reference: inserting-data.sql:128-178): the multi-way surrogate
  * key resolution joins (J1/J2), expression-keyed date-dimension joins
  * (J3), and null-safe key canonicalization (J4).
  *
  * Scale notes: only the constant-size dimensions (nation, region, the
  * generated date dim) are broadcast. customer/supplier/part grow with
  * scale factor — broadcasting them would OOM at large SF, so those joins
  * are left to AQE (shuffle-hash / sort-merge with runtime re-plan).
  */
object Facts {

  /** 7-way star join (J2, reference inserting-data.sql:150-178: complaints
    * joined to all seven dimensions), summarized per region/returnflag.
    * Revenue uses exact decimal accumulation so the oracle hash-matches
    * (double summation order is engine-dependent; decimal is not). */
  def factMultijoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val s = Tables.supplier(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("r_name").as("region"), col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")), 2).cast("double").as("revenue"))
      .select(col("region"), col("l_returnflag"), col("n_items"),
        col("sum_qty"), col("revenue"))
      .orderBy("region", "l_returnflag")
  }

  val factMultijoinSql: String =
    """SELECT r_name AS region, l_returnflag,
      |       count(*) AS n_items,
      |       sum(l_quantity) AS sum_qty,
      |       CAST(round(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey  = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN part     ON l_partkey = p_partkey
      |GROUP BY r_name, l_returnflag
      |ORDER BY region, l_returnflag""".stripMargin

  /** population_fact analog (J1, reference inserting-data.sql:128-141):
    * the 2-way surrogate-key resolution join — yearly per-location measures
    * joined to year_dimension and location_dimension to swap natural keys
    * for surrogate ids. Both dims are dimension-sized → broadcast. */
  def populationFact(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val yearly = o
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("year"),
        col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2).cast("double")
          .as("total_price"))
    val yd = Dims.yearDim(spark, dir)
    val ld = Dims.locationDim(spark, dir)
    yearly
      .join(broadcast(yd), Seq("year"))
      .join(broadcast(ld), Seq("nation"))
      .withColumn("population_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("year_id"), col("location_id"))).cast("long"))
      .select("population_id", "year_id", "location_id", "n_orders", "total_price")
      .orderBy("population_id")
  }

  val populationFactSql: String =
    """WITH yearly AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS year, n_name AS nation,
      |         count(*) AS n_orders,
      |         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2
      |), yd AS (
      |  SELECT row_number() OVER (ORDER BY y) AS year_id, y AS year
      |  FROM (SELECT CAST(year(CAST(gs AS DATE)) AS BIGINT) AS y
      |        FROM generate_series(DATE '1992-01-01', DATE '2002-01-01', INTERVAL 1 YEAR) t(gs))
      |), keys AS (
      |  SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |  UNION
      |  SELECT DISTINCT s_nationkey FROM supplier
      |), ld AS (
      |  SELECT row_number() OVER (ORDER BY n_name) AS location_id,
      |         n_name AS nation, r_name AS region
      |  FROM keys
      |  JOIN nation ON nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |)
      |SELECT row_number() OVER (ORDER BY year_id, location_id) AS population_id,
      |       year_id, location_id, n_orders, total_price
      |FROM yearly JOIN yd USING (year) JOIN ld USING (nation)
      |ORDER BY population_id""".stripMargin

  /** Expression-keyed equi-join to the generated date dimension (J3 + M3 +
    * F1/F2, reference inserting-data.sql:164-169: join keys computed with
    * EXTRACT(… FROM TO_DATE(...))). Still hash-joinable in Catalyst. */
  def exprJoinDateDim(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val dd = Dims.dateDim(spark, dir)
    li.join(broadcast(dd),
        dd("year") === year(col("l_shipdate")) &&
        dd("month") === month(col("l_shipdate")) &&
        dd("day") === dayofmonth(col("l_shipdate")))
      .groupBy(col("year"))
      .agg(count(lit(1)).as("n_items"),
        countDistinct(col("date_id")).as("n_ship_days"))
      .orderBy("year")
  }

  val exprJoinDateDimSql: String =
    """WITH dd AS (
      |  SELECT row_number() OVER (ORDER BY d) AS date_id, d,
      |         CAST(year(d) AS BIGINT) AS year,
      |         CAST(month(d) AS BIGINT) AS month,
      |         CAST(day(d) AS BIGINT) AS day
      |  FROM (SELECT CAST(gs AS DATE) AS d
      |        FROM generate_series(DATE '1995-01-01', DATE '2002-12-31', INTERVAL 1 DAY) t(gs))
      |)
      |SELECT dd.year, count(*) AS n_items, count(DISTINCT date_id) AS n_ship_days
      |FROM lineitem JOIN dd
      |  ON dd.year = year(l_shipdate) AND dd.month = month(l_shipdate) AND dd.day = day(l_shipdate)
      |GROUP BY dd.year
      |ORDER BY dd.year""".stripMargin

  /** Null-safe multi-key equi-join (J4, reference inserting-data.sql:170-175:
    * COALESCE(key,'') on both sides so NULL keys match). Nulls injected
    * deterministically via nullif; the join uses <=> (eqNullSafe), Spark's
    * native equivalent of the reference's COALESCE canonicalization. */
  def nullsafeJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val dimSide = p
      .groupBy(nullif(col("p_brand"), lit("Brand#13")).as("brand"))
      .agg(count(lit(1)).as("n_parts"))
    val factSide = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(nullif(col("p_brand"), lit("Brand#13")).as("brand"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
    factSide.join(dimSide, factSide("brand") <=> dimSide("brand"))
      .select(factSide("brand"), col("n_parts"), col("sum_qty"))
      .orderBy(col("brand").asc_nulls_first)
  }

  val nullsafeJoinSql: String =
    """WITH dim_side AS (
      |  SELECT nullif(p_brand, 'Brand#13') AS brand, count(*) AS n_parts
      |  FROM part GROUP BY 1
      |), fact_side AS (
      |  SELECT nullif(p_brand, 'Brand#13') AS brand, sum(l_quantity) AS sum_qty
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1
      |)
      |SELECT f.brand, n_parts, sum_qty
      |FROM fact_side f JOIN dim_side d ON f.brand IS NOT DISTINCT FROM d.brand
      |ORDER BY f.brand ASC NULLS FIRST""".stripMargin
}
