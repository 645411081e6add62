package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Equivalence proofs-by-execution for the two plan rewrites the analytics
  * layer makes relative to the reference's literal formulation (the
  * scaladoc carries the algebraic argument; these pin it on real data). */
class QueriesSpec extends SparkSpec {

  test("q1c single-scan disjunctive filter == union of the Q1a/Q1b winner lists") {
    val combined = Queries.q1cCompanies(spark, sfDir).select("company")
    val naive = Queries.q1RatioRank(spark, sfDir).select(col("s_name").as("company"))
      .union(Queries.q1bDisputedRank(spark, sfDir).select(col("s_name").as("company")))
      .distinct()
    assert(combined.except(naive).isEmpty && naive.except(combined).isEmpty)
  }

  test("q3b semi-join rewrite == the reference's non-deduped join-back") {
    // the faithful formulation: join temp_cf to Top5Information without
    // dedup (row multiplication), exactly as analysis.sql:192-196
    val tempCf = Queries.q3aCfView(spark, sfDir).cache()
    val ratio = count(when(col("timely_responses") === 1, 1)) / count(lit(1))
    val top5 = tempCf.groupBy(col("company"))
      .agg(ratio.as("timely_response_ratio"))
      .orderBy(col("timely_response_ratio").desc, col("company"))
      .limit(5).select("company")
    val top5Info = tempCf.join(top5, Seq("company"))
    val naiveWeakest: DataFrame = tempCf
      .join(top5Info.select("company", "state"), Seq("company", "state"))
      .groupBy(col("company"), col("state"), col("product"))
      .agg(ratio.as("timely_response_ratio"))
      .withColumn("product_rank",
        row_number().over(Window.partitionBy(col("company"), col("state"))
          .orderBy(col("timely_response_ratio").asc, col("product"))).cast("long"))
      .filter(col("product_rank") <= 2)
      .select("company", "state", "product", "timely_response_ratio", "product_rank")
    val rewritten = tempCf
      .join(top5, Seq("company"), "left_semi")
      .groupBy(col("company"), col("state"), col("product"))
      .agg(ratio.as("timely_response_ratio"))
      .withColumn("product_rank",
        row_number().over(Window.partitionBy(col("company"), col("state"))
          .orderBy(col("timely_response_ratio").asc, col("product"))).cast("long"))
      .filter(col("product_rank") <= 2)
      .select("company", "state", "product", "timely_response_ratio", "product_rank")
    // (a·m)/(b·m) == a/b under correctly-rounded IEEE division — the
    // ratios, and hence the ranks, must be bit-identical
    assert(naiveWeakest.except(rewritten).isEmpty
      && rewritten.except(naiveWeakest).isEmpty)
  }

  test("q1b undisputed ranking from counts matches the ratio-complement ordering") {
    val out = Queries.q1bDisputedRank(spark, sfDir).cache()
    // ordering by undisputed_count/total DESC must order exactly like
    // disputed_count/total ASC on non-null binary flags
    val byComplement = out.orderBy(col("disputed_response_ratio").asc, col("s_name"))
      .select("s_name").collect().map(_.getString(0)).toSeq
    val byDirect = out.orderBy(col("undisputed_response_ratio").desc, col("s_name"))
      .select("s_name").collect().map(_.getString(0)).toSeq
    assert(byComplement == byDirect)
  }

  test("set-op cohorts match a driver-side model and partition the 1995 buyers") {
    val byYear = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
      .filter(col("y").isin(1995, 1996)).collect()
      .groupBy(_.getInt(1)).map { case (y, rs) => y -> rs.map(_.getLong(0)).toSet }
    val (b95, b96) = (byYear(1995), byYear.getOrElse(1996, Set.empty[Long]))
    val got = Queries.setopCohorts(spark, sfDir).collect()
      .groupBy(_.getString(0)).map { case (c, rs) => c -> rs.map(_.getLong(1)).toSet }
    assert(got("both") == (b95 intersect b96))
    assert(got("only_1995") == (b95 diff b96))
    // the two cohorts are disjoint and exactly cover the 1995 buyer set
    assert((got("both") intersect got("only_1995")).isEmpty)
    assert((got("both") union got("only_1995")) == b95)
  }

  test("top-k per group emits dense ranks of non-increasing revenue, k<=3 per nation") {
    val rows = Queries.topkPerGroup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byNation = rows.groupBy(_._1)
    byNation.foreach { case (nation, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.length <= 3, s"$nation cap")
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq, s"$nation dense ranks")
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq,
        s"$nation revenue non-increasing")
    }
    // the window ranks aggregated cells: every nation with any lineitem
    // revenue appears (suppliers cover all nations on this corpus)
    val nations = graft.Tables.supplier(spark, sfDir)
      .join(graft.Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .select("n_name").distinct().collect().map(_.getString(0)).toSet
    assert(byNation.keySet == nations)
  }

  test("listagg: sorted comma-joined distinct priorities, partition-order independent") {
    val rows = Queries.listaggPriorities(spark, sfDir).collect()
    val n = graft.Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == n)
    rows.foreach { r =>
      val parts = r.getAs[String]("priorities").split(",").toSeq
      assert(parts == parts.sorted && parts.distinct == parts,
        s"${r.getAs[String]("o_orderstatus")}: ${parts.mkString("|")}")
    }
    // determinism: a second execution (fresh shuffle, fresh set order)
    // must produce byte-identical strings — array_sort seals the set
    val again = Queries.listaggPriorities(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
