package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RuntimeFilterSpec extends SparkSpec {

  test("the bloom runtime filter is injected on the fact side") {
    val plan = RuntimeFilter.bloomPrunedJoin(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan.take(1500))
    assert(plan.contains("bloom_filter_agg"), plan.take(1500))
  }

  test("bloom pruning never changes the result") {
    val got = RuntimeFilter.bloomPrunedJoin(spark, sfDir)
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
    assert(got.collect().toSeq == plain.orderBy("l_returnflag").collect().toSeq)
  }

  test("the child session's knobs do not leak into the parent session") {
    RuntimeFilter.bloomPrunedJoin(spark, sfDir).count()
    assert(spark.conf.get("spark.sql.autoBroadcastJoinThreshold") != "-1")
  }
}
