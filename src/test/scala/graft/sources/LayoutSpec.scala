package graft.sources

import graft.SparkSpec

/** Pin the physical properties the layout operators exist for. */
class LayoutSpec extends SparkSpec {

  test("bucketed join runs without an exchange (co-located buckets)") {
    val df = Layout.bucketedJoin(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the join itself must read both bucketed tables without shuffling;
    // the only exchange allowed is the one feeding the final aggregation
    val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey")
      && !joinSection.contains("Exchange hashpartitioning(o_orderkey"), plan.take(3000))
  }

  test("partitioned scan prunes to the filtered partition") {
    val df = Layout.partitionedScan(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type") , plan.take(3000))
  }
}
