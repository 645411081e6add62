package graft

import org.apache.spark.sql.DataFrame

import graft.analytics.Queries
import graft.etl.Transforms
import graft.llm.Similarity

/** Plan audits: pin the physical-plan properties the 100 TB design relies
  * on (SURVEY.md §4) so a regression in plan shape fails the suite, not
  * just the benchmark. */
class PlanSpec extends SparkSpec {

  private def planString(df: DataFrame): String = {
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString
  }

  test("q1: supplier dimension joins via broadcast (no fact-side shuffle)") {
    val plan = planString(Queries.q1RatioRank(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("clean chain: the ts range filter is pushed into the parquet scan") {
    val plan = planString(Transforms.cleanEvents(spark, sfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(ts)")
      || plan.contains("PushedFilters: [*IsNotNull(ts)")
      || (plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(ts")),
      plan.take(3000))
  }

  test("clean chain: pruned scan reads only referenced columns") {
    val plan = planString(Transforms.cleanEvents(spark, sfDir))
    // props/user_id are dropped before any use; the parquet ReadSchema
    // must not contain them
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("props") && !readSchema.contains("user_id"), readSchema)
  }

  test("q3b: the top-5 companies use TakeOrderedAndProject (true top-k, no full sort)") {
    val plan = planString(Queries.q3bWorstIssues(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("native kNN: cosine kernel runs inside whole-stage codegen") {
    val df = Similarity.embeddingKnnNative(spark, sfDir)
    // pre-execution plan: AQE hasn't collapsed materialized stages yet, so
    // the full tree (incl. the cosine projection) is visible
    val initial = df.queryExecution.executedPlan.toString
    assert(initial.contains("cosine_similarity"), initial.take(3000))
    val finalPlan = planString(df)
    assert(finalPlan.contains("WholeStageCodegen") || finalPlan.contains("*("),
      finalPlan.take(2000))
  }
}
