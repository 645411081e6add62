package graft.analytics

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StatsSpec extends SparkSpec {

  test("KS: d in [0,1], every type present, counts reconcile to the corpus") {
    val ks = Stats.ksByEventType(spark, sfDir).cache()
    val types = Tables.events(spark, sfDir)
      .select("event_type").distinct().count()
    assert(ks.count() == types)
    val total = Tables.events(spark, sfDir).count()
    // each row's n_type + n_rest must equal the corpus
    assert(ks.filter(col("n_type") + col("n_rest") =!= total).isEmpty)
    assert(ks.filter(col("ks_d") < 0 || col("ks_d") > 1).isEmpty)
  }

  test("KS: identical distributions give d = 0 on a hand-built frame") {
    import spark.implicits._
    // two types with the SAME per-bucket mass: any grid walk must see
    // a zero supremum for each type vs the pooled rest
    val rows = Seq.tabulate(100)(i => ("a", i.toDouble)) ++
      Seq.tabulate(100)(i => ("b", i.toDouble))
    val df = rows.toDF("event_type", "value")
    df.createOrReplaceTempView("spec_ks_events")
    // re-express the engine kernel inline over the temp frame
    val e = df
    val bounds = e.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    val binned = e.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(
            floor((col("value") - col("mn")) * Stats.KsBuckets /
              (col("mx") - col("mn"))), lit(Stats.KsBuckets - 1L)))
          .cast("long").as("bucket"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
    // identical masses → per-bucket n is equal across types
    val perBucketTypes = binned.groupBy("bucket")
      .agg(countDistinct(col("n")).as("k"))
    assert(perBucketTypes.filter(col("k") =!= 1).isEmpty)
  }

  test("Gini matches the all-pairs mean-absolute-difference form") {
    val g = Stats.giniSpend(spark, sfDir).head()
    val spend = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("x"))
    // G = Σᵢⱼ|xᵢ−xⱼ| / (2 n² μ) — quadratic, fine at spec scale
    val xs = spend.select("x").collect().map(_.getDouble(0))
    val n = xs.length.toDouble
    val mu = xs.sum / n
    val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
    val expected = mad / (2 * n * n * mu)
    assert(math.abs(g.getAs[Double]("gini") - expected) < 1e-4,
      s"got ${g.getAs[Double]("gini")} want $expected")
    assert(g.getAs[Long]("n_customers") == xs.length)
  }

  test("MoM: first month NULL, deltas telescope to last-minus-first") {
    val m = Stats.monthlyRevenueMom(spark, sfDir).cache()
    val rows = m.orderBy("month").collect()
    assert(rows.length > 12)
    assert(rows.head.isNullAt(rows.head.fieldIndex("delta")))
    assert(rows.tail.forall(!_.isNullAt(rows.head.fieldIndex("delta"))))
    val telescoped = rows.tail.map(_.getDouble(2)).sum
    val lastMinusFirst = rows.last.getDouble(1) - rows.head.getDouble(1)
    assert(math.abs(telescoped - lastMinusFirst) < 1e-6)
  }

  test("MoM plans the lag window over a months-bounded frame") {
    val plan = Stats.monthlyRevenueMom(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    // the fact stream must aggregate BEFORE the window: a partial_sum
    // (map-side combine) precedes the exchange
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"), plan)
  }
}
