package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("boundary point p == hi matches ONLY the upper band ([lo, hi))") {
    val pts = Seq((1L, 2000.0)).toDF("pid", "p") // 2000 = hi of band 0 = lo of band 1
    val iv = RangeJoin.bands.toDF("band_id", "lo", "hi")
    val got = RangeJoin.bucketed(pts, col("p"), iv, 8192.0)
      .select("band_id").as[Int].collect().toSeq
    assert(got == Seq(1), s"2000.0 must land only in band 1 ([2000,4000)); got $got")
  }

  test("points below the lowest lo and at/above the highest hi drop out") {
    val pts = Seq((1L, 999.99), (2L, 512000.0), (3L, 999999.0)).toDF("pid", "p")
    val iv = RangeJoin.bands.toDF("band_id", "lo", "hi")
    assert(RangeJoin.bucketed(pts, col("p"), iv, 8192.0).count() == 0)
  }

  test("result is invariant across bucket widths W") {
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val iv = RangeJoin.bands.toDF("band_id", "lo", "hi")
    val results = Seq(512.0, 8192.0, 1e6).map { w =>
      RangeJoin.bucketed(o, col("o_totalprice"), iv, w)
        .select("o_orderkey", "band_id")
    }
    val base = results.head
    results.tail.foreach { r =>
      assert(r.except(base).isEmpty && base.except(r).isEmpty,
        "bucketed range join must be exact for ANY W (residual filter)")
    }
  }

  test("registered entry matches the naive non-equi formulation (sf0.001)") {
    val got = RangeJoin.rangeJoinBands(spark, sfDir)
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val iv = RangeJoin.bands.toDF("band_id", "lo", "hi")
    val naive = o.join(iv,
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band_id", "lo", "hi")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"))
      .select(col("band_id"), col("lo").as("band_lo"), col("hi").as("band_hi"),
        col("n_orders"), col("sum_price"))
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
    assert(got.count() > 0)
  }

  test("plan: equi-join on the bucket, no BroadcastNestedLoopJoin") {
    val plan = RangeJoin.rangeJoinBands(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "range join must stay an equi-join on _bkt with a residual filter")
  }

  test("overlap join emits each overlapping pair exactly once, for ANY W") {
    // intervals chosen to cross bucket boundaries and share several
    // buckets, so the exactly-once rule (overlap-start bucket) is load-bearing
    val a = Seq((1L, 0L, 250L), (2L, 90L, 110L), (3L, 400L, 410L))
      .toDF("aid", "s_lo", "s_hi")
    val b = Seq((10L, 100L, 300L), (20L, 240L, 260L), (30L, 500L, 600L))
      .toDF("bid", "w_lo", "w_hi")
    val want = Set((1L, 10L), (1L, 20L), (2L, 10L)) // closed-interval overlaps
    for (w <- Seq(7L, 100L, 1000L)) {
      val got = RangeJoin.overlapBucketed(a, "s_lo", "s_hi", b, "w_lo", "w_hi", w)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicates at W=$w: ${got.toSeq}")
      assert(got.toSet == want, s"W=$w got ${got.toSet}")
    }
  }

  test("closed-interval touch (a_hi == b_lo) counts as a zero-length overlap") {
    val a = Seq((1L, 0L, 100L)).toDF("aid", "s_lo", "s_hi")
    val b = Seq((10L, 100L, 200L)).toDF("bid", "w_lo", "w_hi")
    val got = RangeJoin.overlapBucketed(a, "s_lo", "s_hi", b, "w_lo", "w_hi", 50L)
    assert(got.count() == 1)
  }

  test("interval overlap entry: sane aggregates and no nested loop") {
    val df = RangeJoin.intervalOverlapJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // a session ∩ window overlap can never exceed the window's own width
    val maxByKind = rows.groupBy(_.getString(1)).map { case (k, rs) =>
      k -> rs.map(r => r.getLong(3) / r.getLong(2)).max // avg overlap per session
    }
    assert(maxByKind("nightly") <= 2L * 3600L * 1000000L)
    assert(maxByKind.getOrElse("midday", 0L) <= 5400L * 1000000L)
  }
}
