package graft.analytics

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class WindowsSpec extends SparkSpec {

  test("rolling 30-day spend matches the self-join model") {
    val got = Windows.rollingSpend30d(spark, sfDir)
    // model: sum over an explicit interval self-join — quadratic per
    // customer, fine at spec scale, decimal-exact like the engine path
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
    val model = o.as("a")
      .join(o.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("b.o_orderdate") >= col("a.o_orderdate") - expr("INTERVAL 30 DAYS") &&
          col("b.o_orderdate") <= col("a.o_orderdate"))
      .groupBy(col("a.o_orderkey").as("o_orderkey"), col("a.o_custkey").as("o_custkey"),
        col("a.o_orderdate").as("o_orderdate"))
      .agg(sum(col("b.p")).cast("double").as("spend_30d"))
    assert(got.except(model).isEmpty && model.except(got).isEmpty)
    assert(got.count() == o.count())
  }

  test("same-day orders are RANGE peers: both rows see the full day total") {
    import spark.implicits._
    val rows = Seq(
      (1L, 7L, "2024-01-01", 10.00), // same day, same customer
      (2L, 7L, "2024-01-01", 20.00),
      (3L, 7L, "2024-02-15", 5.00), // outside the 30-day reach of Jan 1
      (4L, 8L, "2024-01-01", 99.00) // other customer, untouched
    ).toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
    rows.createOrReplaceTempView("spec_orders")
    val got = spark.sql(
      """SELECT o_orderkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate
        |         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW
        |       ) AS DOUBLE) AS spend
        |FROM spec_orders""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 30.0, 2L -> 30.0, 3L -> 5.0, 4L -> 99.0))
  }

  test("rolling spend plans one hash exchange plus the presentation sort") {
    val plan = Windows.rollingSpend30d(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(plan.split("Exchange").length - 1 == 2, plan)
  }

  test("daily anomaly: z-scores standardize (mean~0, var~1), counts reconcile") {
    val a = Windows.dailyVolumeAnomaly(spark, sfDir).cache()
    val n = a.count()
    assert(n > 0)
    assert(a.agg(sum("n_events")).head().getLong(0) ==
      Tables.events(spark, sfDir).count())
    val zMean = a.agg(avg("z")).head().getDouble(0)
    val zVar = a.agg(avg(col("z") * col("z"))).head().getDouble(0)
    assert(math.abs(zMean) < 1e-4, s"z mean $zMean")
    assert(math.abs(zVar - 1.0) < 1e-3, s"z var $zVar")
    assert(a.filter(col("is_anomaly") =!= (abs(col("z")) > 2d)).isEmpty)
    a.unpersist()
  }

  test("customer RFM reconciles with the raw orders table") {
    val rfm = graft.analytics.Queries.customerRfm(spark, sfDir).cache()
    val o = Tables.orders(spark, sfDir)
    assert(rfm.count() == o.select("o_custkey").distinct().count())
    assert(rfm.agg(sum("frequency")).head().getLong(0) == o.count())
    // the most recent customer has recency 0; none are negative
    assert(rfm.agg(min("recency_days")).head().getLong(0) == 0L)
    assert(rfm.filter(col("recency_days") < 0 || col("frequency") < 1).isEmpty)
    rfm.unpersist()
  }

  test("value-hour correlation matches Spark's corr and stays in [-1, 1]") {
    val got = Windows.valueHourCorr(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.values.forall { case (_, c) => c >= -1d && c <= 1d })
    // the exact-moment formula must agree with Spark's running-co-moment
    // corr aggregate to float tolerance (they differ only in summation
    // order / algorithm, not in the statistic)
    val ref = Tables.events(spark, sfDir).filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        corr(col("value"), hour(col("ts")).cast("double")).as("c"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (et, (n, c)) =>
      assert(n == ref(et)._1, et)
      assert(math.abs(c - ref(et)._2) < 1e-6, s"$et: $c vs ${ref(et)._2}")
    }
  }

  test("ranking family agrees with a driver-side model over the nation revenues") {
    val rows = Windows.nationRevenueRanks(spark, sfDir).collect()
    val n = rows.length
    // reconstruct the total order and re-derive each function
    val ordered = rows.sortBy(r => (-r.getDouble(1), r.getString(0)))
    ordered.zipWithIndex.foreach { case (r, i) =>
      val distinctBefore = ordered.take(i + 1).map(_.getDouble(1)).distinct.size
      assert(r.getLong(2) == distinctBefore, s"dense_rank at $i")
      // with the (revenue, nation) total order every row rank is i+1
      assert(math.abs(r.getDouble(3) - i.toDouble / (n - 1)) < 5e-7, s"prank at $i")
      assert(math.abs(r.getDouble(4) - (i + 1).toDouble / n) < 5e-7, s"cdist at $i")
      // SQL ntile: first (n mod 4) tiles get ceil(n/4), the rest floor(n/4)
      val (big, base) = (n % 4, n / 4)
      val tile = if (i < big * (base + 1)) i / (base + 1) + 1
        else (i - big * (base + 1)) / base + big + 1
      assert(r.getLong(5) == tile, s"ntile at $i")
    }
    assert(rows.map(_.getLong(5)).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("price~quantity regression matches a driver-side exact OLS per flag") {
    val got = Windows.priceQuantityRegression(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val li = graft.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1).toLong,
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    assert(got.keySet == li.map(_._1).toSet)
    li.groupBy(_._1).foreach { case (flag, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum.toDouble
      val sxx = rows.map(r => r._2 * r._2).sum.toDouble
      val sy = rows.map(_._3).sum.toDouble
      val sxy = rows.map(r => r._3 * BigDecimal(r._2)).sum.toDouble
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val (gn, gs, gi, gr2) = got(flag)
      assert(gn == rows.length.toLong)
      assert(math.abs(gs - slope) < 1e-4, s"$flag slope $gs vs $slope")
      assert(math.abs(gi - intercept) < 1e-3, s"$flag intercept")
      assert(gr2 >= 0d && gr2 <= 1d, s"$flag r2 in range")
    }
  }

  test("revenue contribution: shares sum to 1, cumulative is monotone, Pareto cut consistent") {
    val rows = Windows.revenueContribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getString(4)))
    assert(rows.nonEmpty && rows.length <= 25)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    // presentation order is revenue DESC; cum_share climbs to 1 along it
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    rows.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0)._4 <= p(1)._4 + 1e-9, s"${p(0)} ${p(1)}")
    }
    assert(math.abs(rows.last._4 - 1.0) < 1e-4)
    rows.foreach { case (n, _, _, cum, cls) =>
      assert(cls == (if (cum <= 0.8) "core" else "tail"), n)
    }
    assert(rows.map(_._5).toSet == Set("core", "tail"))
  }

  test("time-weighted average: replay matches, bursts don't over-weight") {
    val got = Windows.timeWeightedValue(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getAs[Double]("twa_value")))).toMap
    val ev = graft.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select("user_id", "event_id", "ts", "value").collect()
      .map { r =>
        val i = r.getTimestamp(2).toInstant
        (r.getLong(0), r.getLong(1),
          i.getEpochSecond * 1000000L + i.getNano / 1000L, r.getDouble(3))
      }
    ev.groupBy(_._1).foreach { case (user, xs) =>
      val sorted = xs.sortBy(e => (e._3, e._2))
      val want =
        if (sorted.length < 2) None
        else {
          val terms = sorted.sliding(2).collect { case Array(a, b) =>
            val dt = b._3 - a._3
            (BigDecimal(a._4 * dt).setScale(6, BigDecimal.RoundingMode.HALF_UP), dt)
          }.toSeq
          val span = terms.map(_._2).sum
          if (span == 0) None
          else Some(BigDecimal(terms.map(_._1).sum.toDouble / span)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      assert(got(user) == want, s"user $user: got ${got(user)} want $want")
    }
  }

  test("brand skyline: exact non-dominated set vs brute-force oracle") {
    val sky = Windows.brandSkyline(spark, sfDir)
      .select("brand", "p_partkey").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val parts = graft.Tables.part(spark, sfDir)
      .select("p_brand", "p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    // brute-force dominance on the tiny sf: q dominates p within a brand
    // iff q is cheaper-or-equal AND bigger-or-equal, strict somewhere
    val want = parts.filter { case (b, _, sz, pr) =>
      !parts.exists { case (b2, _, sz2, pr2) =>
        b2 == b && pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
      }
    }.map(p => (p._1, p._2)).toSet
    assert(sky == want, s"missing=${(want -- sky).take(5)} extra=${(sky -- want).take(5)}")
    assert(sky.nonEmpty)
  }
}
