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

  test("KS: identical distributions give d = 0 through the actual kernel") {
    import spark.implicits._
    // two types with the SAME values: the full CDF walk must see a zero
    // supremum for each type vs the pooled rest
    val rows = Seq.tabulate(100)(i => ("a", i.toDouble)) ++
      Seq.tabulate(100)(i => ("b", i.toDouble))
    val out = Stats.ksFrom(rows.toDF("event_type", "value")).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Double]("ks_d") == 0.0),
      out.map(r => s"${r.getString(0)}=${r.getAs[Double]("ks_d")}").mkString(","))
    assert(out.forall(r => r.getAs[Long]("n_type") == 100L
      && r.getAs[Long]("n_rest") == 100L))
  }

  test("KS: disjoint distributions give d = 1; single type gives NULL") {
    import spark.implicits._
    // type a entirely below type b: at the boundary bucket CDF_a = 1 and
    // CDF_rest = 0, so the supremum is exactly 1 for both contrasts
    val rows = Seq.tabulate(50)(i => ("a", i.toDouble)) ++
      Seq.tabulate(50)(i => ("b", 1000.0 + i))
    val out = Stats.ksFrom(rows.toDF("event_type", "value")).collect()
    assert(out.length == 2 && out.forall(_.getAs[Double]("ks_d") == 1.0))
    // degenerate corpus #2 from the scaladoc: one type has no rest
    // population → ks_d NULL, counts still reported
    val solo = Stats.ksFrom(Seq.tabulate(10)(i => ("only", i.toDouble))
      .toDF("event_type", "value")).collect()
    assert(solo.length == 1 && solo.head.isNullAt(solo.head.fieldIndex("ks_d")))
    assert(solo.head.getAs[Long]("n_type") == 10L
      && solo.head.getAs[Long]("n_rest") == 0L)
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
    // the fact stream must aggregate BEFORE the window: a map-side
    // partial_sum combine sits BELOW the Window in the tree (children
    // print after parents, so "executes first" = LARGER string index)
    val iWindow = plan.indexOf("Window")
    val iPartial = plan.indexOf("partial_sum")
    assert(iPartial >= 0, s"no partial_sum (map-side combine) in plan:\n$plan")
    assert(iPartial > iWindow,
      s"partial_sum must be under the Window (idx $iPartial vs $iWindow):\n$plan")
  }

  test("nation HHI: bounds, even-market floor, and a driver-side recompute") {
    val hhi = Stats.nationRevenueHhi(spark, sfDir).cache()
    assert(hhi.count() > 0)
    // 1/n <= HHI <= 1 for every nation (6dp slack from per-term rounding)
    assert(hhi.filter(col("hhi") > 1.0 + 1e-5 ||
      col("hhi") < lit(1.0) / col("n_suppliers") - 1e-5).isEmpty)
    // exact recompute for one nation
    val r = hhi.first()
    val cells = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .join(graft.Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === r.getAs[String]("nation"))
      .groupBy("s_suppkey")
      .agg(sum(expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")).as("srev"))
      .collect().map(_.getAs[java.math.BigDecimal]("srev"))
    val total = cells.map(BigDecimal(_)).sum
    val want = cells.map { c =>
      val s = (BigDecimal(c) / total).toDouble
      BigDecimal(s * s).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(r.getAs[Long]("n_suppliers") == cells.length)
    assert(math.abs(r.getAs[Double]("hhi") - want) < 1e-6,
      s"${r.getAs[Double]("hhi")} vs $want")
    hhi.unpersist()
  }

  test("customer percentiles: closed forms equal Spark's own window functions") {
    import org.apache.spark.sql.expressions.Window
    val got = Stats.customerPercentiles(spark, sfDir).cache()
    // reference model: the built-in global-window functions on the same
    // dimension-sized frame (fine in a spec; the kernel avoids them so
    // the id-stamp survives fact-sized input)
    val spend = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
    val want = spend
      .withColumn("pct_rank", round(percent_rank().over(Window.orderBy("spend")), 6))
      .withColumn("cume_dist", round(cume_dist().over(Window.orderBy("spend")), 6))
      .withColumn("quartile",
        ntile(4).over(Window.orderBy(col("spend"), col("custkey"))).cast("long"))
      .select(col("custkey"), col("spend").cast("double").as("spend"),
        col("pct_rank"), col("cume_dist"), col("quartile"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // quartiles are balanced: sizes differ by at most 1, ordered 1..4
    val sizes = got.groupBy("quartile").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(1L, 2L, 3L, 4L))
    assert(sizes.values.max - sizes.values.min <= 1)
    got.unpersist()
  }

  test("dow seasonality: 7 cells, counts reconcile, index averages to 1") {
    val s = Stats.dowSeasonality(spark, sfDir).cache()
    assert(s.count() == 7)
    assert(s.select("dow").collect().map(_.getInt(0)).sorted.toSeq == (1 to 7))
    val orders = graft.Tables.orders(spark, sfDir)
    assert(s.agg(sum("n_orders")).head().getLong(0) == orders.count())
    // pin the defining identity per row: index = 7 · revenue / total
    val rows = s.collect()
    val trev = rows.map(r => BigDecimal(r.getAs[Double]("revenue"))).sum
    rows.foreach { r =>
      val want = (BigDecimal(7.0) * BigDecimal(r.getAs[Double]("revenue")) / trev).toDouble
      assert(math.abs(r.getAs[Double]("rev_index") - want) < 1e-4)
    }
    // Monday..Sunday mapping: spot-check one known date's bucket via Spark SQL
    val d = spark.sql("SELECT weekday(DATE'2026-08-10') + 1").head().getInt(0)
    assert(d == 1, "2026-08-10 is a Monday")
    s.unpersist()
  }

  test("cohort ltv: offset-0 rows exist, cumulative monotone, totals reconcile") {
    val m = Stats.cohortLtv(spark, sfDir).cache()
    // every cohort has an offset-0 cell (the acquisition month itself)
    val cohorts = m.select("cohort_month").distinct().count()
    assert(m.filter(col("month_offset") === 0).count() == cohorts)
    // cum_ltv never decreases within a cohort and sizes partition customers
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cohort_month")).orderBy(col("month_offset"))
    assert(m.withColumn("prev", lag(col("cum_ltv"), 1).over(w))
      .filter(col("prev").isNotNull && col("cum_ltv") < col("prev") - 1e-9).isEmpty)
    val sizeSum = m.select("cohort_month", "cohort_size").distinct()
      .agg(sum("cohort_size")).head().getLong(0)
    val customers = graft.Tables.orders(spark, sfDir)
      .select("o_custkey").distinct().count()
    assert(sizeSum == customers)
    // revenue across all cells equals total order revenue
    val tot = m.agg(sum("revenue")).head().getDouble(0)
    val want = graft.Tables.orders(spark, sfDir)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head()
      .getDecimal(0).doubleValue()
    assert(math.abs(tot - want) < 0.5)
    m.unpersist()
  }

  test("region nation share: shares normalize, ranks valid, totals reconcile") {
    val r = Stats.regionNationShare(spark, sfDir).cache()
    // every customer nation appears; revenue total matches orders total
    val tot = r.agg(sum("revenue")).head().getDouble(0)
    val want = graft.Tables.orders(spark, sfDir)
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))).head()
      .getDecimal(0).doubleValue()
    assert(math.abs(tot - want) < 0.5)
    // per-region share sums to 1, rank is a permutation of 1..k (ties absent)
    val byRegion = r.groupBy("region")
      .agg(sum("region_share").as("s"), count(lit(1)).as("k"),
        min("region_rank").as("mn"), max("region_rank").as("mx"),
        countDistinct("region_rank").as("kd")).collect()
    byRegion.foreach { row =>
      assert(math.abs(row.getAs[Double]("s") - 1.0) < row.getAs[Long]("k") * 1e-6 + 1e-9)
      assert(row.getAs[Long]("mn") == 1L)
      assert(row.getAs[Long]("kd") == row.getAs[Long]("k") ||
        row.getAs[Long]("mx") <= row.getAs[Long]("k"))
    }
    r.unpersist()
  }

  test("spend band migration: transitions reconcile to customer-year cells") {
    val m = Stats.spendBandMigration(spark, sfDir).cache()
    val bands = Set("low", "mid", "high", "top")
    m.collect().foreach { r =>
      assert(bands(r.getAs[String]("from_band")) && bands(r.getAs[String]("to_band")))
      assert(r.getAs[Long]("year_gap") >= 1)
      assert(r.getAs[Long]("n_customers") >= 1)
    }
    // total transitions = Σ per customer (active years − 1)
    val cells = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey").as("c"), year(col("o_orderdate")).as("y"))
      .distinct().groupBy("c").count().collect()
    val want = cells.map(_.getAs[Long]("count") - 1).sum
    assert(m.agg(sum("n_customers")).head().getLong(0) == want)
    m.unpersist()
  }

  test("seasonal naive: forecast is the year-ago actual, APE recomputes") {
    val f = Stats.seasonalNaiveForecast(spark, sfDir).collect()
    assert(f.nonEmpty)
    val monthly = graft.Tables.orders(spark, sfDir)
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2).doubleValue()).toMap
    // row count = months whose year-ago month exists
    assert(f.length == monthly.keys.count { case (y, m) => monthly.contains((y - 1, m)) })
    f.foreach { r =>
      val d = r.getAs[java.sql.Date]("month").toLocalDate
      val a = monthly((d.getYear, d.getMonthValue))
      val fc = monthly((d.getYear - 1, d.getMonthValue))
      assert(math.abs(r.getAs[Double]("actual") - a) < 0.01)
      assert(math.abs(r.getAs[Double]("forecast") - fc) < 0.01)
      assert(math.abs(r.getAs[Double]("ape") - math.abs(a - fc) / a) < 1e-4)
    }
  }

  test("spearman: rho replays from driver-side midranks, bounded by 1") {
    val r = Stats.spearmanValueHour(spark, sfDir).head()
    val rho = r.getAs[Double]("spearman_rho")
    assert(math.abs(rho) <= 1.0 + 1e-9)
    val ev = graft.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("value"), hour(col("ts"))).collect()
      .map(x => (x.getDouble(0), x.getInt(1)))
    assert(r.getAs[Long]("n") == ev.length)
    def ranks[T](xs: Seq[T])(implicit o: Ordering[T]): Map[T, Double] = {
      val sorted = xs.sorted
      sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> g.map(_._2 + 1.0).sum / g.length }
    }
    val rx = ranks(ev.map(_._1).toSeq)
    val ry = ranks(ev.map(_._2).toSeq)
    val pairs = ev.map(e => (rx(e._1), ry(e._2)))
    val n = pairs.length.toDouble
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(rho - want) < 1e-4, s"got $rho want $want")
  }

  test("mann-whitney: U and z replay from a driver-side midrank walk") {
    val r = Stats.mannWhitneyValue(spark, sfDir).head()
    val ev = graft.Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click") && col("value").isNotNull)
      .select("event_type", "value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val n1 = ev.count(_._1 == "purchase")
    val n2 = ev.count(_._1 == "click")
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    // midranks over the pooled sorted sample
    val sorted = ev.sortBy(_._2)
    val rankOf = sorted.map(_._2).zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2 + 1.0).sum / xs.length }
    val r1 = ev.filter(_._1 == "purchase").map(e => rankOf(e._2)).sum
    val u1 = r1 - n1.toDouble * (n1 + 1) / 2
    assert(math.abs(r.getAs[Double]("u_stat") - u1) < 0.51, s"u=$u1")
    val ties = sorted.map(_._2).groupBy(identity)
      .map { case (_, xs) => math.pow(xs.length, 3) - xs.length }.sum
    val n = (n1 + n2).toDouble
    val sigma = math.sqrt(n1.toDouble * n2 / 12 * ((n + 1) - ties / (n * (n - 1))))
    val z = (u1 - n1.toDouble * n2 / 2) / sigma
    assert(math.abs(r.getAs[Double]("z_score") - z) < 1e-3, s"z=$z")
  }

  test("changepoint t-test: splits at the cusum date, t recomputes from moments") {
    val r = Stats.changepointTtest(spark, sfDir).head()
    val cp = Stats.revenueCusumChangepoint(spark, sfDir).head()
    assert(r.get(r.fieldIndex("change_date")) ==
      cp.get(cp.fieldIndex("change_date")))
    val days = graft.Tables.orders(spark, sfDir)
      .select("o_orderdate").distinct().count()
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == days)
    // the t-test's segment means must agree with the cusum entry's
    assert(math.abs(r.getAs[Double]("mean_before") -
      cp.getAs[Double]("mean_before")) < 1e-2)
    if (!r.isNullAt(r.fieldIndex("t_stat"))) {
      // Welch df within [min(n)-1, n1+n2-2]
      val df = r.getAs[Double]("welch_df")
      val lo = math.min(r.getAs[Long]("n1"), r.getAs[Long]("n2")) - 1.0
      assert(df >= lo - 1e-6 && df <= days - 2.0 + 1e-6, s"df=$df")
    }
  }

  test("growth decomposition: factors multiply back to revenue growth") {
    val g = Stats.growthDecomposition(spark, sfDir).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      val rg = r.getAs[Double]("revenue_growth")
      val vg = r.getAs[Double]("volume_growth")
      val ag = r.getAs[Double]("aov_growth")
      // (1+rg) = (1+vg)·(1+ag) up to the 6dp output rounding
      assert(math.abs((1 + rg) - (1 + vg) * (1 + ag)) < 5e-5,
        s"year ${r.getAs[Long]("year")}: $rg vs ${(1 + vg) * (1 + ag) - 1}")
    }
    // years are consecutive-with-predecessor only
    val years = g.map(_.getAs[Long]("year")).toSet
    val all = graft.Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate")).cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(years == all.filter(y => all.contains(y - 1)))
  }

  test("cusum changepoint: one row, segments reconcile to the corpus mean") {
    val r = Stats.revenueCusumChangepoint(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    val n = row.getAs[Long]("n_days")
    val days = graft.Tables.orders(spark, sfDir)
      .select("o_orderdate").distinct().count()
    assert(n == days)
    // mean_before over t days and mean_after over n-t days must weighted-
    // average back to mean_daily; recover t from the CUSUM identity
    // s_t = t*(mean_before - mean_daily)
    val mean = row.getAs[Double]("mean_daily")
    val before = row.getAs[Double]("mean_before")
    val peak = row.getAs[Double]("cusum_peak")
    val t = math.round(peak / (before - mean))
    assert(t >= 1 && t <= n, s"t=$t")
    if (!row.isNullAt(row.fieldIndex("mean_after"))) {
      val after = row.getAs[Double]("mean_after")
      val recon = (before * t + after * (n - t)) / n
      assert(math.abs(recon - mean) < 1e-2, s"recon=$recon mean=$mean")
    }
  }
}
