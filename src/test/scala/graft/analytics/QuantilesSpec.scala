package graft.analytics

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QuantilesSpec extends SparkSpec {

  test("rank-arithmetic quantiles equal Spark's buffering percentile aggregate") {
    val got = Quantiles.valueQuantiles(spark, sfDir)
    val ref = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 6).as("q50"),
        round(expr("percentile(value, 0.95)"), 6).as("q95"),
        round(expr("percentile(value, 0.99)"), 6).as("q99"))
    assert(got.except(ref).isEmpty && ref.except(got).isEmpty,
      "sort-based path must reproduce the buffering aggregate exactly")
  }

  test("no data-sized single-task window in the quantile plan") {
    // The scale contract: every Window either keys on the range-partition
    // id (bounded by partition size) or sits above an Aggregate (the
    // ≤ #partitions × #groups histogram). A bare partitionBy(event_type)
    // window over the raw scan — the shape this entry replaced — fails.
    val df = Quantiles.valueQuantiles(spark, sfDir)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected window operators in the plan")
    wins.foreach { w =>
      val onPid = w.partitionSpec.exists(_.references.exists(_.name == "_pid"))
      val aboveAgg = w.child.collectFirst { case a: Aggregate => a }.isDefined
      assert(onPid || aboveAgg,
        s"data-sized window partitioned by ${w.partitionSpec.mkString(", ")}")
    }
  }

  test("histogram: full grid, counts reconcile, max lands in the last bucket") {
    val h = Quantiles.valueHistogram(spark, sfDir).cache()
    val ev = Tables.events(spark, sfDir).filter(col("value").isNotNull)
    val groups = ev.select("event_type").distinct().count()
    assert(h.count() == groups * 20) // full grid, empty buckets included
    // per-group counts sum back to the group's row count
    val sums = h.groupBy("event_type").agg(sum("n").as("s"))
    val truth = ev.groupBy("event_type").agg(count(lit(1)).as("c"))
    assert(sums.join(truth, "event_type").filter(col("s") =!= col("c")).isEmpty)
    // bucket_lo is monotone within each group; no negative counts
    assert(h.filter(col("n") < 0).isEmpty)
    val lastLo = h.filter(col("bucket") === 19)
      .select(col("event_type"), col("bucket_lo"))
    val mx = ev.groupBy("event_type").agg(max("value").as("mx"))
    assert(lastLo.join(mx, "event_type")
      .filter(col("bucket_lo") > col("mx")).isEmpty)
    h.unpersist()
  }

  test("winsorize clamps exactly into the per-group percentile band") {
    val w = Quantiles.winsorizedValues(spark, sfDir).cache()
    // recompute fences with Spark's buffering percentile (same type-7
    // interpolation), rounded like the kernel
    val fences = Tables.events(spark, sfDir).filter(col("value").isNotNull)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.01)"), 6).as("p01"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
    val j = w.join(fences, "event_type").cache()
    // clipped value sits inside the band; outlier flag matches the band test
    assert(j.filter(col("value_clipped") < col("p01") ||
      col("value_clipped") > col("p99")).isEmpty)
    assert(j.filter(col("was_outlier") =!=
      (col("value") < col("p01") || col("value") > col("p99"))).isEmpty)
    // outliers exist (two 1% tails) but stay a small minority
    val n = j.count()
    val out = j.filter(col("was_outlier")).count()
    assert(out > 0 && out < n / 10, s"outliers=$out of $n")
    // non-outliers keep their value (up to the 6dp rounding)
    assert(j.filter(!col("was_outlier") &&
      abs(col("value_clipped") - col("value")) > 5e-7).isEmpty)
    Seq(w, j).foreach(_.unpersist())
  }

  test("quantiles are invariant to the partition count") {
    // rank = offset + local rank must reassemble the same global ranking
    // for ANY range boundary placement (ties carry equal values)
    val base = Quantiles.valueQuantiles(spark, sfDir).collect().toSet
    for (parts <- Seq("1", "7")) {
      val s = spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", parts)
      val got = Quantiles.valueQuantiles(s, sfDir).collect().toSet
      assert(got == base, s"parts=$parts differs")
    }
  }

  test("rollup emits detail + region subtotals + grand total consistently") {
    val rr = Quantiles.rollupRevenue(spark, sfDir).cache()
    // exactly one grand-total row, and it matches the sum of detail rows
    val grand = rr.filter(col("g_region") === 1 && col("g_nation") === 1).collect()
    assert(grand.length == 1)
    val detail = rr.filter(col("g_region") === 0 && col("g_nation") === 0)
    val detailSum = detail.agg(sum(col("n_orders"))).head.getLong(0)
    assert(grand.head.getAs[Long]("n_orders") == detailSum)
    // each region subtotal equals the sum of its detail rows
    val subtotals = rr.filter(col("g_region") === 0 && col("g_nation") === 1)
      .select(col("region"), col("n_orders").as("sub_n"))
    val byRegion = detail.groupBy("region").agg(sum("n_orders").as("det_n"))
    assert(subtotals.join(byRegion, "region")
      .filter(col("sub_n") =!= col("det_n")).isEmpty)
  }

  test("cube emits all four grouping sets consistently") {
    val cr = Quantiles.cubeRevenue(spark, sfDir).cache()
    val grand = cr.filter(col("g_seg") === 1 && col("g_pri") === 1).collect()
    assert(grand.length == 1)
    val detail = cr.filter(col("g_seg") === 0 && col("g_pri") === 0)
    // each marginal's total equals the grand total — both directions
    for ((gs, gp) <- Seq((0, 1), (1, 0))) {
      val marginalSum = cr.filter(col("g_seg") === gs && col("g_pri") === gp)
        .agg(sum("n_orders")).head.getLong(0)
      assert(marginalSum == grand.head.getAs[Long]("n_orders"), s"($gs,$gp)")
    }
    assert(detail.agg(sum("n_orders")).head.getLong(0) ==
      grand.head.getAs[Long]("n_orders"))
  }

  test("MAD matches a driver-side model and obeys the kernel's window contract") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def median7(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = (s.length - 1) * 0.5
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      r6(lo + (pos - math.floor(pos)) * (hi - lo))
    }
    val vals = Tables.events(spark, sfDir).filter(col("value").isNotNull)
      .select("event_type", "value").collect()
      .groupBy(_.getString(0)).map { case (et, rs) => et -> rs.map(_.getDouble(1)).toSeq }
    val want = vals.map { case (et, xs) =>
      val med = median7(xs)
      et -> (xs.length.toLong, median7(xs.map(x => r6(math.abs(x - med)))))
    }
    val got = Quantiles.valueMad(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == want)
    // both kernel passes keep the window contract (same audit as above)
    val df = Quantiles.valueMad(spark, sfDir)
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val onPid = w.partitionSpec.exists(_.references.exists(_.name == "_pid"))
      val aboveAgg = w.child.collectFirst { case a: Aggregate => a }.isDefined
      assert(onPid || aboveAgg,
        s"data-sized window partitioned by ${w.partitionSpec.mkString(", ")}")
    }
  }

  test("grouping sets emit exactly the hand-picked lattice: marginals + grand, no detail") {
    val gs = Quantiles.groupingSetsRevenue(spark, sfDir).cache()
    // no detail rows at all — the set list excludes (segment, priority)
    assert(gs.filter(col("g_seg") === 0 && col("g_pri") === 0).isEmpty)
    val grand = gs.filter(col("g_seg") === 1 && col("g_pri") === 1).collect()
    assert(grand.length == 1)
    // both marginals sum to the grand total
    for ((gSeg, gPri) <- Seq((0, 1), (1, 0))) {
      val marginalSum = gs.filter(col("g_seg") === gSeg && col("g_pri") === gPri)
        .agg(sum("n_orders")).head.getLong(0)
      assert(marginalSum == grand.head.getAs[Long]("n_orders"), s"($gSeg,$gPri)")
    }
    // the marginals agree with the cube's marginals (same input lattice)
    val cubeMarg = Quantiles.cubeRevenue(spark, sfDir)
      .filter(col("g_seg") === 0 && col("g_pri") === 1)
      .select(col("segment"), col("n_orders").as("cube_n"))
    assert(gs.filter(col("g_seg") === 0 && col("g_pri") === 1)
      .join(cubeMarg, "segment")
      .filter(col("n_orders") =!= col("cube_n")).isEmpty)
    gs.unpersist()
  }

  test("approx_count_distinct stays within its rsd bound of the exact count") {
    // HLL++ with rsd=0.05: the estimate must sit within a few standard
    // deviations of the exact cardinality (3σ = 15% — loose enough to be
    // deterministic for a fixed dataset, tight enough to catch a broken
    // sketch)
    val exact = Quantiles.distinctUsers(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val approx = Tables.events(spark, sfDir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), rsd = 0.05).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (et, n) =>
      assert(math.abs(approx(et) - n) <= n * 0.15,
        s"$et: approx ${approx(et)} vs exact $n")
    }
  }

  test("approx_percentile stays within its rank-error bound of the exact path") {
    // the documented 100 TB knob: t-digest sketch with accuracy parameter
    // a ⇒ rank error ≤ 1/a. With a = 100 on n rows the returned value's
    // RANK must be within n/100 of the true quantile rank.
    val ev = Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).cache()
    val approx = ev.groupBy("event_type")
      .agg(expr("approx_percentile(value, 0.95, 100)").as("a95"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val n = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (et, av) =>
      val below = ev.filter(col("event_type") === et && col("value") <= av).count()
      val trueRank = 0.95 * n(et)
      assert(math.abs(below - trueRank) <= n(et) / 100.0 + 1,
        s"$et: approx p95 rank $below vs true $trueRank of ${n(et)}")
    }
  }

  test("approx quantiles contract holds and the exact median matches a driver model") {
    val res = Quantiles.approxQuantilesCheck(spark, sfDir).cache()
    // the verdict must be TRUE for every group (the entry is a contract,
    // not a report — a false here is a broken sketch)
    assert(res.filter(!col("within_bound")).isEmpty)
    val vals = Tables.events(spark, sfDir).filter(col("value").isNotNull)
      .select("event_type", "value").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
    def medianT7(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = (s.length - 1) * 0.5
      val frac = pos - math.floor(pos)
      val v = s(pos.toInt) + frac * (s(math.ceil(pos).toInt) - s(pos.toInt))
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    res.collect().foreach { r =>
      val et = r.getString(0)
      assert(r.getLong(1) == vals(et).length.toLong, et)
      assert(math.abs(r.getDouble(2) - medianT7(vals(et).map(_._2).toSeq)) < 1e-9, et)
    }
    // the sketch must ship mergeable partials (ObjectHashAggregate with a
    // partial phase), never the raw value stream to one node
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    res.unpersist()
  }

  test("spend deciles: balanced cells, monotone in spend, no global ntile sort") {
    val d = Quantiles.spendDeciles(spark, sfDir).cache()
    val n = d.count()
    assert(d.filter(col("decile") < 1 || col("decile") > 10).isEmpty)
    // boundary assignment is equi-depth up to interpolation ties: every
    // decile holds within 25% of n/10
    val sizes = d.groupBy("decile").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keys.toSet == (1L to 10L).toSet, sizes.toString)
    sizes.values.foreach(c =>
      assert(math.abs(c - n / 10.0) <= n / 10.0 * 0.25, sizes.toString))
    // decile is monotone in spend
    val bySpend = d.orderBy("spend", "custkey").collect().map(_.getLong(2))
    assert(bySpend.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // the scalable shape: no ntile over a single global partition of the
    // customer frame — the only windows run inside the boundary kernel
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("ntile"), plan.take(1500))
    d.unpersist()
  }

  test("ship delay profile: coherent stats and a driver-side percentile recompute") {
    val p = Quantiles.shipDelayProfile(spark, sfDir).cache()
    val joined = graft.Tables.lineitem(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("delay"))
      .cache()
    assert(p.agg(sum("n_lines")).head().getLong(0) == joined.count())
    assert(p.filter(col("p50") > col("p90") || col("avg_days") < 0).isEmpty)
    // exact interpolated percentile for one priority, recomputed in-driver
    val r = p.first()
    val ds = joined.filter(col("priority") === r.getAs[String]("priority"))
      .collect().map(_.getInt(1)).sorted
    def q(frac: Double): Double = {
      val pos = frac * (ds.length - 1)
      val (lo, hi) = (ds(pos.toInt), ds(math.ceil(pos).toInt))
      lo + (hi - lo) * (pos - math.floor(pos))
    }
    assert(math.abs(r.getAs[Double]("p50") - q(0.5)) < 1e-6)
    assert(math.abs(r.getAs[Double]("p90") - q(0.9)) < 1e-6)
    assert(math.abs(r.getAs[Double]("avg_days") -
      ds.map(_.toLong).sum.toDouble / ds.length) < 1e-6)
    joined.unpersist(); p.unpersist()
  }

  test("weighted quantiles: cuts match a driver-side cumulative-weight replay") {
    val got = Quantiles.weightedLengthQuantiles(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Double]("length_cut"), r.getAs[Long]("total_tokens"))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("lang"), col("n_chars").cast("double"),
        size(split(trim(col("text")), "\\s+")).cast("long")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val byLang = docs.groupBy(_._1)
    assert(got.keys.map(_._1).toSet == byLang.keySet)
    for ((lang, xs) <- byLang; (qn, q) <- Seq("p25" -> 0.25, "p50" -> 0.5,
        "p75" -> 0.75, "p90" -> 0.9)) {
      val sorted = xs.sortBy(_._2)
      val w = sorted.map(_._3).sum
      // smallest value whose cumulative token weight reaches q·W
      var cum = 0L
      val cut = sorted.find { d => cum += d._3; cum >= q * w }.get._2
      val (gotCut, gotTot) = got((lang, qn))
      assert(gotTot == w, s"$lang $qn total")
      assert(gotCut == cut, s"$lang $qn: got $gotCut want $cut")
    }
  }

  test("corr matrix: six pairs, |r| bounded, price-quantity matches Spark's corr") {
    val m = Quantiles.numericCorrMatrix(spark, sfDir).collect()
    assert(m.length == 6)
    assert(m.forall(r => math.abs(r.getAs[Double]("pearson_r")) <= 1.0 + 1e-9))
    val want = graft.Tables.lineitem(spark, sfDir)
      .agg(corr(col("l_quantity"), col("l_extendedprice"))).head().getDouble(0)
    val got = m.find(r => r.getString(0) == "l_quantity" &&
      r.getString(1) == "l_extendedprice").get.getAs[Double]("pearson_r")
    assert(math.abs(got - want) < 1e-4, s"got $got want $want")
  }
}
