package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  // left: (key, ts, id); right: (key, ts, tie, v)
  private def left = Seq(
    ("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L),
    ("b", 5L, 4L), // key with no right rows at all
    ("c", 10L, 5L) // key whose only right row is AT its ts
  ).toDF("k", "ts", "id")

  private def right = Seq(
    ("a", 10L, 100L, "r10-lo"), ("a", 10L, 101L, "r10-hi"), // tie on ts=10
    ("a", 25L, 102L, "r25"),
    ("c", 10L, 103L, "rc10")
  ).toDF("k", "ts", "tie", "v")

  private def run(strict: Boolean) =
    AsofJoin.asOf(left, right, key = "k", ts = "ts",
      tie = col("tie"), payload = struct(col("tie"), col("v")), strict = strict)
      .select(col("id"), col("_asof.v").as("v"))
      .as[(Long, String)].collect().toMap

  test("strict: a right row AT the left ts is NOT visible") {
    val m = run(strict = true)
    assert(m.get(1L).contains(null)) // a@10: right a@10 excluded strictly
    assert(m.get(5L).contains(null)) // c@10: only right row is at ts=10
    assert(m(2L) == "r10-hi") // a@20 sees ts=10 rows
    assert(m(3L) == "r25") // a@30 sees ts=25
    assert(m.get(4L).contains(null)) // b: no right rows → null payload
  }

  test("inclusive: a right row AT the left ts IS visible") {
    val m = run(strict = false)
    assert(m(1L) == "r10-hi")
    assert(m(5L) == "rc10")
    assert(m(2L) == "r10-hi")
    assert(m(3L) == "r25")
    assert(m.get(4L).contains(null))
  }

  test("right rows tied on ts resolve to the highest tie-break") {
    // both modes: a@20 (and inclusive a@10) must pick tie=101 ("r10-hi"),
    // matching the oracle's ORDER BY r.ts DESC, r.tie DESC ... rn = 1
    assert(run(strict = true)(2L) == "r10-hi")
    assert(run(strict = false)(1L) == "r10-hi")
  }

  test("reserved working columns on the left are rejected loudly") {
    val bad = left.withColumn("_asof", lit(1))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asOf(bad, right, "k", "ts", col("tie"), struct(col("v")), strict = true)
    }
    assert(e.getMessage.contains("_asof"))
  }

  private def runFwd(strict: Boolean, tol: Long) =
    AsofJoin.asOfForward(left, right, key = "k", ts = "ts",
      tie = col("tie"), payload = struct(col("tie"), col("v")), strict = strict,
      within = (l, r) => r - l <= tol)
      .select(col("id"), col("_asof.v").as("v"))
      .as[(Long, String)].collect().toMap

  test("forward: nearest future row, strict vs inclusive at equal ts") {
    val strict = runFwd(strict = true, tol = 100L)
    // id=1 (a,10): strict forward skips the ts=10 rights -> ts=25 row
    assert(strict(1L) == "r25")
    assert(strict(3L) == null) // (a,30): nothing after
    assert(strict(5L) == null) // (c,10): only right is AT ts, strict skips
    val incl = runFwd(strict = false, tol = 100L)
    // inclusive at equal ts: ties resolve to the LOWEST tie value
    assert(incl(1L) == "r10-lo")
    assert(incl(5L) == "rc10")
  }

  test("forward: tolerance nulls out a match that is too far ahead") {
    val tight = runFwd(strict = true, tol = 5L)
    // (a,10) -> nearest future is ts=25, 15 ticks ahead: outside tol=5
    assert(tight(1L) == null)
    // (a,20) -> ts=25 is 5 ticks ahead: exactly at tol, kept
    assert(tight(2L) == "r25")
  }

  test("registered forward entry matches the naive non-equi formulation (sf0.001)") {
    val got = AsofJoin.asofJoinForward(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    val l = ev.select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("r_uid"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("value").as("r_value"))
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("r_ts").asc_nulls_last, col("r_id").asc_nulls_last)
    val naive = l.join(r,
        col("r_uid") === col("user_id") && col("r_ts") > col("ts") &&
          unix_micros(col("r_ts")) - unix_micros(col("ts")) <= 2L * 3600 * 1000000,
        "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("r_id").as("next_purchase_id"), col("r_value").as("next_purchase_value"))
    assert(got.count() == l.count())
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("registered entry matches the naive non-equi formulation (sf0.001)") {
    val got = AsofJoin.asofJoin(spark, sfDir)
    // naive twin of the oracle SQL, in Spark: non-equi left join + top-1
    val ev = Tables.events(spark, sfDir)
    val l = ev.select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("r_uid"), col("ts").as("r_ts"),
        col("event_id").as("r_id"), col("value").as("r_value"))
    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("r_ts").desc_nulls_last, col("r_id").desc_nulls_last)
    val naive = l.join(r, col("r_uid") === col("user_id") && col("r_ts") < col("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("r_id").as("prior_error_id"), col("r_value").as("prior_error_value"))
    assert(got.count() == l.count()) // left-outer: every event survives
    assert(got.except(naive).isEmpty && naive.except(got).isEmpty)
  }

  test("plan: ONE hash shuffle on the key, no BroadcastNestedLoopJoin") {
    val df = AsofJoin.asofJoin(spark, sfDir)
    df.collect() // finalize AQE so the executed plan is the real one
    // AQE's toString prints BOTH "== Final Plan ==" and "== Initial Plan ==";
    // count exchanges in the final section only
    val full = df.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "as-of must keep the union+window shape, not regress to a nested-loop join")
    // the union+window kernel needs exactly one hash exchange (partition by
    // the key for the window); the presentation orderBy adds a range
    // exchange, which is allowed
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(plan.contains("hashpartitioning(user_id"),
      s"expected the window shuffle on user_id; plan:\n${plan.take(3000)}")
    assert(hashExchanges == 1,
      s"as-of kernel must hash-shuffle exactly once on the key, saw $hashExchanges:\n${plan.take(3000)}")
  }

  test("nearest as-of: smaller |Δt| wins, equidistant resolves backward") {
    val got = graft.operators.AsofJoin.asofJoinNearest(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getLong(4))))).toMap
    // independent replay over the raw events
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type").collect()
      .map { r =>
        val i = r.getTimestamp(2).toInstant
        (r.getLong(0), r.getLong(1),
          i.getEpochSecond * 1000000L + i.getNano / 1000L, r.getString(3))
      }
    val errsByUser = ev.filter(_._4 == "error").groupBy(_._2)
    val tol = 3600L * 1000000
    ev.foreach { case (id, user, tu, _) =>
      val cands = errsByUser.getOrElse(user, Array.empty)
        .filter(e => e._3 != tu && math.abs(e._3 - tu) <= tol)
      val want =
        if (cands.isEmpty) None
        else {
          // order: |Δt| asc, then earlier-side preference via ts asc,
          // with the directional id tie-breaks (desc before, asc after)
          val best = cands.minBy(e => (math.abs(e._3 - tu), e._3,
            if (e._3 < tu) -e._1 else e._1))
          Some((best._1, best._3 - tu))
        }
      assert(got(id) == want, s"event $id: got ${got(id)} want $want")
    }
  }
}
