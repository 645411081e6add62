package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (temporal lookup) join — an operator Spark's join menu lacks
  * natively (beyond-reference surface; the builder brief names it as a
  * canonical custom-operator case). For every left row (key, ts), attach
  * the payload of the LATEST right row of the same key with right.ts
  * before left.ts (strictly or inclusively).
  *
  * Spark-first shape — union + running window, NOT a join:
  * a naive formulation is a non-equi join (`r.ts <= l.ts`) that Spark
  * executes as BroadcastNestedLoop / per-key quadratic fan-out, then a
  * top-1 filter — per-key O(L·R). Instead both sides are unioned into one
  * (key, ts)-sorted stream and each left row reads the running `last`
  * non-null right payload over `rowsBetween(unboundedPreceding,
  * currentRow)`: ONE shuffle on the key, a sort Spark would need for a
  * merge join anyway, O(1) running state per partition, and per-key cost
  * O((L+R) log(L+R)). At 100 TB this is the only shape that survives —
  * no broadcast requirement on either side, no quadratic candidate set;
  * a hot key lands in one task (inherent to ordered semantics) but cost
  * stays linear in that key's rows.
  *
  * Determinism contract (oracle parity): within one key, rows order by
  * (ts, side, tie), where `side` places right rows BEFORE left rows at
  * equal ts for inclusive semantics and AFTER for strict semantics —
  * so `<=` vs `<` is decided by sort position, not a comparison. Right
  * rows tied on ts resolve to the one with the highest tie-break column
  * (the running `last`), matching the oracle's
  * `ORDER BY r.ts DESC, r.tie DESC ... rn = 1`. The right payload rides
  * as ONE struct so all attached columns come from the SAME right row
  * atomically (independent `last(ignoreNulls)` calls could mix rows if a
  * payload field were legitimately null).
  */
object AsofJoin {

  /** Generic kernel. `left` keeps all its columns; `right` contributes
    * `payload` (a struct column built by the caller) attached as-of each
    * left row, null when no prior right row exists (left-outer
    * semantics). `tie` must be a right-side column that totally orders
    * right rows within (key, ts) — e.g. a primary key. */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      tie: Column,
      payload: Column,
      strict: Boolean): DataFrame = {
    // the kernel claims _side/_tie/_rp/_asof as working columns; a left
    // frame already carrying one would be silently overwritten by
    // withColumn and corrupt the _rp.isNull filter / unionByName alignment
    val reserved = Set("_side", "_tie", "_rp", "_asof")
    val clash = left.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"asOf reserves column names ${reserved.mkString(", ")}; " +
        s"left frame carries ${clash.mkString(", ")} — rename before joining")
    // side ordinal: inclusive → right(0) sorts before left(1) at equal ts
    // (current-row frame sees it); strict → right(1) after left(0)
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val lCols = left.columns
    val l = left.withColumn("_side", lit(leftSide))
      .withColumn("_tie", lit(null).cast("long"))
    val r = right.select(
      col(key), col(ts), lit(rightSide).as("_side"),
      tie.cast("long").as("_tie"), payload.as("_rp"))
    // align schemas: left carries its own columns, right its payload;
    // unionByName(allowMissing) nulls the gaps on both sides.
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc, col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === leftSide && col("_rp").isNull)
      .select(lCols.map(col) :+ col("_asof"): _*)
  }

  /** Forward as-of with tolerance — the other half of the pandas
    * `merge_asof` surface (direction='forward', tolerance=...): for every
    * left row, the EARLIEST right row of the same key at-or-after
    * (inclusive) / strictly after (strict) left.ts, and only if it lands
    * within `toleranceUs` microseconds; null otherwise. Mirror of
    * [[asOf]]: same union, the window just traverses ts DESCENDING so the
    * running `last` is the nearest FUTURE right row — still one shuffle,
    * O(1) running state, no non-equi join. The tolerance is a post-hoc
    * null-out (the nearest candidate is the only one that could qualify),
    * so it costs a codegen'd comparison, not a join predicate. Right-side
    * ties at equal ts resolve to the LOWEST tie value (oracle parity with
    * `ORDER BY r.ts ASC, r.tie ASC ... rn = 1`).
    *
    * `within(leftTs, rightTs)` is the tolerance predicate (type-generic:
    * timestamps compare via unix_micros, numeric event-times directly);
    * `(_, _) => lit(true)` means unbounded forward. */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      tie: Column,
      payload: Column,
      strict: Boolean,
      within: (Column, Column) => Column): DataFrame = {
    val reserved = Set("_side", "_tie", "_rp", "_asof", "_near")
    val clash = left.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"asOfForward reserves column names ${reserved.mkString(", ")}; " +
        s"left frame carries ${clash.mkString(", ")} — rename before joining")
    // DESC traversal: inclusive → right(0) still sorts before left(1)
    // within an equal-ts group; strict → after
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val lCols = left.columns
    val l = left.withColumn("_side", lit(leftSide))
      .withColumn("_tie", lit(null).cast("long"))
    // the right ts rides inside _rp so the tolerance check reads the
    // matched row's own timestamp atomically with its payload
    val r = right.select(
      col(key), col(ts), lit(rightSide).as("_side"),
      tie.cast("long").as("_tie"),
      struct(payload.as("p"), col(ts).as("t")).as("_rp"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).desc, col("_side").asc, col("_tie").desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_near", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === leftSide && col("_rp").isNull)
      .withColumn("_asof",
        when(col("_near").isNotNull && within(col(ts), col("_near.t")),
          col("_near.p")))
      .select(lCols.map(col) :+ col("_asof"): _*)
  }

  /** Registered entry: for every event, the same user's most recent
    * STRICTLY prior 'error' event (self as-of join on the events table —
    * right-side timestamps interleave with the left's, unlike the
    * orders→events pairing where every order predates every event).
    * Left-outer: events with no prior error keep nulls. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val left = ev.select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"),
        col("event_id").as("err_id"), col("value").as("err_value"))
    asOf(
      left, errors,
      key = "user_id", ts = "ts",
      tie = col("err_id"),
      // payload values are copied verbatim (no arithmetic), so no rounding
      // is needed for oracle parity — both engines read the same doubles
      payload = struct(col("err_id"), col("err_value")),
      strict = true)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("_asof.err_id").as("prior_error_id"),
        col("_asof.err_value").as("prior_error_value"))
      .orderBy("event_id")
  }

  /** Tolerance for [[asofJoinForward]] (2 hours in µs) — shared with the
    * oracle SQL. */
  private val ForwardTolUs = 2L * 3600 * 1000000

  /** Registered entry: for every event, the same user's NEXT 'purchase'
    * event within 2 hours (strict forward + tolerance — the "did an
    * action convert" lookup, the mirror of click attribution phrased as
    * an as-of). */
  def asofJoinForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val left = ev.select("event_id", "user_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_id"), col("value").as("p_value"))
    asOfForward(
      left, purchases,
      key = "user_id", ts = "ts",
      tie = col("p_id"),
      payload = struct(col("p_id"), col("p_value")),
      strict = true,
      within = (l, r) => unix_micros(r) - unix_micros(l) <= ForwardTolUs)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("_asof.p_id").as("next_purchase_id"),
        col("_asof.p_value").as("next_purchase_value"))
      .orderBy("event_id")
  }

  val asofJoinForwardSql: String =
    """SELECT event_id, user_id, ts, next_purchase_id, next_purchase_value FROM (
      |  SELECT l.event_id, l.user_id, l.ts,
      |         r.event_id AS next_purchase_id,
      |         r.value AS next_purchase_value,
      |         ROW_NUMBER() OVER (PARTITION BY l.event_id
      |           ORDER BY r.ts ASC, r.event_id ASC) AS rn
      |  FROM events l
      |  LEFT JOIN events r
      |    ON r.user_id = l.user_id AND r.event_type = 'purchase'
      |   AND CAST(r.ts AS TIMESTAMP) > CAST(l.ts AS TIMESTAMP)
      |   AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 2 HOUR
      |) WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  /** Oracle: the naive formulation — non-equi left join + per-left-row
    * top-1 with the SAME tie-break (ts DESC, err_id DESC). Quadratic per
    * key, which is exactly why the engine path doesn't run it. */
  val asofJoinSql: String =
    """SELECT event_id, user_id, ts, prior_error_id, prior_error_value FROM (
      |  SELECT l.event_id, l.user_id, l.ts,
      |         r.event_id AS prior_error_id,
      |         r.value AS prior_error_value,
      |         ROW_NUMBER() OVER (PARTITION BY l.event_id
      |           ORDER BY r.ts DESC, r.event_id DESC) AS rn
      |  FROM events l
      |  LEFT JOIN events r
      |    ON r.user_id = l.user_id AND r.ts < l.ts AND r.event_type = 'error'
      |) WHERE rn = 1
      |ORDER BY event_id""".stripMargin

  /** Tolerance for [[asofJoinNearest]] (±1 hour in µs). */
  private val NearestTolUs = 3600L * 1000000

  /** Nearest as-of — pandas `merge_asof(direction='nearest')`, the third
    * direction completing the family: for every event, the same user's
    * CLOSEST 'error' event within ±1 hour, whichever side of the
    * timestamp it falls on (the sensor-fusion / log-correlation lookup).
    * Composed from the two directional kernels — one backward pass, one
    * forward pass over its output (each the one-shuffle union+window
    * kernel; no non-equi join anywhere) — then a per-row pick of the
    * smaller |Δt|. Ties (equidistant candidates) resolve BACKWARD
    * (the earlier error), matching the oracle's
    * (|Δt|, r.ts, direction-specific id) total order. Strict on both
    * sides: an error AT the event's own timestamp (including itself)
    * never matches. */
  def asofJoinNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val left = ev.select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id").as("err_id"))
    val payload = struct(col("ts").as("r_ts"), col("err_id"))
    val b = asOf(left, errors, key = "user_id", ts = "ts",
      tie = col("err_id"), payload = payload, strict = true)
      .withColumnRenamed("_asof", "_b")
    val bf = asOfForward(b, errors, key = "user_id", ts = "ts",
      tie = col("err_id"), payload = payload, strict = true,
      within = (l, r) => unix_micros(r) - unix_micros(l) <= NearestTolUs)
      .withColumnRenamed("_asof", "_f")
    val dtB = unix_micros(col("ts")) - unix_micros(col("_b.r_ts"))
    val dtF = unix_micros(col("_f.r_ts")) - unix_micros(col("ts"))
    val bOk = col("_b").isNotNull && dtB <= NearestTolUs
    val fOk = col("_f").isNotNull
    bf.select(col("event_id"), col("user_id"), col("ts"),
      when(bOk && (!fOk || dtB <= dtF), col("_b.err_id"))
        .when(fOk, col("_f.err_id")).as("nearest_error_id"),
      when(bOk && (!fOk || dtB <= dtF), -dtB)
        .when(fOk, dtF).as("delta_us"))
      .orderBy("event_id")
  }

  /** Oracle: both directional top-1s as naive non-equi joins with the
    * kernels' exact tie-breaks, then the same smaller-|Δt| pick. */
  val asofJoinNearestSql: String =
    s"""WITH l AS (
       |  SELECT event_id, user_id, ts, epoch_us(CAST(ts AS TIMESTAMP)) AS tu
       |  FROM events
       |), err AS (
       |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
       |         event_id AS eid
       |  FROM events WHERE event_type = 'error'
       |), b AS (
       |  SELECT event_id, beid, btu FROM (
       |    SELECT l.event_id, r.eid AS beid, r.tu AS btu,
       |           row_number() OVER (PARTITION BY l.event_id
       |             ORDER BY r.tu DESC, r.eid DESC) AS rn
       |    FROM l LEFT JOIN err r
       |      ON r.user_id = l.user_id AND r.tu < l.tu
       |     AND l.tu - r.tu <= $NearestTolUs
       |  ) WHERE rn = 1
       |), f AS (
       |  SELECT event_id, feid, ftu FROM (
       |    SELECT l.event_id, r.eid AS feid, r.tu AS ftu,
       |           row_number() OVER (PARTITION BY l.event_id
       |             ORDER BY r.tu ASC, r.eid ASC) AS rn
       |    FROM l LEFT JOIN err r
       |      ON r.user_id = l.user_id AND r.tu > l.tu
       |     AND r.tu - l.tu <= $NearestTolUs
       |  ) WHERE rn = 1
       |)
       |SELECT l.event_id, l.user_id, l.ts,
       |       CASE WHEN beid IS NOT NULL
       |                  AND (feid IS NULL OR l.tu - btu <= ftu - l.tu)
       |            THEN beid ELSE feid END AS nearest_error_id,
       |       CASE WHEN beid IS NOT NULL
       |                  AND (feid IS NULL OR l.tu - btu <= ftu - l.tu)
       |            THEN -(l.tu - btu)
       |            WHEN feid IS NOT NULL THEN ftu - l.tu
       |       END AS delta_us
       |FROM l
       |JOIN b USING (event_id)
       |JOIN f USING (event_id)
       |ORDER BY event_id""".stripMargin
}
