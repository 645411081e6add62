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
}
