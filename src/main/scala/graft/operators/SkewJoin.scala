package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation by key salting (builder brief: "salting for skew") —
  * the manual escape hatch for when AQE's skew-join splitting isn't
  * available (aggregations, or pre-3.0 sinks).
  *
  * Two kernels, both producing results IDENTICAL to their unsalted
  * equivalents (the registered queries' oracles are the plain formulations):
  *
  *  - saltedAggregate: a two-phase COUNT/SUM groupBy. Phase 1 groups on
  *    (key, salt) — the hot key's rows spread over `buckets` reducers —
  *    phase 2 re-groups the per-salt partials on key alone. The salt is
  *    a deterministic hash of a distinguishing column, not rand(): runs
  *    are reproducible and retries idempotent.
  *  - saltedJoin: fact⋈dim where one fact key dominates. The fact side
  *    gets salt = pmod(hash(tiebreak), buckets); the dim side is
  *    replicated `buckets`× with explode(sequence), so every
  *    (key, salt) fact partition finds its dim row without a hot
  *    reducer. Dim replication cost: |dim|·buckets rows — chosen for
  *    dims small enough to replicate but too large (or too many keyed
  *    joins) to broadcast outright.
  *
  * At 100 TB: salting bounds the largest reducer partition at
  * |hot key| / buckets; pick buckets ≈ hot-key share × shuffle
  * parallelism. AQE's skew split handles sort-merge joins automatically —
  * salting remains the tool for skewed AGGREGATIONS, which AQE does not
  * split. */
object SkewJoin {

  /** Deterministic salt in [0, buckets) from a tie-break column. */
  private def saltCol(tiebreak: Column, buckets: Int): Column =
    pmod(hash(tiebreak), lit(buckets))

  /** Two-phase salted aggregation: exact same result as
    * df.groupBy(key).agg(count, sum(value)). */
  def saltedAggregate(df: DataFrame, key: String, value: String,
                      tiebreak: String, buckets: Int): DataFrame =
    df.withColumn("__salt", saltCol(col(tiebreak), buckets))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(value)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("value_sum"))

  /** Salted equi-join: exact same rows as fact.join(dim, key). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 tiebreak: String, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltCol(col(tiebreak), buckets))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Registered entry: salted per-supplier aggregate over lineitem
    * (supplier keys are the skew stand-in), re-keyed through a salted join
    * to supplier for names. Oracle = the plain groupBy+join — results are
    * identical by construction. */
  def skewSaltedAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val sup = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))
    val agg = saltedAggregate(
      // decimal accumulation: the two-phase sum reorders additions, and
      // decimal (unlike double) is order-independent, so the oracle's
      // single-phase sum matches exactly
      li.select(col("l_suppkey"),
        col("l_quantity").cast("decimal(18,2)").as("l_quantity"),
        col("l_orderkey")),
      "l_suppkey", "l_quantity", "l_orderkey", buckets = 8)
    saltedJoin(agg, sup.withColumnRenamed("s_suppkey", "l_suppkey"),
      "l_suppkey", "l_suppkey", buckets = 4)
      .select(col("s_name"), col("n"),
        round(col("value_sum"), 2).cast("double").as("qty_sum"))
      .orderBy("s_name")
  }

  val skewSaltedAggSql: String =
    """SELECT s_name, count(*) AS n,
      |       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty_sum
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin
}
