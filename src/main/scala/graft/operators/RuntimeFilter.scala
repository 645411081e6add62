package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Runtime bloom-filter join pruning — dynamic, row-level scan pruning for
  * selective dim→fact joins on NON-partition columns, complementing the
  * static layout family (`partitioned_scan` prunes directories at plan
  * time; `zorder_layout` tightens file min/max; this prunes ROWS at run
  * time from a filter only known after the dim side is evaluated).
  *
  * Spark's `InjectRuntimeFilter` rule builds a bloom filter over the join
  * keys surviving the dim-side predicate (`bloom_filter_agg`), ships it as
  * a scalar subquery, and applies `might_contain(xxhash64(key))` to the
  * fact scan BEFORE the join shuffle. At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling only the ~p
  * fraction that can possibly match a p-selective dim filter — the shuffle
  * is the bottleneck the builder brief keeps pointing at, and this cuts it
  * by the join selectivity with zero layout changes.
  *
  * Reference anchor: the filtered fact-dim joins of analysis.sql:64-108
  * (J1/J5 + P-family filters, SURVEY §2.4) — same query shape, engine-
  * native runtime pruning.
  */
object RuntimeFilter {

  /** Registered entry: urgent-priority orders joined to lineitem, rolled
    * up by return flag. Runs in a CHILD session (`newSession`: own conf,
    * shared context) so the bloom knobs never leak into sibling queries:
    * broadcast is disabled (a broadcast join already prunes via its hash
    * relation — the bloom path is for the shuffle-join regime every
    * fact-sized join lives in), and the application-side size threshold is
    * dropped to let the rule fire at test SF (at production scale the
    * 10 GB default does that). RuntimeFilterSpec pins `might_contain` +
    * `bloom_filter_agg` in the optimized plan and result-equality against
    * an unfiltered run. */
  def bloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  val bloomPrunedJoinSql: String =
    """SELECT l_returnflag, count(*) AS n_items,
      |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
