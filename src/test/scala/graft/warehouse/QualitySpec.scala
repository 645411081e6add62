package graft.warehouse

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QualitySpec extends SparkSpec {

  test("table profile: one row per column, counts reconcile, min <= max") {
    val prof = Quality.tableProfile(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(prof.map(_.getAs[String]("col_name")).toSeq ==
      Seq("doc_id", "lang", "n_chars", "source", "text"))
    prof.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_null") == 0, "driver corpus has no nulls")
      val d = r.getAs[Long]("n_distinct")
      assert(d >= 1 && d <= n)
    }
    val byCol = prof.map(r => r.getAs[String]("col_name") -> r).toMap
    // doc_id is the PK: distinct == rows; min/max render natively-compared
    assert(byCol("doc_id").getAs[Long]("n_distinct") == n)
    assert(byCol("doc_id").getAs[String]("min_value") == "0")
    // native-type min then cast: n_chars must not be the string-min ("1xx"
    // style artifacts would show as min starting with '1' yet shorter text)
    val mn = byCol("n_chars").getAs[String]("min_value").toLong
    val mx = byCol("n_chars").getAs[String]("max_value").toLong
    assert(mn <= mx)
  }

  test("seq gap audit equals the naive global-lag formulation") {
    val got = Quality.seqGapCheck(spark, sfDir).cache()
    val keys = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") =!= "F")
      .select(col("o_orderkey").as("k"))
    val want = keys
      .withColumn("pk", lag(col("k"), 1).over(Window.orderBy("k")))
      .filter(col("pk").isNotNull && col("k") - col("pk") > 1)
      .select((col("pk") + 1).as("gap_start"), (col("k") - 1).as("gap_end"),
        (col("k") - col("pk") - 1).as("n_missing"))
    assert(got.count() > 0, "archived 'F' orders leave real gaps in the active slice")
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    got.unpersist()
  }

  test("seq gap audit: planted gaps across bucket boundaries and empty buckets") {
    import spark.implicits._
    // keys straddle three 1024-wide buckets with bucket 1 fully empty:
    // intra-bucket gap (5->9), cross-bucket gap spanning the empty bucket
    // (1000 -> 2050), and a dense run (2050,2051) contributing nothing
    val keys = Seq(3L, 4L, 5L, 9L, 1000L, 2050L, 2051L)
      .map(k => (k, "O")).toDF("o_orderkey", "o_orderstatus")
    val dir = s"${System.getProperty("java.io.tmpdir")}/qgap_${System.nanoTime()}"
    keys.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Quality.seqGapCheck(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((6L, 8L, 3L), (10L, 999L, 990L), (1001L, 2049L, 1049L)))
  }

  test("observed metrics: the piggybacked pass sees every row exactly once") {
    val m = Quality.observedMetrics(spark, sfDir).head()
    val ev = Tables.events(spark, sfDir)
    assert(m.getAs[Long]("n_rows") == ev.count())
    assert(m.getAs[Long]("n_null_value") ==
      ev.filter(col("value").isNull).count())
    val wantSum = ev.agg(sum(col("value").cast("decimal(18,2)"))).head()
      .getDecimal(0).doubleValue()
    assert(math.abs(m.getAs[Double]("value_sum") - wantSum) < 0.01)
    val bounds = ev.agg(min("ts"), max("ts")).head()
    assert(m.getAs[java.sql.Timestamp]("min_ts") == bounds.getTimestamp(0))
    assert(m.getAs[java.sql.Timestamp]("max_ts") == bounds.getTimestamp(1))
  }

  test("fanout profile and activity histogram: cells partition their bases") {
    val f = Quality.orderFanoutProfile(spark, sfDir).collect()
    val orders = Tables.lineitem(spark, sfDir)
      .select("l_orderkey").distinct().count()
    assert(f.map(_.getAs[Long]("n_orders")).sum == orders)
    assert(f.forall(_.getAs[Long]("fanout") >= 1))
    val h = Quality.userActivityHistogram(spark, sfDir).collect()
    val users = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(h.map(_.getAs[Long]("n_users")).sum == users)
    assert(h.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sfDir).count())
    // bucket_min = 2^bucket exactly (the bit-length bucketing contract)
    h.foreach { r =>
      assert(r.getAs[Long]("bucket_min") ==
        (1L << r.getAs[Long]("log2_bucket").toInt))
    }
  }

  test("key skew report: top-10 heaviest suppkeys, internally consistent") {
    val r = Quality.keySkewReport(spark, sfDir).collect()
    assert(r.length == 10)
    assert(r.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    // ranked by count desc; share and skew_ratio reconcile with totals
    val counts = r.map(_.getAs[Long]("n_rows"))
    assert(counts.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    val total = Tables.lineitem(spark, sfDir).count()
    val nKeys = r.head.getAs[Long]("n_keys")
    assert(nKeys == Tables.lineitem(spark, sfDir)
      .select("l_suppkey").distinct().count())
    r.foreach { row =>
      val n = row.getAs[Long]("n_rows")
      assert(math.abs(row.getAs[Double]("share") - n.toDouble / total) < 1e-6)
      assert(math.abs(row.getAs[Double]("skew_ratio") -
        n.toDouble * nKeys / total) < 1e-3)
    }
  }
}
