package graft.warehouse

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MergeSpec extends SparkSpec {

  test("all four merge clauses behave on a handcrafted feed") {
    import spark.implicits._
    val target = Seq(
      (1L, "a", 10.0, "SEG"), // matched update
      (2L, "b", 20.0, "SEG"), // matched delete
      (3L, "c", 30.0, "SEG") // untouched
    ).toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val changes = Seq(
      (1L, "U", 11.0),
      (2L, "D", 0.0),
      (9L, "U", 99.0), // unmatched insert
      (8L, "D", 0.0) // unmatched delete: no-op
    ).toDF("key", "op", "new_bal")
    val got = Merge.mergeInto(target, changes).orderBy("c_custkey").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, "a", 11.0, "SEG"),
      (3L, "c", 30.0, "SEG"),
      (9L, "NEW#9", 99.0, "UNKNOWN")))
  }

  test("registered CDC merge: deletes gone, inserts shifted, updates applied") {
    val got = Merge.mergeCdc(spark, sfDir).cache()
    val target = Tables.customer(spark, sfDir)
    // row accounting: |target| - matched deletes + inserts
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val latest = Tables.orders(spark, sfDir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).cache()
    val deletes = latest.filter(col("o_orderstatus") === "F" && col("o_custkey") % 13 =!= 0)
      .join(target, col("o_custkey") === col("c_custkey"), "left_semi").count()
    val inserts = latest.filter(col("o_custkey") % 13 === 0 && col("o_orderstatus") =!= "F").count()
    assert(got.count() == target.count() - deletes + inserts)
    // every insert landed at or above the key shift (custkey 0 maps to
    // exactly 500000) with the synthesized shape
    val ins = got.filter(col("c_custkey") >= 500000L)
    assert(ins.count() == inserts)
    assert(ins.filter(col("c_mktsegment") =!= "UNKNOWN" ||
      !col("c_name").startsWith("NEW#")).isEmpty)
    // a matched update really took the latest order total
    val sample = latest.filter(col("o_orderstatus") =!= "F" && col("o_custkey") % 13 =!= 0)
      .join(got, col("o_custkey") === col("c_custkey"))
      .filter(col("c_acctbal") =!= col("o_totalprice"))
    assert(sample.isEmpty)
  }

  test("snapshot diff is exactly the CDC feed's effect on the customer table") {
    val diff = Merge.snapshotDiff(spark, sfDir).cache()
    val before = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"))
    val after = Merge.mergeCdc(spark, sfDir)
      .select(col("c_custkey"), col("c_acctbal"))
    // added = keys only in after; removed = keys only in before
    val added = after.select("c_custkey").except(before.select("c_custkey"))
    val removed = before.select("c_custkey").except(after.select("c_custkey"))
    assert(diff.filter(col("change") === "added").count() == added.count())
    assert(diff.filter(col("change") === "removed").count() == removed.count())
    // every diff class is present, and no unchanged row leaks in
    assert(diff.filter(col("change").isNull).isEmpty)
    val changed = diff.filter(col("change") === "changed")
    assert(changed.filter(col("old_bal") === col("new_bal")).isEmpty)
    assert(changed.count() > 0 && added.count() > 0 && removed.count() > 0)
    diff.unpersist()
  }

  test("incremental aggregate merge equals the full recompute exactly") {
    val inc = Merge.incrementalAgg(spark, sfDir)
    val full = graft.Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("order_date"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(18,2)")
          .as("revenue"))
    assert(inc.count() == full.count())
    assert(inc.except(full).isEmpty && full.except(inc).isEmpty)
    // the delta split is real: both sides of the partition are non-empty
    val o = graft.Tables.orders(spark, sfDir)
    val d = o.filter(col("o_orderkey") % 10 === 0).count()
    assert(d > 0 && d < o.count())
  }
}
