package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SkewJoinSpec extends SparkSpec {

  test("salted aggregate equals the plain groupBy exactly") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"),
        col("l_quantity").cast("decimal(18,2)").as("l_quantity"),
        col("l_orderkey"))
    val salted = SkewJoin.saltedAggregate(li, "l_suppkey", "l_quantity", "l_orderkey", 8)
    val plain = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("value_sum"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted join equals the plain join row-for-row") {
    val li = Tables.lineitem(spark, sfDir).select("l_suppkey", "l_orderkey", "l_quantity")
    val sup = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val salted = SkewJoin.saltedJoin(li, sup, "l_suppkey", "l_orderkey", 4)
    val plain = li.join(sup, "l_suppkey")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salting actually spreads the hot key over buckets") {
    import spark.implicits._
    // a degenerate all-one-key frame: without salt, one group; with salt, 8
    val hot = Seq.fill(1000)((1L, 1.0, scala.util.hashing.MurmurHash3.stringHash("x").toLong))
      .zipWithIndex.map { case ((k, v, _), i) => (k, v, i.toLong) }
      .toDF("k", "v", "tb")
    val phase1Groups = hot
      .withColumn("__salt", pmod(hash(col("tb")), lit(8)))
      .groupBy("k", "__salt").count()
    assert(phase1Groups.count() == 8)
  }
}
