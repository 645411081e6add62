package graft.warehouse

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property tests for the scalable surrogate-key path: under a total
  * ordering it must assign exactly the ids the single-partition
  * `row_number()` window assigns, for any partition count. */
class DimsSpec extends SparkSpec {

  private def windowIds(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("id", row_number().over(Window.orderBy(col("k"))).cast("long"))
      .select("k", "id")

  private def check(keys: Seq[String], parts: Int): Unit = {
    import spark.implicits._
    val df = keys.toDF("k").repartition(7) // scramble input placement
    val scalable = Dims.surrogateKeysScalable(df, "id", Seq(col("k")), parts)
      .select("k", "id")
    assert(scalable.except(windowIds(df)).isEmpty
      && windowIds(df).except(scalable).isEmpty,
      s"keys=${keys.take(5)}... parts=$parts")
  }

  test("scalable surrogate keys equal the row_number path (unique keys, several partition counts)") {
    val keys = scala.util.Random.shuffle((1 to 500).map(i => f"key_$i%04d")).toSeq
    for (parts <- Seq(1, 3, 8)) check(keys, parts)
  }

  test("scalable surrogate keys equal the row_number path (skewed key lengths)") {
    // highly skewed ordering values: range partitioner must still place
    // every key so that prefix offsets reproduce the global order
    val keys = (1 to 300).map(i => "a" * (i % 17 + 1) + f"_$i%03d")
    check(scala.util.Random.shuffle(keys).toSeq, 5)
  }

  test("ids are a dense 1..n sequence") {
    import spark.implicits._
    val df = (1 to 123).map(i => f"v$i%03d").toDF("k")
    val out = Dims.surrogateKeysScalable(df, "id", Seq(col("k")), 4)
    val ids = out.select("id").as[Long].collect().sorted
    assert(ids.toSeq == (1L to 123L))
  }

  test("adaptive path routes by size estimate and both routes agree") {
    import spark.implicits._
    val df = (1 to 200).map(i => f"v$i%03d").toDF("k")
    // small estimate → window path: plan stays declarative (no RDD scan)
    val small = Dims.surrogateKeys(df, "id", Seq(col("k")))
    assert(!small.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "small input must take the window path")
    // forced-zero threshold → zipWithIndex path: RDD scan present
    val large = Dims.surrogateKeys(df, "id", Seq(col("k")), smallInputBytes = 0L)
    assert(large.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "over-threshold input must take the scalable path")
    // identical ids either way — the contract that makes the switch safe
    assert(small.except(large).isEmpty && large.except(small).isEmpty)
  }

  test("inferred dim members: exactly the fact-referenced gap keys, flagged") {
    val out = Dims.inferredDimMembers(spark, sfDir).cache()
    val inferred = out.filter(col("is_inferred")).collect()
    // the simulated gap: every ordered-by customer with custkey % 97 == 0
    val want = graft.Tables.orders(spark, sfDir)
      .select(col("o_custkey")).distinct()
      .filter(col("o_custkey") % 97 === 0)
      .collect().map(_.getLong(0)).toSet
    assert(inferred.map(_.getAs[Long]("custkey")).toSet == want)
    assert(inferred.forall(r => r.getAs[String]("name") == "(inferred)" &&
      r.getAs[Long]("nationkey") == -1L))
    // loaded members pass through unflagged; no key appears twice
    val n = out.count()
    assert(out.select("custkey").distinct().count() == n)
    val loaded = graft.Tables.customer(spark, sfDir)
      .filter(col("c_custkey") % 97 =!= 0).count()
    assert(n == loaded + inferred.length)
    out.unpersist()
  }
}
