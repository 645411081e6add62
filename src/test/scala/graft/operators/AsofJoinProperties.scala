package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck properties for the as-of kernel: the union+window dataflow
  * must agree with a direct driver-side reference model (per left row,
  * scan all right rows) on randomly generated event sets. Key and
  * timestamp spaces are deliberately tiny so equal timestamps, shared
  * keys, and keyless lefts are COMMON — exactly the tie cases the
  * (ts, side, tie) ordering contract exists for. */
object AsofJoinProperties extends Properties("asof-join") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // (key, ts, id): id doubles as the unique left identity
  private val leftGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 10L)))
      .map(_.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })

  // (key, ts, tie): tie is the unique right identity / tie-break
  private val rightGen: Gen[List[(Long, Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 10L)))
      .map(_.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) })

  /** Reference model: for each left row, the right row with the same key,
    * ts before (strictly/inclusively) the left ts, maximal by (ts, tie). */
  private def expected(left: List[(Long, Long, Long)],
      right: List[(Long, Long, Long)], strict: Boolean): Map[Long, Option[Long]] =
    left.map { case (k, t, id) =>
      val cands = right.filter { case (rk, rt, _) =>
        rk == k && (if (strict) rt < t else rt <= t)
      }
      id -> (if (cands.isEmpty) None
             else Some(cands.maxBy { case (_, rt, tie) => (rt, tie) }._3))
    }.toMap

  private def run(left: List[(Long, Long, Long)],
      right: List[(Long, Long, Long)], strict: Boolean): Boolean = {
    val ldf = left.toDF("k", "ts", "id")
    val rdf = right.toDF("k", "ts", "tie")
    val got = AsofJoin.asOf(ldf, rdf, key = "k", ts = "ts",
        tie = col("tie"), payload = struct(col("tie")), strict = strict)
      .select(col("id"), col("_asof.tie").as("t"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    got == expected(left, right, strict)
  }

  property("strict kernel equals the reference model") =
    forAll(leftGen, rightGen) { (l, r) => run(l, r, strict = true) }

  property("inclusive kernel equals the reference model") =
    forAll(leftGen, rightGen) { (l, r) => run(l, r, strict = false) }
}
