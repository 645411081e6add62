package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck properties for the bucketed range join: for random points,
  * random (possibly overlapping, possibly empty) intervals, and random
  * bucket widths, the bucketed equi-join + residual filter must produce
  * exactly the pairs of the direct all-pairs model — including points on
  * shared boundaries and intervals narrower than a bucket. */
object RangeJoinProperties extends Properties("range-join") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // integer-valued doubles in a tiny range so boundary hits are common
  private val pointsGen: Gen[List[(Long, Double)]] =
    Gen.listOf(Gen.choose(0, 40).map(_.toDouble))
      .map(_.zipWithIndex.map { case (p, i) => (i.toLong, p) })

  // (iv_id, lo, hi) with lo <= hi; empty [x, x) intervals allowed
  private val intervalsGen: Gen[List[(Long, Double, Double)]] =
    Gen.listOf(Gen.zip(Gen.choose(0, 40), Gen.choose(0, 12)))
      .map(_.zipWithIndex.map { case ((lo, w), i) =>
        (i.toLong, lo.toDouble, (lo + w).toDouble) })

  private val widthGen: Gen[Double] = Gen.oneOf(1.0, 3.0, 7.0, 64.0)

  property("bucketed join equals the all-pairs model for any bucket width") =
    forAll(pointsGen, intervalsGen, widthGen) { (pts, ivs, w) =>
      val pdf = pts.toDF("pid", "p")
      val idf = ivs.toDF("iv_id", "lo", "hi")
      val got = RangeJoin.bucketed(pdf, col("p"), idf, w)
        .select("pid", "iv_id").as[(Long, Long)].collect().toSet
      val want = (for {
        (pid, p) <- pts
        (ivId, lo, hi) <- ivs
        if p >= lo && p < hi
      } yield (pid, ivId)).toSet
      got == want
    }
}
