package graft.analytics

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck properties for the weighted two-phase selection kernel:
  * for random weighted corpora (tied values, skewed weights, tiny and
  * multi-group frames), the needle-slice kernel must return exactly the
  * smallest value whose cumulative weight reaches q·W — the definition,
  * replayed directly — for every group and fraction, at any partition
  * placement the range exchange happens to pick. */
object WeightedQuantileProperties extends Properties("weighted-quantiles") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)

  // small value domain (ties common), weights 1-9, 1-2 groups
  private val rowsGen: Gen[List[(String, Double, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("g1", "g2"),
      Gen.choose(0, 15).map(_.toDouble),
      Gen.choose(1L, 9L)))

  property("crossing value matches the cumulative-weight definition") =
    forAll(rowsGen) { rows =>
      val got = Quantiles
        .weightedQuantilesFrom(rows.toDF("lang", "value", "w"), qs)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getAs[Double]("length_cut"), r.getAs[Long]("total_tokens"))).toMap
      val want = rows.groupBy(_._1).flatMap { case (g, xs) =>
        val sorted = xs.sortBy(_._2)
        val wTot = xs.map(_._3).sum
        qs.map { case (qn, q) =>
          var cum = 0L
          val cut = sorted.find { r => cum += r._3; cum >= q * wTot }.get._2
          (g, qn) -> (cut, wTot)
        }
      }
      got == want
    }
}
