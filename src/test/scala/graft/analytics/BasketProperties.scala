package graft.analytics

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck properties for the market-basket kernel: for random
  * baskets (duplicate items, singleton baskets, empty corpora), the
  * in-row pair expansion + counter collapse must produce exactly the
  * pairs of the direct all-pairs model — same support counts, same
  * per-part order counts, same lift. */
object BasketProperties extends Properties("basket-pairs") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // small id domains so co-occurrence and duplicates are common
  private val itemsGen: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 8L)))

  property("pairs equal the brute-force distinct-basket model") =
    forAll(itemsGen) { items =>
      val got = Behavior.basketPairsFrom(items.toDF("orderkey", "partkey"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getAs[Long]("pair_orders"), r.getAs[Long]("orders_a"),
            r.getAs[Long]("orders_b"), r.getAs[Double]("lift"))).toMap
      // model: distinct (order, part); pairs per order; support >= 2
      val baskets = items.distinct.groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      val nOrders = baskets.size
      val perPart = baskets.values.flatten.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val want = baskets.values.toSeq
        .flatMap(parts => parts.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .filter(_._2 >= 2)
        .map { case ((a, b), c) =>
          val lift = BigDecimal(c.toDouble * nOrders / (perPart(a) * perPart(b)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (a, b) -> (c, perPart(a), perPart(b), lift)
        }
      got == want
    }
}
