package graft.warehouse

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.SparkSpec

/** ScalaCheck property for the two-phase gap kernel: on ANY distinct key
  * set the bucketed formulation must equal the naive global-lag answer —
  * including keys straddling bucket boundaries, runs of fully-empty
  * buckets, singleton inputs, and dense runs. */
object QualityProperties extends Properties("quality-kernels") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Key sets spanning several 1024-wide buckets, with boundary magnets
    * (multiples of 1024 ± 1) mixed in so bucket-edge cases are common. */
  private val keysGen: Gen[List[Long]] =
    Gen.zip(
      Gen.listOf(Gen.choose(0L, 5000L)),
      Gen.listOf(Gen.oneOf(1023L, 1024L, 1025L, 2047L, 2048L, 2049L, 4095L, 4096L)))
      .map { case (a, b) => (a ++ b).distinct }

  property("two-phase bucketed gaps == global-lag gaps") =
    forAll(keysGen) { keys =>
      val got = Quality.seqGapsFrom(keys.toDF("k")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val sorted = keys.sorted
      val want = sorted.zip(sorted.drop(1)).collect {
        case (p, n) if n - p > 1 => (p + 1, n - 1, n - p - 1)
      }
      got == want
    }
}
