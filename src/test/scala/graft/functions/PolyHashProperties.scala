package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Algebraic properties of the PolyHash kernel (pure JVM — no Spark jobs,
  * so the full default case count runs instantly). */
object PolyHashProperties extends Properties("poly-hash") {

  private def h(s: String): Long = PolyHash.compute(UTF8String.fromString(s))

  private val ascii: Gen[String] = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  property("range: always within [0, mod)") = forAll(ascii) { s =>
    val v = h(s)
    v >= 0L && v < PolyHash.Mod
  }

  property("composition: h(a++b) == (h(a)*31^|b| + h(b)) mod p") =
    forAll(ascii, ascii) { (a, b) =>
      def powMod(e: Int): Long =
        (0 until e).foldLeft(1L)((acc, _) => acc * PolyHash.Base % PolyHash.Mod)
      // 128-bit-safe: h(a) < 2^30, powMod < 2^30 -> product < 2^60
      h(a + b) == (h(a) * powMod(b.length) + h(b)) % PolyHash.Mod
    }

  property("determinism") = forAll(ascii) { s => h(s) == h(s) }

  property("sensitivity: appending a char changes the hash (mod collisions aside)") =
    forAll(ascii) { s =>
      // h(s+"x") = h(s)*31 + 120 mod p; equal to h(s) only if h(s)*30 = -120 mod p
      h(s + "x") == (h(s) * PolyHash.Base + 'x'.toLong) % PolyHash.Mod
    }
}
