package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{BloomKernel, PortableHash, TextKernels}

/** Property tests pinning the PORTABLE one-pass kernels against
  * independent naive reimplementations over randomized inputs — these
  * kernels back generated oracle SQL, so silent drift would surface as
  * driver correctness failures. No Spark session needed. */
class PortableKernelPropertySpec extends AnyFunSuite {

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.const(' '),
    1 -> Gen.oneOf('\t', '\n', '.', ',', 'é', 'ü', '中'),
    1 -> Gen.const('\r'))).map(_.mkString)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def toks(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  test("simHash48Portable ≡ naive vote accumulation") {
    check(Prop.forAll(textGen) { s =>
      val naive = {
        val counts = new Array[Int](48)
        toks(s).foreach { t =>
          val h = PortableHash.hash48(t, 42L)
          (0 until 48).foreach { b =>
            counts(b) += (if (((h >>> b) & 1L) != 0L) 1 else -1)
          }
        }
        (0 until 48).map(b => if (counts(b) > 0) 1L << b else 0L).sum
      }
      TextKernels.simHash48Portable(UTF8String.fromString(s), 42L) == naive
    })
  }

  test("minhashSignaturePortable ≡ naive shingle/CW formulation") {
    val P = 2147483647L
    val coeffs = graft.operators.Dedup.portableCoeffs(16, 42L)
    check(Prop.forAll(textGen) { s =>
      val t = toks(s)
      val shingleList = (0 to t.length - 3).map(i =>
        s"${t(i)} ${t(i + 1)} ${t(i + 2)}")
      val naive: Seq[Long] =
        if (shingleList.isEmpty) Seq.empty
        else coeffs.map { case (a, b) =>
          shingleList.map { sh =>
            val h = PortableHash.hash48(sh, 42L) % P
            (h * a + b) % P
          }.min
        }
      val kernel = TextKernels.minhashSignaturePortable(
        UTF8String.fromString(s), 3, 16, 42L)
      (0 until kernel.numElements()).map(kernel.getLong).toSeq == naive
    })
  }

  test("fingerprint64 ≡ naive BigInt 31-polynomial mod 2^64") {
    val M = BigInt(1) << 64
    check(Prop.forAll(textGen) { s =>
      val naive = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .foldLeft(BigInt(1125899906842597L)) { (acc, b) =>
          (acc * 31 + (b & 0xff)) mod M
        }
      val signed =
        if (naive >= (BigInt(1) << 63)) (naive - M).toLong else naive.toLong
      TextKernels.fingerprint64(UTF8String.fromString(s)) == signed
    })
  }

  test("bloom has no false negatives: every built shingle probes positive") {
    check(Prop.forAll(textGen) { s =>
      val u = UTF8String.fromString(s)
      val nShingles = TextKernels.shingles(u, 3).numElements()
      val bits = new Array[Long](1 << 6) // deliberately tiny (4096 bits)
      BloomKernel.setShingleBits(bits, u, 3, 5)
      val bytes = java.nio.ByteBuffer.allocate(bits.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bytes.asLongBuffer().put(bits)
      BloomKernel.countMatchingShingles(u, bytes.array(), 3, 5) == nShingles
    })
  }
}
