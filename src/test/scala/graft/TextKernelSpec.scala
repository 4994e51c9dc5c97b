package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.TextOps

/** Focused parity tests for the round-6 kernel rewrites (optimization-round
  * rule: operator-internal changes get a dedicated spec). Each rewritten
  * kernel is compared against an independent re-implementation of the
  * round-5 algorithm on deterministic pseudo-random text. */
class TextKernelSpec extends AnyFunSuite {

  // deterministic word-salad generator (no RNG seeds in prod code paths;
  // this is test-only)
  private def text(seed: Int, words: Int): String = {
    val r = new scala.util.Random(seed)
    (1 to words).map(_ => r.alphanumeric.take(1 + r.nextInt(8)).mkString).mkString(" ")
  }

  /** Round-5 simhash reference: per-bit nibble indexing over the hex chars. */
  private def simhashRef(t: String): String = {
    val words = t.split(' ')
    val ones = new Array[Int](64)
    var n = 0
    words.foreach { w =>
      if (w.nonEmpty) {
        n += 1
        val h = graft.util.Md5.digest(w)
        var j = 0
        while (j < 64) {
          val hexIdx = 15 - (j >> 2)
          val byteIdx = hexIdx >> 1
          val nibble = if ((hexIdx & 1) == 0) (h(byteIdx) >> 4) & 0xf else h(byteIdx) & 0xf
          ones(j) += (nibble >> (j & 3)) & 1
          j += 1
        }
      }
    }
    val sb = new java.lang.StringBuilder(16)
    var k = 15
    while (k >= 0) {
      var v = 0
      var b = 0
      while (b < 4) { if (ones(4 * k + b) * 2 > n) v |= (1 << b); b += 1 }
      sb.append(Character.forDigit(v, 16))
      k -= 1
    }
    sb.toString
  }

  test("simhashHex: long-shift voting == round-5 nibble indexing") {
    (1 to 50).foreach { s =>
      val t = text(s, 1 + s % 40)
      assert(TextOps.simhashHex(t) == simhashRef(t), s"seed $s diverged")
    }
    assert(TextOps.simhashHex("") == simhashRef(""))
    assert(TextOps.simhashHex("   ") == simhashRef("   "))
    assert(TextOps.simhashHex("one") == simhashRef("one"))
  }

  test("minhash digest-byte minimum == lexicographic-hex minimum") {
    // the equivalence the minhash rewrite rests on: hex encoding is
    // byte-wise order-preserving, so unsigned byte compare == hex compare
    val r = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val a = new Array[Byte](16); val b = new Array[Byte](16)
      r.nextBytes(a); r.nextBytes(b)
      val byBytes = Integer.signum(java.util.Arrays.compareUnsigned(a, b))
      val byHex = Integer.signum(graft.util.Md5.bytesToHex(a).compareTo(graft.util.Md5.bytesToHex(b)))
      assert(byBytes == byHex)
    }
  }
}
