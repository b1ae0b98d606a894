package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash

/** Pins the THEOREM the `llm_fingerprint` DuckDB oracle relies on
  * (round-10 graduation): over the prime modulus M = 2^61−1 the
  * Karp-Rabin fold h ← (h·B + c) mod M reformulates as
  * P(i) = B^i · Σ_{p≤i} c_p·B⁻ᵖ (mod M), so an engine with only
  * windowed SUMs can compute it. The spec recomputes full() and
  * windowMin() through EXACTLY the oracle's arithmetic shape
  * (inverse-power terms → running sum → B^i product → lag-16 window
  * diff → min) in BigInt and demands bit-equality with RollingHash on
  * randomized strings, including the short-text (≤16) and empty
  * branches. DuckDB agreement with THIS shape is then proven per
  * corpus by the driver's hash-match gate. */
class FingerprintOracleSpec extends AnyFunSuite {

  private val M = BigInt(RollingHash.mod)
  private val B = BigInt(RollingHash.base)
  private val Binv = BigInt(RollingHash.baseInv)
  private val Bk = BigInt(RollingHash.basePow(16))

  /** P(1..n) via the oracle's prefix-sum reformulation. */
  private def prefixHashes(t: String): IndexedSeq[BigInt] = {
    var s = BigInt(0)
    var bip = BigInt(1) // B^-pos, pos starting at 1
    var bp = BigInt(1) // B^pos
    (1 to t.length).map { pos =>
      bip = bip * Binv % M
      bp = bp * B % M
      s = (s + BigInt(t.charAt(pos - 1).toInt) * bip) % M
      s * bp % M
    }
  }

  private def oracleShape(t: String): (Long, Long) = {
    val ph = prefixHashes(t)
    val full = if (t.isEmpty) BigInt(0) else ph.last
    val winMin =
      if (t.length <= 16) full
      else (16 to t.length).map { e =>
        val ph0 = if (e == 16) BigInt(0) else ph(e - 17)
        ((ph(e - 1) - ph0 * Bk % M) % M + M) % M
      }.min
    (full.toLong, winMin.toLong)
  }

  test("modular-inverse constants invert exactly") {
    assert(B * Binv % M == BigInt(1))
    assert(Bk == B.modPow(16, M))
  }

  test("oracle prefix-sum shape == RollingHash on randomized strings") {
    val rnd = new Random(7)
    val cases = Seq("", "a", "exactly16charss!", "seventeen chars!!") ++
      (1 to 200).map { _ =>
        val n = rnd.nextInt(120)
        // printable ASCII — the corpus regime the oracle mirrors
        new String(Array.fill(n)((32 + rnd.nextInt(95)).toChar))
      }
    cases.foreach { t =>
      val (f, w) = oracleShape(t)
      assert(f == RollingHash.full(t), s"full mismatch on ${t.take(30)}")
      assert(w == RollingHash.windowMin(t, 16),
        s"windowMin mismatch on ${t.take(30)}")
    }
  }
}
