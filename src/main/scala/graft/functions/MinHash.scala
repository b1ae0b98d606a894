package graft.functions

import scala.util.hashing.MurmurHash3

/** MinHash sketching for approximate near-duplicate detection
  * (SURVEY.md §2.1 J `llm_minhash_lsh`).
  *
  * 128 permutations h_i(t) = (a_i·m(t) + b_i) mod p over murmur3 token
  * hashes, banded 32×4 for LSH. All seeds fixed ⇒ fully deterministic.
  * The sketch is built in one pass per document (no shuffle); candidate
  * generation then shuffles only (band, signature, doc_id) tuples and
  * joins within buckets — the standard scale-out LSH plan, never a
  * cross join.
  */
object MinHash {

  val NumPerms = 128
  val Bands = 32
  val RowsPerBand: Int = NumPerms / Bands

  private val MersennePrime = (1L << 61) - 1

  // Fixed-seed affine coefficients (deterministic across runs/JVMs).
  private val coeffs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42L)
    Array.fill(NumPerms) {
      (math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
        math.abs(rnd.nextLong()) % MersennePrime)
    }
  }

  /** 128-value sketch of a token set. Empty input → MaxValue sentinels. */
  def sketch(tokens: Seq[String]): Array[Long] = {
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    tokens.foreach { t =>
      val h = MurmurHash3.stringHash(t).toLong & 0xffffffffL
      var i = 0
      while (i < NumPerms) {
        val (a, b) = coeffs(i)
        // multiplyHigh-free modular arithmetic via BigInt would be slow;
        // 32-bit h keeps a*h below 93 bits — use Math.multiplyHigh-safe
        // path: (a % p) * h fits in ~92 bits, so reduce via % on the
        // 128-bit product emulated with unsigned ops. Simpler: a,h < 2^61
        // and h < 2^32 ⇒ split a = a1·2^31 + a0.
        val a1 = a >>> 31
        val a0 = a & 0x7fffffffL
        val hi = (a1 * h) % MersennePrime
        val v = ((hi << 31) % MersennePrime + a0 * h + b) % MersennePrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** Band signatures: hash of each 4-row slice of the sketch. */
  def bandSignatures(sig: Array[Long]): Array[Long] = {
    Array.tabulate(Bands) { b =>
      var acc = MurmurHash3.arraySeed
      var i = b * RowsPerBand
      while (i < (b + 1) * RowsPerBand) {
        acc = MurmurHash3.mix(acc, (sig(i) ^ (sig(i) >>> 32)).toInt)
        i += 1
      }
      ((b.toLong << 32) | (MurmurHash3.finalizeHash(acc, RowsPerBand).toLong & 0xffffffffL))
    }
  }
}

/** Term-frequency-weighted 64-bit SimHash (`llm_simhash_dedup`): each
  * token votes ±1 per bit of its 64-bit murmur hash; the sign vector is
  * the fingerprint. Hamming distance approximates cosine distance of the
  * tf vectors. Deterministic (fixed seeds, order-free: votes commute).
  */
object SimHash {

  val Blocks = 4 // 16-bit blocks: hamming ≤ 3 ⇒ ≥ 1 identical block

  def fingerprint(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h1 = MurmurHash3.stringHash(t, 0x9747b28c)
      val h2 = MurmurHash3.stringHash(t, 0x85ebca6b)
      val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** (blockIdx << 16 | 16-bit slice) keys — pigeonhole blocking for
    * hamming ≤ Blocks-1 candidate generation. */
  def blockKeys(fp: Long): Array[Long] =
    Array.tabulate(Blocks)(i => (i.toLong << 16) | ((fp >>> (16 * i)) & 0xffffL))
}

/** Karp-Rabin document fingerprints (`llm_fingerprint`): a whole-text
  * rolling polynomial hash plus a winnowing-style minimum over 16-char
  * window hashes (MOSS-like). Both deterministic and order-sensitive —
  * complements the order-free set sketches above.
  */
object RollingHash {

  private val Base = 1000003L
  private val Mod = (1L << 61) - 1

  private def mulmod(a: Long, b: Long): Long =
    (BigInt(a) * b % Mod).toLong // 61-bit operands: exact via BigInt

  def full(text: String): Long = {
    var h = 0L
    var i = 0
    while (i < text.length) { h = (mulmod(h, Base) + text.charAt(i)) % Mod; i += 1 }
    h
  }

  /** Minimum rolling hash over all k-char windows (k=16); whole-text hash
    * when the text is shorter. */
  def windowMin(text: String, k: Int = 16): Long = {
    if (text.length <= k) return full(text)
    var bk = 1L
    (1 to k).foreach(_ => bk = mulmod(bk, Base))
    var h = 0L
    var min = Long.MaxValue
    var i = 0
    while (i < text.length) {
      h = (mulmod(h, Base) + text.charAt(i)) % Mod
      if (i >= k) h = ((h - mulmod(bk, text.charAt(i - k))) % Mod + Mod) % Mod
      if (i >= k - 1 && h < min) min = h
      i += 1
    }
    min
  }
}
