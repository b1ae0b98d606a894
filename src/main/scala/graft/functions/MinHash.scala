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

/** Random-hyperplane (cosine) LSH over embedding vectors
  * (`llm_embedding_lsh`, round-3 add) — the sketch that makes SimHash's
  * trick available to VECTOR space: 256 fixed-seed Gaussian hyperplanes
  * give a 256-bit sign signature, and for a pair at angle θ each bit
  * collides with probability 1 − θ/π (Goemans–Williamson / Charikar).
  * Banding 32×8 turns bit agreement into equi-joinable candidate
  * buckets: a pair is a candidate iff some band's 8 bits all match, so
  * P(candidate) = 1 − (1 − (1−θ/π)^8)^32 — steep in θ, which is the
  * whole point: candidate volume scales ~n^(1+ρ) with
  * ρ = ln(1/p_near)/ln(1/p_far) < 1, sub-quadratic, vs the Ω(n²) exact
  * cell-pair search that no sound pruning can save on unclustered
  * corpora (SURVEY §7.1). All randomness is a fixed seed: signatures are
  * deterministic across rows, partitions, retries and sessions.
  */
object CosineLsh {

  val Planes = 256
  val Bands = 32
  val BitsPerBand: Int = Planes / Bands // 8
  val Dim = 64

  private val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(20240812L)
    Array.fill(Planes)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  /** The 32 band keys (band index ‖ its 8 sign bits) of a vector's
    * hyperplane signature. Scale note: per-vector cost is Planes×Dim
    * multiply-adds, embarrassingly parallel, no shuffle — the shuffle
    * that follows carries only (band key, vec_id) pairs. */
  def bandKeys(v: Seq[Float]): Array[Long] = {
    val n = math.min(v.length, Dim)
    val bits = new Array[Boolean](Planes)
    var i = 0
    while (i < Planes) {
      val p = planes(i)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += p(j) * v(j); j += 1 }
      bits(i) = dot >= 0
      i += 1
    }
    Array.tabulate(Bands) { b =>
      var k = 0L
      var i2 = b * BitsPerBand
      while (i2 < (b + 1) * BitsPerBand) {
        k = (k << 1) | (if (bits(i2)) 1L else 0L)
        i2 += 1
      }
      (b.toLong << 16) | k
    }
  }
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
