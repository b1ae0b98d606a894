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

  /** 128-value sketch of a token set. Empty input → MaxValue sentinels.
    *
    * Exact (a·h + b) mod p without 128-bit arithmetic: split
    * a = a1·2³¹ + a0 (a1 < 2³⁰, h < 2³², so a1·h < 2⁶² — no overflow),
    * reduce a1·h mod p, then multiply by 2³¹ via the Mersenne identity
    * 2⁶¹ ≡ 1 (mod p): x·2³¹ ≡ ((x << 31) & p) + (x >>> 30) — the 64-bit
    * shift may wrap, but only bits ≥ 64 are lost and the mask keeps
    * bits 0–60, which are exactly (x·2³¹) mod 2⁶¹. (Round-9 fix: the
    * previous split reduced `hi << 31` with plain `%`, which wraps
    * SIGNED for hi ≥ 2³³ — the sketch was deterministic but not the
    * documented affine permutation, and negative values leaked into
    * the signatures. The DuckDB oracle mirrors the clean form with
    * HUGEINT arithmetic; MinHashPinSpec pins both engines' constants.) */
  def sketch(tokens: Seq[String]): Array[Long] = {
    val sig = Array.fill(NumPerms)(Long.MaxValue)
    tokens.foreach { t =>
      val h = MurmurHash3.stringHash(t).toLong & 0xffffffffL
      var i = 0
      while (i < NumPerms) {
        val (a, b) = coeffs(i)
        val a1 = a >>> 31
        val a0 = a & 0x7fffffffL
        val hi = (a1 * h) % MersennePrime
        val hiTimes2p31 =
          (((hi << 31) & MersennePrime) + (hi >>> 30)) % MersennePrime
        // each term < p < 2⁶¹; the 3-term sum stays under 2⁶³
        val v = (hiTimes2p31 + (a0 * h) % MersennePrime + b) % MersennePrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
    }
    sig
  }

  /** The fixed permutation coefficients — exposed so the DuckDB oracle
    * SQL (SparkEntry) embeds the SAME constants it mirrors. */
  private[graft] def coefficients: Array[(Long, Long)] = coeffs

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
  * Banding r bands × b bits turns bit agreement into equi-joinable
  * candidate buckets: a pair is a candidate iff some band's b bits all
  * match, so P(candidate) = 1 − (1 − (1−θ/π)^b)^r.
  *
  * The geometry is ADAPTIVE (round-4 fix): a FIXED (r, b) admits a fixed
  * fraction of all far pairs — with 32×8, a far pair (θ≈90°, bit-agree
  * p=0.5) collides in some band with prob 1−(1−0.5⁸)³² ≈ 11.8%, i.e.
  * Θ(n²)/8 candidates on distinct-vector corpora, quadratic with a small
  * constant. Sub-quadratic candidate volume requires b to GROW with the
  * corpus: [[geometry]] sets b = clamp(8, 16, ⌈log₂ n⌉ − 2) — i.e.
  * 2^b ≈ n/4, a mean far-pair bucket occupancy of ~4 per band — so the
  * far-pair admission rate r·2^(−b) shrinks ~1/n and expected far
  * candidates stay ~r·n. The price is recall on BORDERLINE pairs — the
  * analytic curve (p = 1−θ/π bit-agreement, candidate prob 1−(1−p^b)^r):
  *
  *   geometry   | far admit (sim 0)   | recall sim 0.4 | sim 0.6 | sim ≥0.99
  *   32×8  (n≤1024) | 11.8%           | 0.56           | 0.87    | ~1.0
  *   28×9  (n=2k)   | 5.3%            | 0.36           | 0.71    | ~1.0
  *   19×13 (n=32k)  | 0.23%           | 0.05           | 0.19    | ~1.0
  *
  * i.e. the sketch keeps near-certain recall on true near-duplicates
  * (replica-grade, sim → 1) at every scale while the borderline band
  * thins as n grows — the standard LSH trade (ρ = ln p₁/ln p₂ ≈ 0.66 at
  * the 0.4 threshold: candidates ~n^1.66 would need multi-probe or more
  * planes to tighten further; at dedup thresholds ≥0.9, ρ ≈ 0.15 and the
  * curve is effectively linear). ScaleProbe's perturbed mode measures
  * the realized candidate counts (PROBE_r04.json). The recall ScalaTest
  * runs at n=500 → the 32×8 cell of the curve, bound ≥ 0.4.
  *
  * All randomness is a fixed seed: signatures are deterministic across
  * rows, partitions, retries and sessions.
  */
object CosineLsh {

  val Planes = 256
  val Dim = 64
  val MinBits = 8
  val MaxBits = 16

  /** (bands, bitsPerBand) for a corpus of n vectors: bits = clamp(8, 16,
    * ⌈log₂ n⌉ − 2), i.e. 2^bits ≈ n/4 — mean far-pair band-bucket
    * occupancy ~4, keeping expected far candidates per vector O(bands) —
    * and bands = min(32, 256/bits) hyperplanes used as disjoint band
    * slices. Deterministic in n. */
  def geometry(n: Long): (Int, Int) = {
    val ceilLog2 =
      if (n <= 2) 1
      else 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    val bits = math.max(MinBits, math.min(MaxBits, ceilLog2 - 2))
    (math.min(32, Planes / bits), bits)
  }

  private val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(20240812L)
    Array.fill(Planes)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  /** The raw hyperplanes, exposed for the DuckDB oracle mirror of
    * `llm_embedding_lsh` (the zero-transcription pattern: the oracle
    * embeds these exact doubles as SQL literals via Double.toString's
    * shortest round-trip representation — java.util.Random's gaussian
    * stream cannot be regenerated outside the JVM, but the CONSTANTS
    * it produced can be shipped). */
  private[graft] def planesRows: Array[Array[Double]] = planes

  /** The band keys (band index ‖ its sign bits) of a vector's hyperplane
    * signature under the given geometry (bands·bitsPerBand ≤ 256 planes).
    * Scale note: per-vector cost is Planes×Dim multiply-adds,
    * embarrassingly parallel, no shuffle — the shuffle that follows
    * carries only (band key, vec_id) pairs. */
  def bandKeys(v: Seq[Float], bands: Int, bitsPerBand: Int): Array[Long] = {
    require(bands * bitsPerBand <= Planes, s"$bands x $bitsPerBand > $Planes")
    // one bulk copy, then primitive-array indexing in the 256×64 hot
    // loop — Seq.apply is a boxed virtual call vulnerable to JVM type-
    // profile pollution (same hazard as ArrayData.getFloat in
    // CosineSimilarity; see its scaladoc)
    val arr = new Array[Float](math.min(v.length, Dim))
    var c = 0
    while (c < arr.length) { arr(c) = v(c); c += 1 }
    val n = arr.length
    val used = bands * bitsPerBand
    val bits = new Array[Boolean](used)
    var i = 0
    while (i < used) {
      val p = planes(i)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += p(j) * arr(j); j += 1 }
      bits(i) = dot >= 0
      i += 1
    }
    Array.tabulate(bands) { b =>
      var k = 0L
      var i2 = b * bitsPerBand
      while (i2 < (b + 1) * bitsPerBand) {
        k = (k << 1) | (if (bits(i2)) 1L else 0L)
        i2 += 1
      }
      (b.toLong << 17) | k
    }
  }

  /** Multi-probe band keys (query side of `llm_ann_lsh`): each exact
    * band key plus its `bitsPerBand` Hamming-1 sign-flip neighbors — the
    * standard multi-probe LSH recall boost, paid ONLY on the (tiny,
    * broadcast) query side: the corpus band table stays 1× per band.
    * Safe to XOR the low bits because the band index lives at bit 17+
    * and bitsPerBand ≤ 16. */
  def bandKeysMultiProbe(v: Seq[Float], bands: Int,
      bitsPerBand: Int): Array[Long] = {
    val exact = bandKeys(v, bands, bitsPerBand)
    val out = new Array[Long](exact.length * (1 + bitsPerBand))
    var o = 0
    exact.foreach { k =>
      out(o) = k; o += 1
      var j = 0
      while (j < bitsPerBand) { out(o) = k ^ (1L << j); o += 1; j += 1 }
    }
    out
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

  /** Constants exported for the DuckDB oracle mirror (the MurmurSql
    * zero-transcription pattern): the oracle reformulates the rolling
    * recurrence as prefix sums P(i) = B^i · Σₚ c_p·B⁻ᵖ mod M — valid
    * because M = 2^61−1 is prime, so B is invertible. See
    * TrainingDataOps.fingerprintOracleSql. */
  private[graft] val base: Long = Base
  private[graft] val mod: Long = Mod
  private[graft] val baseInv: Long =
    BigInt(Base).modInverse(BigInt(Mod)).toLong
  private[graft] def basePow(e: Int): Long =
    BigInt(Base).modPow(BigInt(e), BigInt(Mod)).toLong

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
