package graft.operators

/** Scala `MurmurHash3` mirrored in DuckDB SQL (round-9 factor-out of
  * the `llm_minhash_lsh` oracle's inline chain, now shared with the
  * `llm_simhash_dedup` oracle). All arithmetic stays in the unsigned-
  * 32 representation (non-negative BIGINTs < 2^32), where Java's
  * signed two's-complement multiply/xor agree mod 2^32, `>>>` is
  * plain integer division, and 32-bit wraparound is emulated with
  * `% 2^32` on HUGEINT products. Rotations are shift-adds on the
  * same representation. The chains are the literal mix / mixLast /
  * finalizeHash pipeline of `scala.util.hashing.MurmurHash3`, so any
  * engine running this SQL reproduces the JVM hash bit-for-bit (the
  * Verify harness proves it per corpus via the hash-match gate). */
private[operators] object MurmurSql {
  private val C1 = 0xcc9e2d51L & 0xffffffffL
  private val C2 = 0x1b873593L
  private val MixC = 0xe6546b64L & 0xffffffffL
  private val Fc1 = 0x85ebca6bL & 0xffffffffL
  private val Fc2 = 0xc2b2ae35L & 0xffffffffL

  /** murmur3 mixLast: k *= c1; k = rotl(k,15); k *= c2; h ^= k. */
  def mixlast(h: String, k: String): String = {
    val k1 = s"(CAST(CAST(($k) AS HUGEINT) * $C1 % 4294967296 AS BIGINT))"
    val k2 = s"(($k1 * 32768) % 4294967296 + $k1 // 131072)"
    val k3 = s"(($k2 * $C2) % 4294967296)"
    s"xor(($h), $k3)"
  }

  /** murmur3 mix: mixLast, then h = rotl(h,13); h = h*5 + mixC. */
  def mix(h: String, k: String): String = {
    val h1 = mixlast(h, k)
    val h2 = s"(($h1 * 8192) % 4294967296 + ($h1) // 524288)"
    s"(($h2 * 5 + $MixC) % 4294967296)"
  }

  /** CTE chain computing Scala `MurmurHash3.stringHash(w, seed)` for
    * every row of `src` (which must expose a string column `w`),
    * ending in CTE `<p>whash(w, h)` with h in [0, 2^32). Chars are
    * consumed in UTF-16 pairs `(c[i] << 16) | c[i+1]`, an odd tail
    * via mixLast, then `h ^= length` and the double-avalanche —
    * exactly `finalizeHash`. `p` prefixes every CTE so two seeds can
    * coexist in one WITH.
    *
    * CORPUS ASSUMPTION (BMP/ASCII): DuckDB's length()/ord()/substring()
    * operate on Unicode CODEPOINTS while the JVM hash consumes UTF-16
    * CODE UNITS — for any supplementary (non-BMP) character the two
    * disagree (one codepoint vs a surrogate pair), so this mirror is
    * exact only for BMP text. The synthetic corpus is ASCII (pinned by
    * llm_text_stats' n_chars==length(text) valid flag); the guard is
    * ACTIVE since round 11 — TrainingDataSpec's "MurmurSql corpus
    * precondition is LOUD" test scans the sf0.001/sf0.01 corpora and
    * fails with a named precondition message on any non-ASCII row, so
    * a future fixture change surfaces here rather than as an
    * inscrutable oracle hash mismatch. The fix for such a fixture is a
    * UTF-16 re-expansion in SQL, not a Scala-side change. */
  def stringHashCtes(p: String, src: String, seed: Long): String = {
    val s = seed & 0xffffffffL
    val mixL = mix("acc", "x")
    s"""${p}twh AS (
         SELECT w, list_reduce(list_prepend($s, list_transform(
             range(1, length(w), 2),
             ii -> ord(substring(w, CAST(ii AS INT), 1)) * 65536
                   + ord(substring(w, CAST(ii AS INT) + 1, 1)))),
           (acc, x) -> $mixL) AS f0
         FROM $src),
       ${p}twh2 AS (SELECT w, CASE WHEN length(w) % 2 = 1
             THEN ${mixlast("f0",
               "ord(substring(w, CAST(length(w) AS INT), 1))")}
             ELSE f0 END AS f1 FROM ${p}twh),
       ${p}twh3 AS (SELECT w, xor(f1, length(w)) AS g0 FROM ${p}twh2),
       ${p}twh4 AS (SELECT w, xor(g0, g0 // 65536) AS g1 FROM ${p}twh3),
       ${p}twh5 AS (SELECT w, CAST(CAST(g1 AS HUGEINT) * $Fc1 % 4294967296
                  AS BIGINT) AS g2 FROM ${p}twh4),
       ${p}twh6 AS (SELECT w, xor(g2, g2 // 8192) AS g3 FROM ${p}twh5),
       ${p}twh7 AS (SELECT w, CAST(CAST(g3 AS HUGEINT) * $Fc2 % 4294967296
                  AS BIGINT) AS g4 FROM ${p}twh6),
       ${p}whash AS (SELECT w, xor(g4, g4 // 65536) AS h FROM ${p}twh7)"""
  }

  /** The murmur3 finalizeHash avalanche tail (h ^= len, then the
    * double xor-shift/multiply chain) as suffixed CTEs over `src`,
    * ending in `<p>out` with the result column `av`. Used by the
    * minhash oracle's band fold — the ONE audited copy of the chain. */
  def avalanche(p: String, src: String, in: String, len: Int): String =
    s"""${p}f1 AS (SELECT *, xor($in, $len) AS a0 FROM $src),
       ${p}f2 AS (SELECT *, xor(a0, a0 // 65536) AS a1 FROM ${p}f1),
       ${p}f3 AS (SELECT *, CAST(CAST(a1 AS HUGEINT) * $Fc1
                 % 4294967296 AS BIGINT) AS a2 FROM ${p}f2),
       ${p}f4 AS (SELECT *, xor(a2, a2 // 8192) AS a3 FROM ${p}f3),
       ${p}f5 AS (SELECT *, CAST(CAST(a3 AS HUGEINT) * $Fc2
                 % 4294967296 AS BIGINT) AS a4 FROM ${p}f4),
       ${p}out AS (SELECT *, xor(a4, a4 // 65536) AS av FROM ${p}f5)"""
}
