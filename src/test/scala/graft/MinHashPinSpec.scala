package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the exact MinHash constants the DuckDB oracle mirror of
  * `llm_minhash_lsh` re-implements in SQL (SparkEntry round-9): the
  * murmur3 string hash, the 61-bit Mersenne affine permutations (seeds
  * from java.util.Random(42)), and the banded signature keys. If any
  * of these drift, this spec fails BEFORE the driver's oracle diff
  * does — with a pointer at what changed. Expected values computed by
  * an independent reimplementation (python, scripts history r9). */
class MinHashPinSpec extends AnyFunSuite {

  test("sketch + band signatures match the pinned reference values") {
    val s = functions.MinHash.sketch(Seq("hello", "world", "x"))
    assert(s.take(4).toSeq == Seq(251613164416462087L,
      587379974536342772L, 1219518402238578554L, 480795838624416270L))
    val b = functions.MinHash.bandSignatures(s)
    assert(b.take(4).toSeq == Seq(2805043211L, 6839716097L,
      11822606599L, 13185419372L))
  }
}
