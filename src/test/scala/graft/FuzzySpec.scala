package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.Fuzzy

/** OSA distance (the reference fuzzy DP with WITH_TRANSPOSITION,
  * lib/pat.c:3395-3415) — brute-check vs a reference recursion plus the
  * documented divergences from unrestricted Damerau. */
class FuzzySpec extends AnyFunSuite {

  private def osaRef(a: String, b: String): Int = {
    val d = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) d(i)(0) = i
    for (j <- 0 to b.length) d(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1), d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
    }
    d(a.length)(b.length)
  }

  test("known cases: transposition is one edit; OSA restriction holds") {
    assert(Fuzzy.osaDistance("psark", "spark", 2) == 1)   // adjacent swap
    assert(Fuzzy.osaDistance("ab", "ba", 2) == 1)
    assert(Fuzzy.osaDistance("abcdef", "abcfed", 3) == 2) // swap + sub region
    // OSA (reference) vs unrestricted Damerau: "ca"->"abc" is 3, not 2
    assert(Fuzzy.osaDistance("ca", "abc", 5) == 3)
    assert(Fuzzy.osaDistance("", "abc", 5) == 3)
    assert(Fuzzy.osaDistance("same", "same", 2) == 0)
  }

  test("matches the quadratic reference recursion on random pairs") {
    val rnd = new scala.util.Random(7)
    def word() = (0 until (1 + rnd.nextInt(8))).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 0 until 500) {
      val (a, b) = (word(), word())
      val want = osaRef(a, b)
      assert(Fuzzy.osaDistance(a, b, 10) == want, s"($a, $b)")
    }
  }

  test("cap is an early-out, never changes in-cap answers") {
    assert(Fuzzy.osaDistance("abcdefgh", "zzzzzzzz", 2) == 3) // cap+1 marker
    assert(Fuzzy.osaDistance("abcd", "abdc", 1) == 1)         // exactly at cap
    assert(Fuzzy.osaDistance("kitten", "sitting", 3) == 3)
  }
}
