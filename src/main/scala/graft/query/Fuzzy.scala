package graft.query

/** Edit distances for fuzzy search. The transposition variant is the
  * RESTRICTED (optimal-string-alignment) form the reference computes —
  * `DIST(x-2, y-2) + 1` when the last two characters are swapped, no
  * unrestricted-Damerau moves (/root/reference/lib/pat.c:3395-3415 under
  * GRN_TABLE_FUZZY_SEARCH_WITH_TRANSPOSITION). OSA and unrestricted
  * Damerau agree at distance <= 1 (a single op either way); they diverge
  * when an edit happens BETWEEN two transposed characters, e.g.
  * "ca" -> "abc" is OSA 3 but Damerau 2 — this follows the reference.
  */
object Fuzzy {

  /** OSA distance with an early-out `cap`: returns cap+1 as soon as the
    * distance provably exceeds cap (the expansion filter never needs the
    * exact value beyond it). */
  def osaDistance(a: String, b: String, cap: Int): Int = {
    if (a == b) return 0
    val n = a.length
    val m = b.length
    if (math.abs(n - m) > cap) return cap + 1
    var prev2: Array[Int] = null
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var x = 1
    while (x <= n) {
      cur(0) = x
      var rowMin = cur(0)
      var y = 1
      while (y <= m) {
        val cost = if (a.charAt(x - 1) == b.charAt(y - 1)) 0 else 1
        var d = math.min(math.min(prev(y) + 1, cur(y - 1) + 1), prev(y - 1) + cost)
        if (x > 1 && y > 1 &&
            a.charAt(x - 1) == b.charAt(y - 2) &&
            a.charAt(x - 2) == b.charAt(y - 1)) {
          val t = prev2(y - 2) + 1
          if (t < d) d = t
        }
        cur(y) = d
        if (d < rowMin) rowMin = d
        y += 1
      }
      if (rowMin > cap) return cap + 1 // whole row above cap: monotone, bail
      prev2 = prev
      prev = cur
      cur = new Array[Int](m + 1)
      x += 1
    }
    prev(m)
  }
}
