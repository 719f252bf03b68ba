package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analyzer.{Normalizer, TableNormalizer}

/** NormalizerTable goldens transcribed from the reference's own suite
  * (test/command/suite/normalizers/table/{many,overlap}.expected) plus
  * longest-match edge cases derived from grn_pat_scan semantics. */
class TableNormalizerSpec extends AnyFunSuite {

  test("reference golden: many.expected (per-char substitution table)") {
    val rules = ('a' to 'z').map(c => c.toString -> s"<${c.toUpper}>")
    val r = TableNormalizer.compile(rules)
    val in = ".a.b.c.d.e.f.g.h.i.j.k.l.m.n.o.p.q.r.s.t.u.v.w.x.y.z."
    val want = ".<A>.<B>.<C>.<D>.<E>.<F>.<G>.<H>.<I>.<J>.<K>.<L>.<M>.<N>" +
      ".<O>.<P>.<Q>.<R>.<S>.<T>.<U>.<V>.<W>.<X>.<Y>.<Z>."
    assert(TableNormalizer.normalize(in, r) == want)
  }

  test("reference golden: overlap.expected (NFKC-normalized PAT keys, longest match)") {
    // keys Ⅰ/Ⅱ/Ⅲ normalize (NFKC130) to i/ii/iii; input ⅡⅡ scans as iiii
    // and the greedy longest-match takes iii then i -> "31"
    val rules = Seq("Ⅰ" -> "1", "Ⅱ" -> "2", "Ⅲ" -> "3")
    val r = TableNormalizer.compile(rules,
      Some(Normalizer.byName("NormalizerNFKC130")))
    assert(TableNormalizer.normalize("ⅡⅡ", r) == "31")
    assert(TableNormalizer.normalize("Ⅰ", r) == "1")
    assert(TableNormalizer.normalize("ⅢⅡ", r) == "32") // iiiii -> iii+ii
  }

  test("leftmost-longest, non-overlapping, unmatched copied through") {
    val r = TableNormalizer.compile(Seq(
      "spark" -> "[1]", "spa" -> "[2]", "a" -> "[3]"))
    assert(TableNormalizer.normalize("spark", r) == "[1]")
    assert(TableNormalizer.normalize("spaspark", r) == "[2][1]")
    assert(TableNormalizer.normalize("xax", r) == "x[3]x")
    assert(TableNormalizer.normalize("", r) == "")
    // after a match the scan resumes AFTER it (non-overlapping)
    assert(TableNormalizer.normalize("spa", r) == "[2]")
  }

  test("spec-string round-trip via Normalizer.byName") {
    val f = Normalizer.byName("NormalizerTable(grn=>groonga,TM=>(tm))")
    assert(f("grn is grnTM") == "groonga is groonga(tm)")
    intercept[IllegalArgumentException](
      Normalizer.byName("NormalizerTable(broken)"))
  }

  test("empty rule set and empty keys are inert") {
    val r = TableNormalizer.compile(Seq("" -> "x"))
    assert(TableNormalizer.normalize("abc", r) == "abc")
  }
}
