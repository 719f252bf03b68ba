package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.analyzer.{Analyzers, TokenizeMode, TokenRegexpTokenizer}

/** Seeded property fuzz for the TokenRegexp ADD/GET alignment invariant
  * the indexed regexp search rests on: for ANY doc text and ANY blank-free
  * literal it contains, the GET phrase of that literal (with or without
  * applicable anchors) aligns against the doc's ADD stream at some base
  * offset — i.e. gram-phrase candidates can never miss a true match. */
class TokenRegexpFuzzSpec extends AnyFunSuite {
  private val tok = Analyzers.byName("TokenRegexp")

  /** does the GET token multiset of `query` align into doc's ADD stream? */
  private def phraseMatches(docAdd: Map[(String, Int), Boolean],
      addByTerm: Map[String, Seq[Int]], q: Seq[(String, Int)]): Boolean = {
    if (q.isEmpty) return false
    val (t0, p0) = q.head
    addByTerm.getOrElse(t0, Nil).exists { base0 =>
      val base = base0 - p0
      q.forall { case (t, p) => docAdd.contains((t, base + p)) }
    }
  }

  test("gram phrase never misses a contained literal (seeded fuzz)") {
    val rnd = new Random(20260818L)
    val alphabet = "abcdefg "
    for (iter <- 0 until 300) {
      val doc = (0 until (3 + rnd.nextInt(25)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        .replaceAll(" +", " ").trim
      if (doc.nonEmpty) {
        val add = tok.tokenize(doc, TokenizeMode.Add).map(t => (t.term, t.pos))
        val docAdd = add.map(x => x -> true).toMap
        val byTerm = add.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSeq }
        // pick a blank-free substring of the doc as the literal
        val words = doc.split(" ").filter(_.length >= 2)
        if (words.nonEmpty) {
          val w = words(rnd.nextInt(words.length))
          val s = rnd.nextInt(w.length - 1)
          val len = 2 + rnd.nextInt(w.length - s - 1)
          val lit = w.substring(s, s + len)
          if (lit.length >= 2) {
            // unanchored: must align somewhere
            val q = tok.tokenize(lit, TokenizeMode.Get).map(t => (t.term, t.pos)).toSeq
            assert(phraseMatches(docAdd, byTerm, q),
              s"iter $iter: literal '$lit' in doc '$doc' missed by grams $q vs ${add.toSeq}")
            // begin-anchored: applicable iff the doc STARTS with the literal
            if (doc.startsWith(lit)) {
              val qa = tok.tokenize(TokenRegexpTokenizer.BeginMark + lit,
                TokenizeMode.Get).map(t => (t.term, t.pos)).toSeq
              assert(phraseMatches(docAdd, byTerm, qa),
                s"iter $iter: begin-anchored '$lit' missed in doc '$doc'")
            }
            // end-anchored: applicable iff the doc ENDS with the literal
            if (doc.endsWith(lit)) {
              val qz = tok.tokenize(lit + TokenRegexpTokenizer.EndMark,
                TokenizeMode.Get).map(t => (t.term, t.pos)).toSeq
              assert(phraseMatches(docAdd, byTerm, qz),
                s"iter $iter: end-anchored '$lit' missed in doc '$doc'")
            }
          }
        }
      }
    }
  }

  test("anchored queries reject docs where the literal is interior (seeded fuzz)") {
    val rnd = new Random(42L)
    for (_ <- 0 until 200) {
      // doc = prefixword + ' ' + word; begin-anchor on `word` must NOT align
      val w1 = (0 until 3 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      val w2 = (0 until 3 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      val doc = s"$w1 $w2"
      val add = tok.tokenize(doc, TokenizeMode.Add).map(t => (t.term, t.pos))
      val docAdd = add.map(x => x -> true).toMap
      val byTerm = add.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSeq }
      if (!doc.startsWith(w2)) {
        val qa = tok.tokenize(TokenRegexpTokenizer.BeginMark + w2,
          TokenizeMode.Get).map(t => (t.term, t.pos)).toSeq
        assert(!phraseMatches(docAdd, byTerm, qa),
          s"begin-anchored '$w2' must not align mid-doc in '$doc'")
      }
      if (!doc.endsWith(w1)) {
        val qz = tok.tokenize(w1 + TokenRegexpTokenizer.EndMark,
          TokenizeMode.Get).map(t => (t.term, t.pos)).toSeq
        assert(!phraseMatches(docAdd, byTerm, qz),
          s"end-anchored '$w1' must not align mid-doc in '$doc'")
      }
    }
  }
}
