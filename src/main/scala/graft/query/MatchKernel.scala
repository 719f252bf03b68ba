package graft.query

import graft.codec.{DecodedBlock, PostingCodec}
import graft.index.PostingBlockRow

import scala.collection.mutable

/** Match modes, mirroring groonga's operator set executed by grn_ii_select
  * (/root/reference/lib/ii.cpp:14680; dispatch lib/table_selector.c:1171). */
sealed trait MatchMode extends Serializable
object MatchMode {
  /** conjunctive — all terms (GRN_OP_MATCH over AND-merged result set) */
  case object All extends MatchMode
  /** disjunctive — any term, scores accumulate (OR merge) */
  case object Any extends MatchMode
  /** position-adjacent phrase (the EXACT-mode phrase check,
    * /root/reference/lib/ii.cpp:13538-13605) */
  case object Phrase extends MatchMode
  /** all terms within a window (GRN_OP_NEAR, /root/reference/lib/ii.cpp:13383-13533) */
  final case class Near(maxInterval: Int) extends MatchMode
  /** all PHRASES (term groups keyed by ResolvedTerm.phraseId) occur, with
    * phrase start positions within `maxInterval` of each other; `ordered`
    * additionally requires starts ascending in query-phrase order
    * (GRN_OP_NEAR_PHRASE / GRN_OP_ORDERED_NEAR_PHRASE,
    * /root/reference/lib/ii.cpp:11210+, 12903) */
  final case class NearPhrase(maxInterval: Int, ordered: Boolean) extends MatchMode
  /** NEAR_PHRASE with ALTERNATIVES: each phrase group is a set of
    * alternatives (keyed by ResolvedTerm.altId) and a group's occurrence
    * starts are the union over its alternatives — one alternative per
    * group must land inside the window
    * (GRN_OP_NEAR_PHRASE_PRODUCT / ORDERED_*, lib/ii.cpp:12903+) */
  final case class NearPhraseProduct(maxInterval: Int, ordered: Boolean) extends MatchMode
  /** at least `min` distinct terms present (GRN_OP_QUORUM) */
  final case class Quorum(min: Int) extends MatchMode
}

sealed trait ScoreMode extends Serializable
object ScoreMode {
  /** groonga default: score = sum of occurrences x weight
    * (record_score=(n_occurrences+total_weights)*column_weight,
    * /root/reference/lib/ii.cpp:13694-13696) */
  case object Tf extends ScoreMode
  /** Okapi BM25 with the reference's constants and idf
    * (/root/reference/lib/tokenizers.c:2110-2111, 2637-2652) */
  final case class Bm25(k1: Double = 2.0, b: Double = 0.75) extends ScoreMode
  /** named scorer proc scorer_tf_at_most(max): per-leg score = min(tf, max)
    * (/root/reference/lib/scorers.c:55-90) */
  final case class TfAtMost(max: Double) extends ScoreMode
  /** named scorer proc scorer_tf_idf: per-leg score =
    * max(tf * ln(nDocs / (sum(df)/n_tokens)), 1), or 1 when the estimate
    * reaches the corpus size (/root/reference/lib/scorers.c:26-53) */
  case object TfIdf extends ScoreMode
}

final case class ResolvedTerm(
    term: String, df: Long, idf: Double, weight: Double, qpos: Int,
    /** phrase-group id for NearPhrase composition (0 for everything else);
      * qpos is then the offset within the phrase */
    phraseId: Int = 0,
    /** alternative id within the phrase group (NEAR_PHRASE_PRODUCT: a
      * group's starts are the UNION over its alternatives) */
    altId: Int = 0)

final case class ResolvedQuery(
    terms: Array[ResolvedTerm],
    mode: MatchMode,
    score: ScoreMode,
    avgdl: Double,
    /** per-bucket top-k pruning (0 = emit every match). Rank-safe: docs are
      * scanned in ascending docId and ties lose to earlier docs, so the
      * per-bucket top-k always contains the bucket's contribution to the
      * global top-k. */
    topK: Int,
    /** per-section weight, indexed by sid-1 (match_columns "a*10||b" →
      * [10, 1], lib/ii.cpp:13694-13696 column_weight). Empty = 1.0 each. */
    sectionWeights: Array[Double] = Array.emptyDoubleArray,
    /** true when the index carries a sid stream (multi-column postings:
      * consecutive entries may share a docId, one per section). WAND still
      * prunes — v2 blocks carry max_gtf, the group-summed tf bound. */
    sectioned: Boolean = false,
    /** tombstones, sorted by doc id: tombDocs(i) is dead in data segments
      * with seg_ord < tombGens(i). Buckets touching a tombstone (or with
      * overlapping segment ranges, i.e. upserts) are decoded, filtered and
      * re-merged before cursor iteration; untouched buckets stream as
      * usual. Compact folds tombstones away and restores the fast path
      * everywhere. */
    tombDocs: Array[Long] = Array.emptyLongArray,
    tombGens: Array[Int] = Array.emptyIntArray,
    /** corpus doc count, needed only by ScoreMode.TfIdf's query idf */
    nDocs: Long = 0L) {
  def sectionWeight(sid: Int): Double =
    if (sectionWeights.isEmpty || sid - 1 >= sectionWeights.length) 1.0
    else sectionWeights(sid - 1)

  /** scorer_tf_idf leg idf over a term set: ln(nDocs / (sum(df)/n)),
    * 0 when the estimate reaches the corpus (record then scores min 1.0) */
  def tfIdfLegIdf(terms: Iterable[ResolvedTerm]): Double = {
    val est = terms.map(_.df).sum.toDouble / terms.size
    if (est <= 0 || est >= nDocs) 0.0 else math.log(nDocs / est)
  }
}

object Bm25 {
  /** idf = ln((N - df + 0.5)/(df + 0.5) + 1) — reference formula at
    * /root/reference/lib/tokenizers.c:2637-2652. */
  def idf(nDocs: Long, df: Long): Double =
    math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)

  def weight(tf: Double, dl: Double, avgdl: Double, k1: Double, b: Double): Double =
    tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
}

/** Streaming cursor over one term's posting blocks within one bucket.
  * Blocks must be ordered by blk; docIds ascend across and within blocks.
  * Block min/max docs act as skip pointers (advanceTo skips whole blocks
  * without decoding — role of chunk-header dgaps,
  * /root/reference/lib/ii.cpp:16200-16219, cursor skip :8139).
  *
  * Iteration is by DOC GROUP: with a sectioned index consecutive postings
  * may share a docId (one per section); doc/tf/next/advanceTo treat the
  * whole group as one logical posting. The builder never splits a doc's
  * group across blocks. Without sections the group is always one posting
  * (the fast path).
  */
final class TermCursor(val rt: ResolvedTerm, blocks: Array[PostingBlockRow]) {
  private var bi = 0
  private var block: DecodedBlock = _
  private var i = 0 // group start
  private var gEnd = 0 // group end (exclusive), same block
  private var posBase = 0 // positions offset of group start
  var exhausted: Boolean = blocks.isEmpty
  if (!exhausted) loadBlock()

  private def loadBlock(): Unit = {
    MatchKernel.statBlocksDecoded.add(1L)
    block = PostingCodec.decode(blocks(bi).payload)
    i = 0
    posBase = 0
    setGroup()
  }
  MatchKernel.statBlocksTotal.add(blocks.length.toLong)

  /** every block carries a valid group-summed tf bound (max_gtf >= 0) —
    * false only for blocks written by a pre-v2 build, which must not WAND */
  def hasGroupBounds: Boolean = {
    var j = 0
    while (j < blocks.length) {
      if (blocks(j).max_gtf < 0) return false
      j += 1
    }
    true
  }

  private def setGroup(): Unit = {
    gEnd = i + 1
    if (block.sids.nonEmpty)
      while (gEnd < block.count && block.docIds(gEnd) == block.docIds(i)) gEnd += 1
  }

  def doc: Long = block.docIds(i)
  /** unweighted tf summed over the doc's sections */
  def tf: Int = {
    if (gEnd == i + 1) block.tfs(i)
    else {
      var s = 0; var j = i
      while (j < gEnd) { s += block.tfs(j); j += 1 }
      s
    }
  }
  def dl: Int = block.dls(i) // whole-doc dl, same for every section posting
  /** section-weighted tf of the current doc group (empty weights = 1.0) */
  def weightedTf(q: ResolvedQuery): Double = {
    if (block.sids.isEmpty && q.sectionWeights.isEmpty) return block.tfs(i).toDouble
    var s = 0.0
    var j = i
    while (j < gEnd) {
      val sid = if (block.sids.isEmpty) 1 else block.sids(j)
      s += block.tfs(j) * q.sectionWeight(sid)
      j += 1
    }
    s
  }
  /** positions of the current group, flattened across sections (only valid
    * for non-sectioned use — phrase/near on sectioned indexes must use
    * groupPositions) */
  def positions: Array[Int] = {
    val n = { var s = 0; var j = i; while (j < gEnd) { s += block.tfs(j); j += 1 }; s }
    val out = new Array[Int](n)
    System.arraycopy(block.positions, posBase, out, 0, n)
    out
  }
  /** per-section positions of the current group: (sid, ascending positions) */
  def groupPositions: Array[(Int, Array[Int])] = {
    val out = new Array[(Int, Array[Int])](gEnd - i)
    var off = posBase
    var j = i
    while (j < gEnd) {
      val p = new Array[Int](block.tfs(j))
      System.arraycopy(block.positions, off, p, 0, p.length)
      out(j - i) = ((if (block.sids.isEmpty) 1 else block.sids(j), p))
      off += block.tfs(j)
      j += 1
    }
    out
  }
  /** true while block.positions non-empty */
  def hasPositions: Boolean = block.positions.length > 0

  // ---- Block-Max WAND bounds (Ding & Suel 2011) ----
  // ubBlock(i): score upper bound of block i = idf x weight x bm25(maxTf, minDl).
  // ubSuffix(i): max over blocks i..end — a LIST-remaining bound, valid for
  // every posting this cursor can still emit. Pivot selection and the
  // no-pivot early exit must use ubSuffix (a later block can have a higher
  // max_tf / lower min_dl than the current one); the current-block bound is
  // only valid as the secondary in-block check.
  private var ubBlock: Array[Double] = _
  private var ubSuffix: Array[Double] = _

  /** per-block score upper bounds for the query's score mode — every mode
    * is monotone in tf (and, for BM25, anti-monotone in dl), so the block's
    * tf bound / min_dl give a sound bound. The tf bound is
    * maxSectionWeight x max_gtf: a doc group's weighted tf is
    * Σ_s w_s·tf_s <= maxW·Σ_s tf_s <= maxW·max_gtf (sid-less blocks have
    * max_gtf == max_tf and maxW == 1, reducing to the classic bound). */
  def initBounds(q: ResolvedQuery): Unit = {
    ubBlock = new Array[Double](blocks.length)
    ubSuffix = new Array[Double](blocks.length)
    val maxW =
      if (q.sectionWeights.isEmpty) 1.0 else q.sectionWeights.max
    var j = 0
    while (j < blocks.length) {
      val maxTf = math.max(blocks(j).max_gtf, blocks(j).max_tf).toDouble * maxW
      val ub = q.score match {
        case ScoreMode.Bm25(k1, b) =>
          rt.idf * rt.weight *
            Bm25.weight(maxTf, blocks(j).min_dl.toDouble, q.avgdl, k1, b)
        case ScoreMode.Tf => maxTf * rt.weight
        case ScoreMode.TfAtMost(max) => math.min(maxTf, max) * rt.weight
        case ScoreMode.TfIdf =>
          val idf = q.tfIdfLegIdf(Seq(rt))
          (if (idf == 0.0) 1.0 else math.max(maxTf * idf, 1.0)) * rt.weight
      }
      // A NEGATIVE leg multiplier inverts the max-tf bound into a lower
      // bound (reachable: sectioned df counts (doc,section) postings, so
      // df > nDocs makes the reference BM25 idf ln((N-df+0.5)/(df+0.5)+1)
      // negative; term weights can be negative too). Such a leg only ever
      // contributes <= 0 to a score, so 0 is a sound — if loose — upper
      // bound; clamping costs nothing on the normal positive path.
      ubBlock(j) = math.max(0.0, ub)
      j += 1
    }
    j = blocks.length - 1
    var mx = 0.0
    while (j >= 0) {
      if (ubBlock(j) > mx) mx = ubBlock(j)
      ubSuffix(j) = mx
      j -= 1
    }
  }

  /** upper bound over ALL postings this cursor can still emit */
  def remainingUpperBound: Double = if (exhausted) 0.0 else ubSuffix(bi)
  /** upper bound over the current block only */
  def currentBlockUpperBound: Double = ubBlock(bi)
  /** last docId of the current block (block-skip boundary) */
  def currentBlockMaxDoc: Long = blocks(bi).max_doc

  /** advance past the current doc group */
  def next(): Unit = {
    if (exhausted) return
    var j = i
    while (j < gEnd) { posBase += block.tfs(j); j += 1 }
    i = gEnd
    if (i >= block.count) {
      bi += 1
      if (bi >= blocks.length) exhausted = true else loadBlock()
    } else setGroup()
  }

  /** advance to the first doc group with docId >= target */
  def advanceTo(target: Long): Unit = {
    if (exhausted) return
    // skip whole blocks by max_doc
    if (blocks(bi).max_doc < target) {
      var nb = bi + 1
      while (nb < blocks.length && blocks(nb).max_doc < target) nb += 1
      if (nb >= blocks.length) { exhausted = true; return }
      bi = nb
      loadBlock()
    }
    // in-block: linear from i (blocks are small); maintain posBase
    while (!exhausted && block.docIds(i) < target) next()
  }
}

object MatchKernel {

  /** Local-mode instrumentation: blocks seen by cursors vs blocks actually
    * decoded — the difference is what block-max pruning (WAND skips + block
    * skip pointers) saved. JVM-wide LongAdders, valid under local[*] where
    * tasks share the driver JVM (tests + bench); on a real cluster these
    * would be SparkMetrics/accumulators, but no correctness depends on them. */
  val statBlocksTotal = new java.util.concurrent.atomic.LongAdder
  val statBlocksDecoded = new java.util.concurrent.atomic.LongAdder
  def resetStats(): Unit = { statBlocksTotal.reset(); statBlocksDecoded.reset() }
  /** (blocksSeen, blocksDecoded) since the last resetStats() */
  def readStats(): (Long, Long) = (statBlocksTotal.sum(), statBlocksDecoded.sum())

  /** true iff some tombstoned doc id falls in [lo, hi] */
  private def rangeHasTombstone(tombDocs: Array[Long], lo: Long, hi: Long): Boolean = {
    var a = 0
    var b = tombDocs.length
    while (a < b) { // lower bound of lo
      val m = (a + b) >>> 1
      if (tombDocs(m) < lo) a = m + 1 else b = m
    }
    a < tombDocs.length && tombDocs(a) <= hi
  }

  /** decode, tombstone-filter, (doc, sid)-sort and re-encode a term's
    * blocks into ONE block — the slow-but-correct path for buckets touched
    * by deletes/upserts (overlapping segment ranges). None if every
    * posting is dead. */
  private[graft] def filterBlocks(
      blocks: Array[PostingBlockRow],
      tombDocs: Array[Long], tombGens: Array[Int]): Option[PostingBlockRow] = {
    val docs = new graft.codec.LongVec(16)
    val tfs = new graft.codec.IntVec(16)
    val dls = new graft.codec.IntVec(16)
    val sds = new graft.codec.IntVec(16)
    val poss = new mutable.ArrayBuffer[Array[Int]](16)
    var withPos = false
    var withSids = false
    blocks.foreach { b =>
      val d = PostingCodec.decode(b.payload)
      if (d.positions.nonEmpty) withPos = true
      if (d.sids.nonEmpty) withSids = true
      var i = 0
      var po = 0
      while (i < d.count) {
        val doc = d.docIds(i)
        val ti = java.util.Arrays.binarySearch(tombDocs, doc)
        val dead = ti >= 0 && b.seg_ord < tombGens(ti)
        if (!dead) {
          docs += doc; tfs += d.tfs(i); dls += d.dls(i)
          sds += (if (d.sids.isEmpty) 1 else d.sids(i))
          poss += (if (d.positions.isEmpty) Array.emptyIntArray
            else java.util.Arrays.copyOfRange(d.positions, po, po + d.tfs(i)))
        }
        po += d.tfs(i)
        i += 1
      }
    }
    val n = docs.length
    if (n == 0) return None
    val da = docs.toArray
    val sa = sds.toArray
    val order = Array.range(0, n).sortBy(k => (da(k), sa(k)))
    val od = new Array[Long](n)
    val ot = new Array[Int](n)
    val ol = new Array[Int](n)
    val os = new Array[Int](n)
    val op = new Array[Array[Int]](n)
    val ta = tfs.toArray
    val la = dls.toArray
    var k = 0
    var maxTf = 0
    var maxGtf = 0
    var curGtf = 0
    var minDl = Int.MaxValue
    var tfSum = 0L
    while (k < n) {
      val src = order(k)
      od(k) = da(src); ot(k) = ta(src); ol(k) = la(src); os(k) = sa(src); op(k) = poss(src)
      if (ot(k) > maxTf) maxTf = ot(k)
      if (k > 0 && od(k) != od(k - 1)) { if (curGtf > maxGtf) maxGtf = curGtf; curGtf = 0 }
      curGtf += ot(k)
      if (ol(k) < minDl) minDl = ol(k)
      tfSum += ot(k)
      k += 1
    }
    if (curGtf > maxGtf) maxGtf = curGtf
    val payload = PostingCodec.encode(od, ot, ol,
      if (withPos) op else null, if (withSids) os else null)
    val h = blocks(0)
    Some(PostingBlockRow(h.term, h.bucket, 0, od(0), od(n - 1), n,
      maxTf, maxGtf, minDl, tfSum, payload.length, payload, 0))
  }

  /** Run the match over one bucket's blocks for all query terms.
    * Emits (docId, score) matches (per-bucket top-k if q.topK > 0). */
  def run(q: ResolvedQuery, rows: Iterator[PostingBlockRow]): Iterator[(Long, Double)] = {
    // organize: term -> blocks ordered by blk
    val byTerm = new mutable.HashMap[String, mutable.ArrayBuffer[PostingBlockRow]]()
    rows.foreach { r => byTerm.getOrElseUpdate(r.term, new mutable.ArrayBuffer[PostingBlockRow]()) += r }
    val cursors: Array[TermCursor] = q.terms.flatMap { rt =>
      // order by doc range (not blk): blocks may come from several segments
      // of an incrementally-appended index; append-only docIds keep segment
      // ranges disjoint, so (min_doc, blk) restores one ascending stream
      byTerm.get(rt.term).flatMap { bs =>
        val sorted = bs.sortBy(b => (b.min_doc, b.blk)).toArray
        var overlapping = false
        var i = 1
        while (!overlapping && i < sorted.length) {
          overlapping = sorted(i).min_doc <= sorted(i - 1).max_doc
          i += 1
        }
        val touched = q.tombDocs.nonEmpty && {
          var hi = Long.MinValue
          sorted.foreach(b => if (b.max_doc > hi) hi = b.max_doc)
          rangeHasTombstone(q.tombDocs, sorted(0).min_doc, hi)
        }
        if (touched || overlapping)
          filterBlocks(sorted, q.tombDocs, q.tombGens)
            .map(b => new TermCursor(rt, Array(b)))
        else Some(new TermCursor(rt, sorted))
      }
    }
    val results: Iterator[(Long, Double)] = q.mode match {
      case MatchMode.All | MatchMode.Phrase | _: MatchMode.Near | _: MatchMode.NearPhrase =>
        if (cursors.length < q.terms.length) Iterator.empty // a term missing in bucket
        else conjunctive(q, cursors)
      case MatchMode.Any => disjunctive(q, cursors, minMatch = 1)
      case MatchMode.Quorum(m) => disjunctive(q, cursors, minMatch = m)
      case MatchMode.NearPhraseProduct(mi, ord) => productMatch(q, cursors, mi, ord)
    }
    if (q.topK > 0) topK(results, q.topK) else results
  }

  private def score1(q: ResolvedQuery, c: TermCursor): Double = {
    val tf = c.weightedTf(q)
    q.score match {
      case ScoreMode.Tf => tf * c.rt.weight
      case ScoreMode.Bm25(k1, b) =>
        c.rt.idf * c.rt.weight * Bm25.weight(tf, c.dl.toDouble, q.avgdl, k1, b)
      case ScoreMode.TfAtMost(max) => math.min(tf, max) * c.rt.weight
      case ScoreMode.TfIdf =>
        val idf = q.tfIdfLegIdf(Seq(c.rt))
        (if (idf == 0.0) 1.0 else math.max(tf * idf, 1.0)) * c.rt.weight
    }
  }

  /** AND / phrase / near: leapfrog intersection driven by the rarest term
    * (df-ascending driver — token_compare, /root/reference/lib/ii.cpp:10549-10561). */
  private def conjunctive(q: ResolvedQuery, cursors: Array[TermCursor]): Iterator[(Long, Double)] = {
    val order = cursors.sortBy(_.rt.df)
    new Iterator[(Long, Double)] {
      private var nextHit: (Long, Double) = _
      private var done = order.exists(_.exhausted)

      private def findNext(): Unit = {
        nextHit = null
        while (nextHit == null && !done) {
          val target = order(0).doc
          var aligned = true
          var i = 1
          while (i < order.length && aligned) {
            order(i).advanceTo(target)
            if (order(i).exhausted) { done = true; return }
            if (order(i).doc != target) {
              order(0).advanceTo(order(i).doc)
              if (order(0).exhausted) { done = true; return }
              aligned = false
            }
            i += 1
          }
          if (aligned) {
            val s = matchedScore(q, order, target)
            if (s.isDefined) nextHit = (target, s.get)
            order(0).next()
            if (order(0).exhausted) done = true
          }
        }
      }

      findNext()
      def hasNext: Boolean = nextHit != null
      def next(): (Long, Double) = {
        val h = nextHit; findNext(); h
      }
    }
  }

  /** score a doc where all cursors are aligned; applies phrase/near position
    * checks. Returns None if position constraints reject the doc. */
  private def matchedScore(
      q: ResolvedQuery, aligned: Array[TermCursor], doc: Long): Option[Double] = {
    q.mode match {
      case MatchMode.All =>
        var s = 0.0
        var i = 0
        while (i < aligned.length) { s += score1(q, aligned(i)); i += 1 }
        Some(s)
      case MatchMode.Phrase =>
        // occurrences where every term appears at base + (qpos_i - qpos_0),
        // within the same section (positions restart per section; a phrase
        // never crosses a section boundary — EXACT phrase check,
        // /root/reference/lib/ii.cpp:13538-13605)
        val base = aligned.minBy(_.rt.qpos)
        val others = aligned.filter(_ ne base)
        val otherBySid: Array[Map[Int, Array[Int]]] =
          others.map(_.groupPositions.toMap)
        var weighted = 0.0
        var anyOcc = false
        for ((sid, basePos) <- base.groupPositions) {
          var sectionOk = true
          val oPos = new Array[Array[Int]](others.length)
          var j = 0
          while (j < others.length && sectionOk) {
            otherBySid(j).get(sid) match {
              case Some(p) => oPos(j) = p
              case None => sectionOk = false
            }
            j += 1
          }
          if (sectionOk) {
            var occ = 0
            var x = 0
            while (x < basePos.length) {
              val p0 = basePos(x)
              var ok = true
              j = 0
              while (j < others.length && ok) {
                val want = p0 + (others(j).rt.qpos - base.rt.qpos)
                ok = java.util.Arrays.binarySearch(oPos(j), want) >= 0
                j += 1
              }
              if (ok) occ += 1
              x += 1
            }
            if (occ > 0) { anyOcc = true; weighted += occ * q.sectionWeight(sid) }
          }
        }
        if (!anyOcc) None
        else Some(q.score match {
          case ScoreMode.Tf => weighted
          case ScoreMode.Bm25(k1, b) =>
            // phrase scored as a unit: idf of the rarest member term
            val idf = aligned.map(_.rt.idf).max
            idf * Bm25.weight(weighted, base.dl.toDouble, q.avgdl, k1, b)
          case ScoreMode.TfAtMost(max) => math.min(weighted, max)
          case ScoreMode.TfIdf =>
            val idf = q.tfIdfLegIdf(aligned.map(_.rt).toSeq)
            if (idf == 0.0) 1.0 else math.max(weighted * idf, 1.0)
        })
      case MatchMode.Near(maxInterval) =>
        // minimal window over all terms' positions within maxInterval,
        // evaluated per shared section (GRN_OP_NEAR,
        // /root/reference/lib/ii.cpp:13383-13533)
        val perCursor: Array[Map[Int, Array[Int]]] =
          aligned.map(_.groupPositions.toMap)
        val sharedSids = perCursor.map(_.keySet).reduce(_ intersect _)
        val ok = sharedSids.exists { sid =>
          minWindow(perCursor.map(_(sid))) <= maxInterval
        }
        if (ok) {
          var s = 0.0
          var i = 0
          while (i < aligned.length) { s += score1(q, aligned(i)); i += 1 }
          Some(s)
        } else None
      case MatchMode.NearPhrase(maxInterval, ordered) =>
        // compose phrase groups: each group matches like Phrase, yielding
        // start positions; groups' starts must fit within maxInterval (and
        // ascend in query order for the ordered variant), within ONE section
        val pids = aligned.map(_.rt.phraseId).distinct.sorted
        val groups = pids.map(pid => aligned.filter(_.rt.phraseId == pid))
        val perPhraseBySid: Array[Map[Int, Array[Int]]] = groups.map(phraseStartsBySid)
        val sharedSids = perPhraseBySid.map(_.keySet)
          .foldLeft(null: Set[Int])((a, b) => if (a == null) b else a intersect b)
        if (sharedSids == null || sharedSids.isEmpty) None
        else {
          val okSid = sharedSids.exists { sid =>
            val starts = perPhraseBySid.map(_(sid))
            if (ordered) orderedWindowExists(starts, maxInterval)
            else minWindow(starts) <= maxInterval
          }
          if (!okSid) None
          else {
            // score = Σ phrase occurrences x section weight (TF semantics)
            var s = 0.0
            perPhraseBySid.foreach(_.foreach { case (sid, st) =>
              s += st.length * q.sectionWeight(sid)
            })
            Some(q.score match {
              case ScoreMode.Tf => s
              case ScoreMode.Bm25(k1, b) =>
                val idf = aligned.map(_.rt.idf).max
                idf * Bm25.weight(s, aligned(0).dl.toDouble, q.avgdl, k1, b)
              case ScoreMode.TfAtMost(max) => math.min(s, max)
              case ScoreMode.TfIdf =>
                val idf = q.tfIdfLegIdf(aligned.map(_.rt).toSeq)
                if (idf == 0.0) 1.0 else math.max(s * idf, 1.0)
            })
          }
        }
      case _ => Some(0.0)
    }
  }

  /** NEAR_PHRASE_PRODUCT: doc-at-a-time walk (a group matches via ANY of
    * its alternatives, so the conjunctive all-terms gate does not apply);
    * per group, starts = union over fully-aligned alternatives. */
  private def productMatch(q: ResolvedQuery, cursors0: Array[TermCursor],
      maxInterval: Int, ordered: Boolean): Iterator[(Long, Double)] = {
    val live0 = mutable.ArrayBuffer(cursors0.filterNot(_.exhausted).toSeq: _*)
    if (live0.isEmpty) return Iterator.empty
    // how many terms each (group, alternative) needs aligned
    val expected: Map[(Int, Int), Int] =
      q.terms.groupBy(t => (t.phraseId, t.altId)).map { case (k, v) => k -> v.length }
    val groupIds = q.terms.map(_.phraseId).distinct.sorted
    // streaming doc-at-a-time walk (no per-bucket result buffer)
    new Iterator[(Long, Double)] {
      private val live = live0
      private var pending: (Long, Double) = _
      private def advance(): Unit = {
        pending = null
        while (pending == null && live.nonEmpty) {
          var minDoc = Long.MaxValue
          live.foreach(c => if (c.doc < minDoc) minDoc = c.doc)
          val aligned = live.filter(_.doc == minDoc).toArray
          // group -> sid -> union of alternative starts
          val groupStarts: Array[Map[Int, Array[Int]]] = groupIds.map { g =>
            val bySid = new mutable.HashMap[Int, mutable.ArrayBuffer[Int]]()
            aligned.filter(_.rt.phraseId == g).groupBy(_.rt.altId).foreach { case (a, cs) =>
              if (cs.length == expected((g, a)))
                phraseStartsBySid(cs).foreach { case (sid, st) =>
                  bySid.getOrElseUpdate(sid, new mutable.ArrayBuffer[Int]()) ++= st
                }
            }
            bySid.map { case (sid, buf) => sid -> buf.distinct.sorted.toArray }.toMap
          }
          if (groupStarts.forall(_.nonEmpty)) {
            val sharedSids = groupStarts.map(_.keySet).reduce(_ intersect _)
            val okSid = sharedSids.exists { sid =>
              val starts = groupStarts.map(_(sid))
              if (ordered) orderedWindowExists(starts, maxInterval)
              else minWindow(starts) <= maxInterval
            }
            if (okSid) {
              var s = 0.0
              groupStarts.foreach(_.foreach { case (sid, st) =>
                s += st.length * q.sectionWeight(sid)
              })
              val score = q.score match {
                case ScoreMode.Tf => s
                case ScoreMode.Bm25(k1, b) =>
                  val idf = aligned.map(_.rt.idf).max
                  idf * Bm25.weight(s, aligned(0).dl.toDouble, q.avgdl, k1, b)
                case ScoreMode.TfAtMost(max) => math.min(s, max)
                case ScoreMode.TfIdf =>
                  val idf = q.tfIdfLegIdf(aligned.map(_.rt).toSeq)
                  if (idf == 0.0) 1.0 else math.max(s * idf, 1.0)
              }
              pending = (minDoc, score)
            }
          }
          aligned.foreach(_.next())
          live.filterInPlace(!_.exhausted)
        }
      }
      advance()
      override def hasNext: Boolean = pending != null
      override def next(): (Long, Double) = { val r = pending; advance(); r }
    }
  }

  /** one phrase group's occurrence START positions per section: position p
    * counts iff every member term of the group occurs at p + (qpos - min
    * qpos). A single-term group's starts are just its positions. */
  private def phraseStartsBySid(group: Array[TermCursor]): Map[Int, Array[Int]] = {
    val base = group.minBy(_.rt.qpos)
    val others = group.filter(_ ne base)
    val otherBySid = others.map(_.groupPositions.toMap)
    val out = Map.newBuilder[Int, Array[Int]]
    for ((sid, basePos) <- base.groupPositions) {
      var sectionOk = true
      val oPos = new Array[Array[Int]](others.length)
      var j = 0
      while (j < others.length && sectionOk) {
        otherBySid(j).get(sid) match {
          case Some(p) => oPos(j) = p
          case None => sectionOk = false
        }
        j += 1
      }
      if (sectionOk) {
        val starts = basePos.filter { p0 =>
          var ok = true
          var i = 0
          while (i < others.length && ok) {
            ok = java.util.Arrays.binarySearch(
              oPos(i), p0 + (others(i).rt.qpos - base.rt.qpos)) >= 0
            i += 1
          }
          ok
        }
        if (starts.nonEmpty) out += sid -> starts
      }
    }
    out.result()
  }

  /** exists s_0 < s_1 < ... (one start per list, ascending in list order)
    * with s_last - s_0 <= maxInterval; greedy chain per anchor is optimal */
  private def orderedWindowExists(starts: Array[Array[Int]], maxInterval: Int): Boolean =
    starts(0).exists { s0 =>
      var prev = s0
      var ok = true
      var i = 1
      while (i < starts.length && ok) {
        val arr = starts(i)
        // first element strictly greater than prev
        var lo = 0
        var hi = arr.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (arr(mid) <= prev) lo = mid + 1 else hi = mid
        }
        if (lo >= arr.length) ok = false else prev = arr(lo)
        i += 1
      }
      ok && prev - s0 <= maxInterval
    }

  /** smallest (max - min) over one position picked from each list */
  private def minWindow(lists: Array[Array[Int]]): Int = {
    var best = Int.MaxValue
    val idx = new Array[Int](lists.length)
    var run = true
    while (run) {
      var minV = Int.MaxValue; var maxV = Int.MinValue; var minI = -1
      var i = 0
      while (i < lists.length) {
        val v = lists(i)(idx(i))
        if (v < minV) { minV = v; minI = i }
        if (v > maxV) maxV = v
        i += 1
      }
      if (maxV - minV < best) best = maxV - minV
      idx(minI) += 1
      if (idx(minI) >= lists(minI).length) run = false
    }
    best
  }

  /** OR / quorum: k-way docId merge; Block-Max WAND pruning kicks in for
    * BM25 top-k (rank-identical — bound is provably >= any score in block). */
  private def disjunctive(
      q: ResolvedQuery, cursors0: Array[TermCursor], minMatch: Int): Iterator[(Long, Double)] = {
    val cursors = cursors0.filterNot(_.exhausted)
    if (cursors.isEmpty || cursors.length < minMatch) return Iterator.empty
    // every ScoreMode has a sound per-block bound (initBounds), so WAND
    // serves all of them — sectioned indexes included since v2 blocks carry
    // max_gtf (the group-summed tf bound). Excluded: legacy v1 blocks
    // (max_gtf = -1 sentinel) and negative section weights (a negative
    // weight breaks the maxW·max_gtf upper-bound argument).
    val useWand = q.topK > 0 && minMatch == 1 &&
      q.sectionWeights.forall(_ >= 0.0) && cursors.forall(_.hasGroupBounds)
    if (useWand) return wand(q, cursors)
    // streaming k-way merge: one (doc, score) produced per pull, so a
    // head-term OR over a wide bucket holds no per-bucket buffer
    new Iterator[(Long, Double)] {
      private val live = mutable.ArrayBuffer(cursors: _*)
      private var pending: (Long, Double) = _
      private def advance(): Unit = {
        pending = null
        while (pending == null && live.nonEmpty) {
          var minDoc = Long.MaxValue
          var i = 0
          while (i < live.length) {
            if (live(i).doc < minDoc) minDoc = live(i).doc
            i += 1
          }
          var s = 0.0
          var nMatched = 0
          i = 0
          while (i < live.length) {
            if (live(i).doc == minDoc) {
              s += score1(q, live(i)); nMatched += 1
              live(i).next()
            }
            i += 1
          }
          live.filterInPlace(!_.exhausted)
          if (nMatched >= minMatch) pending = (minDoc, s)
        }
      }
      advance()
      override def hasNext: Boolean = pending != null
      override def next(): (Long, Double) = { val r = pending; advance(); r }
    }
  }

  /** PriorityQueue ordering whose max (= head, dequeued first) is the WORST
    * entry of a top-k: smallest score, ties -> largest docId. */
  private val evictOrder: Ordering[(Double, Long)] = (a: (Double, Long), b: (Double, Long)) => {
    val c = java.lang.Double.compare(b._1, a._1)
    if (c != 0) c else java.lang.Long.compare(a._2, b._2)
  }

  /** Block-Max WAND (Ding & Suel 2011) over this bucket.
    *
    * Rank-safety invariants:
    *  - pivot selection and the no-pivot early exit sum LIST-remaining
    *    bounds (TermCursor.remainingUpperBound = suffix max over remaining
    *    blocks), which dominate every posting any cursor can still emit;
    *  - the current-block bound is used only for the secondary check on an
    *    aligned pivot doc, and the resulting skip is capped both at the
    *    aligned cursors' nearest block boundary AND at the next cursor's
    *    doc — docs inside the skipped range are contained only in the
    *    aligned cursors' current blocks, whose bound sum failed the
    *    threshold.
    * groonga's grn_ii_select scores every match (lib/ii.cpp:13694) — this
    * must return the identical top-k (IndexSpec rank-identity tests,
    * including the multi-block skewed-tf one).
    */
  private def wand(q: ResolvedQuery, cursors: Array[TermCursor]): Iterator[(Long, Double)] = {
    val k = q.topK
    cursors.foreach(_.initBounds(q))
    // min-heap of (score, docId): worst of the current top-k on top.
    val heap = mutable.PriorityQueue.empty[(Double, Long)](evictOrder)
    def threshold: Double = if (heap.size < k) Double.NegativeInfinity else heap.head._1
    val live = mutable.ArrayBuffer(cursors: _*)

    while (live.nonEmpty) {
      val sorted = live.sortBy(_.doc)
      var ubSum = 0.0
      var pivot = -1
      val t = threshold
      var i = 0
      while (i < sorted.length && pivot < 0) {
        ubSum += sorted(i).remainingUpperBound
        if (ubSum > t) pivot = i
        i += 1
      }
      if (pivot < 0) return heapResults(heap) // suffix bounds cover all remaining postings
      val pivotDoc = sorted(pivot).doc
      if (sorted(0).doc == pivotDoc) {
        // group = every cursor positioned exactly on pivotDoc
        var g = 0
        while (g < sorted.length && sorted(g).doc == pivotDoc) g += 1
        // secondary BMW check with true per-block maxima
        var blockSum = 0.0
        var j = 0
        while (j < g) { blockSum += sorted(j).currentBlockUpperBound; j += 1 }
        if (blockSum > t) {
          // fully evaluate pivotDoc across the aligned group
          var s = 0.0
          j = 0
          while (j < g) { s += score1(q, sorted(j)); sorted(j).next(); j += 1 }
          if (heap.size < k) heap.enqueue((s, pivotDoc))
          else if (s > heap.head._1) { heap.dequeue(); heap.enqueue((s, pivotDoc)) }
        } else {
          // skip: docs up to min(group block boundary, next cursor's doc)
          // are scored only by the group's current blocks, whose bound sum
          // failed the threshold
          var d = Long.MaxValue
          j = 0
          while (j < g) {
            val m = sorted(j).currentBlockMaxDoc
            if (m < d) d = m
            j += 1
          }
          val nextDoc = if (g < sorted.length) sorted(g).doc else Long.MaxValue
          val target = math.max(pivotDoc + 1, math.min(safeInc(d), nextDoc))
          j = 0
          while (j < g) { sorted(j).advanceTo(target); j += 1 }
        }
        live.filterInPlace(!_.exhausted)
      } else {
        // advance the leading cursors to the pivot
        var j = 0
        while (j < pivot) { sorted(j).advanceTo(pivotDoc); j += 1 }
        live.filterInPlace(!_.exhausted)
      }
    }
    heapResults(heap)
  }

  private def safeInc(x: Long): Long = if (x == Long.MaxValue) x else x + 1

  private def heapResults(heap: mutable.PriorityQueue[(Double, Long)]): Iterator[(Long, Double)] =
    heap.toArray.iterator.map { case (s, d) => (d, s) }

  /** exact streaming top-k over ascending-docId matches (ties -> earlier doc) */
  private def topK(it: Iterator[(Long, Double)], k: Int): Iterator[(Long, Double)] = {
    val heap = mutable.PriorityQueue.empty[(Double, Long)](evictOrder)
    it.foreach { case (d, s) =>
      if (heap.size < k) heap.enqueue((s, d))
      else if (s > heap.head._1) { heap.dequeue(); heap.enqueue((s, d)) }
    }
    heapResults(heap)
  }
}
