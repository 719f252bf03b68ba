package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec._

class CodecSpec extends AnyFunSuite {

  test("varbyte roundtrip") {
    val w = new ByteWriter()
    val vals = Seq(0L, 1L, 127L, 128L, 300L, 1L << 20, Long.MaxValue)
    vals.foreach(w.writeVarLong)
    val r = new ByteReader(w.result())
    vals.foreach(v => assert(r.readVarLong() == v))
    assert(r.remaining == 0)
  }

  test("bitpack roundtrip all widths") {
    for (bits <- 0 to 64) {
      val max = if (bits == 64) Long.MaxValue else (1L << bits) - 1
      val vals = Array(0L, max, max / 2, 1L.min(max), max).map(_ & max)
      val w = new ByteWriter()
      BitPack.pack(vals, 0, vals.length, bits, w)
      val out = new Array[Long](vals.length)
      BitPack.unpack(new ByteReader(w.result()), vals.length, bits, out, 0)
      assert(out.toSeq == vals.toSeq, s"width $bits")
    }
  }

  /** deterministic pseudo-random posting fixtures (seeded) */
  private def randomPostings(seed: Int): (Array[Long], Array[Int], Array[Int]) = {
    val rnd = new scala.util.Random(seed)
    val n = 1 + rnd.nextInt(400)
    val docIds = new Array[Long](n)
    var d = 10L
    for (i <- 0 until n) { d += 1 + rnd.nextInt(5000); docIds(i) = d }
    val tfs = Array.fill(n)(1 + rnd.nextInt(8))
    val dls = Array.fill(n)(1 + rnd.nextInt(500))
    (docIds, tfs, dls)
  }

  test("posting block roundtrip without positions (100 seeded cases)") {
    for (seed <- 0 until 100) {
      val (docIds, tfs, dls) = randomPostings(seed)
      val bytes = PostingCodec.encode(docIds, tfs, dls, null)
      val d = PostingCodec.decode(bytes)
      assert(d.docIds.toSeq == docIds.toSeq, s"seed $seed")
      assert(d.tfs.toSeq == tfs.toSeq, s"seed $seed")
      assert(d.dls.toSeq == dls.toSeq, s"seed $seed")
      assert(d.positions.isEmpty)
    }
  }

  test("posting block roundtrip with positions (100 seeded cases)") {
    for (seed <- 100 until 200) {
      val (docIds, tfs, dls) = randomPostings(seed)
      val rnd = new scala.util.Random(seed)
      val positions = tfs.map { tf =>
        val out = new Array[Int](tf)
        var p = -1
        for (j <- 0 until tf) { p += 1 + rnd.nextInt(50); out(j) = p }
        out
      }
      val bytes = PostingCodec.encode(docIds, tfs, dls, positions)
      val d = PostingCodec.decode(bytes)
      assert(d.docIds.toSeq == docIds.toSeq, s"seed $seed")
      assert(d.tfs.toSeq == tfs.toSeq, s"seed $seed")
      var off = 0
      for (i <- docIds.indices) {
        assert(d.positions.slice(off, off + tfs(i)).toSeq == positions(i).toSeq,
          s"seed $seed doc $i")
        off += tfs(i)
      }
    }
  }

  test("sectioned block roundtrip with positions (100 seeded cases)") {
    for (seed <- 200 until 300) {
      val rnd = new scala.util.Random(seed)
      val nDocs = 1 + rnd.nextInt(60)
      // (doc, sid) ascending, 1..3 sections per doc, docId gaps up to 1000
      val docs = scala.collection.mutable.ArrayBuffer.empty[Long]
      val sids = scala.collection.mutable.ArrayBuffer.empty[Int]
      var doc = rnd.nextInt(1000).toLong
      for (_ <- 0 until nDocs) {
        val nSec = 1 + rnd.nextInt(3)
        val secIds = rnd.shuffle((1 to 5).toList).take(nSec).sorted
        secIds.foreach { s => docs += doc; sids += s }
        doc += 1 + rnd.nextInt(1000)
      }
      val n = docs.length
      val tfs = Array.fill(n)(1 + rnd.nextInt(7))
      val dls = Array.fill(n)(1 + rnd.nextInt(300))
      val positions = tfs.map { tf =>
        val out = new Array[Int](tf)
        var p = -1
        for (j <- 0 until tf) { p += 1 + rnd.nextInt(50); out(j) = p }
        out
      }
      val bytes = PostingCodec.encode(docs.toArray, tfs, dls, positions, sids.toArray)
      val d = PostingCodec.decode(bytes)
      assert(d.docIds.toSeq == docs.toSeq, s"seed $seed")
      assert(d.sids.toSeq == sids.toSeq, s"seed $seed")
      assert(d.tfs.toSeq == tfs.toSeq, s"seed $seed")
      assert(d.dls.toSeq == dls.toSeq, s"seed $seed")
      var off = 0
      for (i <- 0 until n) {
        assert(d.positions.slice(off, off + tfs(i)).toSeq == positions(i).toSeq,
          s"seed $seed posting $i")
        off += tfs(i)
      }
    }
  }

  test("dense blocks use bit-packed doc deltas and stay compact") {
    val n = 128
    val docIds = Array.tabulate(n)(i => 1000L + i * 3)
    val tfs = Array.fill(n)(1)
    val dls = Array.fill(n)(100)
    val bytes = PostingCodec.encode(docIds, tfs, dls, null)
    assert((bytes(0) & PostingCodec.FlagPackedDocs) != 0)
    // 127 deltas of 2 bits ~= 32 bytes; varbyte tf+dl = 256; header few bytes
    assert(bytes.length < 320, s"got ${bytes.length}")
    val d = PostingCodec.decode(bytes)
    assert(d.docIds.toSeq == docIds.toSeq)
  }

  test("strictly ascending docIds enforced") {
    intercept[IllegalArgumentException] {
      PostingCodec.encode(Array(5L, 5L), Array(1, 1), Array(1, 1), null)
    }
  }
}
