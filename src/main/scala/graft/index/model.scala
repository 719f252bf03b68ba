package graft.index

/** One (doc, term) occurrence row produced by the tokenize stage.
  * `bucket` = docId >> bucketBits — the docId-range salt that splits a head
  * term's postings across partitions while preserving global docId order
  * (bucket-major). This is the explicit skew handling the single-node
  * reference does not need (cf. head-term skew discussion,
  * /root/reference/lib/ii.cpp:1262-1284 n-gram frequency commentary).
  */
final case class DocTermRow(
    term: String,
    bucket: Int,
    doc_id: Long,
    tf: Int,
    dl: Int,
    /** per-doc position deltas, varbyte-encoded at the map side — the
      * shuffle carries compact bytes and the blockifier appends them to the
      * block payload verbatim (no decode/re-encode on the reduce side) */
    pos_bytes: Array[Byte])

/** A map-side partial posting run: all of one (term, bucket)'s postings seen
  * by one map task between spills, already doc-ordered and block-encoded.
  * The shuffle moves ~vocab x tasks runs instead of one row per (doc, term)
  * — the Spark translation of the reference builder's sorted spill blocks
  * (grn_ii_builder block spill at 0x4000000 values,
  * /root/reference/lib/ii.cpp:15461-15479, 18691-18699).
  */
final case class PostingRunRow(
    term: String,
    bucket: Int,
    min_doc: Long,
    max_doc: Long,
    cnt: Int,
    max_tf: Int,
    /** max over doc GROUPS of the section-summed tf (= max_tf when the run
      * is sid-less — every group is one posting) */
    max_gtf: Int,
    min_dl: Int,
    tf_sum: Long,
    payload: Array[Byte])

/** One encoded posting block — a row of the postings table. Parquet min/max
  * column stats on (term, bucket, min_doc, max_doc) are our skip pointers
  * (role of the chunk dgap headers, /root/reference/lib/ii.cpp:16200-16219);
  * (max_tf, min_dl) are the Block-Max WAND score-bound inputs.
  */
final case class PostingBlockRow(
    term: String,
    bucket: Int,
    blk: Int,
    min_doc: Long,
    max_doc: Long,
    cnt: Int,
    max_tf: Int,
    /** max over the block's doc GROUPS of the section-summed tf. For a
      * sid-less block every group is one posting, so max_gtf == max_tf; for
      * a sectioned block it is the input that makes Block-Max WAND sound
      * (a doc's aggregated score uses the SUM of its per-section tfs, which
      * can exceed the per-posting max_tf). -1 = unknown (block written by a
      * pre-v2 build) — the kernel then skips WAND pruning for safety. */
    max_gtf: Int,
    min_dl: Int,
    tf_sum: Long,
    payload_len: Int,
    payload: Array[Byte],
    /** segment ordinal, assigned at READ time from the manifest's segment
      * order (0 = base). Tombstones of generation g cover postings with
      * seg_ord < g, which is what lets an upsert re-add a live doc id
      * while its old postings stay dead (grn_ii_update_one semantics,
      * /root/reference/lib/grn_ii.h:155). */
    seg_ord: Int = 0)

final case class TermStatRow(term: String, df: Long, total_tf: Long, max_tf: Int)

final case class DocStatRow(doc_id: Long, dl: Int)

/** Index-wide constants persisted in the manifest. */
final case class IndexMeta(
    formatVersion: Int,
    tokenizer: String,
    withPositions: Boolean,
    blockSize: Int,
    bucketBits: Int,
    nDocs: Long,
    avgdl: Double,
    totalPostings: Long,
    totalPayloadBytes: Long,
    segments: Seq[String],
    /** indexed column names in sid order (sid = position + 1); empty for a
      * single-column index (no sid stream in the postings) — the Spark
      * counterpart of groonga's WITH_SECTION multi-column index
      * (/root/reference/include/groonga/groonga.h:777) */
    sections: Seq[String] = Nil,
    /** tombstone segment dirs, each holding (doc_id, gen) rows: doc_id is
      * dead in all data segments with seg_ord < gen. Folded away by
      * compact. (delete path of grn_ii_delete_one, lib/grn_ii.h:158) */
    deleteSegments: Seq[String] = Nil,
    /** per-data-segment statistics, aligned by `name` with the NORMALIZED
      * segment list ("." = root base). Persisted at every commit so a
      * reader/compactor gets doc ranges and footprints from ONE manifest
      * read — at 10k+ segments the previous per-file parquet-footer loop
      * was minutes of driver-sequential metadata IO per index open.
      * Empty on legacy manifests: readers fall back to footer stats /
      * a stats job (the reference keeps chunk stats inline in the buffer
      * headers for the same reason, /root/reference/lib/ii.cpp:16200). */
    segStats: Seq[SegStats] = Nil)

/** One data segment's manifest-persisted statistics. `minDoc`/`maxDoc` are
  * the DOCS-table id range (Long.MaxValue/MinValue when empty) — a superset
  * of the postings doc range, so sound for both the id-order-scan
  * ascending-invariant check and tombstone-touch tests. */
final case class SegStats(
    name: String,
    nDocs: Long,
    minDoc: Long,
    maxDoc: Long,
    nPostings: Long,
    payloadBytes: Long)

final case class IndexConfig(
    tokenizer: String = "TokenBigram",
    withPositions: Boolean = true,
    blockSize: Int = 128,
    /** bucket = docId >> bucketBits — the head-term salt. <= 0 means auto:
      * sized so the corpus spreads over ~4 buckets per shuffle partition
      * (a Zipf head term's postings then split across every partition
      * instead of serializing on one reducer). */
    bucketBits: Int = -1,
    numPartitions: Int = 0,
    /** map-side spill threshold in buffered postings (reference analogue:
      * grn_ii_builder block threshold, /root/reference/lib/ii.cpp:15472) */
    spillPostings: Int = 1 << 20,
    /** corpus size hint; when > 0 the builder skips the docs.count() job
      * used to auto-size the bucket salt */
    nDocsHint: Long = 0L) {

  /** resolve auto bucketBits for a corpus of `nDocs` over `partitions` */
  def resolveBucketBits(nDocs: Long, partitions: Int): Int =
    if (bucketBits >= 0) bucketBits
    else {
      val targetBuckets = math.max(1L, 4L * partitions)
      val bucketSize = math.max(1L, nDocs / targetBuckets)
      math.max(0, 63 - java.lang.Long.numberOfLeadingZeros(bucketSize))
    }
}
