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
    positions: Array[Int])

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
    min_dl: Int,
    payload: Array[Byte])

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
    segments: Seq[String])

final case class IndexConfig(
    tokenizer: String = "TokenBigram",
    withPositions: Boolean = true,
    blockSize: Int = 128,
    /** bucket = docId >> bucketBits; pick so that one bucket's docs fit an
      * executor task comfortably (2^20 docs default). */
    bucketBits: Int = 20,
    numPartitions: Int = 0)
