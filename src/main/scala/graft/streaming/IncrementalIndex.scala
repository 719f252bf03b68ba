package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.index._

/** Incremental index maintenance: new documents land as additional
  * SEGMENTS; readers union segments (docIds are append-only, so segment doc
  * ranges stay disjoint and posting streams stay ordered).
  *
  * Semantic counterpart of the reference's incremental update
  * (grn_ii_update_one, /root/reference/lib/grn_ii.h:155: buffers take
  * mutations, immutable chunks hold bulk — here: small appended segments
  * play the buffer role, `compact` folds them into a new base like the
  * buffer->chunk merges of lib/ii.cpp:3300-7900).
  */
object IncrementalIndex {

  /** Append `docs` as a new segment of a committed index; returns the
    * updated handle. DocIds MUST exceed all existing docIds (append-only). */
  def appendSegment(
      spark: SparkSession,
      indexPath: String,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      segmentName: String,
      cfg: IndexConfig = IndexConfig()): GraftIndex = {
    val fs = SegmentCatalog.fileSystem(spark, indexPath)
    require(SegmentCatalog.isCommitted(fs, indexPath),
      s"append requires a committed base index at $indexPath")
    val base = SegmentCatalog.readMeta(fs, indexPath)

    val segPath = s"$indexPath/$segmentName"
    // a sectioned base appends with the SAME section columns (docs must
    // expose them); single-column bases use textCol
    val textCols = if (base.sections.nonEmpty) base.sections else Seq(textCol)
    val seg = IndexBuilder.buildSectioned(spark, docs, idCol, textCols, segPath,
      cfg.copy(tokenizer = base.tokenizer, withPositions = base.withPositions))
    val segMeta = seg.meta

    val oldSegs =
      if (base.segments.isEmpty ||
        base.segments.exists(s => s == "postings" || s == "terms" || s == "docs")) Seq(".")
      else base.segments
    val nDocs = base.nDocs + segMeta.nDocs
    val totalTokens = base.avgdl * base.nDocs + segMeta.avgdl * segMeta.nDocs
    val merged = base.copy(
      nDocs = nDocs,
      avgdl = if (nDocs == 0) 0.0 else totalTokens / nDocs,
      totalPostings = base.totalPostings + segMeta.totalPostings,
      totalPayloadBytes = base.totalPayloadBytes + segMeta.totalPayloadBytes,
      segments = oldSegs :+ segmentName)
    SegmentCatalog.commit(fs, indexPath, merged,
      Map("appendedSegment" -> segmentName))
    GraftIndex(spark, indexPath)
  }

  /** Structured-Streaming ingestion front: micro-batches from a streaming
    * DataFrame are appended as segments (one per non-empty batch).
    * `Trigger.AvailableNow` drains a directory batch-style. */
  def streamAppend(
      spark: SparkSession,
      stream: DataFrame,
      indexPath: String,
      idCol: String,
      textCol: String,
      checkpoint: String,
      cfg: IndexConfig = IndexConfig()): Unit = {
    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          appendSegment(spark, indexPath, batch, idCol, textCol,
            f"seg-$batchId%05d", cfg)
          ()
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Fold all segments into a fresh base index. Posting blocks already have
    * the run layout, so compaction is: union block rows -> shuffle by
    * (term, bucket) -> merge/re-chunk -> new base (no re-tokenization). */
  def compact(spark: SparkSession, indexPath: String, cfg: IndexConfig = IndexConfig()): GraftIndex = {
    import spark.implicits._
    val fs = SegmentCatalog.fileSystem(spark, indexPath)
    val idx = GraftIndex(spark, indexPath)
    val meta = idx.meta
    val shufflePartitions = if (cfg.numPartitions > 0) cfg.numPartitions
      else spark.sessionState.conf.numShufflePartitions

    val tmp = s"$indexPath/_compact"
    fs.delete(new Path(tmp), true)
    // posting blocks are runs: re-merge across segments
    idx.postings.as[PostingBlockRow]
      .map(b => PostingRunRow(b.term, b.bucket, b.min_doc, b.max_doc, b.cnt,
        b.max_tf, b.min_dl, b.tf_sum, b.payload))
      .repartition(shufflePartitions, $"term", $"bucket")
      .sortWithinPartitions($"term", $"bucket", $"min_doc")
      .mapPartitions(IndexBuilder.mergeRuns(cfg.copy(
        withPositions = meta.withPositions, blockSize = meta.blockSize),
        sectioned = meta.sections.nonEmpty))
      .write.mode("overwrite").parquet(s"$tmp/postings")
    spark.read.parquet(s"$tmp/postings")
      .groupBy($"term")
      .agg(sum($"cnt").as("df"), sum($"tf_sum").as("total_tf"),
        max($"max_tf").cast("int").as("max_tf"))
      .repartition(math.max(1, shufflePartitions / 4))
      .sortWithinPartitions($"term")
      .write.mode("overwrite").parquet(s"$tmp/terms")
    idx.docs.write.mode("overwrite").parquet(s"$tmp/docs")

    // swap: move compacted tables into place, drop old segments
    val oldSegs = meta.segments.filterNot(_ == ".")
    Seq("postings", "terms", "docs").foreach { t =>
      fs.delete(new Path(s"$indexPath/$t"), true)
      fs.rename(new Path(s"$tmp/$t"), new Path(s"$indexPath/$t"))
    }
    fs.delete(new Path(tmp), true)
    SegmentCatalog.commit(fs, indexPath,
      meta.copy(segments = Seq(".")), Map("compacted" -> "true"))
    oldSegs.foreach(s => fs.delete(new Path(s"$indexPath/$s"), true))
    GraftIndex(spark, indexPath)
  }
}
