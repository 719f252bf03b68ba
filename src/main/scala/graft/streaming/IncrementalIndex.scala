package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.index._
import graft.query.MatchKernel

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
    require(!Set("postings", "terms", "terms_rev", "docs", ".").contains(segmentName) &&
        !segmentName.contains("/"),
      s"segment name '$segmentName' collides with reserved table/dir names")
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
    // segment stats ride the manifest forward: the sub-build's own stats
    // (committed under name ".") take the new segment's name. A legacy base
    // without aligned stats stays legacy (readers fall back) until compact.
    val newStats =
      if (base.segStats.map(_.name) == oldSegs && segMeta.segStats.nonEmpty)
        base.segStats ++ segMeta.segStats.map(_.copy(name = segmentName))
      else Nil
    val merged = base.copy(
      nDocs = nDocs,
      avgdl = if (nDocs == 0) 0.0 else totalTokens / nDocs,
      totalPostings = base.totalPostings + segMeta.totalPostings,
      totalPayloadBytes = base.totalPayloadBytes + segMeta.totalPayloadBytes,
      segments = oldSegs :+ segmentName,
      segStats = newStats)
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

  /** number of data segments (tombstone generations count against it) */
  private def dataSegCount(meta: IndexMeta): Int = {
    val segs =
      if (meta.segments.isEmpty ||
        meta.segments.exists(s => s == "postings" || s == "terms" || s == "docs")) Seq(".")
      else meta.segments
    segs.length
  }

  /** Delete documents: commits a tombstone segment of (doc_id, gen) rows;
    * gen = current data-segment count, so the tombstone covers every
    * EXISTING segment but not segments appended later (that is what lets
    * upsert re-add the same doc id). Readers apply tombstones at posting
    * level; compact folds them away physically
    * (grn_ii_delete_one, /root/reference/lib/grn_ii.h:158). */
  def delete(spark: SparkSession, indexPath: String, docIds: DataFrame,
      idCol: String = "doc_id"): GraftIndex = {
    import spark.implicits._
    val fs = SegmentCatalog.fileSystem(spark, indexPath)
    require(SegmentCatalog.isCommitted(fs, indexPath),
      s"delete requires a committed index at $indexPath")
    val meta = SegmentCatalog.readMeta(fs, indexPath)
    val gen = dataSegCount(meta)
    // name carries the next manifest version: unique across the index's
    // WHOLE history (a count-derived name recycles after a compaction
    // resets the list, which would let an expired snapshot read a
    // recreated dir with different tombstones — see GraftIndex.atVersion)
    val name = f"del-m${SegmentCatalog.nextVersion(fs, indexPath)}%06d"
    val ids = docIds.select(col(idCol).cast("long").as("doc_id")).distinct()
    // corpus stats stay EXACT across deletes: subtract only docs that are
    // currently LIVE (idempotent — GraftIndex.docs already excludes
    // earlier tombstones), so BM25 avgdl/idf don't drift until compact
    val live = GraftIndex(spark, indexPath).docs.join(ids, Seq("doc_id"))
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).as[(Long, Long)].head()
    ids.withColumn("gen", lit(gen))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexPath/$name")
    val newN = meta.nDocs - live._1
    val newAvgdl =
      if (newN <= 0) 0.0
      else (meta.avgdl * meta.nDocs - live._2.toDouble) / newN
    SegmentCatalog.commit(fs, indexPath,
      meta.copy(nDocs = newN, avgdl = newAvgdl,
        deleteSegments = meta.deleteSegments :+ name),
      Map("deleted" -> name))
    GraftIndex(spark, indexPath)
  }

  def delete(spark: SparkSession, indexPath: String, docIds: Seq[Long]): GraftIndex = {
    import spark.implicits._
    delete(spark, indexPath, docIds.toDF("doc_id"))
  }

  /** Upsert (groonga `load` key-merge, /root/reference/lib/load.c:794-1203):
    * tombstone the incoming ids across all existing segments, then append
    * the new versions as a fresh segment. Buckets touched by the upsert pay
    * a decode-merge at query time until the next compact; untouched buckets
    * keep the streaming fast path. Corpus stats (nDocs/avgdl) are exact at
    * commit time, and per-term df/idf are recomputed exactly at resolve
    * time while tombstones exist (GraftIndex.exactTermStats) — so TF and
    * BM25 both match a from-scratch rebuild without waiting for compact. */
  def upsert(
      spark: SparkSession,
      indexPath: String,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      segmentName: String,
      cfg: IndexConfig = IndexConfig()): GraftIndex = {
    delete(spark, indexPath, docs.select(col(idCol)), idCol)
    appendSegment(spark, indexPath, docs, idCol, textCol, segmentName, cfg)
  }

  /** `load` with the reference's full record-merge controls
    * (grn_load_internal, /root/reference/lib/load.c:1844-1955):
    *
    *  - `--each`: an expression applied to every incoming record before
    *    load — here a DataFrame transform (any Column rewrite).
    *  - `--ifexists`: records whose id ALREADY EXISTS are applied only
    *    when the predicate holds over the EXISTING record (columns of
    *    `existing`); failing records are skipped. Brand-new ids always
    *    load.
    *
    * `existing` is the caller's current record table (this engine indexes
    * the caller's storage rather than owning it — SURVEY §1.1). Returns
    * the updated index; the caller applies the same merge to its table. */
  def load(
      spark: SparkSession,
      indexPath: String,
      incoming: DataFrame,
      idCol: String,
      textCol: String,
      segmentName: String,
      existing: DataFrame,
      cfg: IndexConfig = IndexConfig(),
      ifexists: Option[org.apache.spark.sql.Column] = None,
      each: Option[DataFrame => DataFrame] = None): GraftIndex = {
    val prepared = each.map(_(incoming)).getOrElse(incoming)
    val existingIds = existing.select(col(idCol))
    val survivors = ifexists match {
      case None => prepared
      case Some(pred) =>
        // existing ids failing the predicate are dropped from the batch;
        // the anti-join keeps genuinely new ids unconditionally
        val allowedExisting = prepared.join(
          existing.where(pred).select(col(idCol)), Seq(idCol), "left_semi")
        val fresh = prepared.join(existingIds, Seq(idCol), "left_anti")
        allowedExisting.unionByName(fresh)
    }
    if (survivors.isEmpty) GraftIndex(spark, indexPath)
    else {
      // the joins above destroy row order; restore the builder's
      // ascending-unique-ids-per-partition precondition
      val ordered = survivors
        .repartitionByRange(col(idCol)).sortWithinPartitions(col(idCol))
      upsert(spark, indexPath, ordered, idCol, textCol, segmentName, cfg)
    }
  }

  /** Fold all segments AND tombstones into a fresh base. Posting blocks
    * already have the run layout, so compaction is: (tombstone-filter) →
    * union block rows → shuffle by (term, bucket) → merge/re-chunk → new
    * base; no re-tokenization.
    *
    * Crash-atomic: everything is written under a fresh versioned dir
    * (base-vN) and the manifest pointer is flipped in one atomic rename —
    * a crash at any point leaves the previous committed state readable.
    * Old dirs are removed only after the commit. */
  def compact(spark: SparkSession, indexPath: String, cfg: IndexConfig = IndexConfig()): GraftIndex = {
    import spark.implicits._
    val fs = SegmentCatalog.fileSystem(spark, indexPath)
    val idx = GraftIndex(spark, indexPath)
    val meta = idx.meta
    val sectioned = meta.sections.nonEmpty
    val shufflePartitions = if (cfg.numPartitions > 0) cfg.numPartitions
      else spark.sessionState.conf.numShufflePartitions

    // manifest-version-derived: never recycled across the index's history
    // (a count-derived base-vN could be recreated after later compactions,
    // silently invalidating retained snapshots that referenced the old one)
    val dstName = s"base-m${SegmentCatalog.nextVersion(fs, indexPath)}"
    val dst = s"$indexPath/$dstName"
    fs.delete(new Path(dst), true)

    // broadcast tombstones once per executor — embedding the arrays in the
    // flatMap closure would ship them with every task
    val tombBc = spark.sparkContext.broadcast(idx.tombstones)
    val mergeCfg = cfg.copy(withPositions = meta.withPositions, blockSize = meta.blockSize)
    // tombstone-filter each block row, then re-merge across segments
    idx.postings.as[PostingBlockRow]
      .flatMap { b =>
        val (td, tg) = tombBc.value
        val filtered =
          if (td.isEmpty) Some(b)
          else MatchKernel.filterBlocks(Array(b), td, tg)
        filtered.map(f => PostingRunRow(f.term, f.bucket, f.min_doc, f.max_doc,
          f.cnt, f.max_tf, f.max_gtf, f.min_dl, f.tf_sum, f.payload))
      }
      .repartition(shufflePartitions, $"term", $"bucket")
      .sortWithinPartitions($"term", $"bucket", $"min_doc")
      .mapPartitions(IndexBuilder.mergeRuns(mergeCfg, sectioned))
      .write.mode("overwrite").parquet(s"$dst/postings")
    IndexBuilder.writeTermStages(spark, fs, dst, shufflePartitions)
    idx.docs.write.mode("overwrite").parquet(s"$dst/docs") // tombstone-filtered

    // fresh corpus stats (delete/upsert drift folds away here)
    val docStats = spark.read.parquet(s"$dst/docs")
      .agg(count(lit(1)), coalesce(avg($"dl"), lit(0.0)),
        coalesce(min($"doc_id"), lit(Long.MaxValue)),
        coalesce(max($"doc_id"), lit(Long.MinValue)))
      .as[(Long, Double, Long, Long)].head()
    val blockStats = spark.read.parquet(s"$dst/postings")
      .agg(coalesce(sum($"cnt"), lit(0L)), coalesce(sum($"payload_len"), lit(0L)))
      .as[(Long, Long)].head()

    val oldSegDirs = meta.segments.filterNot(s =>
      s == "postings" || s == "terms" || s == "docs" || s == ".")
    val hadRootBase = meta.segments.isEmpty || meta.segments.exists(s =>
      s == "postings" || s == "terms" || s == "docs") || meta.segments.contains(".")

    // COMMIT: atomic manifest pointer flip to the new versioned base
    SegmentCatalog.commit(fs, indexPath,
      meta.copy(
        // compact re-derives every block (incl. max_gtf), so the artifact
        // is current-format even if the input base predated it
        formatVersion = IndexBuilder.CurrentFormatVersion,
        nDocs = docStats._1,
        avgdl = docStats._2,
        totalPostings = blockStats._1,
        totalPayloadBytes = blockStats._2,
        segments = Seq(dstName),
        deleteSegments = Nil,
        segStats = Seq(SegStats(dstName, docStats._1, docStats._3, docStats._4,
          blockStats._1, blockStats._2))),
      Map("compacted" -> dstName))

    // cleanup after commit (crash here only leaves unreferenced garbage)
    if (hadRootBase)
      Seq("postings", "terms", "terms_rev", "docs")
        .foreach(t => fs.delete(new Path(s"$indexPath/$t"), true))
    oldSegDirs.foreach(s => fs.delete(new Path(s"$indexPath/$s"), true))
    meta.deleteSegments.foreach(s => fs.delete(new Path(s"$indexPath/$s"), true))
    GraftIndex(spark, indexPath)
  }

  private case class SegInfo(stats: SegStats, ord: Int, touched: Boolean) {
    def name: String = stats.name
    def nPostings: Long = stats.nPostings
    def payloadBytes: Long = stats.payloadBytes
  }

  /** LEVELED (partial) compaction — the scale path. `compact` rewrites the
    * whole base; at 100 TB a compaction triggered by a 0.1% tombstone set
    * must NOT re-shuffle 100 TB. This folds only segments that need it —
    * tombstone-touched ones and those below `minKeepPostings` — merging
    * each CONTIGUOUS run of foldable segments into one new segment, and
    * leaves large clean segments byte-untouched (their blocks are already
    * in final form — the builder's lone-run fast path writes the same
    * layout). Contiguity preserves the ascending-disjoint segment doc-range
    * invariant (manifest order == doc order), which the id-order scan fast
    * path and the kernel's streaming cursors rely on.
    *
    * Reference analogue: grn_ii's buffer→chunk merges fold only dirty
    * buffers into chunks, never the whole index
    * (/root/reference/lib/ii.cpp:3300-7900).
    *
    * All tombstones are consumed (a tombstone's segment is by definition
    * touched, hence folded), so the commit drops deleteSegments entirely.
    * Crash-atomic like compact: folds land in fresh `fold-G-K` dirs, the
    * manifest flip is one atomic rename, replaced dirs are deleted after. */
  def compactPartial(
      spark: SparkSession,
      indexPath: String,
      cfg: IndexConfig = IndexConfig(),
      minKeepPostings: Long = 1L << 20): GraftIndex = {
    import spark.implicits._
    val fs = SegmentCatalog.fileSystem(spark, indexPath)
    val idx = GraftIndex(spark, indexPath)
    val meta = idx.meta
    val sectioned = meta.sections.nonEmpty
    val (td, tg) = idx.tombstones
    val shufflePartitions = if (cfg.numPartitions > 0) cfg.numPartitions
      else spark.sessionState.conf.numShufflePartitions

    val segs =
      if (meta.segments.isEmpty ||
        meta.segments.exists(s => s == "postings" || s == "terms" || s == "docs")) Seq(".")
      else meta.segments
    def tableP(s: String, t: String) =
      if (s == ".") s"$indexPath/$t" else s"$indexPath/$s/$t"

    // Per-segment footprint + doc range: straight from the MANIFEST when
    // this index has committed segment stats (zero jobs, zero file IO — the
    // 100-TB path: a 0.1%-tombstone compaction must not pay a metadata scan
    // of every segment first). Legacy manifests without stats pay ONE
    // postings + ONE docs union job (never a per-segment driver loop) and
    // come out of this compaction with stats persisted.
    val baseStats: Seq[SegStats] =
      if (meta.segStats.map(_.name) == segs) meta.segStats
      else {
        val pStats = segs.zipWithIndex.map { case (s, i) =>
          spark.read.parquet(tableP(s, "postings"))
            .select(lit(i).as("ord"), $"cnt", $"payload_len")
        }.reduce(_.unionByName(_))
          .groupBy($"ord")
          .agg(coalesce(sum($"cnt"), lit(0L)), coalesce(sum($"payload_len"), lit(0L)))
          .as[(Int, Long, Long)]
          .collect().map(r => r._1 -> r).toMap
        val dStats = segs.zipWithIndex.map { case (s, i) =>
          spark.read.parquet(tableP(s, "docs")).select(lit(i).as("ord"), $"doc_id")
        }.reduce(_.unionByName(_))
          .groupBy($"ord")
          .agg(count(lit(1)),
            coalesce(min($"doc_id"), lit(Long.MaxValue)),
            coalesce(max($"doc_id"), lit(Long.MinValue)))
          .as[(Int, Long, Long, Long)]
          .collect().map(r => r._1 -> r).toMap
        segs.zipWithIndex.map { case (s, i) =>
          val (_, np, pb) = pStats.getOrElse(i, (i, 0L, 0L))
          val (_, nd, lo, hi) = dStats.getOrElse(i, (i, 0L, Long.MaxValue, Long.MinValue))
          SegStats(s, nd, lo, hi, np, pb)
        }
      }
    val infos: Seq[SegInfo] = baseStats.zipWithIndex.map { case (ss, i) =>
      // touched = some tombstone (doc, gen) has gen > ord and doc in range
      val (lo, hi) = (ss.minDoc, ss.maxDoc)
      var a = {
        var x = 0; var y = td.length
        while (x < y) { val m = (x + y) >>> 1; if (td(m) < lo) x = m + 1 else y = m }
        x
      }
      var hit = false
      while (!hit && a < td.length && td(a) <= hi) { hit = tg(a) > i; a += 1 }
      SegInfo(ss, i, hit)
    }

    // contiguous runs of foldable segments; a run folds if it must (touched
    // tombstones) or if it actually merges something (>= 2 segments)
    def foldableSeg(si: SegInfo) = si.touched || si.nPostings < minKeepPostings
    val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[SegInfo]]
    var cur = Vector.empty[SegInfo]
    infos.foreach { si =>
      if (foldableSeg(si)) cur :+= si
      else { if (cur.nonEmpty) { runs += cur; cur = Vector.empty } }
    }
    if (cur.nonEmpty) runs += cur
    val folds = runs.filter(r => r.exists(_.touched) || r.length >= 2).toSeq
    if (folds.isEmpty && meta.deleteSegments.isEmpty) return idx // nothing to do

    // generation = next manifest version: globally unique fold names (the
    // old max-over-current-segments counter recycled names once folds were
    // themselves folded away — fatal for retained-snapshot validation)
    val gen = SegmentCatalog.nextVersion(fs, indexPath)
    val tombBc = spark.sparkContext.broadcast((td, tg))
    val mergeCfg = cfg.copy(withPositions = meta.withPositions, blockSize = meta.blockSize)

    val foldNames: Map[Int, String] = folds.zipWithIndex.map { case (run, k) =>
      val dstName = s"fold-m$gen-$k"
      val dst = s"$indexPath/$dstName"
      fs.delete(new Path(dst), true)
      val ords = run.map(_.ord)
      // postings of just this run, tombstone-filtered block-wise, re-merged
      idx.postings.where($"seg_ord".isin(ords: _*)).as[PostingBlockRow]
        .flatMap { b =>
          val (d, g) = tombBc.value
          val filtered = if (d.isEmpty) Some(b) else MatchKernel.filterBlocks(Array(b), d, g)
          filtered.map(f => PostingRunRow(f.term, f.bucket, f.min_doc, f.max_doc,
            f.cnt, f.max_tf, f.max_gtf, f.min_dl, f.tf_sum, f.payload))
        }
        .repartition(shufflePartitions, $"term", $"bucket")
        .sortWithinPartitions($"term", $"bucket", $"min_doc")
        .mapPartitions(IndexBuilder.mergeRuns(mergeCfg, sectioned))
        .write.mode("overwrite").parquet(s"$dst/postings")
      IndexBuilder.writeTermStages(spark, fs, dst, shufflePartitions)
      // docs of the run, tombstone-filtered with the run segments' ordinals
      run.map { si =>
        spark.read.parquet(tableP(si.name, "docs"))
          .select($"doc_id", $"dl").withColumn("seg_ord", lit(si.ord))
      }.reduce(_.unionByName(_))
        .flatMap { r =>
          val (d, g) = tombBc.value
          val id = r.getLong(0)
          val j = java.util.Arrays.binarySearch(d, id)
          if (j >= 0 && r.getInt(2) < g(j)) None else Some((id, r.getInt(1)))
        }.toDF("doc_id", "dl")
        .write.mode("overwrite").parquet(s"$dst/docs")
      run.head.ord -> dstName
    }.toMap

    val foldedOrds = folds.flatMap(_.map(_.ord)).toSet
    val newSegments = infos.flatMap { si =>
      if (!foldedOrds.contains(si.ord)) Some(si.name)
      else foldNames.get(si.ord) // fold dir takes the run head's slot
    }

    // exact new totals + full stats for the fold dirs: ONE postings + ONE
    // docs union job across all folds (kept segments keep their measured
    // footprint from the manifest — no IO for them at all)
    val foldDirs = foldNames.values.toSeq
    val foldP = if (foldDirs.isEmpty) Map.empty[String, (Long, Long)] else foldDirs.map { n =>
      spark.read.parquet(s"$indexPath/$n/postings")
        .select(lit(n).as("seg"), $"cnt", $"payload_len")
    }.reduce(_.unionByName(_))
      .groupBy($"seg")
      .agg(coalesce(sum($"cnt"), lit(0L)), coalesce(sum($"payload_len"), lit(0L)))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val foldD = if (foldDirs.isEmpty) Map.empty[String, (Long, Long, Long)] else foldDirs.map { n =>
      spark.read.parquet(s"$indexPath/$n/docs").select(lit(n).as("seg"), $"doc_id")
    }.reduce(_.unionByName(_))
      .groupBy($"seg")
      .agg(count(lit(1)),
        coalesce(min($"doc_id"), lit(Long.MaxValue)),
        coalesce(max($"doc_id"), lit(Long.MinValue)))
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val foldStatsByName: Map[String, SegStats] = foldDirs.map { n =>
      val (np, pb) = foldP.getOrElse(n, (0L, 0L))
      val (nd, lo, hi) = foldD.getOrElse(n, (0L, Long.MaxValue, Long.MinValue))
      n -> SegStats(n, nd, lo, hi, np, pb)
    }.toMap
    val kept = infos.filterNot(si => foldedOrds.contains(si.ord))
    val totalPostings = kept.map(_.nPostings).sum + foldStatsByName.values.map(_.nPostings).sum
    val totalPayload = kept.map(_.payloadBytes).sum + foldStatsByName.values.map(_.payloadBytes).sum
    // manifest stats for the new segment list, in order (kept stats ride
    // through untouched; fold dirs take the run head's slot)
    val newSegStats = infos.flatMap { si =>
      if (!foldedOrds.contains(si.ord)) Some(si.stats)
      else foldNames.get(si.ord).map(foldStatsByName)
    }

    // COMMIT (atomic manifest flip); nDocs/avgdl are already exact through
    // mutations, tombstones are now folded away physically. The format
    // version only advances when EVERY segment was re-derived (kept
    // segments' blocks are untouched, so a partial fold of a v1 index must
    // stay v1 — the version is a whole-artifact per-block guarantee).
    SegmentCatalog.commit(fs, indexPath,
      meta.copy(
        formatVersion =
          if (kept.isEmpty) IndexBuilder.CurrentFormatVersion else meta.formatVersion,
        totalPostings = totalPostings,
        totalPayloadBytes = totalPayload,
        segments = newSegments,
        deleteSegments = Nil,
        segStats = newSegStats),
      Map("partialCompacted" -> foldNames.values.mkString(",")))

    // cleanup after commit (crash here only leaves unreferenced garbage)
    folds.flatten.foreach { si =>
      if (si.name == ".")
        Seq("postings", "terms", "terms_rev", "docs")
          .foreach(t => fs.delete(new Path(s"$indexPath/$t"), true))
      else fs.delete(new Path(s"$indexPath/${si.name}"), true)
    }
    meta.deleteSegments.foreach(s => fs.delete(new Path(s"$indexPath/$s"), true))
    GraftIndex(spark, indexPath)
  }
}
