package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.analyzer.{Analyzers, Tokenizer}
import graft.codec.{DecodedBlock, PostingCodec}

import scala.collection.mutable

/** Offline inverted-index builder.
  *
  * Spark-first re-expression of groonga's offline builder `grn_ii_build`
  * (/root/reference/lib/ii.cpp:18711-18726): the reference tokenizes into
  * per-term buffers, spills sorted blocks at a value threshold, then
  * k-way-merges them in lexicon order (append_source/commit,
  * lib/ii.cpp:16836-17200, 18608-18674). The Spark translation keeps that
  * exact dataflow:
  *
  *   stage 1  docs --map: tokenize + buffer per (term, bucket) + spill
  *            doc-ordered encoded RUNS at a posting threshold--> shuffle by
  *            (term, bucket) --sort by (term, bucket, min_doc)--> merge runs
  *            into fixed-size posting blocks --> parquet
  *            (the shuffle moves ~|vocab| x tasks encoded runs, NOT one row
  *             per (doc, term) — measured 40x fewer rows, the difference
  *             between a 90M-row sort and an 800k-row sort per 1M docs)
  *   stage 2  term stats: aggregation over block rows (postings/128 rows)
  *   stage 3  doc stats: map-only tokenize-count pass
  *   stage 4  manifest commit (atomic rename)
  *
  * Skew: `bucket = docId >> bucketBits` (auto-sized from corpus size) salts
  * head terms — a bigram lexicon over web text is extremely Zipf-skewed, so
  * without the salt one reducer would own all of "th". docId order is
  * preserved bucket-major, so query-side streams stay globally sorted.
  * A bucket also bounds merge memory: one (term, bucket) group holds at most
  * 2^bucketBits postings.
  *
  * Resumability: each stage commits to its own directory with Spark's
  * _SUCCESS marker; a re-run skips completed stages (checkpoint granularity =
  * stage; within a stage, lineage + task retry give partition-level
  * recovery). Metrics are emitted per build via accumulators into the
  * manifest.
  */
object IndexBuilder {

  /** index artifact format: 2 adds per-block `max_gtf` (group-summed tf
    * maximum), the bound input that lets Block-Max WAND prune SECTIONED
    * indexes. Committed v1 artifacts are rebuilt on first open via
    * buildSectioned's version check; v1 blocks read through
    * GraftIndex.postings get max_gtf synthesized (= max_tf sid-less, -1 =
    * "unknown, no pruning" sectioned). */
  final val CurrentFormatVersion = 2

  /** max over doc groups of the summed tf; a doc's (per-section) postings
    * are consecutive, so one linear walk suffices. Sid-less input (every
    * group a single posting) degenerates to max(tf). */
  private def maxGroupTf(docs: graft.codec.LongVec, tfs: graft.codec.IntVec): Int = {
    var best = 0
    var cur = 0
    var i = 0
    while (i < docs.length) {
      if (i > 0 && docs(i) != docs(i - 1)) { if (cur > best) best = cur; cur = 0 }
      cur += tfs(i)
      i += 1
    }
    if (cur > best) best = cur
    best
  }

  /** mutable per-term posting accumulator on the map side — primitive
    * buffers only (boxing on this path measured as ~2500 CPU-s per 1M docs),
    * positions pre-encoded into one varbyte stream per run */
  private final class RunBuf {
    val docs = new graft.codec.LongVec(4)
    val tfs = new graft.codec.IntVec(4)
    val dls = new graft.codec.IntVec(4)
    val sids = new graft.codec.IntVec(4) // used only for sectioned indexes
    val posW = new graft.codec.ByteWriter(16)
  }

  /** Tokenize a partition of docs into doc-ordered encoded posting runs.
    * Buffers are keyed by term and flushed at every bucket boundary (so a
    * run never spans buckets) and at the `spillPostings` threshold.
    * Each doc is an array of section texts (sid = position + 1); a
    * single-element array builds the classic sid-less layout. */
  def tokenizeToRuns(
      docs: Dataset[(Long, Array[String])],
      cfg: IndexConfig,
      bucketBits: Int,
      sectioned: Boolean,
      tokensAcc: Option[LongAccumulator],
      runsAcc: Option[LongAccumulator]): Dataset[PostingRunRow] = {
    import docs.sparkSession.implicits._
    val tokenizerName = cfg.tokenizer
    docs.mapPartitions { it =>
      val tokenizer: Tokenizer = Analyzers.byName(tokenizerName)
      runsFromAnalyzed(it.map { case (docId, texts) =>
        (docId, texts.map(t => tokenizer.tokenize(if (t == null) "" else t)))
      }, cfg, bucketBits, sectioned, tokensAcc, runsAcc)
    }
  }

  /** Run builder over PRE-ANALYZED docs — the shared back half of
    * tokenizeToRuns, also fed directly by TokenColumn.buildIndex (the
    * reference's token-column cache, lib/token_column.cpp: tokenize once,
    * build many). One element per doc: per-section token arrays in sid
    * order. */
  private[index] def runsFromAnalyzed(
      it: Iterator[(Long, Array[Array[graft.analyzer.Token]])],
      cfg: IndexConfig,
      bucketBits: Int,
      sectioned: Boolean,
      tokensAcc: Option[LongAccumulator],
      runsAcc: Option[LongAccumulator]): Iterator[PostingRunRow] = {
    val withPositions = cfg.withPositions
    val spillPostings = cfg.spillPostings
    val termOrder = new java.util.Comparator[graft.analyzer.Token] {
      def compare(a: graft.analyzer.Token, b: graft.analyzer.Token): Int =
        a.term.compareTo(b.term)
    }

      new Iterator[PostingRunRow] {
        private val bufs = new java.util.HashMap[String, RunBuf]()
        private var curBucket = -1
        private var nBuffered = 0
        private val out = new mutable.Queue[PostingRunRow]()

        private def spill(bucket: Int): Unit = {
          if (bufs.isEmpty) return
          val eit = bufs.entrySet().iterator()
          while (eit.hasNext) {
            val e = eit.next()
            val b = e.getValue
            val payload = PostingCodec.encodeWithPosBlob(
              b.docs.toArray, b.tfs.toArray, b.dls.toArray,
              if (withPositions) b.posW.result() else null,
              if (sectioned) b.sids.toArray else null)
            out.enqueue(PostingRunRow(e.getKey, bucket, b.docs.head, b.docs.last,
              b.docs.length, b.tfs.max, maxGroupTf(b.docs, b.tfs),
              b.dls.min, b.tfs.sumLong, payload))
          }
          runsAcc.foreach(_.add(bufs.size.toLong))
          bufs.clear()
          nBuffered = 0
        }

        private var lastDocId = Long.MinValue

        private def consumeSection(docId: Long, sid: Int, toks: Array[graft.analyzer.Token],
            dl: Int): Unit = {
          // stable sort by term groups a section's occurrences; positions
          // stay ascending within each group (no per-term map, no boxing)
          java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]],
            termOrder.asInstanceOf[java.util.Comparator[AnyRef]])
          var i = 0
          while (i < toks.length) {
            val term = toks(i).term
            var j = i + 1
            while (j < toks.length && toks(j).term == term) j += 1
            val tf = j - i
            var b = bufs.get(term)
            if (b == null) { b = new RunBuf; bufs.put(term, b) }
            b.docs += docId; b.tfs += tf; b.dls += dl
            if (sectioned) b.sids += sid
            if (withPositions) {
              var prev = 0
              var k = i
              while (k < j) {
                b.posW.writeVarInt(toks(k).pos - prev); prev = toks(k).pos; k += 1
              }
            }
            nBuffered += 1
            i = j
          }
        }

        private def consumeDoc(docId: Long, toksBySec: Array[Array[graft.analyzer.Token]]): Unit = {
          // build() precondition: doc ids unique and ascending within each
          // input partition (PostingCodec runs are delta-coded). Fail fast
          // with the offending ids instead of erroring deep in the codec.
          if (docId <= lastDocId)
            throw new IllegalArgumentException(
              s"IndexBuilder.build requires unique ascending doc ids per input " +
                s"partition; saw $docId after $lastDocId — sort the input " +
                s"(repartitionByRange(col(idCol)).sortWithinPartitions(idCol)) " +
                s"or deduplicate ids first")
          lastDocId = docId
          var dl = 0
          var s = 0
          while (s < toksBySec.length) {
            dl += toksBySec(s).length
            s += 1
          }
          tokensAcc.foreach(_.add(dl.toLong))
          if (dl == 0) return
          val bucket = (docId >> bucketBits).toInt
          if (bucket != curBucket) { spill(curBucket); curBucket = bucket }
          // sections consumed in ascending sid keeps every RunBuf ordered
          // by (doc, sid); dl is the whole-doc token count (BM25 length)
          s = 0
          while (s < toksBySec.length) {
            if (toksBySec(s).nonEmpty) consumeSection(docId, s + 1, toksBySec(s), dl)
            s += 1
          }
          if (nBuffered >= spillPostings) { spill(curBucket); curBucket = -1 }
        }

        private def fill(): Unit = {
          while (out.isEmpty && it.hasNext) {
            val (docId, toks) = it.next()
            consumeDoc(docId, toks)
            if (!it.hasNext) spill(curBucket)
          }
        }

        def hasNext: Boolean = { fill(); out.nonEmpty }
        def next(): PostingRunRow = { fill(); out.dequeue() }
      }
  }

  /** single-text-column convenience (the classic layout) */
  def tokenizeToRuns(
      docs: Dataset[(Long, String)],
      cfg: IndexConfig,
      bucketBits: Int,
      tokensAcc: Option[LongAccumulator] = None,
      runsAcc: Option[LongAccumulator] = None)(
      implicit d: DummyImplicit): Dataset[PostingRunRow] = {
    import docs.sparkSession.implicits._
    tokenizeToRuns(docs.map { case (id, t) => (id, Array(t)) }, cfg, bucketBits,
      sectioned = false, tokensAcc, runsAcc)
  }

  /** Reduce side: consume runs sorted by (term, bucket, min_doc); per
    * (term, bucket) group decode all runs (bounded by the bucket's 2^bits
    * docs), merge into global doc order, and re-chunk into fixed-size
    * blocks. */
  def mergeRuns(cfg: IndexConfig, sectioned: Boolean = false)(
      it: Iterator[PostingRunRow]): Iterator[PostingBlockRow] =
    new Iterator[PostingBlockRow] {
      private val in = it.buffered
      private val out = new mutable.Queue[PostingBlockRow]()

      private def emitGroup(term: String, bucket: Int,
          runs: mutable.ArrayBuffer[DecodedBlock]): Unit = {
        // runs are min_doc-ordered and (from doc-ordered map tasks) usually
        // disjoint; merge defensively when ranges interleave
        val n = runs.iterator.map(_.count).sum
        val docs = new Array[Long](n)
        val tfs = new Array[Int](n)
        val dls = new Array[Int](n)
        val sds = new Array[Int](n)
        val poss = new Array[Array[Int]](n)
        var o = 0
        runs.foreach { d =>
          var i = 0
          var po = 0
          while (i < d.count) {
            docs(o) = d.docIds(i); tfs(o) = d.tfs(i); dls(o) = d.dls(i)
            sds(o) = if (d.sids.isEmpty) 1 else d.sids(i)
            if (d.positions.nonEmpty) {
              poss(o) = java.util.Arrays.copyOfRange(d.positions, po, po + d.tfs(i))
              po += d.tfs(i)
            } else poss(o) = Array.emptyIntArray
            i += 1; o += 1
          }
        }
        // sort by (docId, sid) if interleaved (cheap index sort; groups are small)
        var sorted = true
        var i = 1
        while (sorted && i < n) {
          sorted = docs(i - 1) < docs(i) ||
            (docs(i - 1) == docs(i) && sds(i - 1) < sds(i))
          i += 1
        }
        val order: Array[Int] =
          if (sorted) null
          else Array.range(0, n).sortBy(k => (docs(k), sds(k)))
        def at[T](arr: Array[T], k: Int): T = if (order == null) arr(k) else arr(order(k))
        var s = 0
        var blk = 0
        while (s < n) {
          var len = math.min(cfg.blockSize, n - s)
          // a doc's (sid) group must never split across blocks: the query
          // cursor aggregates a doc's sections within one block
          if (sectioned)
            while (s + len < n && at(docs, s + len) == at(docs, s + len - 1)) len += 1
          val bd = new Array[Long](len)
          val bt = new Array[Int](len)
          val bl = new Array[Int](len)
          val bs = new Array[Int](len)
          val bp = new Array[Array[Int]](len)
          var j = 0
          var maxGtf = 0
          var curGtf = 0
          while (j < len) {
            bd(j) = at(docs, s + j); bt(j) = at(tfs, s + j)
            bl(j) = at(dls, s + j); bs(j) = at(sds, s + j); bp(j) = at(poss, s + j)
            if (j > 0 && bd(j) != bd(j - 1)) { if (curGtf > maxGtf) maxGtf = curGtf; curGtf = 0 }
            curGtf += bt(j)
            j += 1
          }
          if (curGtf > maxGtf) maxGtf = curGtf
          val payload = PostingCodec.encode(bd, bt, bl,
            if (cfg.withPositions) bp else null,
            if (sectioned) bs else null)
          out.enqueue(PostingBlockRow(term, bucket, blk, bd(0), bd(len - 1), len,
            bt.max, maxGtf, bl.min, bt.foldLeft(0L)(_ + _), payload.length, payload))
          blk += 1
          s += len
        }
      }

      private def fill(): Unit = {
        while (out.isEmpty && in.hasNext) {
          val head = in.head
          val term = head.term
          val bucket = head.bucket
          val rows = new mutable.ArrayBuffer[PostingRunRow]()
          while (in.hasNext && in.head.term == term && in.head.bucket == bucket) {
            rows += in.next()
          }
          // fast path: a lone small run IS a valid block (same payload
          // format) — the common case, since a bucket rarely spans map
          // tasks; head terms (cnt > blockSize) still get re-chunked for
          // block-max granularity. A legacy run without a group bound
          // (max_gtf < 0, only possible when compact feeds v1 blocks back
          // through here) takes the decode path so the bound is recomputed.
          if (rows.length == 1 && rows.head.cnt <= cfg.blockSize && rows.head.max_gtf >= 0) {
            val r = rows.head
            out.enqueue(PostingBlockRow(r.term, r.bucket, 0, r.min_doc, r.max_doc,
              r.cnt, r.max_tf, r.max_gtf, r.min_dl, r.tf_sum, r.payload.length, r.payload))
          } else {
            emitGroup(term, bucket, rows.map(r => PostingCodec.decode(r.payload)))
          }
        }
      }

      def hasNext: Boolean = { fill(); out.nonEmpty }
      def next(): PostingBlockRow = { fill(); out.dequeue() }
    }

  /** Stages 2/2b shared by the text and token-column builders: the term
    * dictionary (df/total_tf/max_tf, term-sorted for prefix row-group
    * pruning) and the reversed-term dictionary (rterm-sorted — the role of
    * groonga's reversed-key patricia trie, lib/ii.cpp:10989 suffix
    * cursor), both derived from a committed postings stage. ONE definition
    * so the two build fronts can never drift. */
  private[graft] def writeTermStages(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      outPath: String,
      shufflePartitions: Int): Unit = {
    val termsPath = s"$outPath/terms"
    SegmentCatalog.writeStageIfAbsent(fs, termsPath) {
      spark.read.parquet(s"$outPath/postings")
        .groupBy(col("term"))
        .agg(sum(col("cnt")).as("df"), sum(col("tf_sum")).as("total_tf"),
          max(col("max_tf")).cast("int").as("max_tf"))
        .repartition(math.max(1, shufflePartitions / 4))
        .sortWithinPartitions(col("term"))
        .write.mode("overwrite").parquet(termsPath)
    }
    val termsRevPath = s"$outPath/terms_rev"
    SegmentCatalog.writeStageIfAbsent(fs, termsRevPath) {
      spark.read.parquet(termsPath)
        .select(reverse(col("term")).as("rterm"), col("term"), col("df"))
        .repartition(math.max(1, shufflePartitions / 4))
        .sortWithinPartitions(col("rterm"))
        .write.mode("overwrite").parquet(termsRevPath)
    }
  }

  /** Build the index from `docs` (must expose a unique long id + text) and
    * commit it under `outPath`. Returns the opened index. */
  def build(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      outPath: String,
      cfg: IndexConfig = IndexConfig()): GraftIndex =
    buildSectioned(spark, docs, idCol, Seq(textCol), outPath, cfg)

  /** Multi-column (sectioned) index build: one posting per (doc, section)
    * with sid = column position + 1 — `select --match_columns
    * "title * 10 || body"` needs per-section tf at query time
    * (WITH_SECTION, /root/reference/lib/ii.cpp:16859 sid packing;
    * scoring lib/ii.cpp:13694-13696). A single column builds the classic
    * sid-less layout. Note: for sectioned indexes, `terms.df` counts
    * (doc, section) postings, not distinct docs. */
  def buildSectioned(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCols: Seq[String],
      outPath: String,
      cfg: IndexConfig = IndexConfig()): GraftIndex = {
    import spark.implicits._
    require(textCols.nonEmpty, "at least one text column")
    val sectioned = textCols.length > 1

    val fs = SegmentCatalog.fileSystem(spark, outPath)
    if (SegmentCatalog.isCommitted(fs, outPath)) {
      // resume short-circuit. A committed v1 SECTIONED artifact is rebuilt
      // so sectioned WAND stays enabled (v1 blocks lack max_gtf) — but ONLY
      // when it is an unmutated base-only build: appended segments and
      // tombstones are state that `docs` does not contain, so deleting a
      // mutated artifact here would silently discard data. Mutated or
      // sid-less v1 artifacts stay as-is — the read path synthesizes
      // max_gtf (= max_tf sid-less, sound; -1 sectioned, WAND off as
      // before) and compact()/compactPartial-of-everything migrate them.
      val m = SegmentCatalog.readMeta(fs, outPath)
      // exact match on the two base-only manifest shapes — an exists()
      // check would misclassify a mutated index whose appended segment
      // happened to be named like a table (appendSegment also rejects
      // those names now, but don't rely on it for a DELETE decision)
      val baseOnly = m.deleteSegments.isEmpty &&
        (m.segments.isEmpty ||
          m.segments == Seq(".") ||
          m.segments.toSet.subsetOf(Set("postings", "terms", "docs")))
      if (m.formatVersion >= CurrentFormatVersion || m.sections.isEmpty || !baseOnly)
        return GraftIndex(spark, outPath)
      // DESTRUCTIVE format migration: the committed v1 artifact is deleted
      // and rebuilt from the CALLER'S CURRENT `docs`. Announce it loudly —
      // if the caller's input changed since the original build, this is a
      // silent content replacement masquerading as a migration.
      System.err.println(
        s"[graft-build] MIGRATING $outPath: deleting committed v1 sectioned " +
          s"base-only artifact (formatVersion=${m.formatVersion} < " +
          s"$CurrentFormatVersion) and rebuilding from the caller's current " +
          "input. If the input is not byte-identical to the original build, " +
          "the previous index contents are being replaced, not migrated.")
      fs.delete(new org.apache.hadoop.fs.Path(outPath), true)
    }

    val shufflePartitions =
      if (cfg.numPartitions > 0) cfg.numPartitions
      else spark.sessionState.conf.numShufflePartitions

    val docsAcc = spark.sparkContext.longAccumulator("graft.index.docs")
    val tokensAcc = spark.sparkContext.longAccumulator("graft.index.tokens")
    val runsAcc = spark.sparkContext.longAccumulator("graft.index.runs")

    // per-stage lineage (task counts, skew, shuffle/spill volume) rides
    // with the artifact: written as build_metrics.json before the commit
    val lineage = new BuildListener
    spark.sparkContext.addSparkListener(lineage)

    def timed[A](stage: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[graft-build] $stage: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // salt granularity needs the corpus size (hint, or a cheap parquet
    // row-count metadata job)
    val nInputDocs = if (cfg.nDocsHint > 0) cfg.nDocsHint else docs.count()
    val bucketBits = cfg.resolveBucketBits(nInputDocs, shufflePartitions)

    val rawDocs = docs
      .select(col(idCol).cast("long"),
        array(textCols.map(c => col(c).cast("string")): _*))
      .as[(Long, Array[String])]

    // ---- stage 1: postings (tokenize + spill runs fused into the shuffle) ----
    val postingsPath = s"$outPath/postings"
    SegmentCatalog.writeStageIfAbsent(fs, postingsPath) {
      timed("postings") {
        val counted = rawDocs.mapPartitions { it => it.map { d => docsAcc.add(1L); d } }
        tokenizeToRuns(counted, cfg, bucketBits, sectioned, Some(tokensAcc), Some(runsAcc))
          .repartition(shufflePartitions, $"term", $"bucket")
          .sortWithinPartitions($"term", $"bucket", $"min_doc")
          .mapPartitions(mergeRuns(cfg, sectioned))
          .write.mode("overwrite").parquet(postingsPath)
      }
    }

    // ---- stages 2/2b: term stats + reversed-term dictionary ----
    timed("terms+terms_rev") {
      writeTermStages(spark, fs, outPath, shufflePartitions)
    }

    // ---- stage 3: doc stats (map-only tokenize-count pass) ----
    val docsPath = s"$outPath/docs"
    SegmentCatalog.writeStageIfAbsent(fs, docsPath) {
      timed("docs") {
        val tokenizerName = cfg.tokenizer
        rawDocs.mapPartitions { it =>
          val tokenizer = Analyzers.byName(tokenizerName)
          it.flatMap { case (docId, texts) =>
            var dl = 0
            var s = 0
            while (s < texts.length) {
              val t = texts(s)
              dl += tokenizer.countTokens(if (t == null) "" else t)
              s += 1
            }
            if (dl == 0) None else Some((docId, dl))
          }
        }.toDF("doc_id", "dl")
          .write.mode("overwrite").parquet(docsPath)
      }
    }

    // ---- stage 4: manifest (atomic commit) ----
    val docStats = spark.read.parquet(docsPath)
      .agg(count(lit(1)), avg($"dl"),
        coalesce(min($"doc_id"), lit(Long.MaxValue)),
        coalesce(max($"doc_id"), lit(Long.MinValue)))
      .as[(Long, Double, Long, Long)].head()
    val blockStats = spark.read.parquet(postingsPath)
      .agg(coalesce(sum($"cnt"), lit(0L)), count(lit(1)),
        coalesce(sum($"payload_len"), lit(0L)))
      .as[(Long, Long, Long)].head()
    val meta = IndexMeta(
      formatVersion = CurrentFormatVersion,
      tokenizer = cfg.tokenizer,
      withPositions = cfg.withPositions,
      blockSize = cfg.blockSize,
      bucketBits = bucketBits,
      nDocs = docStats._1,
      avgdl = docStats._2,
      totalPostings = blockStats._1,
      totalPayloadBytes = blockStats._3,
      segments = Seq("postings", "terms", "docs"),
      sections = if (sectioned) textCols else Nil,
      segStats = Seq(SegStats(".", docStats._1, docStats._3, docStats._4,
        blockStats._1, blockStats._3)))
    spark.sparkContext.removeSparkListener(lineage)
    try {
      val os = fs.create(new org.apache.hadoop.fs.Path(outPath, "build_metrics.json"), true)
      os.write(lineage.reportJson().getBytes("UTF-8"))
      os.close()
    } catch { case e: Exception =>
      System.err.println(s"[graft-build] build_metrics.json not written: ${e.getMessage}")
    }
    SegmentCatalog.commit(fs, outPath, meta,
      Map(
        "docsRead" -> docsAcc.value.toString,
        "tokens" -> tokensAcc.value.toString,
        "spilledRuns" -> runsAcc.value.toString,
        "postings" -> blockStats._1.toString,
        "blocks" -> blockStats._2.toString,
        "payloadBytes" -> blockStats._3.toString))
    GraftIndex(spark, outPath)
  }
}
