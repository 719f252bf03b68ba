package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.analyzer.{Analyzers, Tokenizer}
import graft.codec.PostingCodec

import scala.collection.mutable

/** Offline inverted-index builder.
  *
  * Spark-first re-expression of groonga's offline builder `grn_ii_build`
  * (/root/reference/lib/ii.cpp:18711-18726): where the reference tokenizes
  * into per-term buffers, spills sorted blocks and k-way-merges them in
  * lexicon order (append_source/commit, lib/ii.cpp:16836-17200, 18608-18674),
  * we express the same dataflow declaratively:
  *
  *   docs --mapPartitions tokenize+local-combine--> DocTermRow
  *        --repartition(term,bucket) + sortWithinPartitions--> (the shuffle
  *            IS the spill-sort-merge; Spark's ExternalSorter spills)
  *        --mapPartitions streaming blockify--> PostingBlockRow --> parquet
  *
  * Skew: `bucket = docId >> bucketBits` salts head terms (a bigram lexicon
  * over web text is extremely Zipf-skewed) so no single reducer owns all of
  * "th"; docId order is preserved bucket-major, so query-side streams stay
  * globally sorted.
  *
  * Resumability: each stage commits to its own directory with Spark's
  * _SUCCESS marker; a re-run skips completed stages (checkpoint granularity =
  * stage; within a stage, lineage + task retry give partition-level recovery).
  * Metrics are emitted per build via accumulators into the manifest.
  */
object IndexBuilder {

  final case class BuildMetrics(
      docs: Long, postings: Long, blocks: Long, payloadBytes: Long, tokens: Long)

  def tokenizeDocs(
      docs: Dataset[(Long, String)],
      tokenizerName: String,
      withPositions: Boolean,
      bucketBits: Int,
      tokensAcc: Option[LongAccumulator] = None): Dataset[DocTermRow] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val tokenizer: Tokenizer = Analyzers.byName(tokenizerName)
      it.flatMap { case (docId, text) =>
        val toks = tokenizer.tokenize(if (text == null) "" else text)
        tokensAcc.foreach(_.add(toks.length))
        val dl = toks.length
        if (dl == 0) Iterator.empty
        else {
          // local per-doc combine: term -> (tf, positions)
          val m = new mutable.LinkedHashMap[String, mutable.ArrayBuffer[Int]]()
          var i = 0
          while (i < toks.length) {
            m.getOrElseUpdate(toks(i).term, new mutable.ArrayBuffer[Int](2)) += toks(i).pos
            i += 1
          }
          val bucket = (docId >> bucketBits).toInt
          m.iterator.map { case (term, poss) =>
            DocTermRow(term, bucket, docId, poss.length, dl,
              if (withPositions) poss.toArray else Array.emptyIntArray)
          }
        }
      }
    }
  }

  /** Streaming blockifier: consumes rows sorted by (term, bucket, doc_id)
    * within each partition and emits one encoded block per `blockSize`
    * postings of a (term, bucket) group. */
  def blockify(cfg: IndexConfig)(it: Iterator[DocTermRow]): Iterator[PostingBlockRow] =
    new Iterator[PostingBlockRow] {
      private val in = it.buffered
      private val out = new mutable.Queue[PostingBlockRow]()

      private def fill(): Unit = {
        while (out.isEmpty && in.hasNext) {
          val head = in.head
          val term = head.term
          val bucket = head.bucket
          var blk = 0
          val docIds = new mutable.ArrayBuffer[Long](cfg.blockSize)
          val tfs = new mutable.ArrayBuffer[Int](cfg.blockSize)
          val dls = new mutable.ArrayBuffer[Int](cfg.blockSize)
          val poss = new mutable.ArrayBuffer[Array[Int]](cfg.blockSize)
          def flush(): Unit = if (docIds.nonEmpty) {
            val payload = PostingCodec.encode(
              docIds.toArray, tfs.toArray, dls.toArray,
              if (cfg.withPositions) poss.toArray else null)
            out.enqueue(PostingBlockRow(
              term, bucket, blk, docIds.head, docIds.last, docIds.length,
              tfs.max, dls.min, payload))
            blk += 1
            docIds.clear(); tfs.clear(); dls.clear(); poss.clear()
          }
          while (in.hasNext && in.head.term == term && in.head.bucket == bucket) {
            val r = in.next()
            docIds += r.doc_id; tfs += r.tf; dls += r.dl; poss += r.positions
            if (docIds.length >= cfg.blockSize) flush()
          }
          flush()
        }
      }

      def hasNext: Boolean = { fill(); out.nonEmpty }
      def next(): PostingBlockRow = { fill(); out.dequeue() }
    }

  /** Build the index from `docs` (must expose a unique long id + text) and
    * commit it under `outPath`. Returns the opened index. */
  def build(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      outPath: String,
      cfg: IndexConfig = IndexConfig()): GraftIndex = {
    import spark.implicits._

    val fs = SegmentCatalog.fileSystem(spark, outPath)
    if (SegmentCatalog.isCommitted(fs, outPath)) return GraftIndex(spark, outPath)

    val shufflePartitions =
      if (cfg.numPartitions > 0) cfg.numPartitions
      else spark.sessionState.conf.numShufflePartitions

    val docsAcc = spark.sparkContext.longAccumulator("graft.index.docs")
    val tokensAcc = spark.sparkContext.longAccumulator("graft.index.tokens")

    val typedDocs = docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it => it.map { d => docsAcc.add(1L); d } }
    val docTerm = tokenizeDocs(
      typedDocs, cfg.tokenizer, cfg.withPositions, cfg.bucketBits, Some(tokensAcc))

    // ---- stage 1: postings (the heavy shuffle) ----
    val postingsPath = s"$outPath/postings"
    val blocks = docTerm
      .repartition(shufflePartitions, $"term", $"bucket")
      .sortWithinPartitions($"term", $"bucket", $"doc_id")
      .mapPartitions(blockify(cfg))
    SegmentCatalog.writeStageIfAbsent(fs, postingsPath) {
      blocks.write.mode("overwrite").parquet(postingsPath)
    }

    // ---- stage 2: term stats (map-side combinable agg over doc-term rows) ----
    val termsPath = s"$outPath/terms"
    SegmentCatalog.writeStageIfAbsent(fs, termsPath) {
      docTerm.groupBy($"term")
        .agg(count(lit(1)).as("df"), sum($"tf").as("total_tf"),
          max($"tf").cast("int").as("max_tf"))
        .repartition(math.max(1, shufflePartitions / 4))
        .sortWithinPartitions($"term")
        .write.mode("overwrite").parquet(termsPath)
    }

    // ---- stage 3: doc stats ----
    val docsPath = s"$outPath/docs"
    SegmentCatalog.writeStageIfAbsent(fs, docsPath) {
      docTerm.groupBy($"doc_id").agg(max($"dl").cast("int").as("dl"))
        .write.mode("overwrite").parquet(docsPath)
    }

    // ---- stage 4: manifest (atomic commit) ----
    val docStats = spark.read.parquet(docsPath)
      .agg(count(lit(1)), avg($"dl")).as[(Long, Double)].head()
    val blockStats = spark.read.parquet(postingsPath)
      .agg(coalesce(sum($"cnt"), lit(0L)), count(lit(1)),
        coalesce(sum(length($"payload")), lit(0L)))
      .as[(Long, Long, Long)].head()
    val meta = IndexMeta(
      formatVersion = 1,
      tokenizer = cfg.tokenizer,
      withPositions = cfg.withPositions,
      blockSize = cfg.blockSize,
      bucketBits = cfg.bucketBits,
      nDocs = docStats._1,
      avgdl = docStats._2,
      totalPostings = blockStats._1,
      totalPayloadBytes = blockStats._3,
      segments = Seq("postings", "terms", "docs"))
    SegmentCatalog.commit(fs, outPath, meta,
      Map(
        "docsRead" -> docsAcc.value.toString,
        "tokens" -> tokensAcc.value.toString,
        "postings" -> blockStats._1.toString,
        "blocks" -> blockStats._2.toString,
        "payloadBytes" -> blockStats._3.toString))
    GraftIndex(spark, outPath)
  }
}
