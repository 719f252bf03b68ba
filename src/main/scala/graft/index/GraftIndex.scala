package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.analyzer.{Analyzers, TokenizeMode}
import graft.query._

/** Handle over a committed index directory: typed views over the posting /
  * term / doc tables plus the search entry points.
  *
  * Query lifecycle mirrors groonga's select read path (SURVEY.md §3.1):
  * tokenize query -> resolve term stats (df-ascending leg order,
  * /root/reference/lib/ii.cpp:10549-10561) -> per-bucket posting kernel ->
  * global top-k (TakeOrderedAndProject). The `term IN (...)` filter is
  * pushed into the parquet scan; posting files are written sorted by term so
  * row-group stats prune everything but the query terms' blocks.
  */
final case class GraftIndex(spark: SparkSession, path: String,
    pinnedVersion: Option[Long] = None) {
  import spark.implicits._

  lazy val meta: IndexMeta = {
    val fs = SegmentCatalog.fileSystem(spark, path)
    pinnedVersion match {
      case Some(v) => SegmentCatalog.readMetaAt(fs, path, v)
      case None    => SegmentCatalog.readMeta(fs, path)
    }
  }

  /** cache-invalidation key: a pinned (time-travel) handle keys on its
    * own version so it can never poison results cached for the live head */
  def snapshotId: String = pinnedVersion match {
    case Some(v) => f"pinned-$v%06d"
    case None =>
      SegmentCatalog.snapshotVersion(SegmentCatalog.fileSystem(spark, path), path)
  }

  /** segment dirs: "." is the base build; incremental appends add seg-N
    * dirs (append-only docIds keep segment doc ranges disjoint) */
  private def segDirs: Seq[String] = {
    val segs = if (meta.segments.isEmpty) Seq(".") else meta.segments
    // base-build manifests list table names; treat those as base-only
    if (segs.exists(s => s == "postings" || s == "terms" || s == "docs")) Seq(".")
    else segs
  }
  private def tablePaths(table: String): Seq[String] =
    segDirs.map(s => if (s == ".") s"$path/$table" else s"$path/$s/$table")

  /** true when the snapshot reads exactly one segment — consumers may then
    * rely on a (term, doc) posting entry appearing at most once globally
    * (sectioned payloads still repeat a doc per sid) */
  def isSingleSegment: Boolean = segDirs.size == 1

  /** every directory this snapshot reads — existence-checked by
    * GraftIndex.atVersion so an expired snapshot fails at open time */
  private[index] def tableDirsForValidation: Seq[String] =
    Seq("postings", "terms", "docs").flatMap(tablePaths) ++
      meta.deleteSegments.map(s => s"$path/$s")

  // lazy handles: file listing + schema resolution happen once per index
  // instance, not once per query. Postings carry seg_ord (manifest segment
  // order) so tombstone generations can tell an upserted doc's old
  // postings from its new ones.
  lazy val postings: DataFrame = {
    val cols = Seq("term", "bucket", "blk", "min_doc", "max_doc", "cnt",
      "max_tf", "max_gtf", "min_dl", "tf_sum", "payload_len", "payload")
    tablePaths("postings").zipWithIndex.map { case (p, i) =>
      val raw = spark.read.parquet(p)
      // pre-v2 segments have no max_gtf column: for a sid-less layout every
      // doc group is one posting so max_tf IS the group bound; a sectioned
      // legacy segment gets the -1 sentinel (kernel skips WAND there)
      val withGtf =
        if (raw.columns.contains("max_gtf")) raw
        else raw.withColumn("max_gtf",
          if (meta.sections.isEmpty) col("max_tf") else lit(-1))
      withGtf.select(cols.map(col): _*).withColumn("seg_ord", lit(i))
    }.reduce(_.unionByName(_))
  }
  lazy val terms: DataFrame = spark.read.parquet(tablePaths("terms"): _*)
  /** doc stats with tombstoned rows filtered out (per-generation) */
  lazy val docs: DataFrame = {
    val raw = tablePaths("docs").zipWithIndex.map { case (p, i) =>
      spark.read.parquet(p).select(col("doc_id"), col("dl"))
        .withColumn("seg_ord", lit(i))
    }.reduce(_.unionByName(_))
    deletesDf match {
      case None => raw.drop("seg_ord")
      case Some(d) =>
        val dg = d.groupBy(col("doc_id")).agg(max(col("gen")).as("gen"))
        raw.join(broadcast(dg), Seq("doc_id"), "left")
          .where(col("gen").isNull || col("seg_ord") >= col("gen"))
          .select(col("doc_id"), col("dl"))
    }
  }

  /** tombstone table, if any deletes were committed */
  lazy val deletesDf: Option[DataFrame] =
    if (meta.deleteSegments.isEmpty) None
    else Some(spark.read.parquet(meta.deleteSegments.map(s => s"$path/$s"): _*))

  /** driver-side tombstones (sorted doc ids + max gen each) consumed by the
    * match kernel. Bounded: a tombstone set past the cap means the index
    * needs a compact, not a bigger driver. */
  @transient lazy val tombstones: (Array[Long], Array[Int]) = deletesDf match {
    case None => (Array.emptyLongArray, Array.emptyIntArray)
    case Some(d) =>
      val rows = d.groupBy($"doc_id").agg(max($"gen").cast("int").as("gen"))
        .collect()
      require(rows.length <= GraftIndex.MaxDriverTombstones,
        s"${rows.length} tombstones exceed the driver cap " +
          s"(${GraftIndex.MaxDriverTombstones}) — run IncrementalIndex.compact " +
          s"on $path to fold deletes into the base")
      val sorted = rows.map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
      (sorted.map(_._1), sorted.map(_._2))
  }

  /** tombstones shipped ONCE per executor (broadcast), not serialized into
    * every task closure — at the driver cap (millions of entries) a
    * closure-embedded copy would dominate task dispatch. */
  @transient private lazy val tombBc
      : org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Int])] =
    spark.sparkContext.broadcast(tombstones)

  /** postings cap under which a query runs the kernel driver-side
    * (spark.graft.smallQueryMaxPostings; 0 disables the fast path) */
  @transient private lazy val smallQueryCap: Long =
    spark.conf.getOption("spark.graft.smallQueryMaxPostings")
      .map(_.toLong).getOrElse(GraftIndex.DefaultSmallQueryMaxPostings)

  /** Run the match kernel per bucket; tombstones are injected from the
    * broadcast inside the task (the shipped `q` carries empty arrays).
    *
    * SMALL-QUERY fast path: a top-k term query costs one Spark job of two
    * stages (pruned scan → bucket shuffle → kernel) — on a warm index
    * that is ~200 ms of scheduling for milliseconds of kernel work
    * (groonga answers the same query in-process, lib/ii.cpp's
    * grn_ii_select runs on the caller's thread). When the DICTIONARY
    * stats bound the query's total posting footprint under
    * `smallQueryCap` (known before any scan — Σ df over the resolved
    * terms), the pruned block scan is collected (bounded: ≤ cap postings
    * ≈ a few MB) and the SAME kernel runs per bucket on the driver; the
    * result is a LocalRelation, so downstream top-k never launches a
    * second stage. At web scale a common term's df blows the cap and the
    * query takes the distributed path — the fast path is for the
    * short-posting-list queries where scheduling dominates, and its cap
    * makes driver memory a constant, not a function of corpus size. */
  private def runKernel(q: ResolvedQuery, blocks: Dataset[PostingBlockRow]): DataFrame = {
    val totalDf = q.terms.iterator.map(_.df).sum
    if (smallQueryCap > 0 && totalDf <= smallQueryCap) {
      val (td, tg) =
        if (deletesDf.isEmpty) (Array.emptyLongArray, Array.emptyIntArray)
        else tombstones
      val qq = q.copy(tombDocs = td, tombGens = tg)
      val out = blocks.collect() // one stage, term-IN-pruned, ≤ cap postings
        .groupBy(_.bucket).toSeq.sortBy(_._1)
        .iterator.flatMap { case (_, rs) => MatchKernel.run(qq, rs.iterator) }
        .toSeq
      return spark.createDataset(out).toDF("doc_id", "score")
    }
    val bc = if (deletesDf.isEmpty) None else Some(tombBc)
    blocks.groupByKey(_.bucket)
      .flatMapGroups { (_, rows) =>
        val qq = bc match {
          case Some(b) => val (td, tg) = b.value; q.copy(tombDocs = td, tombGens = tg)
          case None => q
        }
        MatchKernel.run(qq, rows)
      }
      .toDF("doc_id", "score")
  }

  /** empty (doc_id, score) result with the canonical schema */
  def emptyResult: DataFrame = spark.emptyDataset[(Long, Double)].toDF("doc_id", "score")

  @transient private lazy val termStatCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[TermStatRow]]()

  /** driver-side stats lookup for a small set of query terms (tiny result;
    * the IN filter prunes parquet row groups). Aggregates across segments;
    * memoized per index instance (term stats are immutable per snapshot).
    *
    * On an index with UNCOMPACTED mutations the per-segment dictionary rows
    * overcount: a deleted doc still sits in its segment's df, and an
    * upserted doc counts once per segment that carries it. nDocs/avgdl are
    * kept exact through mutations at commit time; per-term df/total_tf are
    * made exact here at resolve time instead, by decoding just the query
    * terms' postings (the same blocks the kernel is about to scan) under
    * the tombstone generation filter — so BM25 idf over a mutated index
    * matches a from-scratch rebuild exactly. */
  def termStats(qterms: Seq[String]): Map[String, TermStatRow] = {
    val missing = qterms.distinct.filterNot(termStatCache.containsKey)
    if (missing.nonEmpty) {
      val fetched =
        if (deletesDf.isEmpty) dictTermStats(missing)
        else exactTermStats(missing)
      missing.foreach(t => termStatCache.put(t, fetched.get(t)))
    }
    qterms.distinct.flatMap(t =>
      Option(termStatCache.get(t)).flatten.map(t -> _)).toMap
  }

  /** dictionary stats folded on the DRIVER: the term-IN-pruned scan returns
    * at most |terms| x |segments| dictionary rows (a handful), so collecting
    * them and summing per term replaces the groupBy exchange — every cold
    * term resolve costs one single-stage job instead of a two-stage shuffle
    * job. Long/int arithmetic only: bit-identical to the aggregate it
    * replaces. */
  private def dictTermStats(missing: Seq[String]): Map[String, TermStatRow] = {
    val rows = terms.where($"term".isin(missing: _*))
      .select($"term", $"df", $"total_tf", $"max_tf")
      .as[(String, Long, Long, Int)]
      .collect()
    rows.groupBy(_._1).map { case (t, rs) =>
      t -> TermStatRow(t, rs.iterator.map(_._2).sum,
        rs.iterator.map(_._3).sum, rs.iterator.map(_._4).max)
    }
  }

  /** exact per-term stats under tombstones: decode the terms' postings,
    * drop generations a tombstone hides, count distinct live docs (sectioned
    * payloads repeat a doc per sid — distinct, not count). max_tf stays the
    * dictionary upper bound semantics: max over live entries.
    *
    * SMALL-QUERY fast path (mirror of runKernel's): the dictionary df sums
    * — known from a driver-side pruned lookup BEFORE any payload moves —
    * upper-bound the live posting count, so when they fit the small-query
    * cap the pruned payload blocks are collected (bounded, a few MB) and
    * decoded on the driver against the already-resident tombstone arrays:
    * one scan-only stage, no exchange, no second job. Past the cap the
    * distributed decode+aggregate runs as before. */
  private def exactTermStats(missing: Seq[String]): Map[String, TermStatRow] = {
    val dict = dictTermStats(missing)
    val bound = dict.valuesIterator.map(_.df).sum
    if (smallQueryCap > 0 && bound <= smallQueryCap) {
      val (td, tg) = tombstones
      val acc = scala.collection.mutable.HashMap
        .empty[String, (java.util.HashSet[java.lang.Long], Array[Long])]
      postings.where($"term".isin(missing: _*))
        .select($"term", $"seg_ord", $"payload")
        .as[(String, Int, Array[Byte])]
        .collect() // one stage, term-IN-pruned, ≤ cap postings
        .foreach { case (t, seg, payload) =>
          val (docSet, sums) = acc.getOrElseUpdate(t,
            (new java.util.HashSet[java.lang.Long](), Array(0L, 0L)))
          val d = graft.codec.PostingCodec.decode(payload)
          var i = 0
          while (i < d.count) {
            val j = java.util.Arrays.binarySearch(td, d.docIds(i))
            if (j < 0 || seg >= tg(j)) {
              docSet.add(d.docIds(i))
              sums(0) += d.tfs(i)                       // total_tf
              if (d.tfs(i) > sums(1)) sums(1) = d.tfs(i) // max_tf
            }
            i += 1
          }
        }
      acc.iterator.collect { case (t, (docSet, sums)) if !docSet.isEmpty =>
        t -> TermStatRow(t, docSet.size.toLong, sums(0), sums(1).toInt)
      }.toMap
    } else {
      val bc = tombBc
      postings.where($"term".isin(missing: _*))
        .select($"term", $"seg_ord", $"payload")
        .as[(String, Int, Array[Byte])]
        .flatMap { case (t, seg, payload) =>
          val (td, tg) = bc.value
          val d = graft.codec.PostingCodec.decode(payload)
          (0 until d.count).iterator.filter { i =>
            val j = java.util.Arrays.binarySearch(td, d.docIds(i))
            j < 0 || seg >= tg(j)
          }.map(i => (t, d.docIds(i), d.tfs(i)))
        }.toDF("term", "doc_id", "tf")
        .groupBy($"term")
        .agg(countDistinct($"doc_id").as("df"),
          sum($"tf").cast("long").as("total_tf"),
          max($"tf").cast("int").as("max_tf"))
        .as[TermStatRow]
        .collect().map(t => t.term -> t).toMap
    }
  }

  /** Position-dependent match modes need an index built withPositions —
    * fail with a clear error instead of crashing inside the kernel. */
  private def requirePositionsFor(mode: MatchMode): Unit = mode match {
    case MatchMode.Phrase | _: MatchMode.Near | _: MatchMode.NearPhrase
        if !meta.withPositions =>
      throw new IllegalArgumentException(
        s"index at $path was built withPositions=false; $mode needs positions " +
          "(rebuild with IndexConfig(withPositions = true))")
    case _ =>
  }

  /** Tokenize a raw query string with the index's analyzer (GET mode). */
  def analyzeQuery(raw: String): Seq[(String, Int)] =
    Analyzers.byName(meta.tokenizer).tokenize(raw, TokenizeMode.Get)
      .map(t => (t.term, t.pos)).toSeq

  /** map column-name→weight into the sid-indexed array the kernel uses */
  private def resolveSectionWeights(w: Map[String, Double]): Array[Double] =
    if (w.isEmpty || meta.sections.isEmpty) Array.emptyDoubleArray
    else meta.sections.map(c => w.getOrElse(c, 1.0)).toArray

  private def resolve(
      termsWithPos: Seq[(String, Int, Double)],
      mode: MatchMode,
      score: ScoreMode,
      topK: Int,
      sectionWeights: Map[String, Double] = Map.empty): ResolvedQuery = {
    val stats = termStats(termsWithPos.map(_._1).distinct)
    val rts = termsWithPos.map { case (t, qpos, w) =>
      val st = stats.get(t)
      ResolvedTerm(t, st.map(_.df).getOrElse(0L),
        Bm25.idf(meta.nDocs, st.map(_.df).getOrElse(0L)), w, qpos)
    }
    ResolvedQuery(rts.toArray, mode, score, meta.avgdl, topK,
      sectionWeights = resolveSectionWeights(sectionWeights),
      sectioned = meta.sections.nonEmpty, nDocs = meta.nDocs)
  }

  /** Core search: (doc_id, score) matches for the given terms.
    * `sectionWeights` keys are indexed column names (match_columns
    * "title * 10 || body" → Map("title" -> 10.0)); ignored for
    * single-column indexes. */
  def searchTerms(
      qterms: Seq[String],
      mode: MatchMode = MatchMode.All,
      score: ScoreMode = ScoreMode.Tf,
      topK: Int = 0,
      weights: Map[String, Double] = Map.empty,
      sectionWeights: Map[String, Double] = Map.empty): DataFrame = {
    requirePositionsFor(mode)
    val withPos = qterms.zipWithIndex.map { case (t, i) =>
      (t, i, weights.getOrElse(t, 1.0))
    }
    val distinctTerms = qterms.distinct
    // conjunctive query with an unknown term can match nothing — skip the scan
    val stats = termStats(distinctTerms)
    val allKnown = distinctTerms.forall(stats.contains)
    val requireAll = mode match {
      case MatchMode.All | MatchMode.Phrase | _: MatchMode.Near => true
      case _ => false
    }
    if (requireAll && !allKnown)
      return spark.emptyDataset[(Long, Double)].toDF("doc_id", "score")
    val q = resolve(withPos, mode, score, topK, sectionWeights)
    val blocks = postings.where($"term".isin(distinctTerms: _*)).as[PostingBlockRow]
    runKernel(q, blocks)
  }

  /** BATCHED multi-query search: N term queries answered from ONE pruned
    * postings scan per CHUNK. The union of a chunk's terms is pushed down
    * as a single term-IN filter, each bucket's blocks are materialized once
    * and the kernel runs per query over the shared in-memory blocks (the
    * kernel builds cursors only for its own query's terms, so no
    * per-query filtering is needed). Per-bucket memory is the bucket's
    * pruned block set for the UNION of the chunk's terms — it scales with
    * the chunk's posting footprint, NOT one query's — so the batch is
    * split greedily into chunks of Σ df ≤ `spark.graft.batchMaxPostings`
    * (GraftIndex.DefaultBatchMaxPostings); a single query over the cap
    * runs as its own chunk, which is exactly the single-query bound.
    *
    * This is the Spark-first answer to query throughput: where the
    * reference dispatches each query on its own thread over shared memory
    * (grn_ii_select per caller), here a query BATCH becomes one job whose
    * scan/shuffle cost is shared — at 1000 executors, k queries cost one
    * scan, not k. Driver stats for the whole batch are fetched in one
    * dictionary lookup, and a batch whose total posting footprint fits
    * `smallQueryCap` runs driver-side in a single stage.
    *
    * Output: (query_id, doc_id, score); query_id = position in `batch`.
    * Conjunctive queries containing an unknown term match nothing, same
    * as searchTerms. */
  def searchTermsBatch(
      batch: Seq[Seq[String]],
      mode: MatchMode = MatchMode.Any,
      score: ScoreMode = ScoreMode.Tf,
      topK: Int = 0,
      sectionWeights: Map[String, Double] = Map.empty): DataFrame = {
    requirePositionsFor(mode)
    val allTerms = batch.flatten.distinct
    val empty = spark.emptyDataset[(Int, Long, Double)]
      .toDF("query_id", "doc_id", "score")
    if (allTerms.isEmpty) return empty
    val stats = termStats(allTerms) // one driver lookup for the whole batch
    val requireAll = mode match {
      case MatchMode.All | MatchMode.Phrase | _: MatchMode.Near => true
      case _ => false
    }
    val resolved: Array[(Int, ResolvedQuery)] = batch.zipWithIndex.flatMap {
      case (qts, qid) =>
        if (requireAll && !qts.distinct.forall(stats.contains)) None
        else {
          val withPos = qts.zipWithIndex.map { case (t, i) => (t, i, 1.0) }
          Some(qid -> resolve(withPos, mode, score, topK, sectionWeights))
        }
    }.toArray
    if (resolved.isEmpty) return empty
    val liveTerms = resolved.flatMap(_._2.terms.map(_.term)).distinct.toSeq
    val blocks = postings.where($"term".isin(liveTerms: _*)).as[PostingBlockRow]
    val totalDf = resolved.iterator
      .flatMap(_._2.terms.iterator.map(_.df)).sum // shared terms count once per query: upper bound
    if (smallQueryCap > 0 && totalDf <= smallQueryCap) {
      val (td, tg) =
        if (deletesDf.isEmpty) (Array.emptyLongArray, Array.emptyIntArray)
        else tombstones
      val mat = blocks.collect().groupBy(_.bucket).toSeq.sortBy(_._1)
      val out = resolved.iterator.flatMap { case (qid, q0) =>
        val qq = q0.copy(tombDocs = td, tombGens = tg)
        mat.iterator.flatMap { case (_, rs) =>
          MatchKernel.run(qq, rs.iterator).map { case (d, s) => (qid, d, s) }
        }
      }.toSeq
      return spark.createDataset(out).toDF("query_id", "doc_id", "score")
    }
    val bc = if (deletesDf.isEmpty) None else Some(tombBc)
    // greedy Σ-df chunking: bounds per-bucket materialization to the chunk's
    // posting footprint (see scaladoc); one scan+shuffle per chunk
    val chunkCap = spark.conf.getOption("spark.graft.batchMaxPostings")
      .map(_.toLong).getOrElse(GraftIndex.DefaultBatchMaxPostings)
    val chunks = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[(Int, ResolvedQuery)])
    var acc = 0L
    resolved.foreach { rq =>
      val qdf = rq._2.terms.iterator.map(_.df).sum
      if (chunks.last.nonEmpty && acc + qdf > chunkCap) {
        chunks += scala.collection.mutable.ArrayBuffer.empty; acc = 0L
      }
      chunks.last += rq; acc += qdf
    }
    chunks.iterator.map { chunk =>
      val chunkArr = chunk.toArray
      val chunkTerms = chunkArr.flatMap(_._2.terms.map(_.term)).distinct.toSeq
      val chunkBlocks =
        postings.where($"term".isin(chunkTerms: _*)).as[PostingBlockRow]
      chunkBlocks.groupByKey(_.bucket)
        .flatMapGroups { (_, rows) =>
          val mat = rows.toArray // one bucket's blocks for THIS chunk's terms
          chunkArr.iterator.flatMap { case (qid, q0) =>
            val qq = bc match {
              case Some(b) =>
                val (td, tg) = b.value; q0.copy(tombDocs = td, tombGens = tg)
              case None => q0
            }
            MatchKernel.run(qq, mat.iterator).map { case (d, s) => (qid, d, s) }
          }
        }
        .toDF("query_id", "doc_id", "score")
    }.reduce(_ union _)
  }

  /** Per-query top-k over a searchTermsBatch result, reference tie order. */
  def topKPerQuery(result: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(desc("score"), asc("doc_id"))
    result.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k).drop("rk")
  }

  /** Phrase search from a raw phrase string: query-side tokenize (GET mode)
    * supplies the token offsets used by the adjacency check. */
  def searchPhrase(phrase: String, score: ScoreMode = ScoreMode.Tf, topK: Int = 0): DataFrame = {
    requirePositionsFor(MatchMode.Phrase)
    val toks = analyzeQuery(phrase)
    if (toks.isEmpty) return spark.emptyDataset[(Long, Double)].toDF("doc_id", "score")
    val stats = termStats(toks.map(_._1).distinct)
    if (!toks.forall(t => stats.contains(t._1)))
      return spark.emptyDataset[(Long, Double)].toDF("doc_id", "score")
    val q = resolve(toks.map { case (t, p) => (t, p, 1.0) }, MatchMode.Phrase, score, topK)
    val blocks = postings.where($"term".isin(toks.map(_._1).distinct: _*)).as[PostingBlockRow]
    runKernel(q, blocks)
  }

  /** NEAR_PHRASE / ORDERED_NEAR_PHRASE: every phrase occurs and the phrase
    * START positions fit within `maxInterval` (ordered: ascending in query
    * order), inside one section (the *NP and *ONP query syntax,
    * /root/reference/lib/ii.cpp:11210+, 12903). Single-word "phrases" are
    * allowed and compose with multi-word ones. */
  def searchNearPhrase(
      phrases: Seq[String],
      maxInterval: Int,
      ordered: Boolean = false,
      score: ScoreMode = ScoreMode.Tf,
      topK: Int = 0): DataFrame = {
    val mode = MatchMode.NearPhrase(maxInterval, ordered)
    requirePositionsFor(mode)
    val toksByPhrase = phrases.map(analyzeQuery)
    if (toksByPhrase.isEmpty || toksByPhrase.exists(_.isEmpty)) return emptyResult
    val allTerms = toksByPhrase.flatten.map(_._1).distinct
    val stats = termStats(allTerms)
    if (!allTerms.forall(stats.contains)) return emptyResult
    val rts = toksByPhrase.zipWithIndex.flatMap { case (toks, pid) =>
      toks.map { case (t, p) =>
        ResolvedTerm(t, stats(t).df, Bm25.idf(meta.nDocs, stats(t).df), 1.0, p, pid)
      }
    }
    val q = ResolvedQuery(rts.toArray, mode, score, meta.avgdl, topK,
      sectioned = meta.sections.nonEmpty, nDocs = meta.nDocs)
    val blocks = postings.where($"term".isin(allTerms: _*)).as[PostingBlockRow]
    runKernel(q, blocks)
  }

  /** NEAR_PHRASE_PRODUCT / ORDERED_NEAR_PHRASE_PRODUCT: each group is a
    * set of alternative phrases; one alternative per group must occur, all
    * landing inside `maxInterval` (lib/ii.cpp:12903+). Alternatives whose
    * terms are absent from the dictionary are dropped; a group with no
    * viable alternative yields an empty result. */
  def searchNearPhraseProduct(
      groups: Seq[Seq[String]],
      maxInterval: Int,
      ordered: Boolean = false,
      score: ScoreMode = ScoreMode.Tf,
      topK: Int = 0): DataFrame = {
    val mode = MatchMode.NearPhraseProduct(maxInterval, ordered)
    requirePositionsFor(MatchMode.Phrase)
    val analyzed: Seq[Seq[Seq[(String, Int)]]] = groups.map(_.map(analyzeQuery))
    if (analyzed.isEmpty || analyzed.exists(_.forall(_.isEmpty))) return emptyResult
    val allTerms = analyzed.flatten.flatten.map(_._1).distinct
    val stats = termStats(allTerms)
    val rts = analyzed.zipWithIndex.flatMap { case (alts, gid) =>
      alts.zipWithIndex.flatMap { case (toks, aid) =>
        // drop alternatives containing unknown terms entirely
        if (toks.isEmpty || !toks.forall(t => stats.contains(t._1))) Nil
        else toks.map { case (t, p) =>
          ResolvedTerm(t, stats(t).df, Bm25.idf(meta.nDocs, stats(t).df), 1.0, p, gid, aid)
        }
      }
    }
    val liveGroups = rts.map(_.phraseId).distinct
    if (liveGroups.size < groups.size) return emptyResult
    val queryTerms = rts.map(_.term).distinct
    val q = ResolvedQuery(rts.toArray, mode, score, meta.avgdl, topK,
      sectioned = meta.sections.nonEmpty, nDocs = meta.nDocs)
    val blocks = postings.where($"term".isin(queryTerms: _*)).as[PostingBlockRow]
    runKernel(q, blocks)
  }

  /** rank candidate terms by corpus-wide df and cap: a term present in
    * several segments (append/upsert) contributes ONE entry with its dfs
    * summed — duplicates would give it two kernel cursors and double-count
    * its tf. */
  private def dedupTopByDf(cands: DataFrame, maxExpansions: Int): Seq[String] =
    cands.groupBy(col("term")).agg(sum(col("df")).as("df"))
      .orderBy(desc("df"), asc("term")).limit(maxExpansions)
      .select($"term").as[String].collect().toSeq

  /** Prefix expansion over the sorted term dictionary (pat-cursor analogue,
    * /root/reference/lib/ii.cpp:10286-10470 EX_PREFIX). */
  def expandPrefix(prefix: String, maxExpansions: Int = 1024): Seq[String] =
    dedupTopByDf(terms.where($"term".startsWith(prefix)), maxExpansions)

  /** Suffix expansion via the reversed-term dictionary (terms_rev, sorted
    * by reversed term → parquet row-group pruning on the startsWith filter;
    * groonga's reversed-key suffix cursor, lib/ii.cpp:10989). Falls back to
    * a full terms scan for indexes built before terms_rev existed. */
  def expandSuffix(suffix: String, maxExpansions: Int = 1024): Seq[String] = {
    val rsuffix = suffix.reverse
    val revPaths = tablePaths("terms_rev")
    val fs = SegmentCatalog.fileSystem(spark, path)
    val haveRev = revPaths.forall(p => fs.exists(new org.apache.hadoop.fs.Path(p)))
    val base =
      if (haveRev) spark.read.parquet(revPaths: _*).where($"rterm".startsWith(rsuffix))
      else terms.where(reverse($"term").startsWith(rsuffix))
    dedupTopByDf(base.select(col("term"), col("df")), maxExpansions)
  }

  /** SUFFIX match mode: docs containing any dictionary term ending with
    * `suffix` (GRN_OP_SUFFIX), TF-scored. */
  def searchSuffix(suffix: String, maxExpansions: Int = 1024): DataFrame = {
    val expanded = expandSuffix(suffix, maxExpansions)
    if (expanded.isEmpty) emptyResult
    else searchTerms(expanded, MatchMode.Any, ScoreMode.Tf)
  }

  /** prefix_rk_search (romaji-kana): dictionary terms whose reading starts
    * with any kana expansion of the romaji prefix (reference proc
    * prefix_rk_search; conversion table in graft.analyzer.Romaji). */
  def expandPrefixRk(romajiPrefix: String, maxExpansions: Int = 1024): Seq[String] = {
    val cands = graft.analyzer.Romaji.candidates(romajiPrefix)
    if (cands.isEmpty) return Nil
    val pred = cands.map(c => $"term".startsWith(c)).reduce(_ || _)
    dedupTopByDf(terms.where(pred), maxExpansions)
  }

  /** GRN_OP_TERM_EXTRACT (lib/grn_ii.h:234): every dictionary term occurring
    * as a substring of `text`, with its char offset. The candidate set
    * (|text| x maxTermLen substrings) is tiny and broadcast against the big
    * dictionary — the scan side stays distributed. */
  def termExtract(text: String, maxTermLen: Int = 32): DataFrame = {
    val cands = (0 until text.length).flatMap { i =>
      (1 to math.min(maxTermLen, text.length - i)).map(l => (i, text.substring(i, i + l)))
    }
    val candDf = spark.createDataFrame(cands).toDF("pos", "term")
    terms.join(broadcast(candDf), Seq("term"))
      .select($"pos", $"term").orderBy($"pos", $"term")
  }

  /** greedy longest-match segmentation over termExtract hits (the tag
    * extraction use of TERM_EXTRACT) */
  def termExtractSegments(text: String, maxTermLen: Int = 32): Seq[(Int, String)] = {
    val byPos = termExtract(text, maxTermLen).collect()
      .map(r => (r.getInt(0), r.getString(1)))
      .groupBy(_._1).map { case (p, hits) => p -> hits.map(_._2).maxBy(_.length) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var p = 0
    while (p < text.length) {
      byPos.get(p) match {
        case Some(t) => out += ((p, t)); p += t.length
        case None => p += 1
      }
    }
    out.toSeq
  }

  /** Fuzzy expansion: terms within edit distance (GRN_OP_FUZZY,
    * /root/reference/lib/ii.cpp:11116-11208) — distributed levenshtein over
    * the term dictionary with a cheap length prefilter.
    * `withTransposition` = GRN_TABLE_FUZZY_SEARCH_WITH_TRANSPOSITION
    * (include/groonga/table.h:1958): adjacent transposition counts as ONE
    * edit, computed with the reference's restricted (OSA) DP
    * (lib/pat.c:3395-3415) via a typed filter (still distributed over the
    * dictionary; Spark has no built-in transposition distance). */
  def expandFuzzy(term: String, maxDistance: Int, prefixLength: Int = 0,
      maxExpansions: Int = 64, withTransposition: Boolean = false): Seq[String] = {
    val base = terms
      .where(length($"term").between(term.length - maxDistance, term.length + maxDistance))
    val pref = if (prefixLength > 0)
      base.where($"term".startsWith(term.take(prefixLength))) else base
    val within =
      if (!withTransposition) pref.where(levenshtein(lit(term), $"term") <= maxDistance)
      else {
        val q = term
        val d = maxDistance
        pref.select($"term", $"df").as[(String, Long)]
          .filter(t => graft.query.Fuzzy.osaDistance(q, t._1, d) <= d)
          .toDF("term", "df")
      }
    dedupTopByDf(within, maxExpansions)
  }

  /** Any+Tf match for an UNBOUNDED term set given as a DataFrame — the
    * scale path when a dictionary expansion (regexp, loose prefix) exceeds
    * the driver-side cap: postings ⋈ matching-terms stays distributed, score
    * = Σ tf. Identical results to searchTerms(expanded, Any, Tf). */
  def searchTermsTfByJoin(matching: DataFrame): DataFrame =
    decodedAlive(postings
        .join(matching.select(col("term").as("term")).distinct(), Seq("term"))
        .as[PostingBlockRow])
      .drop("term") // keep the groupBy exchange to fixed-width rows
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast("double").as("score"))

  /** decode posting blocks into live (term, doc_id, tf, seg_ord) rows —
    * the ONE place the block decode meets the tombstone generation filter
    * (searchTermsTfByJoin and decodedPostings both build on it, so
    * tombstone semantics cannot diverge between search and export). */
  private def decodedAlive(blocks: Dataset[PostingBlockRow]): DataFrame = {
    val per = blocks.flatMap { b =>
      val d = graft.codec.PostingCodec.decode(b.payload)
      (0 until d.count).iterator.map(i => (b.term, d.docIds(i), d.tfs(i).toLong, b.seg_ord))
    }.toDF("term", "doc_id", "tf", "seg_ord")
    deletesDf match {
      case None => per
      case Some(d) =>
        val dg = d.groupBy(col("doc_id")).agg(max(col("gen")).as("gen"))
        per.join(broadcast(dg), Seq("doc_id"), "left")
          .where(col("gen").isNull || col("seg_ord") >= col("gen"))
          .drop("gen")
    }
  }

  /** Full decoded postings view (term, doc_id, tf): tombstone-filtered,
    * section-summed — the export / consistency-audit surface. Distributed
    * end to end (block decode is a flatMap over the postings scan). */
  def decodedPostings: DataFrame =
    decodedAlive(postings.as[PostingBlockRow])
      .groupBy(col("term"), col("doc_id")).agg(sum(col("tf")).as("tf"))

  /** index↔source consistency audit (the `index_column_diff` command,
    * /root/reference/lib/proc/proc_index_column.c:40 /
    * lib/index_column.c:345 "remains"/"missings"): re-tokenizes `docs`
    * with THIS index's analyzer and diffs against the decoded postings.
    * One summary row — all-zero diff counts iff the index exactly matches
    * its source. Shape: two scans + one (term, doc_id)-keyed join; no
    * driver state (the reference walks the index single-threaded). */
  def diffAgainst(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val expected = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(graft.functions.StringProcs.stringTokenize(
          col(textCol), meta.tokenizer)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("expected_tf"))
    val actual = decodedPostings.withColumnRenamed("tf", "actual_tf")
    expected.join(actual, Seq("doc_id", "term"), "full_outer")
      .agg(
        sum(when(col("expected_tf").isNotNull, 1L).otherwise(0L)).as("n_expected"),
        sum(when(col("actual_tf").isNotNull, 1L).otherwise(0L)).as("n_actual"),
        sum(when(col("actual_tf").isNull, 1L).otherwise(0L)).as("n_missing"),
        sum(when(col("expected_tf").isNull, 1L).otherwise(0L)).as("n_remains"),
        sum(when(col("expected_tf").isNotNull && col("actual_tf").isNotNull &&
          col("expected_tf") =!= col("actual_tf"), 1L).otherwise(0L)).as("n_tf_mismatch"))
  }

  /** REGEXP over the dictionary: driver-side expansion capped at
    * `maxExpansions` terms (a loose pattern over a web-scale lexicon would
    * otherwise OOM the driver / blow the IN-list); above the cap the match
    * is computed by a distributed postings⋈terms join instead
    * (grn_ii_select GRN_OP_REGEXP dict-literal path, lib/ii.cpp:14854;
    * the reference likewise special-cases "simple" regexps into cheaper
    * paths — lib/expr_executor.cpp:2862). An `^`-anchored literal prefix
    * is additionally pushed into the dictionary scan as a StartsWith
    * predicate: the terms table is written term-sorted, so parquet min/max
    * stats prune every row group outside the prefix range and the rlike
    * only runs over the survivors — at a web-scale lexicon this turns a
    * full dictionary scan into a few row groups. */
  /** the dictionary side of a regexp search — exposed so plan checks can
    * assert the prefix pushdown on the exact scan searchRegexp runs */
  def regexpDictionary(pattern: String): DataFrame = {
    // a TokenRegexp index's dictionary holds GRAMS + marks, not full
    // terms — regexp-matching it is silently wrong; that index answers
    // through searchRegexpGrams + a confirm pass on the source text
    require(!meta.tokenizer.startsWith("TokenRegexp"),
      "dictionary regexp on a TokenRegexp grams index — use " +
        "searchRegexpGrams + a full-regex confirm on the source text")
    val pre = GraftIndex.regexpLiteralPrefix(pattern)
    val dict = if (pre.isEmpty) terms else terms.where($"term".startsWith(pre))
    dict.where($"term".rlike(pattern)).select($"term").distinct()
  }

  /** Index-accelerated regexp CANDIDATES over a TokenRegexp-grams index
    * (the reference's indexed `@~` path: TokenRegexp ADD grams +
    * begin/end marks, /root/reference/lib/tokenizers.c:1289-1545): the
    * pattern's required literal run becomes a gram phrase — `\A`/`^`
    * anchors ride the begin mark, `\z`/`$` the end mark, so anchored
    * patterns prune by POSITION too, not just containment. Any doc
    * matching the regex contains the literal contiguously and blank-free,
    * so its stride-1 ADD grams align with the GET phrase — candidates are
    * a sound superset and the caller re-verifies with the full regex.
    * None when no usable literal exists (single chars need the unmatured-
    * tail prefix expansion the phrase kernel doesn't do — callers fall
    * back to the sequential confirm). */
  def searchRegexpGrams(pattern: String): Option[DataFrame] = {
    require(meta.tokenizer.startsWith("TokenRegexp"),
      s"searchRegexpGrams needs a TokenRegexp-analyzed index (got ${meta.tokenizer})")
    val hasBegin = pattern.startsWith("\\A") || pattern.startsWith("^")
    val beginLen = if (pattern.startsWith("\\A")) 2 else if (hasBegin) 1 else 0
    val hasEnd = (pattern.endsWith("\\z") && !pattern.endsWith("\\\\z")) ||
      (pattern.endsWith("$") && !pattern.endsWith("\\$"))
    val endLen = if (pattern.endsWith("\\z")) 2 else if (hasEnd) 1 else 0
    val core = pattern.substring(beginLen, pattern.length - endLen)
    val (lit, atStart, atEnd) = GraftIndex.regexpRequiredLiteral(core)
    if (lit.length < 2) None
    else {
      val q = (if (hasBegin && atStart) graft.analyzer.TokenRegexpTokenizer.BeginMark else "") +
        lit +
        (if (hasEnd && atEnd) graft.analyzer.TokenRegexpTokenizer.EndMark else "")
      Some(searchPhrase(q))
    }
  }

  def searchRegexp(pattern: String, maxExpansions: Int = 1024): DataFrame = {
    val matching = regexpDictionary(pattern)
    val sample = matching.limit(maxExpansions + 1).as[String].collect()
    if (sample.isEmpty) emptyResult
    else if (sample.length <= maxExpansions)
      searchTerms(sample.toSeq, MatchMode.Any, ScoreMode.Tf)
    else searchTermsTfByJoin(matching)
  }

  /** Top-k with the deterministic reference tie order (-_score, _id). */
  def topK(result: DataFrame, k: Int): DataFrame =
    result.orderBy(desc("score"), asc("doc_id")).limit(k)

  /** Index-order sort fast path (grn_table_sort_index, lib/sort.c:33,
    * chosen at :1077-1096): ascending `_id` with a limit is served by the
    * STORAGE ORDER instead of a sort of the whole table. Append-only ids
    * keep segment doc ranges disjoint and ascending in manifest order, so
    * the first `limit` ids live entirely in the shortest segment prefix
    * whose cumulative doc count reaches `limit` — only those segments are
    * scanned (at scale: one segment out of thousands; counts come from
    * parquet footers, no data read). Upserts break the ascending-range
    * invariant, but they always leave tombstones, which routes to the
    * sorted fallback until compact restores the fast path. */
  /** one docs segment's (minDoc, maxDoc, rowCount) read from its parquet
    * FOOTER statistics — driver-side metadata IO only, no Spark job, no
    * data pages touched. None when any row group lacks doc_id stats (then
    * the fast path is unvalidatable and callers must fall back). */
  private def footerDocRange(dir: String): Option[(Long, Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val fs = SegmentCatalog.fileSystem(spark, dir)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.startsWith("part-"))
    GraftIndex.footerReads.addAndGet(files.length)
    var lo = Long.MaxValue
    var hi = Long.MinValue
    var cnt = 0L
    var statsOk = true
    var fi = 0
    while (statsOk && fi < files.length) { // stop footer IO once invalid
      val st = files(fi)
      fi += 1
      val rd = ParquetFileReader.open(
        HadoopInputFile.fromStatus(st, spark.sparkContext.hadoopConfiguration))
      try {
        val it = rd.getFooter.getBlocks.iterator()
        while (statsOk && it.hasNext) {
          val b = it.next()
          cnt += b.getRowCount
          var found = false
          val cit = b.getColumns.iterator()
          while (cit.hasNext) {
            val c = cit.next()
            if (c.getPath.toDotString == "doc_id") {
              c.getStatistics match {
                case s: org.apache.parquet.column.statistics.LongStatistics
                    if s.hasNonNullValue =>
                  if (s.genericGetMin < lo) lo = s.genericGetMin
                  if (s.genericGetMax > hi) hi = s.genericGetMax
                  found = true
                case _ =>
              }
            }
          }
          if (!found && b.getRowCount > 0) statsOk = false
        }
      } finally rd.close()
    }
    if (statsOk) Some((lo, hi, cnt)) else None
  }

  /** per-segment (minDoc, maxDoc, count) — from the MANIFEST's persisted
    * segment stats when present (one manifest read for the whole index, the
    * 100-TB path), else once per handle from parquet footers (legacy
    * manifests only: O(segment files) of driver-sequential metadata IO) */
  @transient private lazy val segDocRanges: Seq[Option[(Long, Long, Long)]] = {
    val ss = meta.segStats
    if (ss.nonEmpty && ss.map(_.name) == segDirs)
      ss.map(s => Some((s.minDoc, s.maxDoc, s.nDocs)))
    else tablePaths("docs").map(footerDocRange)
  }

  def idOrderScan(limit: Int): DataFrame = {
    if (deletesDf.nonEmpty || limit <= 0)
      return docs.select($"doc_id", $"dl").orderBy($"doc_id").limit(math.max(limit, 0))
    // The prefix trick REQUIRES strictly ascending disjoint segment ranges.
    // appendSegment documents append-only ids but cannot enforce them
    // (doc_id is a user key) — an out-of-order append would silently return
    // the wrong first-N, so validate from footer-stat ranges (metadata
    // only, no data read) and fall back to the sorted scan when the
    // invariant doesn't hold or stats are unavailable.
    val ranges = segDocRanges
    val ascending = ranges.forall(_.isDefined) && {
      val rs = ranges.flatten.filter(_._3 > 0)
      rs.sliding(2).forall {
        case Seq((_, hi, _), (lo2, _, _)) => hi < lo2
        case _ => true
      }
    }
    if (!ascending)
      return docs.select($"doc_id", $"dl").orderBy($"doc_id").limit(limit)
    val segs = tablePaths("docs")
    var acc = 0L
    val prefix = segs.zip(ranges).takeWhile { case (_, r) =>
      val before = acc
      acc += r.map(_._3).getOrElse(0L)
      before < limit
    }.map(_._1)
    spark.read.parquet(prefix: _*)
      .select($"doc_id", $"dl").orderBy($"doc_id").limit(limit)
  }
}

object GraftIndex {
  /** tombstone sets past this size must be compacted away, not shipped to
    * every task */
  final val MaxDriverTombstones: Int = 5000000

  /** count of parquet footers opened for doc-range fallbacks — observable
    * so tests can prove a stats-bearing manifest serves id-order scans and
    * partial compaction with ZERO per-file metadata IO */
  val footerReads = new java.util.concurrent.atomic.AtomicLong(0L)

  /** default Σ-df cap for the driver-side small-query kernel path: ~256k
    * postings ≈ single-digit MB of encoded blocks on the driver */
  final val DefaultSmallQueryMaxPostings: Long = 1L << 18

  /** default Σ-df cap per batched-search CHUNK (spark.graft.batchMaxPostings):
    * searchTermsBatch materializes, per bucket, the blocks of the UNION of a
    * chunk's terms — so executor memory scales with the chunk's posting
    * footprint, and an uncapped batch of common terms could OOM a task. 16M
    * postings ≈ tens of MB of encoded blocks in the worst (single-bucket
    * skew) case; a single query over the cap still runs, as its own chunk —
    * the same bound the single-query kernel has. */
  final val DefaultBatchMaxPostings: Long = 1L << 24

  /** Time-travel read: open the index as of a retained manifest version
    * (SegmentCatalog.listVersions). Commits keep the newest
    * `SegmentCatalog.ManifestRetain` manifests; append/delete commits
    * never remove segment files, so those snapshots stay readable.
    * compact()/compactPartial() physically delete superseded segments —
    * that IS snapshot expiry — so a snapshot referencing them fails HERE,
    * loudly, rather than mid-query. */
  def atVersion(spark: SparkSession, path: String, version: Long): GraftIndex = {
    val idx = GraftIndex(spark, path, Some(version))
    val fs = SegmentCatalog.fileSystem(spark, path)
    val missing = idx.tableDirsForValidation.filterNot(p =>
      fs.exists(new org.apache.hadoop.fs.Path(p)))
    if (missing.nonEmpty) throw new java.io.FileNotFoundException(
      s"snapshot $version of $path is expired: compaction deleted " +
        s"segment(s) it references (${missing.mkString(", ")}); only " +
        "snapshots newer than the last compact()/compactPartial() are readable")
    // recycled-name guard: engine-generated names embed the (monotonic)
    // manifest version so they are never reused, but caller-chosen append
    // names and legacy count-derived names can be. If a segment name the
    // snapshot recorded ALSO appears in the head manifest with different
    // stats, the directory was replaced after this snapshot — the bytes
    // on disk are not the ones it recorded.
    val headStats = SegmentCatalog.readMeta(fs, path)
      .segStats.map(s => s.name -> s).toMap
    val recycled = idx.meta.segStats.filter(s =>
      headStats.get(s.name).exists(h => h != s))
    if (recycled.nonEmpty) throw new java.io.FileNotFoundException(
      s"snapshot $version of $path is expired: segment(s) " +
        s"${recycled.map(_.name).mkString(", ")} were rewritten under the " +
        "same name after this snapshot (stats differ from the live manifest)")
    idx
  }

  /** retained snapshot versions for `path`, ascending */
  def versions(spark: SparkSession, path: String): Seq[Long] =
    SegmentCatalog.listVersions(SegmentCatalog.fileSystem(spark, path), path)

  /** Longest literal prefix REQUIRED by a `^`-anchored Java regexp, or ""
    * when none can be proven. Conservative by construction — a returned
    * prefix is sound iff every matching string starts with it, so:
    *   - unanchored patterns, or any `|` anywhere (alternation could
    *     bypass the prefix), or a leading group/class → ""
    *   - a quantifier (`* + ? {`) makes its preceding char optional or
    *     repeated: drop that char and stop (keeping fewer chars is always
    *     sound; `^ab?c` → "a", `^qu.*y$` → "qu")
    *   - `\x` where x is a regex metachar/punct is that literal char;
    *     `\d`-style classes stop the scan
    * (the reference's simple-regexp fast paths play the same game of
    * proving a pattern is cheaper than full regex execution —
    * lib/expr_executor.cpp:2862). */
  def regexpLiteralPrefix(pattern: String): String = {
    if (!pattern.startsWith("^") || pattern.contains("|")) return ""
    val meta = ".[({*+?$\\"
    val sb = new StringBuilder
    var i = 1
    var done = false
    while (!done && i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '*' || c == '+' || c == '?' || c == '{') {
        if (sb.nonEmpty) sb.setLength(sb.length - 1) // preceding char now unproven
        done = true
      } else if (c == '\\' && i + 1 < pattern.length) {
        val e = pattern.charAt(i + 1)
        if (Character.isLetterOrDigit(e)) done = true // \d \w \Q … — give up
        else { sb.append(e); i += 2 }                 // escaped literal metachar
      } else if (meta.indexOf(c.toInt) >= 0) {
        done = true
      } else { sb.append(c); i += 1 }
    }
    // a quantifier could still follow the scan break via lookahead etc.;
    // the loop already stopped before consuming it, so sb is proven
    sb.toString
  }

  /** Longest blank-free literal run REQUIRED by every match of `core` (a
    * pattern whose outer `\A`/`^` / `\z`/`$` anchors are already stripped),
    * plus whether that run abuts the core's start / end. Conservative
    * candidate extraction in the public trigram-index style (Cox 2012,
    * "Regular Expression Matching with a Trigram Index"): a quantifier
    * un-requires its preceding char, classes/dots break runs, and the scan
    * stops at the first group or alternation (runs found before it stay
    * sound). Soundness = no false negatives: every string matching the
    * pattern contains every returned run contiguously, so gram-phrase
    * candidates on the run are a superset of the regexp's matches and the
    * caller's full-regex confirm is exact. */
  def regexpRequiredLiteral(core: String): (String, Boolean, Boolean) = {
    // a TOP-LEVEL alternation anywhere means no literal is required by
    // every branch (pattern 'spark|scan': docs matching only 'scan' must
    // not be pruned away) — pre-scan at paren depth 0, tracking escapes,
    // and give up so callers fall back to the full-regex confirm over all
    // docs. Branch-intersection extraction (Cox 2012) can refine later.
    {
      var d = 0
      var j = 0
      while (j < core.length) {
        core.charAt(j) match {
          case '\\' => j += 1 // skip escaped char (trailing \ just ends)
          case '(' => d += 1
          case ')' => if (d > 0) d -= 1
          case '|' if d == 0 => return ("", false, false)
          case _ =>
        }
        j += 1
      }
    }
    val runs = new scala.collection.mutable.ArrayBuffer[(String, Int, Int)]()
    val cur = new StringBuilder
    var curStart = 0
    var i = 0
    var stopped = false
    def flush(endIdx: Int): Unit = {
      if (cur.nonEmpty) runs += ((cur.toString, curStart, endIdx))
      cur.setLength(0)
    }
    while (i < core.length && !stopped) {
      core.charAt(i) match {
        case '(' | '|' => stopped = true; flush(i)
        case '?' | '*' =>
          if (cur.nonEmpty) cur.setLength(cur.length - 1) // preceding char optional
          flush(i); i += 1
        case '{' =>
          if (cur.nonEmpty) cur.setLength(cur.length - 1)
          flush(i)
          val j = core.indexOf('}', i)
          i = if (j < 0) core.length else j + 1
        case '+' => flush(i); i += 1 // prev char required, adjacency beyond unknown
        case '.' | ')' | '}' | ']' | '^' | '$' => flush(i); i += 1
        case '[' =>
          flush(i)
          var j = i + 1
          if (j < core.length && core.charAt(j) == '^') j += 1
          if (j < core.length && core.charAt(j) == ']') j += 1
          while (j < core.length && core.charAt(j) != ']') {
            if (core.charAt(j) == '\\') j += 1
            j += 1
          }
          i = if (j >= core.length) core.length else j + 1
        case '\\' if i + 1 >= core.length =>
          // trailing lone backslash: malformed pattern — break the run and
          // stop instead of treating '\' as a required literal char
          stopped = true; flush(i)
        case '\\' =>
          val e = core.charAt(i + 1)
          if (Character.isLetterOrDigit(e)) { flush(i); i += 2 } // \d \w \b … class/boundary
          else { if (cur.isEmpty) curStart = i; cur.append(e); i += 2 }
        case ch if Character.isWhitespace(ch) =>
          flush(i); i += 1 // grams never cross blanks
        case ch =>
          if (cur.isEmpty) curStart = i
          cur.append(ch); i += 1
      }
    }
    if (!stopped) flush(core.length)
    if (runs.isEmpty) ("", false, false)
    else {
      val (txt, s, e) = runs.maxBy(_._1.length)
      (txt, s == 0, !stopped && e == core.length)
    }
  }
}
