package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path

import graft.corpus.WebCorpus
import graft.index.{GraftIndex, IndexBuilder, IndexConfig, SegmentCatalog}
import graft.query.{MatchMode, ScoreMode}
import graft.streaming.IncrementalIndex

/** Regression tests for the round-3 robustness fixes: multi-segment
  * dictionary-expansion dedup, versioned crash-safe manifest commits, and
  * broadcast tombstones. */
class RobustnessSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nBase = 200
  private val nMore = 100
  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-robust").toString
  private lazy val corpus = (0L until (nBase + nMore)).map(i => i -> WebCorpus.text(i, 42L)._1)
  private lazy val naive = new NaiveSearch(corpus)
  private lazy val cfg = IndexConfig(bucketBits = 5)

  /** two-segment index over the same vocabulary (append shares terms) */
  private lazy val idx: GraftIndex = {
    IndexBuilder.build(spark,
      WebCorpus.generate(spark, nBase, 4), "doc_id", "text", s"$tmp/idx", cfg)
    IncrementalIndex.appendSegment(spark, s"$tmp/idx",
      WebCorpus.generate(spark, nBase + nMore, 4).where($"doc_id" >= nBase),
      "doc_id", "text", "seg-more", cfg)
  }

  private def collectScores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("multi-segment suffix expansion dedupes terms (no double-counted tf)") {
    assert(idx.meta.segments.length >= 2)
    // a suffix shared across both segments' vocabularies
    val sfx = "ka"
    val expanded = idx.expandSuffix(sfx)
    assert(expanded == expanded.distinct, "expansion must not repeat terms")
    val wantTerms = naive.df.keySet.filter(_.endsWith(sfx))
    assert(expanded.toSet == wantTerms, "expansion covers both segments' terms once")
    val got = collectScores(idx.searchSuffix(sfx))
    val want = corpus.flatMap { case (id, _) =>
      val s = wantTerms.toSeq.map(t => naive.tf(id, t)).sum
      if (s > 0) Some(id -> s.toDouble) else None
    }.toMap
    assert(got == want, "suffix tf must count each term once per doc")
  }

  test("multi-segment regexp search scores match single-counted tf") {
    val pattern = "^ka.*"
    val got = collectScores(idx.searchRegexp(pattern))
    val wantTerms = naive.df.keySet.filter(_.matches(pattern))
    val want = corpus.flatMap { case (id, _) =>
      val s = wantTerms.toSeq.map(t => naive.tf(id, t)).sum
      if (s > 0) Some(id -> s.toDouble) else None
    }.toMap
    assert(got == want)
  }

  test("multi-segment prefix expansion is distinct and df-summed") {
    val exp = idx.expandPrefix("ka")
    assert(exp == exp.distinct)
    assert(exp.toSet == naive.df.keySet.filter(_.startsWith("ka")))
  }

  test("manifest recommits are versioned: retained window, last wins, tmp ignored") {
    val path = s"$tmp/idx"
    val fs = SegmentCatalog.fileSystem(spark, path)
    idx // force build + append (>= 2 commits already happened)
    def names = fs.listStatus(new Path(path)).map(_.getPath.getName)
      .filter(n => n.startsWith("manifest") && n.endsWith(".json")).sorted.toSeq
    val before = names
    assert(before.nonEmpty && before.length <= SegmentCatalog.ManifestRetain,
      s"retained window, got $before")
    // a leftover .tmp from a crashed commit must not confuse the reader
    val junk = new Path(path, "manifest-999999.json.tmp")
    val out = fs.create(junk, true); out.write("{}".getBytes("UTF-8")); out.close()
    val meta = SegmentCatalog.readMeta(fs, path)
    assert(meta.nDocs == naive.nDocs)
    fs.delete(junk, false)
    // recommit bumps the version; predecessors stay retained (time travel)
    // up to ManifestRetain, and the READ path always takes the newest
    SegmentCatalog.commit(fs, path, meta, Map("noop" -> "recommit"))
    val after = names
    assert(after.length == math.min(before.length + 1, SegmentCatalog.ManifestRetain))
    assert(after.last > before.last, "version must ascend")
    assert(SegmentCatalog.readMeta(fs, path).nDocs == meta.nDocs)
    // far past the window: only the newest ManifestRetain survive
    (0 until SegmentCatalog.ManifestRetain + 2).foreach { i =>
      SegmentCatalog.commit(fs, path, meta, Map("noop" -> s"spin$i"))
    }
    assert(names.length == SegmentCatalog.ManifestRetain, s"GC to window: $names")
    assert(SegmentCatalog.readMeta(fs, path).nDocs == meta.nDocs)
  }

  test("legacy unversioned manifest.json still reads (version -1)") {
    val path = s"$tmp/idx"
    val fs = SegmentCatalog.fileSystem(spark, path)
    val meta = SegmentCatalog.readMeta(fs, path)
    val cur = fs.listStatus(new Path(path)).map(_.getPath)
      .filter(p => p.getName.startsWith("manifest") && p.getName.endsWith(".json")).head
    val legacy = new Path(path, SegmentCatalog.ManifestFile)
    // copy current manifest to the legacy name, drop the versioned one
    org.apache.hadoop.fs.FileUtil.copy(fs, cur, fs, legacy, false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(cur, false)
    assert(SegmentCatalog.isCommitted(fs, path))
    assert(SegmentCatalog.readMeta(fs, path).nDocs == meta.nDocs)
    // a fresh commit supersedes the legacy file for READS immediately (it
    // sorts as version -1); retention GCs it once it leaves the window
    SegmentCatalog.commit(fs, path, meta, Map("noop" -> "upgrade"))
    assert(SegmentCatalog.readMeta(fs, path).nDocs == meta.nDocs)
    assert(SegmentCatalog.listVersions(fs, path).last >= 0, "versioned head wins")
    (0 until SegmentCatalog.ManifestRetain).foreach { i =>
      SegmentCatalog.commit(fs, path, meta, Map("noop" -> s"spin$i"))
    }
    assert(!fs.exists(legacy), "legacy manifest GC'd once outside the retention window")
    assert(SegmentCatalog.readMeta(fs, path).nDocs == meta.nDocs)
  }

  test("suggest co-occurrence prunes the postings scan by bucket + doc range") {
    val term = naive.df.toSeq.sortBy { case (t, d) => (-d, t) }.head._1
    val df = graft.operators.Suggest.suggest(idx, term, k = 5, maxDocs = 50)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("bucket"), s"postings scan must carry a bucket filter:\n$plan")
    assert(plan.contains("max_doc") && plan.contains("min_doc"),
      "postings scan must carry block doc-range overlap filters")
    // the bucket prune is one IN over values (data), not a per-bucket OR
    // expression chain — at 10k scattered buckets the latter is a 10k-node
    // Column tree; a handful of mentions = single IN + pushed filter copy
    assert(plan.split("bucket").length - 1 <= 6,
      s"bucket filter must be a single IN, not an OR chain:\n$plan")
    // results match a naive co-occurrence count over the capped doc set
    val matched = corpus.collect { case (id, _) if naive.tf(id, term) > 0 => id }
      .sorted.take(50).toSet
    val want = corpus.filter(c => matched.contains(c._1))
      .flatMap { case (id, text) => naive.tokenized(id).map(_.term).distinct.map(t => (t, id)) }
      .filter(_._1 != term)
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).distinct.size.toLong) }
      .toSeq.sortBy { case (t, n) => (-n, t) }.take(5)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("select LRU cache: repeats hit, mutation invalidates, results identical") {
    val path = s"$tmp/idx3"
    IndexBuilder.build(spark,
      WebCorpus.generate(spark, nBase, 4), "doc_id", "text", path, cfg)
    val cache = new graft.operators.SelectCache(capacity = 8)
    val term = naive.df.toSeq.sortBy { case (t, d) => (-d, t) }.head._1
    val req = graft.operators.Select.Request(query = term, limit = 5)
    def run(): Seq[(Long, Double)] =
      cache.select(GraftIndex(spark, path), req)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val first = run()
    assert(cache.misses == 1 && cache.hits == 0)
    assert(run() == first && cache.hits == 1, "repeat must be a cache hit")
    // mutation commits a new manifest -> different snapshot key -> miss
    val victim = first.head._1
    IncrementalIndex.delete(spark, path, Seq(victim))
    val after = run()
    assert(cache.misses == 2, "post-mutation select must recompute")
    assert(!after.exists(_._1 == victim), "stale cached row must not resurface")
    // uncacheable requests bypass (no counters move)
    val (h, m) = (cache.hits, cache.misses)
    cache.select(GraftIndex(spark, path),
      req.copy(postFilter = Some(org.apache.spark.sql.functions.col("score") > 0)))
    assert(cache.hits == h && cache.misses == m)
  }

  test("select cache: unbounded bypass, no field collisions, leadingNot keyed") {
    val path = s"$tmp/idx3" // committed by the LRU test above (build resumes)
    IndexBuilder.build(spark,
      WebCorpus.generate(spark, nBase, 4), "doc_id", "text", path, cfg)
    val idx3 = GraftIndex(spark, path)
    val cache = new graft.operators.SelectCache(capacity = 8)
    val term = naive.df.toSeq.sortBy { case (t, d) => (-d, t) }.head._1
    // limit = -1 ("all rows") must NOT enter the LRU — it would collect an
    // unbounded result into the driver
    cache.select(idx3, graft.operators.Select.Request(query = term, limit = -1))
    assert(cache.hits == 0 && cache.misses == 0, "unbounded request must bypass")
    // adjacent numeric fields must not collide: (offset=1, limit=23) vs
    // (offset=12, limit=3) are distinct keys with distinct results
    val r1 = graft.operators.Select.Request(query = term, offset = 1, limit = 23)
    val r2 = graft.operators.Select.Request(query = term, offset = 12, limit = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val a = rows(cache.select(idx3, r1))
    val b = rows(cache.select(idx3, r2))
    assert(cache.misses == 2, "distinct requests must occupy distinct entries")
    assert(a != b)
    assert(b == rows(graft.operators.Select.select(idx3, r2)))
    // allowLeadingNot participates in the key: the permissive variant being
    // cached must not satisfy the strict one (which errors on leading NOT)
    val neg = s"-$term dummy"
    cache.select(idx3, graft.operators.Select.Request(query = neg,
      limit = 5, allowLeadingNot = true))
    intercept[Exception] {
      cache.select(idx3, graft.operators.Select.Request(query = neg,
        limit = 5, allowLeadingNot = false))
    }
  }

  test("index-order scan reads only the covering segment prefix") {
    val want = (0L until nBase + nMore).map(i => i).take(10)
    val q = idx.idOrderScan(10)
    assert(q.select($"doc_id").as[Long].collect().toSeq == want)
    // fast path: limit 10 < nBase docs in the base segment -> the appended
    // segment's files must not be touched
    assert(q.inputFiles.nonEmpty &&
      !q.inputFiles.exists(_.contains("seg-more")),
      s"appended segment scanned: ${q.inputFiles.mkString(", ")}")
    // a limit spanning both segments still returns the right prefix
    val wide = idx.idOrderScan(nBase + 5).select($"doc_id").as[Long].collect().toSeq
    assert(wide == (0L until (nBase + 5)).map(i => i))
    // mutations route to the sorted fallback and stay correct
    val mutPath = s"$tmp/idx-order-mut"
    IndexBuilder.build(spark,
      WebCorpus.generate(spark, nBase, 4), "doc_id", "text", mutPath, cfg)
    val after = IncrementalIndex.delete(spark, mutPath, Seq(0L, 3L))
    val got = after.idOrderScan(5).select($"doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 4L, 5L, 6L))
  }

  test("v1-format migration rebuilds ONLY unmutated base-only sectioned artifacts") {
    import org.apache.spark.sql.functions.lit
    // sectioned v1 artifact WITH an appended segment: build() must NOT
    // delete it (the appended docs aren't in the `docs` argument)
    val p = s"$tmp/idx-v1mut"
    val df = WebCorpus.generate(spark, 80, 2)
      .withColumn("title", lit("head words here"))
    IndexBuilder.buildSectioned(spark, df.where($"doc_id" < 60),
      "doc_id", Seq("title", "text"), p, cfg)
    IncrementalIndex.appendSegment(spark, p, df.where($"doc_id" >= 60),
      "doc_id", "text", "seg-v1", cfg)
    // downgrade the manifest to formatVersion 1 (a pre-r4 artifact)
    val fs = graft.index.SegmentCatalog.fileSystem(spark, p)
    val m1 = graft.index.SegmentCatalog.readMeta(fs, p)
    graft.index.SegmentCatalog.commit(fs, p, m1.copy(formatVersion = 1), Map.empty)
    val resumed = IndexBuilder.buildSectioned(spark, df.where($"doc_id" < 60),
      "doc_id", Seq("title", "text"), p, cfg)
    assert(resumed.meta.segments.contains("seg-v1"), "mutated v1 artifact was wiped!")
    assert(resumed.docs.count() == 80, "appended docs must survive the resume")
    // unmutated base-only sectioned v1: IS migrated (rebuilt as v2)
    val p2 = s"$tmp/idx-v1base"
    IndexBuilder.buildSectioned(spark, df.where($"doc_id" < 60),
      "doc_id", Seq("title", "text"), p2, cfg)
    val fs2 = graft.index.SegmentCatalog.fileSystem(spark, p2)
    val m2 = graft.index.SegmentCatalog.readMeta(fs2, p2)
    graft.index.SegmentCatalog.commit(fs2, p2, m2.copy(formatVersion = 1), Map.empty)
    val migrated = IndexBuilder.buildSectioned(spark, df.where($"doc_id" < 60),
      "doc_id", Seq("title", "text"), p2, cfg)
    assert(migrated.meta.formatVersion == IndexBuilder.CurrentFormatVersion)
    assert(migrated.docs.count() == 60)
  }

  test("tombstones ride a broadcast: deleted docs stay hidden") {
    val path = s"$tmp/idx2"
    IndexBuilder.build(spark,
      WebCorpus.generate(spark, nBase, 4), "doc_id", "text", path, cfg)
    val terms = naive.df.toSeq.sortBy { case (t, d) => (-d, t) }.map(_._1).take(2)
    val before = collectScores(
      GraftIndex(spark, path).searchTerms(terms, MatchMode.All, ScoreMode.Tf))
    val victims = before.keys.toSeq.sorted.take(2)
    val after = IncrementalIndex.delete(spark, path, victims)
    val got = collectScores(after.searchTerms(terms, MatchMode.All, ScoreMode.Tf))
    assert(got == before -- victims)
  }
}
