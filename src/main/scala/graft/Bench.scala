package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.WebCorpus
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.{MatchMode, ScoreMode}

/** Round benchmark: one JSON line with
  *  - per-query wall seconds over SparkEntry.queries at SPARK_GRAFT_SF_DIR
  *  - index-build throughput (docs/sec) over a deterministic synthetic
  *    corpus (the BASELINE.json headline metric)
  *  - top-k query latency p50/p95 over repeated BM25 runs
  */
object Bench {
  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buildDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "100000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- warm-up: gate index build + first-touch parquet reads happen
    // once here, so per-query numbers measure the queries, not cold I/O.
    // The build cost is reported separately (gate_index_build JSON field).
    val gateBuildSec = time {
      graft.api.Tables.documentsIndex(spark, sfDir)
      graft.api.Tables.documentsSectionedIndex(spark, sfDir)
      graft.api.Tables.documentsStemmedIndex(spark, sfDir)
      graft.api.Tables.documentsRegexpIndex(spark, sfDir)
      // build+mutate phase of the ft_after_update* gates lands here, so
      // their per-query numbers measure the queries over the mutated index
      graft.api.Tables.documentsMutatedIndex(spark, sfDir)
      Seq("documents", "embeddings", "lineitem", "orders", "customer", "events")
        .foreach(t => graft.api.Tables.table(spark, sfDir, t).count())
    }

    // ---- operator queries ----
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // record the failure instead of letting a broken query read as fast
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n]", " ").take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0

    // ---- index-build throughput (headline metric) ----
    val buildDir = s"/tmp/graft-bench/build-$cpus-$buildDocs"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(buildDir), true)
    val corpus = WebCorpus.generate(spark, buildDocs, partitions = cpus.toInt * 2)
    val buildSec = time {
      IndexBuilder.build(spark, corpus, "doc_id", "text", buildDir, IndexConfig())
    }
    val docsPerSec = buildDocs / buildSec

    // ---- top-k latency distribution over the built index ----
    val idx = graft.index.GraftIndex(spark, buildDir)
    val queries = Seq(
      Seq("spark", "fulltext"), Seq("inverted", "index"), Seq("crawl"),
      Seq("spark", "crawl", "lin"), Seq("block", "max", "wand"))
    // warm-up: one pass over EVERY query shape (term-stat cache fill +
    // JIT), so the distribution measures steady-state repeated-query
    // latency rather than first-touch planning
    queries.foreach { terms =>
      idx.topK(idx.searchTerms(terms, MatchMode.Any, ScoreMode.Bm25(), topK = 10), 10).collect()
    }
    val lats = (0 until 4).flatMap { _ =>
      queries.map { terms =>
        time {
          idx.topK(idx.searchTerms(terms, MatchMode.Any, ScoreMode.Bm25(), topK = 10), 10).collect()
        }
      }
    }.sorted
    def pct(p: Double): Double = lats((p * (lats.size - 1)).round.toInt)
    // the same 20 queries answered as ONE batched job — shared pruned scan
    val batch20 = (0 until 4).flatMap(_ => queries)
    val batchSec = time {
      idx.topKPerQuery(idx.searchTermsBatch(batch20, MatchMode.Any,
        ScoreMode.Bm25(), topK = 10), 10).collect()
    }

    // ---- sectioned-index WAND datapoint on the DEFAULT corpus ----
    // The gate index's auto bucket sizing at bench SF yields one block per
    // bucket (nothing to skip — r4's datapoint was degenerate), so build
    // the same documents at the bucket geometry a 100-TB index has: big
    // buckets spanning many small blocks. The query pairs the common term
    // with the corpus's one rare term ("dup", df≈5%): once the top-10 heap
    // fills with both-term docs, common-term blocks containing no rare-term
    // candidate fall below the threshold and are skipped — the classic
    // WAND shape that works even on a tf-uniform corpus.
    val sectDir = "/tmp/graft-bench/sect-default"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(sectDir), true)
    val sectDocs = {
      import org.apache.spark.sql.functions._
      graft.api.Tables.table(spark, sfDir, "documents")
        .withColumn("title", array_join(slice(split(col("text"), " "), 1, 5), " "))
    }
    val sectIdx = IndexBuilder.buildSectioned(spark, sectDocs, "doc_id",
      Seq("title", "text"), sectDir,
      IndexConfig(tokenizer = "TokenBigram", bucketBits = 12, blockSize = 16))
    graft.query.MatchKernel.resetStats()
    val sectSec = time {
      sectIdx.topK(sectIdx.searchTerms(Seq("window", "dup"), MatchMode.Any,
        ScoreMode.Bm25(), topK = 10,
        sectionWeights = Map("title" -> 10.0)), 10).collect()
    }
    val (sectSeen, sectDecoded) = graft.query.MatchKernel.readStats()

    // the gate corpus is tf-UNIFORM (every block bound alike), the one shape
    // WAND cannot prune — so also measure a deterministic score-SKEWED
    // sectioned corpus (strong docs up front, long weak tail), the shape
    // web corpora actually have and WAND exists for
    val skewDir = "/tmp/graft-bench/sect-skew"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(skewDir), true)
    val skewDf = {
      import spark.implicits._
      val nSkew = 30000
      (0L until nSkew).map { i =>
        val (tT, tB) =
          if (i < 64) (12 + (i % 4).toInt, 13 + (i % 3).toInt)
          else if (i < nSkew * 2 / 3) (1, 0)
          else (0, 0)
        def rep(k: Int) = Seq.fill(k)("skewterm").mkString(" ")
        val fillT = (0 until math.max(0, 18 - tT)).map(j => s"u${i}x$j").mkString(" ")
        val fillB = (0 until math.max(0, 18 - tB)).map(j => s"v${i}x$j").mkString(" ")
        (i, rep(tT) + " " + fillT, rep(tB) + " " + fillB)
      }.toDF("doc_id", "title", "body")
    }
    // bucketBits=13 (8k docs/bucket → ~60 blocks per cursor): the bucket
    // geometry a 100-TB index has, where block skipping is the win — the
    // auto salt at 30k docs would make every bucket a single block
    val skewIdx = IndexBuilder.buildSectioned(spark, skewDf, "doc_id",
      Seq("title", "body"), skewDir,
      IndexConfig(tokenizer = "TokenBigram", bucketBits = 13))
    graft.query.MatchKernel.resetStats()
    val skewSec = time {
      skewIdx.topK(skewIdx.searchTerms(Seq("skewterm"), MatchMode.Any,
        ScoreMode.Bm25(), topK = 10,
        sectionWeights = Map("title" -> 2.0)), 10).collect()
    }
    val (skewSeen, skewDecoded) = graft.query.MatchKernel.readStats()

    // ---- sf1 data-ops scaling datapoint (opt-in: SPARK_GRAFT_SF1_DOCS) ----
    // The dedup/ANN/mixing family is gated at sf0.001 and benched at sf0.1
    // (5k docs); this section times the same gate functions over a 10x+
    // synthetic corpus in the SAME schema, so per-query scaling vs the
    // sf0.1 numbers is a committed regression datapoint. Deterministic
    // generation (WebCorpus splitmix64) — no external data.
    val sf1Docs = sys.env.getOrElse("SPARK_GRAFT_SF1_DOCS", "0").toLong
    val sf1Json = if (sf1Docs <= 0) "" else {
      val dir = s"/tmp/graft-sf1/$sf1Docs"
      val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/documents.parquet"))) {
        import spark.implicits._
        spark.range(0L, sf1Docs, 1L, cpus.toInt * 2).as[Long].map { i =>
          // ~2.7% verbatim near-dups so LSH/components do real work
          val src = if (i % 37 == 0 && i > 36) i - (i % 5) - 1 else i
          val (t, lang) = WebCorpus.text(src, 77L)
          (i, t, lang, s"src${i % 20}", t.length.toLong)
        }.toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val nEmb = math.max(2000L, sf1Docs / 5 * 2)
        spark.range(0L, nEmb, 1L, cpus.toInt * 2).as[Long].map { i =>
          val label = (i % 10).toInt
          val v = Array.tabulate(64) { d =>
            (math.sin(label * 7.3 + d * 1.7) * 5.0 +
              math.sin(i * 13.1 + d * 3.9) * 0.3).toFloat
          }
          (i, v, label)
        }.toDF("vec_id", "embedding", "label")
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      val names = Seq("dedup_minhash_lsh", "dedup_components", "seq_pack",
        "dedup_substring", "quantiles_sketch", "ann_ivfpq_topk")
      val times = names.map { n =>
        n -> time { SparkEntry.queries(n)(spark, dir).count() }
      }
      // the gate shape is the exactness path (full probe + full rerank);
      // also time the PRUNED scale path over the same artifact
      val prunedSec = time {
        import org.apache.spark.sql.functions.col
        val q = graft.api.Tables.table(spark, dir, "embeddings")
          .where(col("vec_id") === 0L).select("embedding")
          .collect()(0).getSeq[Float](0).toArray
        graft.ml.IvfPq.search(spark,
          graft.api.DataOpsQueries.ivfPqIndexPath(spark, dir),
          q, k = 10, nprobe = 4, rerank = 256).collect()
      }
      val ts = times.map { case (k, v) => "\"" + k + "\":" + v }.mkString(",")
      s""","sf1_dataops":{"docs":$sf1Docs,$ts,"ann_ivfpq_pruned":$prunedSec}"""
    }

    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir",""" +
      s""""errors":$errJson,"gate_index_build_s":$gateBuildSec,""" +
      s""""build":{"docs":$buildDocs,"secs":$buildSec,"docs_per_sec":$docsPerSec,"cpus":$cpus},""" +
      s""""topk_latency":{"p50_ms":${pct(0.5) * 1000},"p95_ms":${pct(0.95) * 1000},"n":${lats.size}},""" +
      s""""batch_topk":{"n":${batch20.size},"secs":$batchSec,"qps":${batch20.size / batchSec}},""" +
      s""""sect_wand":{"secs":$sectSec,"blocks_seen":$sectSeen,"blocks_decoded":$sectDecoded,""" +
      s""""blocks_skipped":${sectSeen - sectDecoded}},""" +
      s""""sect_wand_skew":{"secs":$skewSec,"blocks_seen":$skewSeen,""" +
      s""""blocks_decoded":$skewDecoded,"blocks_skipped":${skewSeen - skewDecoded}}""" +
      sf1Json + "}"
    // headline summary FIRST: the driver artifact has tail-truncated the
    // full JSON twice — lead with the numbers + the path of the full copy
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH/bench_last.json")
    println(f"[bench-summary] total=$total%.1fs nq=${results.size} " +
      f"errors=${errors.size} build=${docsPerSec.round} docs/s " +
      f"p50=${pct(0.5) * 1000}%.0fms p95=${pct(0.95) * 1000}%.0fms " +
      s"full_json=$outPath")
    println(json)
    // the full metric line also goes to its own file: stdout capture has
    // been observed tail-truncating the driver artifact (r2 lost 15/78
    // per-query timings), and the JSON is the round's primary evidence
    val outFile = outPath
    try {
      val p = java.nio.file.Paths.get(outFile)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
