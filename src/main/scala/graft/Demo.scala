package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.WebCorpus
import graft.index.{GraftIndex, IndexBuilder, IndexConfig}
import graft.query.{MatchMode, ScoreMode}

/** End-to-end smoke driver: generate corpus -> build index -> query.
  * Run: sbt "runMain graft.Demo [nDocs] [outDir]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000L)
    val out = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString + "/idx")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val docs = WebCorpus.generate(spark, n, partitions = 16)
    val index = IndexBuilder.build(spark, docs, "doc_id", "text", out, IndexConfig())
    val buildSec = (System.nanoTime() - t0) / 1e9
    println(f"[demo] built index over $n docs in $buildSec%.2f s " +
      f"(${n / buildSec}%.0f docs/s) at $out")
    println(f"[demo] meta: nDocs=${index.meta.nDocs} avgdl=${index.meta.avgdl}%.2f " +
      f"postings=${index.meta.totalPostings} bytes=${index.meta.totalPayloadBytes}")

    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val rows = df.collect()
      println(s"[demo] $name -> ${rows.length} rows: " +
        rows.take(5).map(r => s"(${r.getLong(0)}, ${"%.4f".format(r.getDouble(1))})").mkString(", "))
    }

    show("AND tf", index.searchTerms(Seq("spark", "fulltext"), MatchMode.All, ScoreMode.Tf))
    show("OR bm25 top10",
      index.topK(index.searchTerms(Seq("spark", "crawl", "lin"),
        MatchMode.Any, ScoreMode.Bm25(), topK = 10), 10))
    show("phrase", index.searchPhrase("inverted index posting list"))
    show("ja phrase (bigram path)", index.searchPhrase("全文検索"))
    println(s"[demo] prefix 'ka' -> ${index.expandPrefix("ka").take(8).mkString(",")}")
    println(s"[demo] suffix 'ing' -> ${index.expandSuffix("ing").take(8).mkString(",")}")
    show("near-phrase", index.searchNearPhrase(Seq("inverted index", "posting"), 12))
    show("query 'spark +fulltext -crawl'",
      graft.operators.Select.eval(index,
        graft.query.QueryParser.parse("spark +fulltext -crawl"), ScoreMode.Tf))

    // indexed regexp: TokenRegexp grams index, mark-anchored literal
    // phrase prune + full-regex confirm (r6)
    {
      import org.apache.spark.sql.functions.col
      val rxDir = java.nio.file.Files.createTempDirectory("graft-demo-rx")
        .toString + "/idx"
      val rxIdx = IndexBuilder.build(spark, docs, "doc_id", "text", rxDir,
        IndexConfig(tokenizer = "TokenRegexp"))
      def rx(pattern: String): Long = {
        val cands = rxIdx.searchRegexpGrams(pattern) match {
          case Some(c) => docs.join(c.select(col("doc_id")), Seq("doc_id"))
          case None => docs
        }
        cands.where(col("text").rlike(pattern)).count()
      }
      // anchor on a word the corpus actually starts docs with
      val firstWord = docs.orderBy("doc_id").select("text").limit(1)
        .collect()(0).getString(0).split(" ")(0)
      val anchored = rx("\\A" + firstWord)
      val classed = rx("sp[ae]rk")
      val cands = rxIdx.searchRegexpGrams("\\A" + firstWord).get.count()
      println(s"[demo] regexp grams: \\A$firstWord -> $anchored docs " +
        s"(begin-mark pruned candidates: $cands), sp[ae]rk -> $classed docs")
    }

    // delete + upsert round-trip on the live index (same ids, new text)
    val victim = index.searchTerms(Seq("spark")).select("doc_id")
      .orderBy("doc_id").limit(1).collect()(0).getLong(0)
    val preUpsertV = GraftIndex.versions(spark, out).last
    graft.streaming.IncrementalIndex.upsert(spark, out,
      spark.createDataFrame(Seq((victim, "graftdemo upserted text"))).toDF("doc_id", "text"),
      "doc_id", "text", "seg-demo-upsert")
    val after = GraftIndex(spark, out)
    show("upserted doc searchable", after.searchTerms(Seq("graftdemo")))
    println(s"[demo] upsert: doc $victim no longer matches 'spark': " +
      s"${after.searchTerms(Seq("spark")).where(org.apache.spark.sql.functions.col("doc_id") === victim).count() == 0}")

    // time travel: the pre-upsert snapshot still answers with the OLD doc
    val vers = GraftIndex.versions(spark, out)
    val pinned = GraftIndex.atVersion(spark, out, preUpsertV)
    println(s"[demo] time travel: ${vers.length} retained snapshots; " +
      s"pre-upsert snapshot still matches 'spark' on doc $victim: " +
      s"${pinned.searchTerms(Seq("spark")).where(org.apache.spark.sql.functions.col("doc_id") === victim).count() == 1}")

    // vector-index lifecycle: build -> append -> delete -> rebalance ->
    // search, full probe exact over the survivors at every step
    {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val vdir = java.nio.file.Files.createTempDirectory("graft-demo-vec")
        .toString + "/ivf"
      // base corpus spans 8 modes; the APPEND floods a single mode — the
      // frozen-centroid skew that imbalance() detects and rebalance() fixes
      def vvec(id: Long): Array[Float] = {
        val mode = if (id < 300) id % 8 else 3L
        Array.tabulate(16) { d =>
          (math.sin(mode * 7.3 + d * 1.7) * 5 + math.sin(id * 13.1 + d) * 0.3).toFloat
        }
      }
      val emb = (0L until 600L).map(i => (i, vvec(i))).toDF("vec_id", "embedding")
      graft.ml.AnnIndex.build(emb.where($"vec_id" < 300), "vec_id", "embedding",
        vdir, nlist = 8)
      graft.ml.AnnIndex.append(emb.where($"vec_id" >= 300), "vec_id", "embedding", vdir)
      graft.ml.AnnIndex.delete(spark, vdir, (0L until 600L).filter(_ % 5 == 2))
      val skew = graft.ml.AnnIndex.imbalance(spark, vdir)
      graft.ml.AnnIndex.rebalance(spark, vdir)
      val bal = graft.ml.AnnIndex.imbalance(spark, vdir)
      val hits = graft.ml.AnnIndex.search(spark, vdir, vvec(7), k = 5, nprobe = 8)
        .select("vec_id").as[Long].collect()
      println(f"[demo] vector lifecycle: append+delete+rebalance " +
        f"(imbalance $skew%.2f -> $bal%.2f), top-5 over survivors: " +
        s"${hits.mkString(",")} (tombstones filtered: ${hits.forall(_ % 5 != 2)})")
    }

    // html ingestion front: real pages (tags + char refs) -> NormalizerHTML
    // extraction -> byte-identical text per url (the input-hint invariant)
    {
      import org.apache.spark.sql.functions.col
      val htmlDocs = graft.corpus.WebCorpus.generateHtml(spark, 300, partitions = 4)
      val extracted = graft.corpus.WebCorpus.extractText(htmlDocs)
        .join(htmlDocs.select("doc_id", "text"), "doc_id")
      val ok = extracted.where(col("extracted") === col("text")).count()
      println(s"[demo] html extraction byte-identical: $ok/300 docs")
    }
    spark.stop()
  }
}
