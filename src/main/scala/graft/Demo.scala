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
    spark.stop()
  }
}
