package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.index.{GraftIndex, IndexBuilder, IndexConfig}

/** Testdata access + per-scale-factor index cache. */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, GraftIndex]()

  /** Build (once per JVM+sfDir) the fulltext index over the documents table.
    * The on-disk index is keyed by the sf dir; a committed manifest short-
    * circuits the build entirely (SegmentCatalog resume). */
  def documentsIndex(spark: SparkSession, sfDir: String): GraftIndex = {
    val key = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    cache.computeIfAbsent(key, { _ =>
      val out = s"/tmp/graft-cache/$key/documents-idx"
      IndexBuilder.build(spark, table(spark, sfDir, "documents"),
        "doc_id", "text", out, IndexConfig(tokenizer = "TokenBigram"))
    })
  }

  /** index analyzed with the S-stemmer token filter (spec round-trips
    * through the manifest so query analysis stems identically) */
  def documentsStemmedIndex(spark: SparkSession, sfDir: String): GraftIndex = {
    val key = sfDir.replaceAll("[^a-zA-Z0-9.]", "_") + "-stem"
    cache.computeIfAbsent(key, { _ =>
      val out = s"/tmp/graft-cache/$key/documents-idx"
      IndexBuilder.build(spark, table(spark, sfDir, "documents"),
        "doc_id", "text", out,
        IndexConfig(tokenizer = "TokenBigram+TokenFilterStemS"))
    })
  }

  /** Two-column sectioned index (title = first 5 whitespace tokens of text,
    * derived deterministically; body = full text) — the match_columns
    * "title * W || text" surface. */
  def documentsSectionedIndex(spark: SparkSession, sfDir: String): GraftIndex = {
    import org.apache.spark.sql.functions._
    val key = sfDir.replaceAll("[^a-zA-Z0-9.]", "_") + "-sect"
    cache.computeIfAbsent(key, { _ =>
      val out = s"/tmp/graft-cache/$key/documents-idx"
      val docs = table(spark, sfDir, "documents")
        .withColumn("title", array_join(slice(split(col("text"), " "), 1, 5), " "))
      IndexBuilder.buildSectioned(spark, docs, "doc_id", Seq("title", "text"),
        out, IndexConfig(tokenizer = "TokenBigram"))
    })
  }
}
