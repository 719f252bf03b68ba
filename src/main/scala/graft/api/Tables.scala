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
}
