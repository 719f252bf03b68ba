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

  /** TokenRegexp grams index (begin/end marks + stride-1 bigrams that
    * never cross a blank) — the indexed regexp-search surface
    * (/root/reference/lib/tokenizers.c:1289). */
  def documentsRegexpIndex(spark: SparkSession, sfDir: String): GraftIndex = {
    val key = sfDir.replaceAll("[^a-zA-Z0-9.]", "_") + "-rx"
    cache.computeIfAbsent(key, { _ =>
      val out = s"/tmp/graft-cache/$key/documents-idx"
      IndexBuilder.build(spark, table(spark, sfDir, "documents"),
        "doc_id", "text", out, IndexConfig(tokenizer = "TokenRegexp"))
    })
  }

  /** Base documents index with a deterministic mutation batch applied:
    * doc_id % 50 == 7 deleted, doc_id % 50 == 3 upserted to a fixed marker
    * text. Built ONCE per JVM (like the other gate indexes) so the
    * `ft_after_update*` gates measure query cost — the build/mutate phase
    * lands in the bench warm-up, reported under gate_index_build_s. The
    * mutation sequence is not idempotent on an already-mutated on-disk
    * index, so the directory is recreated on first use in each JVM. */
  def documentsMutatedIndex(spark: SparkSession, sfDir: String): GraftIndex = {
    import org.apache.spark.sql.functions._
    val key = sfDir.replaceAll("[^a-zA-Z0-9.]", "_") + "-mut"
    cache.computeIfAbsent(key, { _ =>
      val out = s"/tmp/graft-cache/$key/documents-idx"
      val fs = graft.index.SegmentCatalog.fileSystem(spark, out)
      fs.delete(new org.apache.hadoop.fs.Path(out), true)
      val docs = table(spark, sfDir, "documents")
      IndexBuilder.build(spark, docs, "doc_id", "text", out,
        IndexConfig(tokenizer = "TokenBigram"))
      graft.streaming.IncrementalIndex.delete(spark, out,
        docs.where(col("doc_id") % 50 === 7).select("doc_id"))
      graft.streaming.IncrementalIndex.upsert(spark, out,
        docs.where(col("doc_id") % 50 === 3)
          .select(col("doc_id"), lit("graftupd graftupd spark").as("text")),
        "doc_id", "text", "seg-upd", IndexConfig(tokenizer = "TokenBigram"))
      GraftIndex(spark, out)
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
