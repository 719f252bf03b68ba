package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

import graft.index.{GraftIndex, SegmentCatalog}

/** Driver-side LRU cache for `select` results — the analogue of the
  * reference's query cache (/root/reference/lib/cache.c, consulted by the
  * select command at lib/proc/proc_select.cpp:4822-4839).
  *
  * Keyed by the normalized request plus the index SNAPSHOT VERSION (the
  * committed manifest name), so any mutation — append / delete / upsert /
  * compact — naturally invalidates every cached entry for that index on the
  * next lookup, exactly like the reference flushing its cache on DB update.
  *
  * Select results are bounded (offset/limit), so entries store the collected
  * rows; a hit rebuilds a local DataFrame without touching the cluster.
  * Requests carrying arbitrary Column/closure state (postFilter, scorer,
  * source table) bypass the cache — their identity is not stringly-keyable,
  * and a wrong hit would be silent corruption. */
final class SelectCache(capacity: Int = 100) {

  private final case class Key(path: String, snapshot: String, req: String)
  private final case class Entry(schema: StructType, rows: Array[Row])

  private val lru =
    new java.util.LinkedHashMap[Key, Entry](capacity, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Key, Entry]): Boolean =
        size() > capacity
    }

  @volatile private var hitCount = 0L
  @volatile private var missCount = 0L
  def hits: Long = hitCount
  def misses: Long = missCount

  /** postFilter/scorer/source carry closure state (not stringly-keyable);
    * limit < 0 means "all rows" — caching it would collect an unbounded
    * result into the driver LRU, so it falls through too */
  private def cacheable(req: Select.Request): Boolean =
    req.postFilter.isEmpty && req.scorer.isEmpty && req.source.isEmpty &&
      req.limit >= 0

  private def keyOf(idx: GraftIndex, req: Select.Request): Key = {
    // length-prefix every field AND every sortKeys element: unambiguous even
    // when a field contains the join character (a bare concat would let
    // "a"|1|23 collide with "a"|12|3, and Seq("a,b") with Seq("a","b"))
    val sortNorm = req.sortKeys
      .map { case (c, asc) => s"${c.length}:$c:$asc" }.mkString(";")
    val norm = Seq(req.query, req.score.toString,
      sortNorm, req.offset.toString, req.limit.toString,
      req.filterScript.getOrElse(""), req.allowLeadingNot.toString)
      .map(f => s"${f.length}:$f").mkString("|")
    Key(idx.path, idx.snapshotId, norm)
  }

  /** select through the cache; uncacheable requests fall through */
  def select(idx: GraftIndex, req: Select.Request): DataFrame = {
    if (!cacheable(req)) return Select.select(idx, req)
    val key = keyOf(idx, req)
    val cached = lru.synchronized(Option(lru.get(key)))
    cached match {
      case Some(e) =>
        hitCount += 1
        idx.spark.createDataFrame(
          new java.util.ArrayList[Row](java.util.Arrays.asList(e.rows: _*)), e.schema)
      case None =>
        missCount += 1
        val df = Select.select(idx, req)
        val rows = df.collect()
        lru.synchronized(lru.put(key, Entry(df.schema, rows)))
        idx.spark.createDataFrame(
          new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), df.schema)
    }
  }
}
