package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-FLAT ANN index persisted as a parquet artifact — the scale path for
  * embedding search over a corpus too large to brute-force per query.
  *
  * Layout (the inverted-file analogue of the posting-list design used for
  * text): vectors are assigned to their nearest of `nlist` coarse
  * centroids, and the table is written RANGE-PARTITIONED AND SORTED by
  * `list_id`, so a probe of `nprobe` lists becomes a pushed-down
  * `list_id IN (...)` predicate: parquet row-group min/max stats (and, on a
  * partitioned lake, directory pruning) skip everything outside the probed
  * lists before any vector is read. Search cost scales with
  * nprobe/nlist of the corpus instead of the corpus.
  *
  * Centroids are chosen DETERMINISTICALLY (the `nlist` lowest-id vectors)
  * rather than by randomized k-means: reproducibility across engines and
  * runs is a correctness-gate requirement here, and the index layout,
  * probe math, and pruning behavior — the parts that matter at 100 TB —
  * are identical whichever coarse quantizer produces the centroids. A
  * k-means quantizer can be swapped in by passing explicit `centroids`.
  *
  * Probing more lists trades latency for recall exactly like IVF-FLAT
  * elsewhere; `nprobe = nlist` degrades gracefully to exact brute force
  * (which the oracle gate exploits: plumbing is verified hash-exact).
  *
  * Lifecycle parity with the text index: [[append]] ingests with frozen
  * centroids, [[delete]] retires ids via generation tombstones
  * ([[VecStore]]), [[compact]] folds the tombstones, [[listStats]] /
  * [[imbalance]] measure the list skew appends accumulate, and
  * [[rebalance]] re-trains centroids on the surviving corpus and rewrites
  * the lists behind an atomic state swap.
  */
object AnnIndex {

  final case class Centroid(list_id: Int, centroid: Array[Float])

  /** JVM cache of collected centroid sets keyed by the directory's content
    * fingerprint (file names + lengths + mtimes from ONE listing): repeated
    * searches against an unchanged index skip the per-call collect job; any
    * rewrite (build/rebalance writes fresh files) changes the fingerprint
    * and misses. Bounded: cleared past 64 entries (each is nlist x dim
    * floats — model-sized, never data-sized). */
  private val centCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Centroid]]()

  private[ml] def dirFingerprint(spark: SparkSession, dir: String): String = {
    val fs = graft.index.SegmentCatalog.fileSystem(spark, dir)
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(s => s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(dir + "|", ";", "")
  }

  private[ml] def readCentroids(spark: SparkSession, dir: String): Array[Centroid] = {
    import spark.implicits._
    if (centCache.size > 64) centCache.clear()
    centCache.computeIfAbsent(dirFingerprint(spark, dir),
      _ => spark.read.parquet(dir).as[Centroid].collect())
  }

  private def l2sq(a: Array[Float], b: Array[Float]): Double =
    Similarity.l2sqLocal(a, b)

  /** nearest-centroid id; ties resolve to the lowest list_id (shared with
    * the IVF+PQ composed index — one assignment kernel for both layouts) */
  private[ml] def assignList(v: Array[Float], cents: Array[Centroid]): Int = assign(v, cents)

  private def assign(v: Array[Float], cents: Array[Centroid]): Int = {
    var best = 0; var bestD = Double.MaxValue; var i = 0
    while (i < cents.length) {
      val d = l2sq(v, cents(i).centroid)
      if (d < bestD) { bestD = d; best = cents(i).list_id }
      i += 1
    }
    best
  }

  /** Lloyd refinement with deterministic SEEDS (the nlist lowest-id
    * vectors — no RNG): `iters` alternating assign/mean steps, each one
    * shuffle with centroids broadcast. Mean accumulation order follows
    * task order, so centroids are reproducible only up to float rounding —
    * which is fine: an IVF index persists its own centroids, and search
    * correctness depends only on assign/probe using the SAME stored set
    * (the hash gate proves that via the nprobe=nlist exact path). Empty
    * clusters keep their previous centroid. Use the result as
    * `build(..., centroids = Some(...))` for tighter lists (higher recall
    * at the same nprobe) than raw seeds.
    *
    * `hashSeeds = true` seeds from the nlist rows with the smallest
    * LCG(id) — a deterministic UNIFORM sample of the corpus, so a dense
    * region gets proportionally many seeds and Lloyd can SPLIT it into
    * several lists (lowest-id seeding plants at most one seed per region
    * regardless of its mass, which leaves a one-mode flood as one
    * oversized list forever — the failure [[rebalance]] exists to fix). */
  def trainCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 5, hashSeeds: Boolean = false): Seq[Array[Float]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val seedKey =
      if (hashSeeds)
        (pmod(col(idCol).cast("long"), lit(2147483648L)) * lit(1103515245L)
          + lit(12345L)) % lit(2147483648L)
      else col(idCol)
    var cents: Array[Centroid] = vecs
      .orderBy(seedKey.asc, col(idCol).asc).limit(nlist)
      .select(col(vecCol)).as[Array[Float]].collect()
      .zipWithIndex.map { case (c, i) => Centroid(i, c) }
    val data = vecs.select(col(vecCol)).as[Array[Float]]
    val nSeeds = cents.length
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      // partition-local (sum, count) accumulators merged on the driver:
      // one scan-only stage per Lloyd round instead of a groupByKey
      // shuffle — the per-round reduction state is nlist x dim doubles,
      // bounded by the model size, never by the corpus (guide §2.3
      // "aggregate before you shuffle", taken to its limit: nothing
      // shuffles at all). Double-sum merge order changes with partitioning
      // — within the documented float-rounding tolerance (see above).
      val parts = data.mapPartitions { it =>
        val cs = bc.value
        val dim = if (cs.isEmpty) 0 else cs(0).centroid.length
        val sums = Array.fill(nSeeds)(new Array[Double](dim))
        val counts = new Array[Long](nSeeds)
        it.foreach { v =>
          val lid = assign(v, cs)
          val s = sums(lid)
          var i = 0
          while (i < v.length) { s(i) += v(i); i += 1 }
          counts(lid) += 1L
        }
        Iterator.single((sums, counts))
      }.collect()
      val total = Array.fill(nSeeds)(
        new Array[Double](if (cents.isEmpty) 0 else cents(0).centroid.length))
      val n = new Array[Long](nSeeds)
      parts.foreach { case (sums, counts) =>
        var l = 0
        while (l < nSeeds) {
          val s = total(l); val p = sums(l)
          var i = 0
          while (i < s.length) { s(i) += p(i); i += 1 }
          n(l) += counts(l)
          l += 1
        }
      }
      cents = cents.map { c =>
        if (n(c.list_id) > 0)
          Centroid(c.list_id, total(c.list_id).map(x => (x / n(c.list_id)).toFloat))
        else c
      }
      bc.destroy()
    }
    cents.sortBy(_.list_id).map(_.centroid).toSeq
  }

  /** Build the index at `path`: `path/centroids` (tiny) + `path/lists`
    * (the corpus, partitioned+sorted by list_id, every row stamped with
    * generation 0 — see [[VecStore]]). Default centroids are the nlist
    * lowest-id vectors; pass `centroids` to use a trained set. */
  def build(vecs: DataFrame, idCol: String, vecCol: String, path: String,
      nlist: Int, centroids: Option[Seq[Array[Float]]] = None,
      filesPerList: Int = 1): Unit = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val cents: Array[Centroid] = centroids match {
      case Some(cs) => cs.zipWithIndex.map { case (c, i) => Centroid(i, c) }.toArray
      case None =>
        vecs.orderBy(col(idCol)).limit(nlist)
          .select(col(vecCol)).as[Array[Float]].collect()
          .zipWithIndex.map { case (c, i) => Centroid(i, c) }
    }
    cents.toSeq.toDS().write.mode("overwrite").parquet(s"$path/centroids")
    val bc = spark.sparkContext.broadcast(cents)
    writeLists(vecs, idCol, vecCol, s"$path/lists", bc, nlist, filesPerList,
      gen = 0L, mode = "overwrite")
    VecStore.commit(spark, path, VecStore.Default)
  }

  /** one assignment+write pass shared by build/append/compact/rebalance */
  private def writeLists(vecs: DataFrame, idCol: String, vecCol: String,
      listsPath: String,
      bc: org.apache.spark.broadcast.Broadcast[Array[Centroid]],
      nlist: Int, filesPerList: Int, gen: Long, mode: String): Unit = {
    val spark = vecs.sparkSession
    import spark.implicits._
    // HASH repartition, not range: repartitionByRange samples its child to
    // pick bounds, which runs the assignment map TWICE and costs an extra
    // job; hash needs no sample. Files may interleave list_ids, but rows
    // stay (list_id, vec_id)-sorted within each file, so the
    // `list_id IN (...)` row-group pruning is unchanged (guide §2.4).
    vecs.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (assign(v, bc.value), id, v, gen) }
      .toDF("list_id", "vec_id", "vec", "gen")
      .repartition(math.max(1, nlist / math.max(1, filesPerList)), col("list_id"))
      .sortWithinPartitions("list_id", "vec_id")
      .write.mode(mode).parquet(listsPath)
  }

  /** Incremental add — the streaming-embedding ingestion path: new
    * vectors are assigned to the EXISTING centroids and appended to the
    * lists table as fresh sorted parquet files. Search code is unchanged:
    * the `list_id IN (...)` pushdown prunes row groups per FILE, and the
    * appended files carry the same (list_id, vec_id) sort, so their row
    * groups prune exactly like the base build's. Centroids are
    * intentionally frozen — classic IVF add semantics: list assignment
    * stays valid, list balance drifts as the distribution moves, and the
    * remedy is a periodic re-train + rebuild, not a per-batch re-train. */
  def append(vecs: DataFrame, idCol: String, vecCol: String, path: String,
      filesPerList: Int = 1): Unit = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val st = VecStore.read(spark, path)
    val cents = readCentroids(spark, s"$path/${st.cents}")
    require(cents.nonEmpty, s"no centroids at $path — build() first")
    val bc = spark.sparkContext.broadcast(cents)
    val g = st.gen + 1
    writeLists(vecs, idCol, vecCol, s"$path/${st.lists}", bc, cents.length,
      filesPerList, gen = g, mode = "append")
    VecStore.commit(spark, path, st.copy(gen = g))
  }

  /** Retire vectors by id: appends generation tombstones (see [[VecStore]])
    * that every search path filters; a later [[append]] of the same id is
    * alive again (the text index's delete-then-upsert semantics). Fold the
    * tombstones with [[compact]]. */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String = "vec_id"): Unit =
    VecStore.delete(spark, path, ids, idCol)

  /** driver-literal convenience for small takedown lists */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    delete(spark, path, ids.toDS().toDF("vec_id"), "vec_id")
  }

  /** Fold tombstones into the data: rewrite the lists as a FRESH directory
    * holding only surviving rows (gen reset to 0), then atomically swap the
    * state pointer to it with an empty deletes dir — readers see either the
    * old tombstoned index or the fully-compacted one, never a half-rewrite
    * (same commit discipline as the text index's manifest swap). */
  def compact(spark: SparkSession, path: String): Unit = {
    val st = VecStore.read(spark, path)
    val v = st.gen + 1
    val newLists = s"lists-c$v"
    val survivors = VecStore.alive(spark, path, st,
      VecStore.withGen(spark.read.parquet(s"$path/${st.lists}")))
      .withColumn("gen", org.apache.spark.sql.functions.lit(0L))
      .select(col("list_id"), col("vec_id"), col("vec"), col("gen"))
    survivors
      .repartition(col("list_id")) // hash: no range-sampling pass (see writeLists)
      .sortWithinPartitions("list_id", "vec_id")
      .write.mode("overwrite").parquet(s"$path/$newLists")
    VecStore.commit(spark, path,
      st.copy(gen = 0L, lists = newLists, deletes = s"deletes-c$v"))
  }

  /** alive rows of the lists table (tombstones filtered; no-op when none) */
  private[ml] def aliveLists(spark: SparkSession, path: String,
      st: VecStore.State): DataFrame =
    VecStore.alive(spark, path, st,
      VecStore.withGen(spark.read.parquet(s"$path/${st.lists}")))

  /** Per-list surviving-row counts INCLUDING empty lists — the list-balance
    * health metric appends drift (frozen centroids, moving distribution).
    * Cost: one projection-pruned scan of two narrow columns. Also valid on
    * an [[IvfPq]] path (same centroids/lists/state layout). */
  def listStats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val st = VecStore.read(spark, path)
    val nlist = readCentroids(spark, s"$path/${st.cents}").length
    val counts = aliveLists(spark, path, st)
      .groupBy(col("list_id")).agg(count(lit(1)).as("n"))
    spark.range(0, nlist).select(col("id").cast("int").as("list_id"))
      .join(counts, Seq("list_id"), "left")
      .select(col("list_id"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** max/mean list size — 1.0 is perfectly balanced; sustained skew means
    * probes over-read hot lists and recall@nprobe drifts down. */
  def imbalance(spark: SparkSession, path: String): Double = {
    import spark.implicits._
    val stats = listStats(spark, path).select(col("n")).as[Long].collect()
    val total = stats.sum.toDouble
    if (total == 0) 1.0 else stats.max / (total / stats.length)
  }

  /** Re-train centroids on the SURVIVING corpus (Lloyd over deterministic
    * seeds, [[trainCentroids]]) and rewrite the lists against them — the
    * remedy for post-append list skew that frozen-model appends accumulate.
    * Fresh centroid + list directories, atomic state swap (tombstones are
    * folded in the same pass, like [[compact]]). */
  def rebalance(spark: SparkSession, path: String, iters: Int = 5,
      filesPerList: Int = 1): Unit = {
    import spark.implicits._
    val st = VecStore.read(spark, path)
    val nlist = readCentroids(spark, s"$path/${st.cents}").length
    val v = st.gen + 1
    val alive = aliveLists(spark, path, st)
      .select(col("vec_id"), col("vec")).persist()
    try {
      // hash seeds: data-proportional, so the skewed mode that motivated
      // the rebalance actually gets split (see trainCentroids)
      val cents = trainCentroids(alive, "vec_id", "vec", nlist, iters,
          hashSeeds = true)
        .zipWithIndex.map { case (c, i) => Centroid(i, c) }.toArray
      val newCents = s"centroids-r$v"
      val newLists = s"lists-r$v"
      cents.toSeq.toDS().write.mode("overwrite").parquet(s"$path/$newCents")
      val bc = spark.sparkContext.broadcast(cents)
      writeLists(alive, "vec_id", "vec", s"$path/$newLists", bc, nlist,
        filesPerList, gen = 0L, mode = "overwrite")
      VecStore.commit(spark, path, VecStore.State(0L, newLists, st.vecs,
        s"deletes-r$v", newCents))
    } finally alive.unpersist()
  }

  /** centroids ranked by distance to the query → the nprobe list ids */
  def probeLists(spark: SparkSession, path: String, query: Array[Float],
      nprobe: Int): Seq[Int] =
    probeLists(spark, path, VecStore.read(spark, path), query, nprobe)

  /** state-plumbed variant: callers that already read the VecStore state
    * (search paths) skip the duplicate state read */
  private[ml] def probeLists(spark: SparkSession, path: String,
      st: VecStore.State, query: Array[Float], nprobe: Int): Seq[Int] = {
    val cents = readCentroids(spark, s"$path/${st.cents}")
    cents.map(c => (l2sq(query, c.centroid), c.list_id))
      .sortBy(identity).take(nprobe).map(_._2).toSeq
  }

  /** BATCH IVF search: top-k per query for a whole query TABLE in one
    * join — each query is expanded to its nprobe nearest lists (driver
    * holds only the tiny centroid set), joined against the lists table on
    * list_id, scored, and window-ranked. A million queries cost one
    * shuffle over (touched lists x queries), never a million driver jobs;
    * the union of probed lists is pushed down as one IN filter so
    * untouched lists are still never read. */
  def searchBatch(spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, qvecCol: String, k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val st = VecStore.read(spark, path)
    val cents = readCentroids(spark, s"$path/${st.cents}")
    val bc = spark.sparkContext.broadcast(cents)
    val probes = queries
      .select(col(qidCol).cast("long").as("qid"), col(qvecCol).as("qv"))
      .as[(Long, Array[Float])]
      .flatMap { case (qid, qv) =>
        bc.value.map(c => (l2sq(qv, c.centroid), c.list_id))
          .sortBy(identity).take(nprobe)
          .iterator.map { case (_, lid) => (qid, lid, qv) }
      }.toDF("qid", "list_id", "qv")
    val touched = probes.select($"list_id").distinct().as[Int].collect().toSeq
    val lists = aliveLists(spark, path, st)
      .where(col("list_id").isin(touched: _*))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("vec_id"))
    probes.join(lists, Seq("list_id"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Similarity.cosine(col("vec"), col("qv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos"))
  }

  /** top-k by cosine among the probed lists only. The list_id IN filter is
    * pushed into the parquet scan (row-group pruning on the sorted layout). */
  def search(spark: SparkSession, path: String, query: Array[Float],
      k: Int, nprobe: Int, excludeId: Option[Long] = None): DataFrame = {
    val st = VecStore.read(spark, path)
    val lists = probeLists(spark, path, st, query, nprobe)
    val q = typedLit(query.toSeq)
    val base = aliveLists(spark, path, st)
      .where(col("list_id").isin(lists: _*))
    val filtered = excludeId.fold(base)(id => base.where(col("vec_id") =!= id))
    filtered.select(col("vec_id"),
        Similarity.cosine(col("vec"), q).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos"), 4).as("cos"))
  }
}
