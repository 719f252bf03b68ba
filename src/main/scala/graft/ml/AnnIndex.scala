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
  */
object AnnIndex {

  final case class Centroid(list_id: Int, centroid: Array[Float])

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
    * at the same nprobe) than raw seeds. */
  def trainCentroids(vecs: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 5): Seq[Array[Float]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    var cents: Array[Centroid] = vecs.orderBy(col(idCol)).limit(nlist)
      .select(col(vecCol)).as[Array[Float]].collect()
      .zipWithIndex.map { case (c, i) => Centroid(i, c) }
    val data = vecs.select(col(vecCol)).as[Array[Float]]
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val sums = data
        .map { v =>
          val lid = assign(v, bc.value)
          (lid, (v.map(_.toDouble), 1L))
        }
        .groupByKey(_._1)
        .mapValues(_._2)
        .reduceGroups { (a, b) =>
          val s = a._1.clone()
          var i = 0
          while (i < s.length) { s(i) += b._1(i); i += 1 }
          (s, a._2 + b._2)
        }
        .map { case (lid, (s, n)) => (lid, s.map(x => (x / n).toFloat)) }
        .collect().toMap
      cents = cents.map(c => Centroid(c.list_id, sums.getOrElse(c.list_id, c.centroid)))
      bc.destroy()
    }
    cents.sortBy(_.list_id).map(_.centroid).toSeq
  }

  /** Build the index at `path`: `path/centroids` (tiny) + `path/lists`
    * (the corpus, partitioned+sorted by list_id). Default centroids are
    * the nlist lowest-id vectors; pass `centroids` to use a trained set. */
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
    val assigned = vecs.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("vec")).as[(Long, Array[Float])]
      .map { case (id, v) => (assign(v, bc.value), id, v) }
      .toDF("list_id", "vec_id", "vec")
    assigned
      .repartitionByRange(math.max(1, nlist / math.max(1, filesPerList)), col("list_id"))
      .sortWithinPartitions("list_id", "vec_id")
      .write.mode("overwrite").parquet(s"$path/lists")
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
    val cents = spark.read.parquet(s"$path/centroids").as[Centroid].collect()
    require(cents.nonEmpty, s"no centroids at $path — build() first")
    val bc = spark.sparkContext.broadcast(cents)
    val nlist = cents.length
    vecs.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("vec"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (assign(v, bc.value), id, v) }
      .toDF("list_id", "vec_id", "vec")
      .repartitionByRange(math.max(1, nlist / math.max(1, filesPerList)), col("list_id"))
      .sortWithinPartitions("list_id", "vec_id")
      .write.mode("append").parquet(s"$path/lists")
  }

  /** centroids ranked by distance to the query → the nprobe list ids */
  def probeLists(spark: SparkSession, path: String, query: Array[Float],
      nprobe: Int): Seq[Int] = {
    import spark.implicits._
    val cents = spark.read.parquet(s"$path/centroids").as[Centroid].collect()
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
    val cents = spark.read.parquet(s"$path/centroids").as[Centroid].collect()
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
    val lists = spark.read.parquet(s"$path/lists")
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
    val lists = probeLists(spark, path, query, nprobe)
    val q = typedLit(query.toSeq)
    val base = spark.read.parquet(s"$path/lists")
      .where(col("list_id").isin(lists: _*))
    val filtered = excludeId.fold(base)(id => base.where(col("vec_id") =!= id))
    filtered.select(col("vec_id"),
        Similarity.cosine(col("vec"), q).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos"), 4).as("cos"))
  }
}
