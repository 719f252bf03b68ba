package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic document clustering over embedding columns — the
  * topic-balancing / mixture-shaping step of a training-data pipeline.
  *
  * This is Lloyd's k-means on an INTEGER lattice: embeddings are quantized
  * to round-toward-negative-infinity thousandths (floor(x*1000) as long),
  * initial centroids are the k lowest vec_ids, and the centroid update is
  * the per-dimension floor-mean. Every arithmetic step is exact int64 (the
  * per-dim sums fit comfortably: |q| <= ~2^11, so dist <= dims * 2^22 and
  * sums <= n * 2^11), which makes the algorithm bit-reproducible in ANY
  * engine regardless of float summation order — the DuckDB oracle replays
  * the identical iterations and hash-matches. Ties in the assignment go to
  * the lowest centroid id; clusters that lose all members drop out (both
  * engines implement the same rule).
  *
  * Scale shape (100 TB): centroids are O(k x dims) and ride a broadcast
  * join; assignment is a map-side projection over the corpus (no shuffle);
  * the update is one groupBy(cluster) with map-side combine per iteration.
  * Driver holds nothing but the loop counter. This is exactly how
  * IVF-list training (AnnIndex/PqIndex) shards at scale, shared shape.
  */
object KMeans {

  /** quantized lattice coordinates as array<long> */
  private def quantize(vecCol: Column, scale: Int): Column =
    transform(vecCol, x => floor(x.cast("double") * scale).cast("long"))

  /** squared L2 distance between two array<long> columns, exact int64 */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)

  /** assignment as a PURE PROJECTION against a driver-resident centroid
    * literal (centroids are O(k x dims) int64 — bounded, never data-sized):
    * array_min over per-centroid (dist, cid) structs replicates the
    * min(struct(dist, cid)) tie rule (lowest cid on equal dist) with the
    * same exact int64 arithmetic. Compared to the previous
    * crossJoin(broadcast) + groupBy(vec_id) shape this removes ONE
    * corpus-wide exchange per iteration — assignment is now map-side only
    * (guide §2.4), which is also the 100-TB shape: the corpus is scanned,
    * never shuffled, per Lloyd round. */
  private def assignCols(cents: Seq[(Int, Seq[Long])]): (Column, Column) = {
    val lit0 = typedLit(cents)
    val best = array_min(transform(lit0, c =>
      struct(sqDist(col("q"), c.getField("_2")).as("dist"),
        c.getField("_1").as("cid"))))
    (best.getField("cid"), best.getField("dist"))
  }

  /** one Lloyd round: assign (projection) + floor-mean update, collected to
    * the driver as the next round's literal. floor(sum / count) is exact
    * because the int64 sum is < 2^53 so the double division is exact before
    * floor; the per-(cid, d) aggregate has map-side combine, so the only
    * exchange carries k x dims rows. */
  private def updateDriver(vecs: DataFrame, cents: Seq[(Int, Seq[Long])]): Seq[(Int, Seq[Long])] = {
    val (cl, _) = assignCols(cents)
    vecs.withColumn("cluster", cl)
      .select(col("cluster").as("cid"), posexplode(col("q")).as(Seq("d", "v")))
      .groupBy(col("cid"), col("d"))
      .agg(floor(sum(col("v")).cast("double") / count(lit(1))).cast("long").as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq)
      }
      .toSeq.sortBy(_._1)
  }

  /** Full clustering: `iters` Lloyd iterations then a final assignment.
    * Output: (vec_id, cluster, dist) with dist the exact lattice squared
    * distance to the final centroid. */
  def cluster(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, scale: Int = 1000): DataFrame = {
    import emb.sparkSession.implicits._
    val vecs = emb.select(col(idCol).as("vec_id"),
      quantize(col(vecCol), scale).as("q"))
    // k lowest-id seeds, driver-side (k x dims longs — bounded)
    var cents: Seq[(Int, Seq[Long])] = vecs.orderBy("vec_id").limit(k)
      .select(col("q")).as[Seq[Long]].collect()
      .zipWithIndex.map { case (q, i) => (i, q) }.toSeq
    for (_ <- 0 until iters)
      cents = updateDriver(vecs, cents)
    val (cl, dist) = assignCols(cents)
    vecs.select(col("vec_id"), cl.as("cluster"), dist.as("dist"))
  }

  /** The same algorithm as a DuckDB SQL string (k, iters, scale baked in)
    * over a table `embeddings(vec_id, embedding)` — generated from one
    * definition so the gate is exact, not statistical. */
  def oracleSql(k: Int, iters: Int, dims: Int, scale: Int = 1000): String = {
    def assignSql(c: String, a: String): String =
      s"""$a AS (
         |  SELECT vec_id, q, cid AS cluster, dist FROM (
         |    SELECT e.vec_id, e.q, c.cid,
         |      list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        list_transform(list_zip(e.q, c.cvec),
         |          p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y) AS dist,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_reduce(list_prepend(CAST(0 AS BIGINT),
         |          list_transform(list_zip(e.q, c.cvec),
         |            p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y), c.cid) AS rn
         |    FROM e CROSS JOIN $c c) WHERE rn = 1)""".stripMargin
    def updateSql(a: String, c: String): String =
      s"""$c AS (
         |  SELECT cid, list(m ORDER BY d) AS cvec FROM (
         |    SELECT cluster AS cid, d,
         |      CAST(floor(CAST(sum(q[d]) AS DOUBLE) / count(*)) AS BIGINT) AS m
         |    FROM $a, unnest(range(1, ${dims + 1})) AS u(d)
         |    GROUP BY cluster, d) GROUP BY cid)""".stripMargin
    val steps = (0 until iters).flatMap { i =>
      Seq(assignSql(s"c$i", s"a$i"), updateSql(s"a$i", s"c${i + 1}"))
    } :+ assignSql(s"c$iters", s"a$iters")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * $scale) AS BIGINT)) AS q
       |  FROM embeddings),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, q AS cvec
       |  FROM e ORDER BY vec_id LIMIT $k),
       |${steps.mkString(",\n")}
       |SELECT vec_id, CAST(cluster AS INT) AS cluster, dist
       |FROM a$iters ORDER BY vec_id""".stripMargin
  }
}
