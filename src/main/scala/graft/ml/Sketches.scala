package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Deterministic approximate-distinct sketch (HyperLogLog, Flajolet et
  * al. 2007) built from engine-independent arithmetic so any SQL engine
  * reproduces it EXACTLY:
  *
  *  - hash = PolyHash (the engine's shared 31/131-base polynomial hash)
  *  - register = h mod 2^10; the remaining 20 bits rank via the BINARY
  *    STRING length (`bin()` exists in both Spark and DuckDB) — no
  *    float log2 whose libm rounding could differ
  *  - the harmonic sum is EXACT INTEGER arithmetic: sum of
  *    2^(30 - maxRank) per register over a common 2^30 denominator —
  *    float accumulation order can never change the result
  *  - alpha is ONE Scala-computed double embedded verbatim in both
  *    engines; the estimate is floored to a BIGINT, so the only
  *    remaining float ops (a division, and ln in the linear-counting
  *    branch) would need a last-ulp disagreement to land exactly on an
  *    integer boundary to diverge.
  *
  * Scale shape: counting distinct over 100 TB shuffles (group, register)
  * pairs — at most 1024 rows per group survive the map-side combine —
  * instead of shuffling every raw value the way count(DISTINCT) must.
  * Spark's own approx_count_distinct is the production choice when
  * cross-engine determinism doesn't matter; this one exists so the
  * DuckDB oracle can replay the estimate exactly.
  */
object Sketches {
  /** 2^p registers */
  final val P = 10
  final val M = 1 << P // 1024
  /** HLL bias constant for m=1024, computed once and embedded verbatim
    * in both engines (DuckDB would otherwise evaluate the alpha formula
    * in DECIMAL arithmetic and differ in the low bits) */
  final val Alpha: Double = 0.7213 / (1.0 + 1.079 / M)

  /** HLL distinct estimate of `valueCol` per `groupCols`.
    * Output: groupCols ++ (regs_used, approx_distinct BIGINT). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: Column): DataFrame = {
    val g = groupCols.map(col)
    val h0 = poly_hash(valueCol.cast("string"))
    // square-mod avalanche: the polynomial hash alone keeps structured
    // inputs ("user-1","user-2",…) in a few arithmetic progressions, so
    // its HIGH bits are degenerate and the rank statistic collapses
    // (observed: every register max-rank 2 → 7x undercount). Squaring mod
    // P is nonlinear, spreads progressions, fits a BIGINT (h<2^30 →
    // h²<2^60) and replays exactly in SQL.
    val h = ((h0 * h0) % HashMod * 131L + h0) % HashMod
    val regs = df
      .select(g :+ (h % M).as("reg") :+ shiftright(h, P).as("w"): _*)
      // rank in the 20-bit window: leading zeros + 1 = 21 - bit_length(w)
      .withColumn("rho",
        when(col("w") === 0, lit(21))
          .otherwise(lit(21) - length(bin(col("w")))))
      .groupBy(g :+ col("reg"): _*)
      .agg(max(col("rho")).as("mx"))
    val agg = regs.groupBy(g: _*)
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 30 - mx)")).as("s_used"),
        count(lit(1)).as("regs_used"))
      .withColumn("zeros", lit(M.toLong) - col("regs_used"))
      // exact integer harmonic sum over the common 2^30 denominator
      .withColumn("s", col("s_used") + col("zeros") * lit(1L << 30))
    val eRaw = lit(Alpha) * lit(M.toDouble * M) * lit((1L << 30).toDouble) / col("s")
    val e = when(eRaw <= lit(2.5 * M) && col("zeros") > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / col("zeros"))).otherwise(eRaw)
    agg.select(g :+ col("regs_used") :+
      floor(e).cast("long").as("approx_distinct"): _*)
  }

  /** the same estimator as DuckDB SQL over table `t`, value expr `v`,
    * grouped by `groupExpr` (aliased `alias`) — generated from one
    * definition so the gate is exact, not statistical */
  def approxDistinctSql(t: String, groupExpr: String, alias: String, v: String): String =
    s"""WITH h0s AS (
       |  SELECT $groupExpr AS grp, ${sqlPolyHash(v)} AS h0 FROM $t),
       |hs AS (
       |  SELECT grp, (((h0 * h0) % 1000000007) * 131 + h0) % 1000000007 AS h
       |  FROM h0s),
       |regs AS (
       |  SELECT grp, h % $M AS reg,
       |    max(CASE WHEN h // $M = 0 THEN 21
       |             ELSE 21 - len(bin(h // $M)) END) AS mx
       |  FROM hs GROUP BY 1, 2),
       |agg AS (
       |  SELECT grp, CAST(sum(CAST(1 AS BIGINT) << (30 - mx)) AS BIGINT) AS s_used,
       |    count(*) AS regs_used
       |  FROM regs GROUP BY 1),
       |est AS (
       |  SELECT grp, regs_used, ($M - regs_used) AS zeros,
       |    s_used + ($M - regs_used) * (CAST(1 AS BIGINT) << 30) AS s
       |  FROM agg),
       |fin AS (
       |  SELECT grp, regs_used, zeros,
       |    CAST($Alpha AS DOUBLE) * ${M.toDouble * M} * ${(1L << 30).toDouble} / s AS e_raw
       |  FROM est)
       |SELECT grp AS $alias, regs_used,
       |  CAST(floor(CASE WHEN e_raw <= ${2.5 * M} AND zeros > 0
       |                  THEN ${M.toDouble} * ln(${M.toDouble} / zeros)
       |                  ELSE e_raw END) AS BIGINT) AS approx_distinct
       |FROM fin""".stripMargin

  /** DuckDB rendering of PolyHash (base 131 = GraftFunctions.poly_hash)
    * over an arbitrary expression cast to VARCHAR — the same left fold
    * every dedup oracle uses. */
  private def sqlPolyHash(v: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(CAST($v AS VARCHAR), ''), " +
      s"c -> CAST(unicode(c) AS BIGINT))), (h, c) -> (h * 131 + c) % 1000000007)"

  // ---- deterministic mergeable quantile sketch ----
  //
  // Arbitrary-quantile estimation from a BOTTOM-K HASH SAMPLE: keep, per
  // group, the k rows whose avalanched id hash is smallest — a
  // deterministic uniform sample of the group (the hash order is a fixed
  // pseudo-random permutation of the ids), so the q-quantile estimate is
  // the ceil(q·|sample|)-th order statistic of the sampled values, with
  // the classic O(1/√k) rank error of a uniform sample.
  //
  // Why not KLL (the textbook mergeable quantile sketch): KLL's compactions
  // depend on STREAM ORDER, and Spark guarantees no row order across
  // shuffles/retries — a KLL result would vary run to run and could never
  // hash-match a cross-engine oracle, the determinism bar every sketch in
  // this module holds (see approxDistinct). Bottom-k-by-hash is the
  // order-independent formulation of the same idea: it is a SEMILATTICE
  // (merge = union → bottom-k), so partial sketches merge associatively
  // and commutatively — per partition, per segment, per engine — and the
  // result is a pure function of the SET of (id, value) pairs.
  //
  // Scale shape: the group-wide bottom-k would put a billion-row group in
  // ONE task; phase 1 takes each input partition's local bottom-k under a
  // (partition-id, group) window — the partition id SALTS the hot group —
  // and phase 2 ranks only ≤ k·nPartitions survivors (the same two-phase
  // trick as Mixing.stratifiedSample; global bottom-k is contained in the
  // union of per-slice bottom-ks, so the result is identical to the naive
  // single window). Quantile extraction then runs over ≤ k rows per group.

  /** avalanched row-sample key (square-mod remix of PolyHash — structured
    * ids would otherwise sample in arithmetic progressions; same remix as
    * approxDistinct) */
  private def sampleKey(id: Column): Column = {
    val h0 = poly_hash(id.cast("string"))
    (((h0 * h0) % HashMod) * lit(131L) + h0) % HashMod
  }

  /** the group's bottom-k rows by avalanched id hash:
    * groupCols ++ (sid, v, u). Mergeable: bottomK(A ∪ B) ==
    * bottomK(bottomK(A) ∪ bottomK(B)) — the spec proves it. */
  def bottomKSample(df: DataFrame, groupCols: Seq[String], idCol: Column,
      valueCol: Column, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive: $k")
    val g = groupCols.map(col)
    val base = df.select(
      g :+ idCol.cast("long").as("sid") :+ valueCol.as("v") :+
        sampleKey(idCol).as("u"): _*)
    val salted = Window
      .partitionBy(col("qs_pid") +: g: _*)
      .orderBy(col("u").asc, col("sid").asc)
    val pruned = base.withColumn("qs_pid", spark_partition_id())
      .withColumn("qs_r1", row_number().over(salted))
      .where(col("qs_r1") <= k)
      .drop("qs_pid", "qs_r1")
    val wg = Window.partitionBy(g: _*).orderBy(col("u").asc, col("sid").asc)
    pruned.withColumn("qs_rn", row_number().over(wg))
      .where(col("qs_rn") <= k).drop("qs_rn")
  }

  /** Quantile estimates at the given permille points (INTEGER permille, so
    * the rank pick `ceil(qp·n/1000)` is exact integer arithmetic on any
    * engine — a double q·n would ceil differently across engines for
    * decimal-typed literals). Output: groupCols ++ (q DOUBLE, est, n_s). */
  def quantileSketch(df: DataFrame, groupCols: Seq[String], idCol: Column,
      valueCol: Column, k: Int, qPermille: Seq[Int]): DataFrame = {
    require(qPermille.nonEmpty && qPermille.forall(q => q >= 1 && q <= 1000),
      s"permille points must be in [1, 1000]: $qPermille")
    val g = groupCols.map(col)
    val samp = bottomKSample(df, groupCols, idCol, valueCol, k)
    val wv = Window.partitionBy(g: _*)
      .orderBy(col("v").asc, col("u").asc, col("sid").asc)
    val ranked = samp
      .withColumn("vr", row_number().over(wv))
      .withColumn("n_s", count(lit(1)).over(Window.partitionBy(g: _*)))
    ranked
      .withColumn("qp", explode(array(qPermille.map(q => lit(q.toLong)): _*)))
      .where(col("vr") === greatest(lit(1L),
        expr("(qp * n_s + 999) div 1000")))
      .select(g :+ (col("qp").cast("double") / 1000.0).as("q") :+
        col("v").as("est") :+ col("n_s"): _*)
  }

  /** the same sketch as DuckDB SQL (one definition, two engines — the
    * exact-match oracle, like approxDistinctSql) */
  def quantileSketchSql(t: String, groupExpr: String, alias: String,
      idExpr: String, vExpr: String, k: Int, qPermille: Seq[Int]): String =
    s"""WITH h0s AS (
       |  SELECT $groupExpr AS grp, CAST($idExpr AS BIGINT) AS sid,
       |    $vExpr AS v, ${sqlPolyHash(idExpr)} AS h0 FROM $t),
       |us AS (
       |  SELECT grp, sid, v,
       |    (((h0 * h0) % 1000000007) * 131 + h0) % 1000000007 AS u
       |  FROM h0s),
       |samp AS (
       |  SELECT grp, sid, v, u FROM (
       |    SELECT grp, sid, v, u,
       |      row_number() OVER (PARTITION BY grp ORDER BY u, sid) AS rn
       |    FROM us) WHERE rn <= $k),
       |ranked AS (
       |  SELECT grp, v, u, sid,
       |    row_number() OVER (PARTITION BY grp ORDER BY v, u, sid) AS vr,
       |    count(*) OVER (PARTITION BY grp) AS n_s
       |  FROM samp),
       |qs AS (SELECT unnest([${qPermille.mkString(", ")}]) AS qp)
       |SELECT grp AS $alias, CAST(qp AS DOUBLE) / 1000.0 AS q, v AS est,
       |  CAST(n_s AS BIGINT) AS n_s
       |FROM ranked, qs
       |WHERE vr = greatest(1, (qp * n_s + 999) // 1000)
       |ORDER BY 1, 2""".stripMargin
}
