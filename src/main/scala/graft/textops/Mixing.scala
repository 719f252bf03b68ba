package graft.textops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix construction operators: deterministic sampling and
  * concat-chunk sequence packing.
  *
  * Both are single-pass map-side shapes (no RNG state, no global window):
  * reproducible bit-for-bit on any engine, so the DuckDB oracles replay
  * them exactly.
  */
object Mixing {

  /** The shared LCG keep-key: pmod the id into [0, 2^31) BEFORE the
    * multiply, so the product is bounded by (2^31-1)·1103515245 ≈ 2.4e18 —
    * inside Long on any engine and for ANY id (a raw id ≥ ~8.4e9 would
    * silently wrap in Spark while DuckDB raises on BIGINT overflow, and a
    * negative id would yield a negative residue that is never sampled). */
  private def lcgKey(id: Column): Column =
    (pmod(id.cast("long"), lit(2147483648L)) * lit(1103515245L) + lit(12345L)) %
      lit(2147483648L)

  /** the same key as DuckDB SQL over an id expression (both oracle users
    * embed this — one definition, two engines) */
  def lcgKeySql(id: String): String =
    s"((($id) % 2147483648 + 2147483648) % 2147483648 * 1103515245 + 12345) % 2147483648"

  /** Deterministic per-group sampling for training-mixture weights: keep a
    * row iff LCG(id) mod 100 < its group's percentage rate. No RNG state —
    * the keep decision is a pure function of the id, so the sample is
    * stable under re-runs, retries, and engine changes (the property that
    * matters when a 100-TB mix must be re-derivable). Map-side filter:
    * ZERO shuffle at any scale. */
  def mixSample(docs: DataFrame, idCol: String, ratePct: Column): DataFrame =
    docs
      .withColumn("rate", ratePct.cast("long"))
      .where(lcgKey(col(idCol)) % 100 < col("rate"))

  /** Concat-and-chunk sequence packing (the LLM pretraining layout): docs
    * in `idCol` order form one virtual token stream, cut into fixed
    * `budget`-token context windows; each doc reports the window (`bin`)
    * and `offset` where its first token lands.
    *
    * Scale shape — a naive global cumsum is a ONE-partition window (the
    * classic 100-TB bottleneck); this is the distributed prefix-sum
    * instead: range-partition by id (global order preserved across
    * partitions), per-partition token totals (tiny: one row per
    * partition) are prefix-summed on the driver and broadcast back, and
    * the within-partition cumsum runs as a window PARTITIONED BY the
    * range bucket — every partition works in parallel. The partitioned
    * frame is persisted so the partials pass and the final pass see one
    * materialization. */
  def seqPack(docs: DataFrame, idCol: String, tokCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val base = docs
      .select(col(idCol).as("id"), tokCol.cast("long").as("n_toks"))
      .repartitionByRange(col("id"))
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val partials = base.groupBy("pid").agg(sum("n_toks").as("ptoks"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      // driver prefix-sum over ONE ROW PER PARTITION — bounded state
      var acc = 0L
      val prefix = partials.map { case (pid, ptoks) =>
        val before = acc; acc += ptoks; (pid, before)
      }
      val prefixDf = docs.sparkSession
        .createDataFrame(prefix.toSeq).toDF("pid", "poffset")
      val w = Window.partitionBy("pid").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
      base.join(broadcast(prefixDf), Seq("pid"))
        .withColumn("cum_before",
          coalesce(sum(col("n_toks")).over(w), lit(0L)) + col("poffset"))
        .select(col("id"), col("n_toks"),
          // integer `div`, not `/`: double division would round above 2^53
          expr(s"cum_before div $budget").as("bin"),
          (col("cum_before") % budget).as("bin_offset"))
    } finally base.unpersist()
  }

  /** Deterministic stratified sampling: exactly min(quota, |stratum|) rows
    * per stratum, ranked by LCG(id) with id tiebreak — a pure function of
    * (stratum, id), so the sample is re-derivable bit-for-bit (same
    * property as [[mixSample]], which trades exact counts for zero
    * shuffle; this guarantees exact per-stratum counts — the "same number
    * of docs per language" mix shape).
    *
    * Scale shape: a single window partitioned by the stratum would put a
    * billion-doc language in ONE task. Instead phase 1 takes each input
    * partition's local top-`quota` per stratum under a (partition-id,
    * stratum) window — the partition id SALTS the hot stratum across the
    * cluster — and phase 2 ranks only the pruned candidates
    * (≤ quota × nPartitions per stratum). Global top-quota by a total
    * order is contained in the union of per-slice top-quotas, so the
    * result is identical to the naive single window. */
  def stratifiedSample(docs: DataFrame, idCol: String, strataCol: String,
      quota: Int): DataFrame = {
    require(quota > 0, s"quota must be positive: $quota")
    val key = lcgKey(col(idCol))
    val salted = Window.partitionBy(col("sf_pid"), col(strataCol))
      .orderBy(key.asc, col(idCol).asc)
    val pruned = docs.withColumn("sf_pid", spark_partition_id())
      .withColumn("sf_r1", row_number().over(salted))
      .where(col("sf_r1") <= quota)
      .drop("sf_pid", "sf_r1")
    val w = Window.partitionBy(col(strataCol)).orderBy(key.asc, col(idCol).asc)
    pruned.withColumn("strat_rank", row_number().over(w))
      .where(col("strat_rank") <= quota)
  }
}
