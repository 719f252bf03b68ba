package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a set of declared queries into
  * plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files
  * (guide §7.2). Usage:
  *   runMain graft.tools.PlanDump <suffix> <query1,query2,...> [outDir]
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench. Separate main so
  * the frozen Bench harness is untouched.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // keep operator-internal localCheckpoints lazy so explain shows the
    // full pipeline instead of an RDD scan (see Dedup.cut)
    System.setProperty("graft.plan.nocheckpoint", "1")
    val suffix = args(0)
    val names = args(1).split(',').toSeq
    val outDir = if (args.length > 2) args(2) else "plans/r07"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      SparkEntryAccess.queries.get(name) match {
        case None => System.err.println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
              plan.getBytes("UTF-8"))
            println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}

/** indirection kept trivial so PlanDump never drifts from the declared set */
private object SparkEntryAccess {
  def queries = graft.SparkEntry.queries
}
