package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry gate queries against a testdata dir.
  * Run: sbt "runMain graft.tools.QueryProbe /root/testdata/sf0.1 dedup_minhash_lsh dedup_jaccard"
  * (no names = run all). Prints name,rows,seconds per query.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val all = graft.SparkEntry.queries
    val sel: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (names.isEmpty) all.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> all(n))
    sel.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val res = try { s"rows=${fn(spark, sfDir).count()}" }
        catch { case e: Throwable => s"ERROR=${e.getMessage.take(120)}" }
      println(f"[probe] $name%-24s $res  secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
