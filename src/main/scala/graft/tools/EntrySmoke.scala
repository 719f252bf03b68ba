package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's smoke check: SparkEntry.entry rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = graft.SparkEntry.entry(spark).collect()
    println(s"[smoke] entry rows=${rows.length}: " + rows.take(3).mkString(", "))
    assert(rows.nonEmpty, "entry must return rows")
    spark.stop()
  }
}
