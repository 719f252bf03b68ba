package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan sanity: posting scans must push the term IN filter + prune columns;
  * document scans must prune to (doc_id, text). */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val idx = graft.api.Tables.documentsIndex(spark, "/root/testdata/sf0.001")
    println("EXPLAIN-START")
    val q = idx.postings.where(col("term").isin("spark", "join"))
    println(q.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") || l.contains("FileScan"))
      .mkString("\n"))
    val d = graft.api.Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").where(col("doc_id") < 10)
    println(d.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
      .mkString("\n"))
    println("EXPLAIN-END")
    spark.stop()
  }
}
