package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.api.{DataOpsQueries, ExtraQueries, FulltextQueries, RelationalQueries, StreamQueries, Tables}
import graft.query.{MatchMode, ScoreMode}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * BM25 top-10 over the documents fulltext index. */
  def entry(spark: SparkSession): DataFrame = {
    val idx = Tables.documentsIndex(spark, "/root/testdata/sf0.001")
    idx.topK(idx.searchTerms(Seq("spark", "join", "dup"),
      MatchMode.Any, ScoreMode.Bm25(), topK = 10), 10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FulltextQueries.queries ++ RelationalQueries.queries ++
      DataOpsQueries.queries ++ ExtraQueries.queries ++ StreamQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    FulltextQueries.oracles ++ RelationalQueries.oracles ++
      DataOpsQueries.oracles ++ ExtraQueries.oracles ++ StreamQueries.oracles
}
