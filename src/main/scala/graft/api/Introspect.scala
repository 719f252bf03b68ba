package graft.api

import org.apache.spark.sql.DataFrame

import graft.index.GraftIndex

/** `table_list` / `column_list` command analogues — catalog introspection
  * over a committed index directory, in the reference's output column
  * shape (doc/source/reference/commands/table_list.rst: id, name, path,
  * flags, domain, range, default_tokenizer, normalizer; column_list.rst:
  * id, name, path, type, flags, domain, range, source). Values come from
  * the manifest + parquet schemas; ids are deterministic ordinals. */
object Introspect {

  private val Tables = Seq("postings", "terms", "terms_rev", "docs")

  def tableList(idx: GraftIndex): DataFrame = {
    val spark = idx.spark
    import spark.implicits._
    val m = idx.meta
    val flags = Seq(
      Some("PERSISTENT"),
      if (m.withPositions) Some("WITH_POSITION") else None,
      if (m.sections.nonEmpty) Some("WITH_SECTION") else None
    ).flatten.mkString("|")
    Tables.zipWithIndex.map { case (name, i) =>
      (i.toLong, name, s"${idx.path}/$name", flags, "Doc", "",
        m.tokenizer, "NormalizerNFKC")
    }.toDF("id", "name", "path", "flags", "domain", "range",
      "default_tokenizer", "normalizer")
  }

  def columnList(idx: GraftIndex, table: String = "postings"): DataFrame = {
    val spark = idx.spark
    import spark.implicits._
    require(Tables.contains(table), s"unknown index table '$table' (${Tables.mkString(", ")})")
    val schema = table match {
      case "postings" => idx.postings.schema
      case "terms" => idx.terms.schema
      case "docs" => idx.docs.schema
      case "terms_rev" =>
        spark.read.parquet(s"${idx.path}/terms_rev").schema
    }
    schema.fields.zipWithIndex.map { case (f, i) =>
      (i.toLong, f.name, s"${idx.path}/$table",
        CommandFormat.grnType(f.dataType), "COLUMN_SCALAR|PERSISTENT",
        table, CommandFormat.grnType(f.dataType), "")
    }.toSeq.toDF("id", "name", "path", "type", "flags", "domain", "range", "source")
  }
}
