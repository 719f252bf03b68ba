package graft.api

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.index.GraftIndex

/** `dump` — the reference's re-loadable COMMAND-SCRIPT text form
  * (/root/reference/lib/proc/proc_dump.c; goldens under
  * test/command/suite/dump/): `table_create`/`column_create` schema
  * commands, `load --table` blocks whose first JSON row is the column
  * header, and index `column_create` lines LAST (so a re-load builds the
  * index after its source data exists). The parquet/manifest dump
  * (SegmentCatalog) remains the scale path — this text form is the
  * interchange surface for tooling that speaks groonga command scripts.
  *
  * Record streaming is driver-side by construction (one ordered text
  * artifact), so it pages through `toLocalIterator` — one partition in
  * memory at a time, never the table.
  */
object Dump {

  /** groonga type name for a Spark column type (dump writes declared
    * types; proc_dump.c dump_column_create) */
  private[api] def grnType(dt: DataType): String = dt match {
    case LongType => "Int64"
    case IntegerType => "Int32"
    case ShortType => "Int16"
    case ByteType => "Int8"
    case FloatType | DoubleType => "Float"
    case BooleanType => "Bool"
    case StringType => "ShortText"
    case TimestampType | TimestampNTZType | DateType => "Time"
    case ArrayType(e, _) => grnType(e)
    case other =>
      throw new IllegalArgumentException(s"no groonga dump type for $other")
  }

  private def isVector(dt: DataType): Boolean = dt.isInstanceOf[ArrayType]

  /** JSON-escape a string the way the dump format needs (proc_dump.c
    * uses grn_text_otoj = standard JSON escaping) */
  private def jstr(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 2)
    b.append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"')
    b.toString
  }

  private def jval(v: Any): String = v match {
    case null => "null"
    case s: String => jstr(s)
    case b: Boolean => b.toString
    case d: Double => if (d == d.floor && !d.isInfinite) f"$d%.1f" else d.toString
    case f: Float => jval(f.toDouble)
    case seq: scala.collection.Seq[_] => seq.map(jval).mkString("[", ",", "]")
    case ts: java.sql.Timestamp => (ts.getTime / 1000.0).toString
    case other => other.toString
  }

  /** The command script as an ordered line iterator. `keyCol` (if given)
    * becomes the table's `_key` (TABLE_HASH_KEY, rows sorted by key —
    * the reference sorts hash-table dumps); without it the table dumps as
    * TABLE_NO_KEY with 1-based `_id`s in row order. `index` adds the
    * lexicon table_create and the trailing index column_create, derived
    * from the index manifest (tokenizer, sections, positions). */
  def commandScript(
      table: DataFrame,
      tableName: String,
      keyCol: Option[String] = None,
      index: Option[GraftIndex] = None,
      lexiconName: String = "Terms",
      indexSourceCols: Seq[String] = Seq("text")): Iterator[String] = {
    val fields = table.schema.fields
    val valueFields = fields.filterNot(f => keyCol.contains(f.name))

    val tableLine = keyCol match {
      case Some(k) =>
        val kt = grnType(fields(table.schema.fieldIndex(k)).dataType)
        s"table_create $tableName TABLE_HASH_KEY $kt"
      case None => s"table_create $tableName TABLE_NO_KEY"
    }
    val columnLines = valueFields.iterator.map { f =>
      val flag = if (isVector(f.dataType)) "COLUMN_VECTOR" else "COLUMN_SCALAR"
      s"column_create $tableName ${f.name} $flag ${grnType(f.dataType)}"
    }

    val lexiconLines: Iterator[String] = index.iterator.flatMap { idx =>
      Iterator("",
        s"table_create $lexiconName TABLE_PAT_KEY ShortText " +
          s"--default_tokenizer ${idx.meta.tokenizer} --normalizer NormalizerAuto")
    }

    val ordered = keyCol.fold(table)(k => table.orderBy(k))
    val header = (keyCol.map(_ => "_key").getOrElse("_id") +:
      valueFields.map(_.name).toSeq).map(jstr).mkString("[", ",", "]")
    val keyIdx = keyCol.map(table.schema.fieldIndex)
    var rowId = 0L
    val rowLines: Iterator[String] = ordered.toLocalIterator()
      .asScala.map { r =>
        rowId += 1
        val key = keyIdx.map(i => jval(r.get(i))).getOrElse(rowId.toString)
        val vals = valueFields.map(f => jval(r.get(r.fieldIndex(f.name))))
        (key +: vals.toSeq).mkString("[", ",", "]")
      }
    // JSON array body: every row but the last gets a trailing comma
    val loadBlock: Iterator[String] = {
      val body = (Iterator(header) ++ rowLines).buffered
      Iterator("", s"load --table $tableName", "[") ++
        new Iterator[String] {
          def hasNext: Boolean = body.hasNext
          def next(): String = {
            val line = body.next()
            if (body.hasNext) line + "," else line
          }
        } ++ Iterator("]")
    }

    val indexLines: Iterator[String] = index.iterator.flatMap { idx =>
      val sects = idx.meta.sections
      val srcCols = if (sects.nonEmpty) sects else indexSourceCols
      val flags = "COLUMN_INDEX" +
        (if (idx.meta.withPositions) "|WITH_POSITION" else "") +
        (if (sects.nonEmpty) "|WITH_SECTION" else "")
      // reference naming: <table>_<column>_index (dump/record/lexicon golden)
      val colName = (tableName.toLowerCase +: srcCols).mkString("_") + "_index"
      Iterator("",
        s"column_create $lexiconName $colName $flags $tableName ${srcCols.mkString(" ")}")
    }

    Iterator(tableLine) ++ columnLines ++ lexiconLines ++ loadBlock ++ indexLines
  }
}
