package graft.api

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** groonga command-version-1 JSON envelope — the wire shape every groonga
  * client parses (doc/source/reference/commands/select.rst "Output format",
  * concrete bodies in the .log files under
  * doc/source/example/reference/commands/select):
  *
  *   [ [return_code, start_sec, elapsed_sec],
  *     [ [[n_hits], [[col,type], ...], row, row, ...],
  *       DRILLDOWN_RESULT..., | {"label": DRILLDOWN_RESULT, ...} ] ]
  *
  * The engine half (this object) renders result DataFrames into bodies and
  * wraps them; the HTTP layer the reference carries around this is out of
  * scope (SURVEY §2.1 output formats row). Rows are collected — a select
  * body is bounded by the command's offset/limit by construction, and
  * `maxRows` guards against formatting an unlimited result by mistake. */
object CommandFormat {

  /** Spark → groonga type names (include/groonga/groonga.h builtin types) */
  def grnType(dt: DataType): String = dt match {
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType | DoubleType => "Float"
    case BooleanType => "Bool"
    case StringType => "ShortText"
    case TimestampType | TimestampNTZType => "Time"
    case _ => "Text"
  }

  private def esc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + esc(s) + "\""
    case b: Boolean => if (b) "true" else "false"
    case d: Double => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15)
      d.toLong.toString else d.toString
    case f: Float => jsonValue(f.toDouble)
    case t: java.sql.Timestamp => (t.getTime / 1000.0).toString
    case t: java.time.LocalDateTime =>
      (t.toEpochSecond(java.time.ZoneOffset.UTC) + t.getNano / 1e9).toString
    case other => other.toString
  }

  /** one result body: [[n_hits], [[name,type]...], rows...]. `nHits` is
    * the pre-limit match count (the reference reports total hits even when
    * limit trims the rows). */
  def body(df: DataFrame, nHits: Long, maxRows: Int = 10000): String = {
    val schema = df.schema
    val rows = df.take(maxRows + 1)
    require(rows.length <= maxRows,
      s"result exceeds maxRows=$maxRows — apply the command's limit before formatting")
    val cols = schema.fields
      .map(f => s"""["${esc(f.name)}","${grnType(f.dataType)}"]""")
      .mkString("[", ",", "]")
    val rowsJson = rows.map { (r: Row) =>
      (0 until r.length).map(i => jsonValue(r.get(i))).mkString("[", ",", "]")
    }
    (Seq(s"[$nHits]", cols) ++ rowsJson).mkString("[", ",", "]")
  }

  /** full envelope; drilldowns render positionally, labeled drilldowns as
    * an object — exactly the two select.rst output shapes */
  def envelope(searchBody: String, drilldowns: Seq[String] = Nil,
      labeled: Map[String, String] = Map.empty,
      returnCode: Int = 0, startSec: Double = 0.0, elapsedSec: Double = 0.0): String = {
    val parts = Seq(searchBody) ++ drilldowns ++
      (if (labeled.isEmpty) Nil
       else Seq(labeled.toSeq.sortBy(_._1)
         .map { case (l, b) => "\"" + esc(l) + "\":" + b }
         .mkString("{", ",", "}")))
    s"[[$returnCode,$startSec,$elapsedSec],[${parts.mkString(",")}]]"
  }
}
