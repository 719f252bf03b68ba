package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{CommandFormat, Introspect, Msgpack}
import graft.index.GraftIndex

/** The reference's HTTP front re-expressed over the JDK's built-in
  * HttpServer (zero third-party deps): `GET /d/<command>[.<output_type>]
  * ?<urlencoded args>` and `POST /d/load` with a JSON body — the same
  * URL shape groonga's `h_*` handlers parse and hand to grn_ctx_send
  * (/root/reference/src/groonga.c:1957, path→command dispatch in
  * lib/ctx.cpp). Output types json (command_version 1 AND 3), xml and
  * msgpack all render through [[CommandFormat]], so the wire bytes are
  * the same envelopes the format specs golden-match.
  *
  * Architecture note (the 100-TB story): this server is the CONTROL
  * plane. It listens on the Spark DRIVER; every command body executes as
  * the same distributed DataFrame plan the library API produces, so the
  * HTTP layer adds no data-plane hop and no new scaling ceiling — it is
  * the groonga daemon's admin/query socket, not a shard router. Result
  * pages are bounded by the command's offset/limit exactly like the
  * reference (unbounded dumps refuse via CommandFormat's maxRows guard).
  *
  * Errors return the reference error-envelope shape
  * `[[rc, start, elapsed, "message"], ...]` with HTTP 400 and
  * rc = -22 (GRN_INVALID_ARGUMENT) for bad commands/args. */
final class GraftHttpServer(
    spark: SparkSession,
    indexes: Map[String, GraftIndex],
    tables: Map[String, DataFrame] = Map.empty,
    port: Int = 0) {

  private val startedAtMs = System.currentTimeMillis()
  private val nQueries = new java.util.concurrent.atomic.AtomicLong(0L)

  /** live index registry: `load` commits a new manifest version, so the
    * serving snapshot is re-opened after each load (readers in flight keep
    * their pinned snapshot — the manifest flip is atomic) */
  private val live = {
    val m = new java.util.concurrent.ConcurrentHashMap[String, GraftIndex]()
    indexes.foreach { case (k, v) => m.put(k, v) }
    m
  }

  private val server = com.sun.net.httpserver.HttpServer.create(
    new InetSocketAddress("127.0.0.1", port), 0)
  // daemon workers + explicit shutdown in stop(): the server must never
  // keep the driver JVM alive after close
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-http-${n.incrementAndGet()}")
        t.setDaemon(true)
        t
      }
    })
  server.setExecutor(pool)
  server.createContext("/d/", new com.sun.net.httpserver.HttpHandler {
    override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit =
      try respond(ex) catch {
        case t: Throwable => // handler must never leak an exception
          try sendError(ex, "json", 1, t.getMessage) catch { case _: Throwable => () }
      } finally ex.close()
  })

  def start(): GraftHttpServer = { server.start(); this }
  def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }
  def boundPort: Int = server.getAddress.getPort

  // ---- request plumbing ----

  private def parseQuery(raw: String): Map[String, String] =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split('&').toSeq.filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => java.net.URLDecoder.decode(k, "UTF-8") ->
          java.net.URLDecoder.decode(v, "UTF-8")
        case Array(k) => java.net.URLDecoder.decode(k, "UTF-8") -> ""
      }
    }.toMap

  private def send(ex: com.sun.net.httpserver.HttpExchange, code: Int,
      contentType: String, body: Array[Byte]): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, body.length.toLong)
    val os = ex.getResponseBody
    os.write(body); os.flush(); os.close()
  }

  private def contentTypeOf(outputType: String): String = outputType match {
    case "xml" => "text/xml"
    case "msgpack" => "application/x-msgpack"
    case "arrow" | "apache-arrow" => "application/x-apache-arrow-streaming"
    case _ => "application/json"
  }

  private def sendError(ex: com.sun.net.httpserver.HttpExchange,
      outputType: String, version: Int, message: String): Unit = {
    val msg = Option(message).getOrElse("error")
    val body: Array[Byte] = outputType match {
      case "msgpack" =>
        Msgpack.pack(Vector(Vector[Any](-22, 0.0, 0.0, msg)))
      case _ if version == 3 =>
        (s"""{"header":{"return_code":-22,"start_time":0.0,""" +
          s""""elapsed_time":0.0,"error":{"message":${jsonStr(msg)}}},""" +
          s""""body":null}""").getBytes(UTF_8)
      case _ =>
        s"""[[-22,0.0,0.0,${jsonStr(msg)}]]""".getBytes(UTF_8)
    }
    send(ex, 400, contentTypeOf(outputType), body)
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  // ---- dispatch ----

  private def respond(ex: com.sun.net.httpserver.HttpExchange): Unit = {
    val t0 = System.nanoTime()
    val startSec = System.currentTimeMillis() / 1000.0
    val path = ex.getRequestURI.getPath.stripPrefix("/d/")
    val (command, extType) = path.lastIndexOf('.') match {
      case -1 => (path, None)
      case i => (path.take(i), Some(path.drop(i + 1)))
    }
    val args = parseQuery(ex.getRequestURI.getRawQuery)
    val outputType = extType.orElse(args.get("output_type")).getOrElse("json")
    val version = args.get("command_version").map(_.toInt).getOrElse(1)
    nQueries.incrementAndGet()

    def elapsed: Double = (System.nanoTime() - t0) / 1e9

    /** one result-set command: (df, nHits, positional drilldowns) */
    def reply(df: DataFrame, nHits: Long,
        drilldowns: Seq[(DataFrame, Long)] = Nil): Unit = {
      val body: Array[Byte] = outputType match {
        case "xml" =>
          CommandFormat.xml(df, nHits,
            offset = args.get("offset").map(_.toInt).getOrElse(0),
            limit = args.get("limit").map(_.toInt).getOrElse(10),
            drilldowns = drilldowns).getBytes(UTF_8)
        case "msgpack" =>
          CommandFormat.msgpack(CommandFormat.bodyTree(df, nHits),
            drilldowns.map { case (dd, n) => CommandFormat.bodyTree(dd, n) },
            returnCode = 0, startSec = startSec, elapsedSec = elapsed)
        case "arrow" | "apache-arrow" =>
          // the reference streams the result set itself (header/drilldowns
          // travel as separate metadata streams); main result set here
          graft.api.ArrowFormat.arrow(df, nHits)
        case _ if version == 3 =>
          CommandFormat.envelopeV3(CommandFormat.bodyV3(df, nHits),
            startSec = startSec, elapsedSec = elapsed).getBytes(UTF_8)
        case _ =>
          CommandFormat.envelope(CommandFormat.body(df, nHits),
            drilldowns = drilldowns.map { case (dd, n) => CommandFormat.body(dd, n) },
            startSec = startSec, elapsedSec = elapsed).getBytes(UTF_8)
      }
      send(ex, 200, contentTypeOf(outputType), body)
    }

    def index(name: String): GraftIndex = Option(live.get(name)).getOrElse(
      throw new IllegalArgumentException(s"[table][select] unknown table: <$name>"))

    try command match {
      case "status" =>
        val up = (System.currentTimeMillis() - startedAtMs) / 1000
        val body =
          s"""[[0,$startSec,$elapsed],{"version":"graft/0.6","uptime":$up,""" +
          s""""n_queries":${nQueries.get()},"start_time":${startedAtMs / 1000}}]"""
        send(ex, 200, contentTypeOf("json"), body.getBytes(UTF_8))

      case "select" =>
        val table = args.getOrElse("table",
          throw new IllegalArgumentException("[select] table is missing"))
        val idx = index(table)
        val q = args.getOrElse("query", "")
        val req = graft.operators.Select.Request(
          query = q,
          score = args.get("score") match {
            case Some("bm25") => graft.query.ScoreMode.Bm25()
            case _ => graft.query.ScoreMode.Tf
          },
          sortKeys = args.get("sort_keys")
            .map(graft.operators.Select.parseSortKeys)
            .getOrElse(Seq(("score", false), ("doc_id", true))),
          offset = args.get("offset").map(_.toInt).getOrElse(0),
          limit = args.get("limit").map(_.toInt).getOrElse(10))
        val nHits = graft.operators.Select
          .select(idx, req.copy(offset = 0, limit = Int.MaxValue)).count()
        val page = graft.operators.Select.select(idx, req)
        // reference default output_columns: _id, _score (ints in TF mode)
        val outCols = args.getOrElse("output_columns", "_id, _score")
          .split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val renamed = outCols.map {
          case "_id" => col("doc_id").as("_id")
          case "_score" => col("score").cast("long").as("_score")
          case other => throw new IllegalArgumentException(
            s"[select] unsupported output column: <$other>")
        }
        val dds = args.get("drilldown").toSeq.flatMap { dcol =>
          val src = tables.getOrElse(table, throw new IllegalArgumentException(
            s"[select][drilldown] no source table registered for <$table>"))
          val grouped = src.join(page.select(col("doc_id")), Seq("doc_id"))
            .groupBy(col(dcol).as("_key"))
            .agg(count(lit(1)).as("_nsubrecs"))
            .orderBy(desc("_nsubrecs"), asc("_key"))
          Seq((grouped.limit(10), grouped.count()))
        }
        reply(page.select(renamed: _*), nHits, dds)

      case "load" =>
        require(ex.getRequestMethod == "POST", "[load] POST only")
        val table = args.getOrElse("table",
          throw new IllegalArgumentException("[load] table is missing"))
        val idx = index(table)
        val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        import spark.implicits._
        val rows = spark.read.json(Seq(body).toDS())
        require(rows.columns.contains("doc_id") && rows.columns.contains("text"),
          "[load] body rows need doc_id and text")
        val n = rows.count()
        graft.streaming.IncrementalIndex.upsert(spark, idx.path,
          rows.select(col("doc_id").cast("long"), col("text").cast("string")),
          "doc_id", "text", s"seg-http-${System.nanoTime()}",
          graft.index.IndexConfig(tokenizer = idx.meta.tokenizer))
        live.put(table, GraftIndex(spark, idx.path)) // serve the new snapshot
        send(ex, 200, contentTypeOf("json"),
          s"[[0,$startSec,$elapsed],$n]".getBytes(UTF_8))

      case "table_list" =>
        import spark.implicits._
        val df = indexes.keys.toSeq.sorted.zipWithIndex
          .map { case (n, i) => (i.toLong + 256L, n) }.toDF("id", "name")
        reply(df, df.count())

      case "column_list" =>
        val table = args.getOrElse("table",
          throw new IllegalArgumentException("[column_list] table is missing"))
        val df = Introspect.columnList(index(table), "postings").orderBy("id")
        reply(df, df.count())

      case "schema" =>
        val table = args.getOrElse("table",
          throw new IllegalArgumentException("[schema] table is missing"))
        val df = Introspect.schemaCmd(index(table)).orderBy("section", "name")
        reply(df, df.count())

      case "object_inspect" =>
        val table = args.getOrElse("table",
          throw new IllegalArgumentException("[object_inspect] table is missing"))
        val df = Introspect.objectInspect(index(table),
          args.getOrElse("name", "postings"))
        reply(df, df.count())

      case "tokenize" =>
        val tokenizer = args.getOrElse("tokenizer", "TokenBigram")
        val string = args.getOrElse("string",
          throw new IllegalArgumentException("[tokenize] string is missing"))
        val mode = if (args.get("mode").contains("GET"))
          graft.analyzer.TokenizeMode.Get else graft.analyzer.TokenizeMode.Add
        import spark.implicits._
        val toks = graft.analyzer.Analyzers.byName(tokenizer)
          .tokenize(string, mode)
          .map(t => (t.term, t.pos,
            (t.status & graft.analyzer.TokenStatus.ForcePrefix) != 0))
          .toSeq.toDF("value", "position", "force_prefix")
        reply(toks, toks.count())

      case "normalize" =>
        val normalizer = args.getOrElse("normalizer", "NormalizerAuto")
        val string = args.getOrElse("string",
          throw new IllegalArgumentException("[normalize] string is missing"))
        import spark.implicits._
        val df = Seq(graft.analyzer.Normalizer.byName(normalizer)(string))
          .toDF("normalized")
        reply(df, 1L)

      case other =>
        throw new IllegalArgumentException(s"invalid command name: <$other>")
    } catch {
      case e: Exception => sendError(ex, outputType, version, e.getMessage)
    }
  }
}
