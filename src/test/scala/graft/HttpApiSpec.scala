package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.funsuite.AnyFunSuite

import graft.api.Msgpack
import graft.server.GraftHttpServer

/** End-to-end drive of the HTTP front: the envelopes on the wire must be
  * EXACTLY what CommandFormat renders for the direct library call — the
  * server is a transport, not a second engine. */
class HttpApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val (srv, idx) = {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark fulltext engine"), (2L, "fast spark joins"),
      (3L, "columnar scan"), (4L, "spark spark spark"),
      (5L, "window functions")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-http").toString + "/idx"
    val built = graft.index.IndexBuilder.build(spark, docs, "doc_id", "text", dir,
      graft.index.IndexConfig(tokenizer = "TokenBigram"))
    val s = new GraftHttpServer(spark, Map("docs" -> built),
      Map("docs" -> docs)).start()
    (s, built)
  }
  private lazy val client = HttpClient.newHttpClient()

  private def get(pathAndQuery: String): HttpResponse[Array[Byte]] =
    client.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${srv.boundPort}$pathAndQuery")).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())

  test("select over HTTP returns the v1 envelope with hits and scores") {
    val r = get("/d/select?table=docs&query=spark&limit=10")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").get() == "application/json")
    val body = new String(r.body(), "UTF-8")
    // doc 4 has tf 3 -> ranked first; columns are the reference defaults
    assert(body.contains("""[["_id","Int64"],["_score","Int64"]]"""))
    assert(body.contains("[[3],") && body.contains("[4,3]") &&
      body.contains("[1,1]") && body.contains("[2,1]"))
  }

  test("msgpack select decodes to the same rows as json") {
    val r = get("/d/select.msgpack?table=docs&query=spark&limit=10")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").get() == "application/x-msgpack")
    val env = Msgpack.unpack(r.body()).asInstanceOf[Vector[Any]]
    assert(env(0).asInstanceOf[Vector[Any]].head == 0L)
    val rs = env(1).asInstanceOf[Vector[Any]](0).asInstanceOf[Vector[Any]]
    assert(rs(0) == Vector(3L))
    assert(rs.drop(2) == Vector(Vector(4L, 3L), Vector(1L, 1L), Vector(2L, 1L)))
  }

  test("command_version=3 wraps header/body; xml renders the result page") {
    val v3 = new String(get("/d/select?table=docs&query=spark&command_version=3").body(), "UTF-8")
    assert(v3.startsWith("""{"header":{"return_code":0"""))
    assert(v3.contains(""""n_hits":3"""))
    val xml = new String(get("/d/select.xml?table=docs&query=spark").body(), "UTF-8")
    assert(xml.contains("""<RESULTSET OFFSET="0" LIMIT="3" NHITS="3">"""))
    assert(xml.contains("""<HIT NO="1">"""))
  }

  test("apache-arrow select streams real IPC bytes with n_hits metadata") {
    val r = get("/d/select.arrow?table=docs&query=spark&limit=10")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").get() ==
      "application/x-apache-arrow-streaming")
    val (nHits, names, rows) = graft.api.ArrowFormat.arrowRead(r.body())
    assert(nHits == 3L && names == Seq("_id", "_score"))
    assert(rows == Vector(Vector(4L, 3L), Vector(1L, 1L), Vector(2L, 1L)))
  }

  test("drilldown rides the select as a second result set") {
    val body = new String(
      get("/d/select?table=docs&query=spark&drilldown=text").body(), "UTF-8")
    assert(body.contains("_nsubrecs"))
  }

  test("offset/limit page; sort_keys parse the reference syntax") {
    val body = new String(get(
      "/d/select?table=docs&query=spark&sort_keys=%2B_id&offset=1&limit=1").body(), "UTF-8")
    // ascending _id, second page of one row -> doc 2
    assert(body.contains("[[3],") && body.contains("[2,1]") && !body.contains("[1,1]"))
  }

  test("status, tokenize, normalize, schema answer") {
    val st = new String(get("/d/status").body(), "UTF-8")
    assert(st.contains(""""version":"graft/0.6"""") && st.contains(""""n_queries":"""))
    val tok = new String(
      get("/d/tokenize?tokenizer=TokenBigram&string=hello%20world").body(), "UTF-8")
    assert(tok.contains("\"hello\"") && tok.contains("\"world\""))
    val norm = new String(
      get("/d/normalize?normalizer=NormalizerAuto&string=ABC").body(), "UTF-8")
    assert(norm.contains("\"abc\""))
    val sch = new String(get("/d/schema?table=docs").body(), "UTF-8")
    assert(sch.contains("tables"))
  }

  test("errors return the reference error envelope with HTTP 400") {
    val bad = get("/d/select?query=spark") // no table
    assert(bad.statusCode() == 400)
    assert(new String(bad.body(), "UTF-8").startsWith("[[-22,"))
    val unknown = get("/d/frobnicate")
    assert(unknown.statusCode() == 400)
    assert(new String(unknown.body(), "UTF-8").contains("invalid command name"))
    // msgpack error envelope too
    val mp = get("/d/select.msgpack?query=x")
    assert(mp.statusCode() == 400)
    val env = Msgpack.unpack(mp.body()).asInstanceOf[Vector[Any]]
    assert(env(0).asInstanceOf[Vector[Any]].head == -22L)
  }

  test("POST /d/load upserts through the live index") {
    val post = client.send(
      HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:${srv.boundPort}/d/load?table=docs"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """[{"doc_id": 9, "text": "freshly loaded spark doc"}]"""))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    assert(post.statusCode() == 200 && post.body().endsWith(",1]"))
    // the loaded doc is immediately searchable over the SAME server
    val body = new String(
      get("/d/select?table=docs&query=freshly&limit=5").body(), "UTF-8")
    assert(body.contains("[9,1]"))
  }
}
