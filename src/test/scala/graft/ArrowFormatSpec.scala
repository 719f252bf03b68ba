package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.ArrowFormat

/** The Arrow output must round-trip every supported column shape through
  * real IPC bytes, carry the reference's GROONGA:n_hits schema metadata,
  * and refuse unbounded pages like every CommandFormat body. */
class ArrowFormatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("round-trips scalars, nulls, strings, binary; carries n_hits") {
    val df = Seq(
      (1L, Option(10), Option(1.5), Option(true), "spark", Array[Byte](1, 2)),
      (2L, None: Option[Int], None: Option[Double], None: Option[Boolean],
        "ascii and あ", Array.empty[Byte]))
      .toDF("id", "n", "d", "b", "s", "bin")
    val bytes = ArrowFormat.arrow(df, nHits = 57)
    val (nHits, names, rows) = ArrowFormat.arrowRead(bytes)
    assert(nHits == 57L)
    assert(names == Seq("id", "n", "d", "b", "s", "bin"))
    assert(rows.length == 2)
    assert(rows(0)(0) == 1L && rows(0)(1) == 10 && rows(0)(2) == 1.5 &&
      rows(0)(3) == true && rows(0)(4) == "spark")
    assert(rows(0)(5).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](1, 2))
    assert(rows(1)(1) == null && rows(1)(2) == null && rows(1)(3) == null)
    assert(rows(1)(4) == "ascii and あ")
  }

  test("the stream is a well-formed Arrow IPC stream (magic-free, schema-first)") {
    val df = Seq((1L, "x")).toDF("i", "s")
    val bytes = ArrowFormat.arrow(df, 1)
    // IPC stream starts with an encapsulated message: 0xFFFFFFFF continuation
    assert(bytes.length > 8)
    assert((bytes(0) & 0xff) == 0xff && (bytes(3) & 0xff) == 0xff)
    // Spark can consume it back through the same public reader API
    val (_, _, rows) = ArrowFormat.arrowRead(bytes)
    assert(rows == Vector(Vector(1L, "x")))
  }

  test("oversized unlimited result is refused") {
    val df = spark.range(100).toDF("i")
    intercept[IllegalArgumentException](ArrowFormat.arrow(df, 100, maxRows = 10))
  }

  test("empty page keeps the schema and the hit count") {
    val df = Seq((1L, "x")).toDF("i", "s").limit(0)
    val (nHits, names, rows) = ArrowFormat.arrowRead(ArrowFormat.arrow(df, 42))
    assert(nHits == 42L && names == Seq("i", "s") && rows.isEmpty)
  }
}
