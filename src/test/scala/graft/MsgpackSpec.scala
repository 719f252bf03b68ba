package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{CommandFormat, Msgpack}

/** Byte goldens hand-derived from the public MessagePack spec
  * (github.com/msgpack/msgpack/blob/master/spec.md) plus the envelope
  * shape the reference packs through lib/msgpack.c / lib/output.c. */
class MsgpackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  test("scalar encodings match the spec byte-for-byte") {
    assert(hex(Msgpack.pack(null)) == "c0")
    assert(hex(Msgpack.pack(false)) == "c2")
    assert(hex(Msgpack.pack(true)) == "c3")
    // ints: minimal width, signed/unsigned families
    assert(hex(Msgpack.pack(0)) == "00")
    assert(hex(Msgpack.pack(127)) == "7f")
    assert(hex(Msgpack.pack(128)) == "cc80")
    assert(hex(Msgpack.pack(255)) == "ccff")
    assert(hex(Msgpack.pack(256)) == "cd0100")
    assert(hex(Msgpack.pack(65536)) == "ce00010000")
    assert(hex(Msgpack.pack(4294967296L)) == "cf0000000100000000")
    assert(hex(Msgpack.pack(-1)) == "ff")
    assert(hex(Msgpack.pack(-32)) == "e0")
    assert(hex(Msgpack.pack(-33)) == "d0df")
    assert(hex(Msgpack.pack(-129)) == "d1ff7f")
    assert(hex(Msgpack.pack(-32769)) == "d2ffff7fff")
    assert(hex(Msgpack.pack(-2147483649L)) == "d3ffffffff7fffffff")
    assert(hex(Msgpack.pack(Long.MaxValue)) == "cf7fffffffffffffff")
    assert(hex(Msgpack.pack(Long.MinValue)) == "d38000000000000000")
    // floats
    assert(hex(Msgpack.pack(1.5f)) == "ca3fc00000")
    assert(hex(Msgpack.pack(1.5)) == "cb3ff8000000000000")
    // str
    assert(hex(Msgpack.pack("")) == "a0")
    assert(hex(Msgpack.pack("abc")) == "a3616263")
    assert(hex(Msgpack.pack("a" * 32)) == "d920" + "61" * 32)
    assert(hex(Msgpack.pack("あ")) == "a3e38182") // UTF-8 multibyte
    // bin
    assert(hex(Msgpack.pack(Array[Byte](1, 2))) == "c4020102")
    // containers
    assert(hex(Msgpack.pack(Seq(1, 2))) == "920102")
    assert(hex(Msgpack.pack(Vector.fill(16)(0: Any))) == "dc0010" + "00" * 16)
    assert(hex(Msgpack.pack(Map("a" -> 1))) == "81a16101")
  }

  test("map keys pack in sorted order (deterministic bytes)") {
    assert(hex(Msgpack.pack(Map("b" -> 2, "a" -> 1))) == "82a16101a16202")
  }

  test("unpack is the exact inverse over every family") {
    val tree: Any = Vector(
      Vector(0L, 0.0, 0.0),
      Vector(
        Vector(Vector(2L): Any, Vector(Vector("_key", "ShortText"): Any)),
        Map("label" -> (Vector(1L, "x", true, null): Any)),
        "あbc", -129L, 4294967296L, 1.25, Vector.empty[Any]))
    assert(Msgpack.unpack(Msgpack.pack(tree)) == tree)
    // bin round-trips by content (Array equality is by reference)
    Msgpack.unpack(Msgpack.pack(Array[Byte](1, 2, 3))) match {
      case a: Array[Byte] => assert(a.toSeq == Seq[Byte](1, 2, 3))
      case other => fail(s"expected bin, got $other")
    }
    // trailing garbage is refused
    intercept[IllegalArgumentException](Msgpack.unpack(Array[Byte](0x01, 0x02)))
  }

  test("select envelope packs the reference doc example tree") {
    // same data as CommandFormatSpec's v1 golden (match_columns_simple.log)
    val df = Seq(("Groonga", 1), ("Mroonga", 2)).toDF("_key", "_score")
    val bytes = CommandFormat.msgpack(CommandFormat.bodyTree(df, nHits = 2))
    // [[0,0.0,0.0],[[[2],[["_key","ShortText"],["_score","Int32"]],
    //               ["Groonga",1],["Mroonga",2]]]]
    assert(hex(bytes) ==
      "92" + // envelope [header, results]
      "9300" + "cb0000000000000000" * 2 + // header [0, 0.0, 0.0]
      "91" + // one result set
      "94" + // [[2], cols, row, row]
      "9102" + // [2]
      "92" + "92a45f6b6579a953686f727454657874" + // ["_key","ShortText"]
             "92a65f73636f7265a5496e743332" + // ["_score","Int32"]
      "92a747726f6f6e676101" + // ["Groonga",1]
      "92a74d726f6f6e676102") // ["Mroonga",2]
    // decoded view equals the JSON envelope's logical tree
    assert(Msgpack.unpack(bytes) == Vector(
      Vector(0L, 0.0, 0.0),
      Vector(Vector(
        Vector(2L),
        Vector(Vector("_key", "ShortText"), Vector("_score", "Int32")),
        Vector("Groonga", 1L), Vector("Mroonga", 2L)))))
  }

  test("labeled drilldowns pack as one trailing map, positional as siblings") {
    val body = Vector(Vector(1L): Any)
    val dd = Vector(Vector(3L): Any)
    assert(Msgpack.unpack(CommandFormat.msgpack(body, drilldowns = Seq(dd))) ==
      Vector(Vector(0L, 0.0, 0.0), Vector(Vector(Vector(1L)), Vector(Vector(3L)))))
    assert(Msgpack.unpack(CommandFormat.msgpack(body, labeled = Map("tag" -> dd))) ==
      Vector(Vector(0L, 0.0, 0.0),
        Vector(Vector(Vector(1L)), Map("tag" -> Vector(Vector(3L))))))
  }

  test("typed scalars keep width: float32, float64, timestamp, binary, nested") {
    val ts = java.sql.Timestamp.valueOf("2026-01-02 03:04:05")
    val df = Seq((1.5f, 2.5, ts, Array[Byte](9), Seq(1, 2)))
      .toDF("f", "d", "t", "b", "v")
    val tree = CommandFormat.bodyTree(df, nHits = 1)
    val row = Msgpack.unpack(Msgpack.pack(tree)).asInstanceOf[Vector[Any]](2)
      .asInstanceOf[Vector[Any]]
    assert(row(0) == 1.5f) // float32 stays float32 (output.c:719)
    assert(row(1) == 2.5)
    assert(row(2) == ts.getTime / 1000.0) // Time packs epoch-seconds double
    assert(row(3).asInstanceOf[Array[Byte]].toSeq == Seq[Byte](9)) // bin, not base64
    assert(row(4) == Vector(1L, 2L))
  }

  test("oversized unlimited result is refused") {
    val df = spark.range(100).toDF("i")
    intercept[IllegalArgumentException](CommandFormat.bodyTree(df, 100, maxRows = 10))
  }

  test("pack/unpack round-trips random trees (seeded fuzz)") {
    val rnd = new scala.util.Random(20260818L)
    def randScalar(): Any = rnd.nextInt(7) match {
      case 0 => rnd.nextLong()
      case 1 => rnd.nextInt(300) - 150L // exercise all fixint/int8/uint8 edges
      case 2 => rnd.nextDouble()
      case 3 => rnd.nextBoolean()
      case 4 => null
      case 5 => rnd.alphanumeric.take(rnd.nextInt(40)).mkString
      case 6 => "あ" * rnd.nextInt(20) // multibyte str lengths
    }
    def randTree(depth: Int): Any =
      if (depth == 0) randScalar()
      else rnd.nextInt(3) match {
        case 0 => randScalar()
        case 1 => Vector.fill(rnd.nextInt(20))(randTree(depth - 1))
        case 2 => (0 until rnd.nextInt(8))
          .map(i => s"k$i" -> randTree(depth - 1)).toMap
      }
    for (i <- 0 until 500) {
      val t = randTree(3)
      assert(Msgpack.unpack(Msgpack.pack(t)) == t, s"iter $i: $t")
    }
  }
}
