package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Casts

/** groonga cast-rule edges (lib/cast.cpp): values chosen so each rule
  * differs observably from both ANSI SQL and Spark default casts. */
class CastsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("v")).collect()(0).get(0)

  test("text→int: whole-string integer, else number truncated, else null") {
    val cases = Seq(
      "42" -> 42L, "-7" -> -7L, "1.9" -> 1L, "-1.9" -> -1L,
      "1e3" -> 1000L, ".5" -> 0L)
    for ((s, want) <- cases)
      assert(one(Casts.textToLong(lit(s))) == want, s"'$s'")
    for (bad <- Seq("12abc", "", " 9", "+9", "false", "0x10"))
      assert(one(Casts.textToLong(lit(bad))) == null, s"'$bad' must be invalid")
  }

  test("static_cast narrowing wraps two's-complement") {
    assert(one(Casts.narrowToInt(lit(300L), 8)) == 44L)           // int8_t(300)
    assert(one(Casts.narrowToInt(lit(-300L), 8)) == -44L)
    assert(one(Casts.narrowToInt(lit(70000L), 16)) == 4464L)      // int16_t(70000)
    assert(one(Casts.narrowToInt(lit(5000000000L), 32)) == 705032704L) // int32_t
    assert(one(Casts.textToInt(lit("1e3"), 8)) == -24L)           // int8_t(1000)
  }

  test("text→bool is non-empty; bool round-trips as true/false text") {
    assert(one(Casts.textToBool(lit("false"))) == true)
    assert(one(Casts.textToBool(lit("0"))) == true)
    assert(one(Casts.textToBool(lit(""))) == false)
    assert(one(Casts.boolToText(lit(true))) == "true")
    assert(one(Casts.boolToText(lit(false))) == "false")
    assert(one(Casts.numToBool(lit(0))) == false)
    assert(one(Casts.numToBool(lit(-3))) == true)
  }

  test("loose load rule substitutes the default on invalid") {
    assert(one(Casts.loose(Casts.textToLong(lit("12abc")))) == 0L)
    assert(one(Casts.loose(Casts.textToLong(lit("42")))) == 42L)
  }
}
