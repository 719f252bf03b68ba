package graft

import org.scalatest.funsuite.AnyFunSuite

/** Native bucketing: identical bucket specs on both sides must plan a
  * shuffle-free sort-merge join whose rows equal the plain join's. */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-located join: zero Exchange, same rows as the plain join") {
    val a = (0L until 500L).map(i => (i, s"v$i")).toDF("k", "va")
    val b = (0L until 500L by 2).map(i => (i, i * 3)).toDF("k", "vb")
    val dir = java.nio.file.Files.createTempDirectory("graft-bkspec").toString
    graft.sources.BucketedTables.writeBucketed(a, "bkspec_a", 4, "k", s"$dir/a")
    graft.sources.BucketedTables.writeBucketed(b, "bkspec_b", 4, "k", s"$dir/b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = graft.sources.BucketedTables
        .colocatedJoin(spark, "bkspec_a", "bkspec_b", "k")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange") && p.contains("SortMergeJoin"), p)
      val got = j.as[(Long, String, Long)].collect().toSet
      val want = a.join(b, "k").as[(Long, String, Long)].collect().toSet
      assert(got == want && got.size == 250)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("rewriting with a changed bucket spec replaces the table") {
    val df = (0L until 10L).map(i => (i, i)).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("graft-bkspec2").toString
    graft.sources.BucketedTables.writeBucketed(df, "bkspec_c", 2, "k", s"$dir/c1")
    graft.sources.BucketedTables.writeBucketed(df, "bkspec_c", 4, "k", s"$dir/c2")
    assert(spark.table("bkspec_c").count() == 10)
  }
}
