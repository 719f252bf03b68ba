package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational correctness-gate queries over the TPC-H-ish tables, covering
  * groonga's non-fulltext operator surface (SURVEY.md §2.4-2.9): drilldowns
  * (grn_table_group + calc types), accessor-path joins, sub_filter /
  * in_values / between selectors, sorts with offset/limit, window functions,
  * result-set ops, and the scalar function families.
  *
  * Money sums use sum(CAST(round(x*100) AS BIGINT)) so aggregation order
  * cannot perturb the hash (double + is not associative; longs are).
  */
object RelationalQueries {
  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(spark, dir, name)

  // drilldown with all calc types (grn_table_group MAX/MIN/SUM/MEAN,
  // include/groonga/table.h:723-730)
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("nsubrecs"),
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_c"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_quantity")).as("min_qty"),
        round(avg(col("l_discount")), 4).as("mean_disc"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  count(*) AS nsubrecs,
      |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
      |  max(l_quantity) AS max_qty,
      |  min(l_quantity) AS min_qty,
      |  round(avg(l_discount), 4) AS mean_disc
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** aggregator_sd — standard deviation calc type (the one aggregator proc
    * round 1 left ungated); population sd, floored at 1e-4 so float
    * summation order cannot flip the hash */
  def aggSd(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg((floor(stddev_pop(col("l_quantity")) * 10000) / 10000.0).as("sd_qty"),
        count(lit(1)).as("nsubrecs"))
      .orderBy("l_returnflag")

  val aggSdSql: String =
    """SELECT l_returnflag,
      |  floor(stddev_pop(l_quantity) * 10000) / 10000.0 AS sd_qty,
      |  count(*) AS nsubrecs
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** nested drilldown: drilldown over a drilldown via a reference column —
    * matched orders faceted by customer nation, then nations faceted by
    * region (drilldowns[label].table chaining, proc_select.cpp:483+) */
  def drilldownNested(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val cust = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    val level1 = orders.where(col("o_orderstatus") === "O")
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("nsubrecs"))
    level1.join(broadcast(nation), level1("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), sum(col("nsubrecs")).as("n_orders"))
      .orderBy("n_regionkey")
  }

  val drilldownNestedSql: String =
    """WITH l1 AS (
      |  SELECT c_nationkey, count(*) AS nsubrecs
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderstatus = 'O' GROUP BY 1)
      |SELECT n_regionkey, count(*) AS n_nations,
      |  CAST(sum(nsubrecs) AS BIGINT) AS n_orders
      |FROM l1 JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // accessor path o_custkey.c_nationkey.n_name = chained N:1 reference
  // columns (grn_obj_get_accessor, lib/db.c:5403) -> broadcast-able joins
  def drilldownRef(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val cust = t(spark, dir, "customer")
    val nation = t(spark, dir, "nation")
    orders
      .join(broadcast(cust), orders("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("nsubrecs"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_price_c"))
      .orderBy("n_name")
  }

  val drilldownRefSql: String =
    """SELECT n_name, count(*) AS nsubrecs,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // multi-key sort + offset/limit (grn_table_sort partial top-k, lib/sort.c)
  def sortTopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      .offset(5).limit(15)

  val sortTopKSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 15 OFFSET 5""".stripMargin

  // window functions: record_number / window_sum / window_rank
  // (lib/window_functions.c:464-481) — whole-partition windows w/ ordering
  def windowFns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(asc("o_orderdate"), asc("o_orderkey"))
    val wAll = Window.partitionBy(col("o_custkey"))
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"),
        rank().over(Window.partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"), asc("o_orderkey"))).as("rk"),
        count(lit(1)).over(wAll).as("wcount"),
        sum(round(col("o_totalprice") * 100).cast("long")).over(wAll).as("wsum_c"))
      .orderBy("o_orderkey")
  }

  val windowFnsSql: String =
    """SELECT o_orderkey, o_custkey,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
      |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk,
      |  count(*) OVER (PARTITION BY o_custkey) AS wcount,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (PARTITION BY o_custkey) AS BIGINT) AS wsum_c
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // result-set AND_NOT (left_anti) — customers with orders but none 'F'
  def setopAndNot(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val withOrders = t(spark, dir, "customer")
      .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
    val withF = orders.where(col("o_orderstatus") === "F").select(col("o_custkey"))
    withOrders.join(withF, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey")).orderBy("c_custkey")
  }

  val setopAndNotSql: String =
    """SELECT c_custkey FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  // sub_filter(ref, expr) semi-join (lib/proc.c:5617)
  def subFilter(spark: SparkSession, dir: String): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .where(col("l_quantity") >= 45).select(col("l_suppkey"))
    t(spark, dir, "supplier")
      .join(big, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name")).orderBy("s_suppkey")
  }

  val subFilterSql: String =
    """SELECT s_suppkey, s_name FROM supplier
      |WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity >= 45)
      |ORDER BY s_suppkey""".stripMargin

  // in_values (lib/proc.c:5643)
  def inValues(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .where(col("p_brand").isin("Brand#1", "Brand#3"))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .orderBy("p_partkey")

  val inValuesSql: String =
    """SELECT p_partkey, p_brand, p_size FROM part
      |WHERE p_brand IN ('Brand#1', 'Brand#3') ORDER BY p_partkey""".stripMargin

  // between() selector with range-index semantics (lib/table_selector.c:1310)
  def betweenRange(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .where(col("l_shipdate").between(
        lit("1995-01-01").cast("timestamp"), lit("1995-12-31").cast("timestamp")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(round(col("l_quantity")).cast("long")).as("qty"))
      .orderBy("l_returnflag")

  val betweenRangeSql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      |FROM lineitem
      |WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // string function family (plugins/functions/string.c, lib/proc.c:5630)
  def stringFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 5).as("name_slice"),
        upper(col("p_type")).as("type_upper"),
        regexp_replace(col("p_name"), "a", "@").as("name_sub"))
      .orderBy("p_partkey")

  val stringFnsSql: String =
    """SELECT p_partkey, length(p_name) AS name_len,
      |  substring(p_name, 1, 5) AS name_slice,
      |  upper(p_type) AS type_upper,
      |  regexp_replace(p_name, 'a', '@', 'g') AS name_sub
      |FROM part ORDER BY p_partkey""".stripMargin

  // time_classify_* family (plugins/functions/time.c)
  def timeFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        year(col("o_orderdate")).as("y"),
        dayofweek(col("o_orderdate")).as("dow"))
      .groupBy(col("ym"))
      .agg(count(lit(1)).as("n"), min(col("dow")).as("min_dow"))
      .orderBy("ym")

  val timeFnsSql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS ym, count(*) AS n,
      |  min(CAST(dayofweek(o_orderdate) AS INT) + 1) AS min_dow
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // math/number family (plugins/functions/math.c, number.cpp)
  def mathFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("adisc"),
        round(col("l_extendedprice"), 1).as("rprice"),
        floor(col("l_quantity")).cast("long").as("fqty"),
        greatest(col("l_tax"), col("l_discount")).as("gmax"))
      .where(col("l_orderkey") <= 100)
      .orderBy("l_orderkey", "l_linenumber")

  val mathFnsSql: String =
    """SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS adisc,
      |  round(l_extendedprice, 1) AS rprice,
      |  CAST(floor(l_quantity) AS BIGINT) AS fqty,
      |  greatest(l_tax, l_discount) AS gmax
      |FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber""".stripMargin

  // edit_distance (lib/proc.c grn_proc_init_edit_distance)
  def editDistance(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(col("p_partkey"), levenshtein(col("p_brand"), lit("Brand#2")).as("dist"))
      .orderBy("p_partkey")

  val editDistanceSql: String =
    """SELECT p_partkey, levenshtein(p_brand, 'Brand#2') AS dist
      |FROM part ORDER BY p_partkey""".stripMargin

  // slices: named filtered sub-result with its own agg
  // (Slice::execute_internal, lib/proc/proc_select.cpp:2119)
  def slices(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "events")
    val s1 = base.where(col("event_type") === "click")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_c"))
    val s2 = base.where(col("value") > 50.0)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_c"))
    s1.withColumn("slice", lit("clicks"))
      .unionByName(s2.withColumn("slice", lit("high_value")))
      .select(col("slice"), col("event_type"), col("n"), col("sum_c"))
      .orderBy("slice", "event_type")
  }

  val slicesSql: String =
    """SELECT * FROM (
      |  SELECT 'clicks' AS slice, event_type, count(*) AS n,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
      |  FROM events WHERE event_type = 'click' GROUP BY 2
      |  UNION ALL
      |  SELECT 'high_value' AS slice, event_type, count(*) AS n,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c
      |  FROM events WHERE value > 50.0 GROUP BY 2)
      |ORDER BY slice, event_type""".stripMargin

  // dynamic columns (columns[name] stage=filtered) + post_filter
  def dynamicColumn(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .where(col("l_returnflag") === "R")
      .withColumn("revenue_c",
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long"))
      .where(col("revenue_c") > 5000000L) // post_filter on the dynamic column
      .select(col("l_orderkey"), col("l_linenumber"), col("revenue_c"))
      .orderBy("l_orderkey", "l_linenumber")

  val dynamicColumnSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) AS revenue_c
      |FROM lineitem
      |WHERE l_returnflag = 'R'
      |  AND CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT) > 5000000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // vector column family (plugins/functions/vector.c) over embeddings
  def vectorFns(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).as("vsize"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("first_el"),
        round(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("l2sq"))
      .orderBy("vec_id")

  val vectorFnsSql: String =
    """SELECT vec_id, len(embedding) AS vsize,
      |  round(CAST(embedding[1] AS DOUBLE), 4) AS first_el,
      |  round(list_reduce(list_prepend(0.0, list_transform(embedding,
      |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b), 4) AS l2sq
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** groonga cast rules (grn_caster_cast, lib/cast.cpp) over deterministic
    * edge-case strings: text→bool is non-empty (so "false" is TRUE),
    * text→int parses whole-string integer else whole-string number
    * truncated toward zero else invalid, narrowing wraps two's-complement
    * (static_cast), and the load path substitutes the default on invalid. */
  def castRules(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Casts
    val s = t(spark, dir, "documents").where(col("doc_id") < 400)
      .select(col("doc_id"),
        when(col("doc_id") % 8 === 0, (col("doc_id") * 37).cast("string"))
          .when(col("doc_id") % 8 === 1, concat(lit("-"), col("doc_id").cast("string")))
          .when(col("doc_id") % 8 === 2, concat(col("doc_id").cast("string"), lit(".5")))
          .when(col("doc_id") % 8 === 3, lit("12abc"))
          .when(col("doc_id") % 8 === 4, lit(""))
          .when(col("doc_id") % 8 === 5, lit("false"))
          .when(col("doc_id") % 8 === 6, lit("1e3"))
          .otherwise(lit(" 7")).as("s"))
    s.select(col("doc_id"), col("s"),
        Casts.textToLong(col("s")).as("to_i64"),
        Casts.loose(Casts.textToLong(col("s"))).as("to_i64_loose"),
        Casts.textToInt(col("s"), 8).as("to_i8"),
        Casts.textToBool(col("s")).as("to_bool"),
        Casts.narrowToInt(col("doc_id") * 97, 8).as("narrow_i8"),
        Casts.boolToText(col("doc_id") % 2 === 0).as("bool_txt"))
      .orderBy("doc_id")
  }

  val castRulesSql: String =
    """WITH src AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 8 AS INT)
      |      WHEN 0 THEN CAST(doc_id * 37 AS VARCHAR)
      |      WHEN 1 THEN '-' || CAST(doc_id AS VARCHAR)
      |      WHEN 2 THEN CAST(doc_id AS VARCHAR) || '.5'
      |      WHEN 3 THEN '12abc'
      |      WHEN 4 THEN ''
      |      WHEN 5 THEN 'false'
      |      WHEN 6 THEN '1e3'
      |      ELSE ' 7' END AS s
      |  FROM documents WHERE doc_id < 400),
      |casted AS (
      |  SELECT doc_id, s,
      |    CASE WHEN regexp_matches(s, '^-?[0-9]+$') THEN TRY_CAST(s AS BIGINT)
      |         WHEN regexp_matches(s, '^-?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$')
      |           THEN TRY_CAST(trunc(TRY_CAST(s AS DOUBLE)) AS BIGINT)
      |         ELSE NULL END AS to_i64
      |  FROM src)
      |SELECT doc_id, s, to_i64,
      |  COALESCE(to_i64, 0) AS to_i64_loose,
      |  CASE WHEN to_i64 IS NULL THEN NULL
      |       WHEN ((to_i64 % 256) + 256) % 256 >= 128
      |         THEN ((to_i64 % 256) + 256) % 256 - 256
      |       ELSE ((to_i64 % 256) + 256) % 256 END AS to_i8,
      |  length(s) > 0 AS to_bool,
      |  CASE WHEN ((doc_id * 97 % 256) + 256) % 256 >= 128
      |       THEN ((doc_id * 97 % 256) + 256) % 256 - 256
      |       ELSE ((doc_id * 97 % 256) + 256) % 256 END AS narrow_i8,
      |  CASE WHEN doc_id % 2 = 0 THEN 'true' ELSE 'false' END AS bool_txt
      |FROM casted ORDER BY doc_id""".stripMargin

  /** index-order sort fast path: ascending _id + limit served from the
    * segment storage order (grn_table_sort_index) — only the covering
    * segment prefix is scanned. dl comes from the index's doc stats, so
    * the oracle recomputes it from a fresh tokenization. */
  def sortIndexOrder(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsIndex(spark, dir).idOrderScan(25)
      .select(col("doc_id"), col("dl").cast("long").as("dl"))

  val sortIndexOrderSql: String =
    """WITH tl AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
      |    x -> x <> '') AS toks
      |  FROM documents)
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tl
      |ORDER BY doc_id LIMIT 25""".stripMargin

  /** pluggable sorter proc (lib/sorter.c:72-199): an arbitrary script
    * expression as the sort key — compiled by ScriptParser to a native
    * Column, descending, doc_id tiebreak (grn sort-key "-proc(...), +_id"). */
  def sorterProc(spark: SparkSession, dir: String): DataFrame = {
    val key = graft.query.ScriptParser.compile("n_chars % 97 + doc_id % 3")
    t(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"), key.cast("long").as("skey"))
      .orderBy(col("skey").desc, col("doc_id").asc)
      .limit(30)
  }

  val sorterProcSql: String =
    """SELECT doc_id, n_chars,
      |  CAST(n_chars % 97 + doc_id % 3 AS BIGINT) AS skey
      |FROM documents ORDER BY skey DESC, doc_id LIMIT 30""".stripMargin

  /** native set operators over id sets (SURVEY §2.8: union/intersect/except
    * exposed as table operators, not just result-set fold) */
  def setopsNative(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val a = d.where(col("lang") === "en").select("doc_id")
    val b = d.where(col("n_chars") > 400).select("doc_id")
    a.intersect(b).withColumn("op", lit("intersect"))
      .union(a.except(b).withColumn("op", lit("except")))
      .union(a.union(b).distinct().withColumn("op", lit("union")))
      .orderBy("op", "doc_id")
  }

  val setopsNativeSql: String =
    """WITH a AS (SELECT doc_id FROM documents WHERE lang = 'en'),
      |b AS (SELECT doc_id FROM documents WHERE n_chars > 400)
      |SELECT doc_id, 'intersect' AS op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
      |UNION ALL
      |SELECT doc_id, 'except' AS op FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
      |UNION ALL
      |SELECT doc_id, 'union' AS op FROM (SELECT * FROM a UNION SELECT * FROM b)
      |ORDER BY op, doc_id""".stripMargin

  /** co-located join via native bucketing (sources.BucketedTables): both
    * sides written bucketed+sorted on doc_id, joined with zero Exchange
    * (ExplainCheck rule 9 asserts the shuffle-free plan); the oracle
    * replays the equivalent plain join. */
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.BucketedTables
    val d = t(spark, dir, "documents")
    val base = java.nio.file.Files.createTempDirectory("graft-bkjoin").toString
    BucketedTables.writeBucketed(d.select("doc_id", "lang", "n_chars"),
      "graft_bk_meta", 8, "doc_id", s"$base/meta")
    BucketedTables.writeBucketed(
      d.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks")),
      "graft_bk_toks", 8, "doc_id", s"$base/toks")
    BucketedTables.colocatedJoin(spark, "graft_bk_meta", "graft_bk_toks", "doc_id")
      .orderBy("doc_id")
  }

  val bucketedJoinSql: String =
    """SELECT doc_id, lang, n_chars,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |FROM documents ORDER BY doc_id""".stripMargin

  /** remaining vector_* procs (plugins/functions/vector.c: vector_slice,
    * vector_new, vector_find, vector_join; vector_size is in vector_fns) */
  def vectorOps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").where(col("doc_id") < 300)
      .select(col("doc_id"),
        array(col("lang"), col("source")).as("arr"))
      .select(col("doc_id"),
        slice(col("arr"), 1, 1).getItem(0).as("sliced"),
        array(lit("a"), lit("b")).getItem(1).as("newed"),
        when(array_contains(col("arr"), "en"), lit("en")).as("found"),
        concat_ws("-", col("arr")).as("joined"))
      .orderBy("doc_id")

  val vectorOpsSql: String =
    """SELECT doc_id,
      |  [lang, source][1] AS sliced,
      |  ['a', 'b'][2] AS newed,
      |  CASE WHEN list_contains([lang, source], 'en') THEN 'en' END AS found,
      |  array_to_string([lang, source], '-') AS joined
      |FROM documents WHERE doc_id < 300 ORDER BY doc_id""".stripMargin

  /** time_classify_* procs (plugins/functions/time.c): truncation to
    * minute/hour/day/week/month/year + day_of_week (0 = Sunday, tm_wday
    * numbering — Spark's dayofweek is 1 = Sunday, hence the -1) */
  def timeClassify(spark: SparkSession, dir: String): DataFrame = {
    val ts = col("ts").cast("timestamp")
    t(spark, dir, "events").where(col("event_id") < 500)
      .select(col("event_id"),
        date_trunc("minute", ts).cast("long").as("c_minute"),
        date_trunc("hour", ts).cast("long").as("c_hour"),
        date_trunc("day", ts).cast("long").as("c_day"),
        date_trunc("week", ts).cast("long").as("c_week"),
        date_trunc("month", ts).cast("long").as("c_month"),
        date_trunc("year", ts).cast("long").as("c_year"),
        (dayofweek(ts) - 1).cast("long").as("c_dow"))
      .orderBy("event_id")
  }

  val timeClassifySql: String =
    """SELECT event_id,
      |  CAST(floor(epoch(date_trunc('minute', ts))) AS BIGINT) AS c_minute,
      |  CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS c_hour,
      |  CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS c_day,
      |  CAST(floor(epoch(date_trunc('week', ts))) AS BIGINT) AS c_week,
      |  CAST(floor(epoch(date_trunc('month', ts))) AS BIGINT) AS c_month,
      |  CAST(floor(epoch(date_trunc('year', ts))) AS BIGINT) AS c_year,
      |  CAST(dayofweek(ts) AS BIGINT) AS c_dow
      |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin

  /** columns[NAME] at stage=initial (proc_select.cpp:3448-3546 stage
    * ordering): the dynamic column is computed BEFORE --filter runs, so
    * the filter itself, a window over it, and the output all consume it —
    * distinct from dynamic_column's stage=filtered + post_filter path. */
  def dynamicColumnInitial(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withInitial = t(spark, dir, "orders")
      .withColumn("bucketed", (col("o_totalprice") / 50000.0).cast("long"))
    withInitial
      .where(col("bucketed").between(2, 4)) // --filter consumes the initial column
      .withColumn("rank_in_bucket", row_number().over(
        Window.partitionBy(col("bucketed"))
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))))
      .where(col("rank_in_bucket") <= 3)
      .select(col("o_orderkey"), col("bucketed"), col("rank_in_bucket"))
      .orderBy("bucketed", "rank_in_bucket")
  }

  val dynamicColumnInitialSql: String =
    """WITH init AS (
      |  SELECT o_orderkey, o_totalprice,
      |    CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucketed
      |  FROM orders),
      |filtered AS (SELECT * FROM init WHERE bucketed BETWEEN 2 AND 4),
      |ranked AS (
      |  SELECT o_orderkey, bucketed,
      |    row_number() OVER (PARTITION BY bucketed
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_bucket
      |  FROM filtered)
      |SELECT o_orderkey, bucketed, rank_in_bucket FROM ranked
      |WHERE rank_in_bucket <= 3 ORDER BY bucketed, rank_in_bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cast_rules" -> castRules,
    "vector_ops" -> vectorOps,
    "time_classify" -> timeClassify,
    "dynamic_column_initial" -> dynamicColumnInitial,
    "sort_index_order" -> sortIndexOrder,
    "sorter_proc" -> sorterProc,
    "setops_native" -> setopsNative,
    "bucketed_join" -> bucketedJoin,
    "q1_agg" -> q1Agg,
    "agg_sd" -> aggSd,
    "drilldown_nested" -> drilldownNested,
    "drilldown_ref" -> drilldownRef,
    "sort_topk" -> sortTopK,
    "window_fns" -> windowFns,
    "setop_and_not" -> setopAndNot,
    "sub_filter" -> subFilter,
    "in_values" -> inValues,
    "between_range" -> betweenRange,
    "string_fns" -> stringFns,
    "time_fns" -> timeFns,
    "math_fns" -> mathFns,
    "edit_distance" -> editDistance,
    "slices" -> slices,
    "dynamic_column" -> dynamicColumn,
    "vector_fns" -> vectorFns)

  val oracles: Map[String, String] = Map(
    "cast_rules" -> castRulesSql,
    "vector_ops" -> vectorOpsSql,
    "time_classify" -> timeClassifySql,
    "dynamic_column_initial" -> dynamicColumnInitialSql,
    "sort_index_order" -> sortIndexOrderSql,
    "sorter_proc" -> sorterProcSql,
    "setops_native" -> setopsNativeSql,
    "bucketed_join" -> bucketedJoinSql,
    "q1_agg" -> q1AggSql,
    "agg_sd" -> aggSdSql,
    "drilldown_nested" -> drilldownNestedSql,
    "drilldown_ref" -> drilldownRefSql,
    "sort_topk" -> sortTopKSql,
    "window_fns" -> windowFnsSql,
    "setop_and_not" -> setopAndNotSql,
    "sub_filter" -> subFilterSql,
    "in_values" -> inValuesSql,
    "between_range" -> betweenRangeSql,
    "string_fns" -> stringFnsSql,
    "time_fns" -> timeFnsSql,
    "math_fns" -> mathFnsSql,
    "edit_distance" -> editDistanceSql,
    "slices" -> slicesSql,
    "dynamic_column" -> dynamicColumnSql,
    "vector_fns" -> vectorFnsSql)
}
