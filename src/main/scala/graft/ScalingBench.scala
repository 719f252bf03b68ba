package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.WebCorpus
import graft.index.{GraftIndex, IndexBuilder, IndexConfig}
import graft.query.{MatchMode, ScoreMode}

/** Scaling-efficiency evidence (north rule: >=0.8 from N to 4N executors).
  *
  * Sandbox stand-in for a real cluster: the SAME job on the SAME input at
  * local[N] and local[4N]. Each parallelism level runs in its OWN JVM —
  * restarting a SparkSession inside one JVM degrades the second run by
  * 5-10x (observed), which would corrupt the comparison. Run both levels:
  *
  *   sbt "runMain graft.ScalingBench 200000 8"
  *   sbt "runMain graft.ScalingBench 200000 32"
  *
  * then efficiency = (docs_per_sec@4N / docs_per_sec@N) / 4. Results are
  * recorded in BENCH/BASELINE.md.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val corpusPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp/graft-bench") + s"/corpus-$nDocs"

    // EXECUTORS=k -> local-cluster[k, cpus/k, mem]: k separate executor
    // JVMs, the faithful sandbox analogue of a k-executor cluster (local[n]
    // puts all tasks in one JVM, which serializes on GC/memory bandwidth)
    val master = sys.env.get("SPARK_GRAFT_EXECUTORS") match {
      case Some(k) =>
        val execs = k.toInt
        s"local-cluster[$execs,${cpus / execs},${sys.env.getOrElse("SPARK_GRAFT_EXEC_MB", "6144")}]"
      case None => s"local[$cpus]"
    }
    val builder0 = SparkSession.builder()
      .master(master)
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
    // local-cluster executors run in separate JVMs: ship the app jar
    // (produce with `sbt package`, point SPARK_GRAFT_JAR at it)
    val s0 = sys.env.get("SPARK_GRAFT_JAR") match {
      case Some(jar) => builder0.config("spark.jars", jar)
      case None => builder0
    }
    // executor JVMs need the same GC discipline as the driver: fixed heap
    // (no grow/uncommit page churn), throughput GC, GC threads bounded by
    // the executor's core count — NOT the machine's (4 JVMs x 32 GC threads
    // thrash each other)
    val execMb = sys.env.getOrElse("SPARK_GRAFT_EXEC_MB", "6144").toInt
    val execCores = sys.env.get("SPARK_GRAFT_EXECUTORS")
      .map(k => cpus / k.toInt).getOrElse(cpus)
    val s = s0
      .config("spark.executor.extraJavaOptions",
        s"-XX:+UseParallelGC -XX:ParallelGCThreads=$execCores " +
          s"-XX:InitialRAMPercentage=70.0")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    // materialize the corpus once (fixed 64 input partitions for all levels)
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$corpusPath/_SUCCESS"))) {
      WebCorpus.generate(s, nDocs, partitions = 64)
        .write.mode("overwrite").parquet(corpusPath)
    }

    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/tmp/graft-bench") + s"/scale-idx-$cpus-$nDocs"
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val listener = new graft.index.BuildListener
    s.sparkContext.addSparkListener(listener)
    val docs = s.read.parquet(corpusPath)
    val t0 = System.nanoTime()
    // partition count is a property of the DATA, not the cluster size: fixed
    // at 128 for every level (tasks stay small; fewer cores just run more
    // waves) — exactly how a production job holds partitioning constant
    // while executors scale N -> 4N
    IndexBuilder.build(s, docs, "doc_id", "text", out,
      IndexConfig(numPartitions = 128, nDocsHint = nDocs))
    val buildSec = (System.nanoTime() - t0) / 1e9
    System.err.println(listener.report())

    // query throughput at this parallelism (same 20 top-k queries)
    val idx = GraftIndex(s, out)
    val queries = Seq(Seq("spark", "fulltext"), Seq("inverted", "index"),
      Seq("crawl"), Seq("spark", "crawl", "lin"), Seq("block", "max", "wand"))
    idx.topK(idx.searchTerms(queries.head, MatchMode.Any, ScoreMode.Bm25(), topK = 10), 10).collect()
    // throughput with 4 concurrent clients (Spark schedules jobs in
    // parallel; single-query latency can't use more cores than one job has
    // tasks, concurrency can)
    val qt0 = System.nanoTime()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val futures = (0 until 4).flatMap { _ =>
      queries.map { terms =>
        pool.submit(new Runnable {
          def run(): Unit =
            idx.topK(idx.searchTerms(terms, MatchMode.Any, ScoreMode.Bm25(), topK = 10), 10).collect()
        })
      }
    }
    futures.foreach(_.get())
    pool.shutdown()
    val querySec = (System.nanoTime() - qt0) / 1e9

    // the same 20 queries as ONE batched job (searchTermsBatch): the
    // scan/shuffle cost is shared across the batch — the Spark-native way
    // to spend a cluster on query throughput
    val batch = (0 until 4).flatMap(_ => queries)
    val bt0 = System.nanoTime()
    idx.topKPerQuery(idx.searchTermsBatch(batch, MatchMode.Any,
      ScoreMode.Bm25(), topK = 10), 10).collect()
    val batchSec = (System.nanoTime() - bt0) / 1e9
    println(
      s"""{"metric":"scaling_level","cpus":$cpus,"docs":$nDocs,""" +
      s""""build_secs":$buildSec,"docs_per_sec":${nDocs / buildSec},""" +
      s""""query_secs":$querySec,"qps":${20.0 / querySec},""" +
      s""""batch_query_secs":$batchSec,"batch_qps":${20.0 / batchSec}}""")
    s.stop()
  }
}
