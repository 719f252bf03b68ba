package graft.tools

import graft.analyzer.Analyzers
import graft.corpus.WebCorpus

/** Pure-JVM (no Spark) thread-scaling microbench for the tokenize hot path.
  * Distinguishes GC/allocation contention from Spark overheads.
  * Run: sbt "runMain graft.tools.MicroBench 200000"
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(200000)
    val texts = (0 until math.min(nDocs, 50000))
      .map(i => WebCorpus.text(i.toLong, 42L)._1).toArray
    val reps = nDocs / texts.length

    for (threads <- Seq(1, 8, 32)) {
      // warmup
      texts.take(2000).foreach(Analyzers.bigram.tokenize(_))
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val chunk = texts.length / threads
      val futures = (0 until threads).map { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var total = 0L
            for (_ <- 0 until reps; i <- t * chunk until math.min((t + 1) * chunk, texts.length)) {
              total += Analyzers.bigram.tokenize(texts(i)).length
            }
            if (total == -1) println("impossible")
          }
        })
      }
      futures.foreach(_.get())
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"threads=$threads%2d docs=${texts.length * reps} " +
        f"secs=$sec%.2f docs_per_sec=${texts.length * reps / sec}%.0f")
    }
  }
}
