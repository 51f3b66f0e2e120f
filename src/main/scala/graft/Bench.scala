package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per round against
  * SPARK_GRAFT_SF_DIR (sf0.1) and records the JSON line.
  *
  * Each query is fully materialized through the `noop` sink: unlike
  * `count()`, noop cannot be satisfied by metadata or column pruning, so
  * the measured time includes the whole physical plan.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-bench")

    // JVM/codegen warmup on the flagship query (not measured)
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // a failed query records -1 (NOT its partial elapsed time) and lands
    // in "failed" — a broken query must never read as a fast pass
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val failed = results.collect { case (k, v) if v < 0 => k }
    val passed = results.filter(_._2 >= 0)
    // s* queries run the Structured Streaming harness: their time is
    // dominated by micro-batch scheduling + memory-sink latency, not plan
    // cost — reported separately so batch-plan regressions aren't masked
    val isStreaming = (n: String) => n.matches("s\\d+_.*")
    val batchSec = passed.filterNot(kv => isStreaming(kv._1)).map(_._2).sum
    val streamingSec = passed.filter(kv => isStreaming(kv._1)).map(_._2).sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${batchSec + streamingSec},"unit":"sec",""" +
      s""""batch_sec":$batchSec,"streaming_sec":$streamingSec,""" +
      s""""failed":$failedJson,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
