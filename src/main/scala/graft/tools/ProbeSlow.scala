package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession
object ProbeSlow {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-probe-slow")
    // PROBE_RECLAIM mimics the bench's storage hygiene (unpersist all +
    // clearCache): "1" = after every measured action, "query" = once
    // after each query's reps (the bench's actual cadence — its
    // unmeasured warmup then absorbs any cache rebuild)
    val reclaim = sys.env.getOrElse("PROBE_RECLAIM", "")
    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      if (reclaim == "1") sweep()
      dt
    }
    for (n <- sys.env.getOrElse("PROBE_QUERIES", "c104_kcore,s2_stream_session,s4_stream_dedup").split(",").toSeq) {
      for (i <- 1 to 3) println(f"[slow] $n rep$i: ${run(n)}%.2f s")
      if (reclaim == "query") sweep()
    }
    spark.stop()
  }
}
