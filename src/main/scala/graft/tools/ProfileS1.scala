package graft.tools

import graft.GraftSession
import graft.streaming.Streams

/** One-off profiling harness for the s1 streaming-bench anomaly
  * (VERDICT r5 item 7): runs the tumbling-count streaming query at
  * several harness partition counts, printing wall time and the
  * per-batch durationMs breakdown from StreamingQueryProgress. Not part
  * of the library surface.
  */
object ProfileS1 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-profile-s1")
    val reps = if (args.nonEmpty) args(0).toInt else 2
    for (parts <- Seq("4", "8", "32"); rep <- 1 to reps) {
      spark.conf.set("graft.streaming.harnessPartitions", parts)
      spark.catalog.dropTempView("s1_profile")
      val t0 = System.nanoTime()
      val q = graft.streaming.Streams.runToCompletion(spark,
        Streams.tumblingCounts(Streams.eventStream(spark, sfDir)), "s1_profile")
      val n = q.count()
      val el = (System.nanoTime() - t0) / 1e9
      println(f"[profile-s1] partitions=$parts rep=$rep wall=$el%.2f s rows=$n")
    }
    // one instrumented run: keep the StreamingQuery handle to read progress
    spark.conf.set("graft.streaming.harnessPartitions", "4")
    spark.catalog.dropTempView("s1_last")
    val sq = Streams.tumblingCounts(Streams.eventStream(spark, sfDir))
      .writeStream.format("memory").queryName("s1_last").outputMode("complete").start()
    sq.processAllAvailable()
    sq.recentProgress.foreach(p => println(s"[progress] ${p.json}"))
    sq.stop()
    spark.stop()
  }
}
