package graft.tools

import graft.{GraftSession, SparkEntry}

/** One-off: run every s* query once per harness-partition setting to
  * pick the count that minimizes TOTAL streaming-suite wall time (the
  * r5 4-partition cut helped the join-heavy queries but hurt s1 — see
  * PLANS.md). Not part of the library surface.
  */
object ProfileStreamSuite {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-profile-ssuite")
    val names = SparkEntry.queries.keys.filter(_.matches("s\\d+_.*")).toSeq.sorted
    // one throwaway pass to absorb streaming-machinery init/JIT
    SparkEntry.queries("s6_stream_static_join")(spark, sfDir).count()
    for (parts <- args.headOption.map(_.split(",").toSeq).getOrElse(Seq("4", "8"))) {
      spark.conf.set("graft.streaming.harnessPartitions", parts)
      var total = 0.0
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val el = (System.nanoTime() - t0) / 1e9
        total += el
        println(f"[ssuite] partitions=$parts $n wall=$el%.2f s")
      }
      println(f"[ssuite] partitions=$parts TOTAL=$total%.2f s")
    }
    spark.stop()
  }
}
