package graft.tools

import graft.{GraftSession, SparkEntry}

object ProbeQ111 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("graft-probe-q111")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q111_percentile_disc")(spark, "/root/testdata/sf0.1")
        .write.format("noop").mode("overwrite").save()
      println(f"[q111] rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
