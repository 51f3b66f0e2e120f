package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession
object ProbeSlow {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.build("graft-probe-slow")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (n <- Seq("c104_kcore", "s2_stream_session", "s4_stream_dedup"); i <- 1 to 3)
      println(f"[slow] $n rep$i: ${run(n)}%.2f s")
    spark.stop()
  }
}
