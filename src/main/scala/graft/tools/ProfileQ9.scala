package graft.tools

import graft.{GraftSession, SparkEntry}

/** One-off profiling harness for bench anomalies (VERDICT r5 items 1/7).
  * Runs named queries N times through the noop sink, printing per-rep
  * wall time, GC time, and process-CPU time; a watchdog thread dumps
  * all stacks if a rep exceeds 8 s. Not part of the library surface.
  */
object ProfileQ9 {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 1) args(1).toInt else 5
    val names = (args.headOption.toSeq ++ args.drop(2)).toList match {
      case Nil => List("q9_range_join"); case ns => ns
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-profile")
    SparkEntry.queries("q1_agg")(spark, sfDir).write.format("noop").mode("overwrite").save()

    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    def gcMillis: Long =
      ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def cpuNanos: Long =
      ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean].getProcessCpuTime

    val tmx = ManagementFactory.getThreadMXBean
    def threadCpuSnapshot: Map[Long, Long] =
      tmx.getAllThreadIds.map(id => id -> math.max(0L, tmx.getThreadCpuTime(id))).toMap

    @volatile var dumped = false
    def dumpStacks(tag: String, base: Map[Long, Long]): Unit = {
      println(s"==== STACK DUMP $tag ====")
      val now = threadCpuSnapshot
      val deltas = now.map { case (id, c) => id -> (c - base.getOrElse(id, 0L)) }
      val top = deltas.toSeq.sortBy(-_._2).take(10)
      top.foreach { case (id, d) =>
        val info = tmx.getThreadInfo(id, 12)
        if (info != null) {
          println(f"-- ${info.getThreadName} [${info.getThreadState}] cpu-delta ${d / 1e9}%.1f s")
          info.getStackTrace.take(12).foreach(f => println(s"   at $f"))
        }
      }
      println(s"==== END DUMP $tag ====")
    }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        val g0 = gcMillis; val c0 = cpuNanos
        val base = threadCpuSnapshot
        val t0 = System.nanoTime()
        dumped = false
        val wd = new Thread({ () =>
          try {
            Thread.sleep(8000)
            if (!dumped) { dumped = true; dumpStacks(s"$name rep $i @8s", base) }
          } catch { case _: InterruptedException => () }
        }: Runnable, "watchdog")
        wd.setDaemon(true); wd.start()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        wd.interrupt()
        val el = (System.nanoTime() - t0) / 1e9
        println(f"$name rep $i: $el%.3f s (gc ${(gcMillis - g0) / 1000.0}%.1f s, cpu ${(cpuNanos - c0) / 1e9}%.1f s)")
      }
    }
    spark.stop()
  }
}
