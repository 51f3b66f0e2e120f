package graft.tools

import graft.{GraftSession, SparkEntry}

/** One-off (round 10): audit every stream-static query's per-run wall
  * time AND micro-batch-duration sum, before/after the static-side
  * caching discipline (VERDICT r9 items 1 and 4). A stream-static join
  * re-evaluates the static plan per micro-batch, so static-plan cost ×
  * micro-batch count shows up in batch_sum. Not part of the library
  * surface.
  *
  * Known measurement caveat (accepted for a one-off probe): listener
  * events are delivered asynchronously, so a straggler progress event
  * from the warmup rep can land after `batchDurMs.set(0)`, and the
  * 100 ms sleep may not fully drain the bus before the print — either
  * skews batch_sum by at most one micro-batch's duration. The numbers
  * this probe recorded (PLANS.md round 10) are 2-30× deltas, far
  * outside that noise band; a production-grade version would quiesce
  * the listener bus between reps.
  */
object ProbeStaticSide {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-static")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("s6_stream_static_join", "s12_corpus_dedup",
        "s15_stream_decontam", "s17_stream_drift", "s20_scd2_enrich")
    val batchDurMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          batchDurMs.addAndGet(e.progress.batchDuration)
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      })
    // throwaway pass to absorb streaming-machinery init/JIT
    SparkEntry.queries("s6_stream_static_join")(spark, sfDir).count()
    names.foreach { n =>
      // warmup rep (unmeasured), then the measured rep — Bench's shape
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.streams.resetTerminated()
      batchDurMs.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      println(f"[static-side] $n wall=$wall%.2f s batch_sum=${batchDurMs.get() / 1e3}%.2f s")
    }
    spark.stop()
  }
}
