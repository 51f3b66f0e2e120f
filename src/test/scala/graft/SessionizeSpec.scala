package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sessionize
import graft.streaming.Streams

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("batch sessionize equals streaming session_window on bounded input") {
    val batch = Sessionize.sessionStats(
        Tables.load(spark, dir, "events"), "user_id", "ts", gapSeconds = 1800)
      .select("user_id", "session_start", "n_events", "last_ts")
      .orderBy("user_id", "session_start").collect()
    val streamed = Streams.runToCompletion(spark,
        Streams.sessionCounts(Streams.eventStream(spark, dir)), "sz_stream")
      .select("user_id", "session_start", "n_events", "last_ts")
      .orderBy("user_id", "session_start").collect()
    assert(batch.sameElements(streamed))
  }

  test("sessionize + stats plan exactly one exchange (windows and groupBy share the key partitioning)") {
    val plan = Sessionize.sessionStats(
        Tables.load(spark, dir, "events"), "user_id", "ts", gapSeconds = 1800)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("session boundaries: gap >= threshold splits, gap < threshold merges") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000)
    val ev = Seq(
      (1L, at(0)), (1L, at(29)),  // gap 29 min < 30 → same session
      (1L, at(59)),               // gap 30 min exactly → NEW session (>= gap)
      (2L, at(0))
    ).toDF("user_id", "ts")
    val out = Sessionize.sessionize(ev, "user_id", "ts", gapSeconds = 1800)
      .select("user_id", "ts", "session_seq")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val u1 = out.filter(_._1 == 1L).sortBy(_._2.getTime).map(_._3)
    assert(u1.toSeq == Seq(1L, 1L, 2L))
    assert(out.filter(_._1 == 2L).head._3 == 1L)
  }
}
