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

  test("sub-second gaps compare at microsecond precision (no floor-second split)") {
    import spark.implicits._
    // true gap 1799.5 s < 1800: floor-second arithmetic would read 1800
    // and split; microsecond comparison must merge
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.7")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00.2"))
    ).toDF("user_id", "ts")
    val seqs = Sessionize.sessionize(ev, "user_id", "ts", gapSeconds = 1800)
      .select("session_seq").collect().map(_.getLong(0)).toSeq
    assert(seqs == Seq(1L, 1L), s"boundary gap must merge, got $seqs")
    // and exactly 1800.0 s still splits (inclusive threshold)
    val ev2 = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00.5")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00.5"))
    ).toDF("user_id", "ts")
    val seqs2 = Sessionize.sessionize(ev2, "user_id", "ts", gapSeconds = 1800)
      .select("session_seq").collect().map(_.getLong(0)).toSeq
    assert(seqs2 == Seq(1L, 2L))
  }

  test("batch sessionize equals streaming session_window at sf0.01 (boundary-adjacent gaps)") {
    val d = "/root/testdata/sf0.01"
    val batch = Sessionize.sessionStats(
        Tables.load(spark, d, "events"), "user_id", "ts", gapSeconds = 1800)
      .select("user_id", "session_start", "n_events", "last_ts")
      .orderBy("user_id", "session_start").collect()
    val streamed = Streams.runToCompletion(spark,
        Streams.sessionCounts(Streams.eventStream(spark, d)), "sz_stream_01")
      .select("user_id", "session_start", "n_events", "last_ts")
      .orderBy("user_id", "session_start").collect()
    assert(batch.sameElements(streamed))
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
