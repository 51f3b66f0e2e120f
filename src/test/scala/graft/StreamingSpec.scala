package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streams

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling counts equal the batch-window equivalent") {
    val streamed = Streams.runToCompletion(spark,
      Streams.tumblingCounts(Streams.eventStream(spark, dir)), "t_tumble")
      .orderBy("window_start", "event_type").collect()
    val batch = Tables.load(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      .orderBy("window_start", "event_type").collect()
    assert(streamed.sameElements(batch))
  }

  test("streaming session windows match batch gaps-and-islands") {
    val streamed = Streams.runToCompletion(spark,
      Streams.sessionCounts(Streams.eventStream(spark, dir)), "t_session")
      .orderBy("user_id", "session_start").collect()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    val batch = Tables.load(spark, dir, "events")
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s", when(col("prev").isNull ||
        col("ts").cast("long") - col("prev").cast("long") >= 1800, 1).otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"),
           max(col("ts")).as("last_ts"))
      .select("session_start", "user_id", "n_events", "last_ts")
      .orderBy("user_id", "session_start").collect()
    assert(streamed.sameElements(batch))
  }
}
