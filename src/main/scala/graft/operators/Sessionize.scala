package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands): consecutive events of the
  * same key within `gapSeconds` of each other belong to one session —
  * the batch counterpart of Structured Streaming's `session_window`
  * (graft.streaming.Streams.sessionCounts), for backfills and
  * reprocessing over historical data.
  *
  * One shuffle on the key (both windows share the same partitioning, so
  * Catalyst plans a single exchange + sort); session numbering is a
  * running sum over the new-session flag.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key, in time order) to every row. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    df
      .withColumn("_prev", lag(col(tsCol), 1).over(w))
      // compare at MICROsecond precision: cast("long") floors to whole
      // seconds, so a true gap of 1799.9 s could read as 1800 and split
      // a session the streaming session_window (and any sub-second-aware
      // oracle) would merge
      .withColumn("_new", when(col("_prev").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("_prev")) >= gapSeconds * 1000000L, 1)
        .otherwise(0))
      .withColumn("session_seq", sum(col("_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_prev", "_new")
  }

  /** Per-session aggregates: start, end, event count. */
  def sessionStats(df: DataFrame, keyCol: String, tsCol: String,
                   gapSeconds: Long): DataFrame =
    sessionize(df, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(min(col(tsCol)).as("session_start"),
           max(col(tsCol)).as("last_ts"),
           count(lit(1)).as("n_events"))
}
