package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.streaming.Streams

/** Round-8 streaming-state scale probe (VERDICT r7 item 8): replay 10×
  * the events fixture through the watermarked stream-stream joins
  * (s5/s8/s11 shapes) and 10× documents through the bounded s12
  * corpus-dedup, and record what the state store actually held —
  * peak rows, peak bytes, rows evicted — from the progress metrics.
  *
  * The question being answered: is state bounded by the WATERMARK
  * HORIZON (rows in the last N hours of event time), not by stream
  * length? If yes, peak state is flat as the replay grows and the
  * operator survives an unbounded production stream; if state tracked
  * stream LENGTH, peak rows would approach total input rows.
  *
  * Not part of the library surface — a measurement harness whose
  * numbers land in PLANS.md.
  */
object ProbeStreamState {

  private case class Peak(rows: Long, bytes: Long, removed: Long,
                          batches: Int)

  private def runProbe(spark: org.apache.spark.sql.SparkSession,
                       name: String, sdf: DataFrame): Peak = {
    val q = sdf.writeStream.format("noop").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val progress = q.recentProgress.toSeq
    val perBatch = progress.map { p =>
      val ops = p.stateOperators
      (ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum,
        ops.map(_.numRowsRemoved).sum)
    }
    Peak(
      rows = if (perBatch.isEmpty) 0 else perBatch.map(_._1).max,
      bytes = if (perBatch.isEmpty) 0 else perBatch.map(_._2).max,
      removed = perBatch.map(_._3).sum,
      batches = progress.count(_.numInputRows > 0))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val nChunks = 8
    val spark = GraftSession.build("graft-probe-sstate")
    import java.nio.file.Files
    // micro-batch count × per-batch state instances is harness overhead,
    // not the measurement; 8 partitions keeps it realistic but cheap
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    // ---- 10× events, user/event ids disjoint per copy, ts UNCHANGED:
    // the event-time axis keeps its density ×10, the watermark horizon
    // its width — exactly the axis state must stay bounded on
    val ev = Tables.load(spark, sfDir, "events")
      .select("ts", "user_id", "event_id", "event_type", "value")
    val big = (0 until copies).map(i => ev.select(
        col("ts"),
        (col("user_id") + lit(i * 10000000L)).as("user_id"),
        (col("event_id") + lit(i * 1000000000L)).as("event_id"),
        col("event_type"), col("value")))
      .reduce(_ unionByName _)
    val work = Files.createTempDirectory("graft_probe_sstate").toString
    val evTotal = big.count()
    val schema = Streams.writeOrderedReplay(big, "ts", nChunks, s"$work/ev")
    def evStream = Streams.replayStream(spark, s"$work/ev", schema,
      maxFilesPerTrigger = 1)

    println(s"[probe] events total=$evTotal copies=$copies chunks=$nChunks")
    for ((label, mk) <- Seq[(String, DataFrame => DataFrame)](
        ("s5_inner_join", Streams.clickPurchaseJoin),
        ("s8_left_outer_join", Streams.clickPurchaseLeftJoin),
        ("s11_semi_join", Streams.clickPurchaseSemiJoin),
        ("s10_dedup_within_wm",
          _.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark("event_id")))) {
      val peak = runProbe(spark, s"probe_$label", mk(evStream))
      println(f"[probe] $label%-22s peakRows=${peak.rows}%9d " +
        f"peakMB=${peak.bytes / 1e6}%8.1f evicted=${peak.removed}%9d " +
        f"batches=${peak.batches} totalInput=$evTotal")
    }

    // ---- 10× documents through the bounded s12 shape, both TTL regimes
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars", "text")
    // per-copy timeline stride measured from the fixture, NOT assumed:
    // a hard-coded stride smaller than the doc_id range would make copy
    // timelines overlap, regress event time at every copy boundary, and
    // silently drop rows as late under the short-watermark regime
    val perCopy = docs.agg(max("doc_id")).head.getLong(0) + 1
    val docsBig = (0 until copies).map(i => docs.select(
        (col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("source"),
        col("n_chars"),
        // texts distinct per copy: every doc is NOVEL, the worst case
        // for dedup state growth
        concat(col("text"), lit(s"#c$i")).as("text"),
        // CONTIGUOUS ingest timeline across copies (1 s per doc):
        // deriving ts from the 1e7-offset doc_id would open ~115-day
        // gaps between copies, evicting even the "resident" regime's
        // state at every copy boundary and making the two regimes
        // measure the same thing
        lit(i.toLong).as("_copy"), col("doc_id").as("_orig")))
      .reduce(_ unionByName _)
      .withColumn("ingest_ts",
        timestamp_millis(lit(1700000000000L) +
          (col("_copy") * perCopy + col("_orig")) * 1000L))
      .drop("_copy", "_orig")
    val docTotal = docsBig.count()
    val dSchema = Streams.writeOrderedReplay(docsBig, "doc_id", nChunks,
      s"$work/docs")
    def docStream = Streams.replayStream(spark, s"$work/docs", dSchema,
      maxFilesPerTrigger = 1)
    val emptyCorpus = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_h",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_seen_text",
          org.apache.spark.sql.types.StringType))))
    for ((label, delay, ttlMs) <- Seq(
        ("s12_resident_ttl", "48 hours", 7L * 24 * 3600 * 1000),
        ("s12_short_ttl", "1 second", 600L * 1000))) {
      val peak = runProbe(spark, s"probe_$label",
        Streams.corpusIncrementalDedup(spark, docStream, emptyCorpus,
          watermarkDelay = delay, stateTtlMs = ttlMs))
      println(f"[probe] $label%-22s peakRows=${peak.rows}%9d " +
        f"peakMB=${peak.bytes / 1e6}%8.1f evicted=${peak.removed}%9d " +
        f"batches=${peak.batches} totalInput=$docTotal")
    }

    Tables.deleteRecursively(work)
    spark.stop()
  }
}
