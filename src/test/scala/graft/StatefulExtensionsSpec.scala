package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.streaming.{Stateful, Streams}
import graft.operators.Skew

class StatefulExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("stateful running totals match the batch window equivalent") {
    val streamed = Stateful.runToCompletion(spark, dir, "t_stateful")
      .orderBy("user_id", "event_id").collect()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("n_events", count(lit(1)).over(w))
      .withColumn("total_value", sum(col("value")).over(w))
      .select("user_id", "event_id", "n_events", "total_value")
      .orderBy("user_id", "event_id").collect()
    assert(streamed.length == batch.length)
    // doubles: running sums accumulate in the same per-user event order
    streamed.zip(batch).foreach { case (s, b) => assert(s == b, s"$s != $b") }
  }

  test("foreachBatch sink writes windowed output per micro-batch") {
    val out = Files.createTempDirectory("graft_febatch").toString
    Stateful.writeViaForeachBatch(spark, Streams.eventStream(spark, dir), out)
    val batches = new java.io.File(out).listFiles().filter(_.getName.startsWith("batch_"))
    assert(batches.nonEmpty)
    // the final micro-batch may be empty (watermark commit) — sum all
    val n = batches.map(b => spark.read.parquet(b.getPath).count()).sum
    assert(n > 0)
  }

  test("SQL functions registered into the session registry") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
      "fingerprint64('abc') AS f, " +
      "size(word_shingles('a b c d', 3)) AS s").collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == ("abc".getBytes.foldLeft(0L)((h, b) => h * 31 + (b & 0xff))))
    assert(r.getInt(2) == 2) // "a b c", "b c d"
    val r2 = spark.sql(
      "SELECT word_chunks('A b c d', 2, 2, true, false) AS w, " +
      "char_ngrams('Höi', 2, true) AS c").collect().head
    assert(r2.getSeq[String](0) == Seq("a b", "c d"))
    assert(r2.getSeq[String](1) == Seq("hö", "öi")) // code points, not bytes
    val r3 = spark.sql(
      "SELECT max_abs(array(1.0d, -3.0d, 2.0d)) AS m, " +
      "quantize_int8(array(0.0d, -3.0d, 1.5d), 2.0d) AS q, " +
      // codes [0,1], ksub=2 → lut[0*2+0] + lut[1*2+1] = 10 + 40
      "adc_score(array(0, 1), array(10.0d, 20.0d, 30.0d, 40.0d), 2) AS a")
      .collect().head
    assert(r3.getDouble(0) == 3.0)
    assert(r3.getSeq[Int](1) == Seq(0, -6, 3)) // round(x * scaleFactor)
    assert(r3.getDouble(2) == 50.0)
  }

  test("saltedJoin equals the plain join") {
    import spark.implicits._
    val large = (1 to 1000).map(i => (i.toLong, i % 3, s"row$i")).toDF("id", "k", "payload")
    val small = Seq((0, "zero"), (1, "one"), (2, "two")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("id", "name")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val salted = Skew.saltedJoin(large, small, "k", "id", saltFactor = 8)
      .select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(plain.sameElements(salted))
  }

  test("Skew.profile: hand-computed shares and skew factors, top-N plan shape") {
    import spark.implicits._
    // key A ×6, B ×3, C ×1 → total 10, 3 keys, mean load 10/3
    val df = (Seq.fill(6)("A") ++ Seq.fill(3)("B") ++ Seq("C")).toDF("k")
    val top2 = Skew.profile(df, "k", topN = 2)
    val rows = top2.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      ("A", 6L, 0.6, 1.8),   // 6/10, 6/(10/3)
      ("B", 3L, 0.3, 0.9))) // 3/10, 3/(10/3)
    // plan shape: top-N never global-sorts, the 1-row totals broadcast
    // back over the counts instead of re-shuffling them
    top2.collect()
    val p = top2.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"no top-N operator:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"totals not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"counts re-shuffled for totals:\n$p")
  }
}
