package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** c79_substring_trim A/B (round-11, carried advice item): the detect
  * step joins the corpus-sized window relation (which carries the
  * 30-char window STRINGS) against the dup-hash relation on `_h` — if
  * that join sort-merges, the whole string-bearing relation shuffles
  * once for the join and AGAIN for the (hash, string) verify window.
  *
  * Variant B replaces the equi-join prefilter with a BLOOM prefilter
  * over the dup hashes (the c93/decontaminateBloom machinery): the
  * corpus side probes a bloom map-side and only survivors reach the
  * verify shuffle. Value-identical BY THE SAME ARGUMENT that makes the
  * hash prefilter sound: exactness comes from the downstream
  * `count over (_h, _win) > 1` STRING-level check, which kills bloom
  * false positives exactly like hash collisions. The dup-hash relation
  * is cached (8-byte rows) for its count + bloom-build double pass.
  *
  * Usage: `sbt "runMain graft.tools.ProbeC79 [sfDir]"`; rep1 is
  * warmup, best-of-2 after. Results → PLANS.md round 11.
  */
object ProbeC79 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-c79")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")

    def time(label: String)(f: => DataFrame): Unit = {
      var best = Double.MaxValue
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i > 1) best = math.min(best, dt)
        println(f"[probe-c79] $label rep$i: $dt%.2f s")
      }
      println(f"[probe-c79] $label best: $best%.2f s")
    }

    time("A substringTrim (status quo: dup-hash equi-join prefilter)")(
      graft.operators.Dedup.substringTrim(docs, "doc_id", "text", 30))
    time("B substringTrim (bloom prefilter, corpus side never joins)")(
      bloomTrim(docs, "doc_id", "text", 30))

    val a = graft.operators.Dedup.substringTrim(docs, "doc_id", "text", 30)
    val b = bloomTrim(docs, "doc_id", "text", 30)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"[probe-c79] A vs B diff rows: $diff (must be 0)")
    spark.stop()
  }

  // ----- variant B: substringTrim with a bloom prefilter ------------
  // (copies the private charWindows/spanStats pipeline from Dedup —
  // probe-local by design; adopted into Dedup only on a measured win)

  private def charWindows(df: DataFrame, idCol: String, textCol: String,
                          windowChars: Int): DataFrame =
    df.select(col(idCol), length(col(textCol)).as("_nc"),
        posexplode(graft.functions.ChunkFunctions.char_ngrams(
          col(textCol), windowChars, lowercase = false)))
      .select(col(idCol), col("_nc"), (col("pos") + 1).as("_pos"),
        xxhash64(col("col")).as("_h"), col("col").as("_win"))

  private def spanStats(marked: DataFrame, idCol: String,
                        windowChars: Int): DataFrame = {
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_pos"))
    val run = byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = marked
      .withColumn("_brk",
        when(col("_pos") - lag(col("_pos"), 1).over(byDoc) <= windowChars, lit(0))
          .otherwise(lit(1)))
      .withColumn("_island", sum(col("_brk")).over(run))
    islands.groupBy(col(idCol), col("_island"))
      .agg(min(col("_pos")).as("_p0"), max(col("_pos")).as("_p1"),
        count(lit(1)).as("_nw"), first(col("_nc")).as("_ncs"))
      .withColumn("_chars",
        least(col("_p1") + windowChars - 1, col("_ncs")) - col("_p0") + 1)
  }

  def bloomTrim(df: DataFrame, idCol: String, textCol: String,
                windowChars: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, expression => toExpr}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    val wins = charWindows(df, idCol, textCol, windowChars)
    val dupHashes = wins.groupBy("_h").agg(count(lit(1)).as("_hc"))
      .filter(col("_hc") > 1).select("_h").cache()
    val n = math.max(dupHashes.count(), 1L)
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(n, 0.01)
    val bloomAgg = toCol(new BloomFilterAggregate(
      toExpr(col("_h")), Literal(n), Literal(numBits)).toAggregateExpression())
    val bloomBytes = dupHashes.agg(bloomAgg.as("_bf"))
      .head().getAs[Array[Byte]]("_bf")
    dupHashes.unpersist(blocking = false)
    val mightContain = toCol(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType), toExpr(col("_h"))))
    val byWin = Window.partitionBy("_h", "_win")
    val cut = wins.filter(mightContain)
      .withColumn("_scnt", count(lit(1)).over(byWin))
      .withColumn("_rn", row_number().over(
        byWin.orderBy(col(idCol).asc, col("_pos").asc)))
      .filter(col("_scnt") > 1 && col("_rn") > 1)
      .select(col(idCol), col("_nc"), col("_pos"))
    val spans = spanStats(cut, idCol, windowChars)
      .withColumn("_s", col("_p0"))
      .withColumn("_e", least(col("_p1") + lit(windowChars - 1), col("_ncs")))
    val ranges = spans.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("_s"), col("_e")))).as("_rs"),
        sum(col("_e") - col("_s") + 1).cast("long").as("removed_chars"),
        count(lit(1)).as("n_cut_spans"))
    val t = df.select(col(idCol), col(textCol).as("_txt"),
      length(col(textCol)).as("_len"))
    ranges.join(t, Seq(idCol))
      .withColumn("new_text",
        aggregate(col("_rs"),
          struct(lit(0).as("last"), lit("").as("acc")),
          (acc, r) => struct(
            r.getField("_e").as("last"),
            concat(acc.getField("acc"),
              col("_txt").substr(acc.getField("last") + 1,
                r.getField("_s") - acc.getField("last") - 1)).as("acc")),
          acc => concat(acc.getField("acc"),
            col("_txt").substr(acc.getField("last") + 1,
              col("_len") - acc.getField("last")))))
      .select(col(idCol), col("new_text"), col("removed_chars"),
        col("n_cut_spans"))
  }
}
