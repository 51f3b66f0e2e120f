package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.operators.TextAnalysis

/** c111_code_switch profile + scorer A/B (round 12, verdict Next #3):
  * c111 is per-SEGMENT language ID — corpus chars explode into 10-word
  * segments and every segment pays 5 alternation-regex scans (one per
  * language profile). The r11 replications put it at 4.5-8.4 s, the
  * slowest un-audited batch query. This probe attributes the cost
  * (explode alone vs explode+scoring vs full query) and A/Bs the
  * scorer: A = `size(regexp_extract_all(lower(text), quoted
  * alternation))` (status quo), B = the round-12
  * [[graft.functions.LiteralScanCount]] codegen expression (ordered
  * first-match byte scan — value-identical by the semantics argument
  * in its Scaladoc, asserted here on the full corpus).
  *
  * `sbt "runMain graft.tools.ProbeCodeSwitch [sfDir]"`; numbers go to
  * PLANS.md round 12.
  */
object ProbeCodeSwitch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-codeswitch")

    def segs: DataFrame = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.ChunkFunctions.word_chunks(
          col("text"), 10, 10,
          lowercase = false, fullOnly = false)).as(Seq("_idx", "_seg")))

    def time(label: String)(f: => DataFrame): Unit = {
      var best = Double.MaxValue
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i > 1) best = math.min(best, dt)
        println(f"[probe-c111] $label rep$i: $dt%.2f s")
      }
      println(f"[probe-c111] $label best: $best%.2f s")
    }

    // scorer variants over an exploded segment relation: keep the
    // majority/ratio aggregation OUT so the arms isolate scoring cost
    def scoredA(d: DataFrame): DataFrame = {
      val text = lower(col("_seg"))
      def score(lang: String): Column = {
        val alternation = TextAnalysis.trigramProfiles(lang)
          .map(java.util.regex.Pattern.quote).mkString("|")
        size(regexp_extract_all(text, lit(alternation), lit(0))).cast("int")
      }
      val langs = TextAnalysis.trigramProfiles.keys.toSeq.sorted
      d.select((col("doc_id") +:
        langs.map(l => score(l).as(s"score_$l"))): _*)
    }
    def scoredB(d: DataFrame): DataFrame = {
      val text = lower(col("_seg"))
      val langs = TextAnalysis.trigramProfiles.keys.toSeq.sorted
      d.select((col("doc_id") +: langs.map(l =>
        graft.functions.TextFunctions
          .literal_scan_count(text, TextAnalysis.trigramProfiles(l))
          .as(s"score_$l"))): _*)
    }

    val nSegs = segs.count()
    val nDistinct = segs.select("_seg").distinct().count()
    println(s"[probe-c111] segments=$nSegs distinct=$nDistinct " +
      f"(dedup ratio ${nDistinct.toDouble / nSegs}%.3f)")

    time("explode only")(segs)
    time("A explode+score (regex alternation)")(scoredA(segs))
    time("B explode+score (literal scan)")(scoredB(segs))

    // value identity on the complete scored relation — every per-lang
    // score for every segment occurrence, not just the argmax
    val diff = scoredA(segs).exceptAll(scoredB(segs)).count() +
      scoredB(segs).exceptAll(scoredA(segs)).count()
    println(s"[probe-c111] A vs B scored diff rows: $diff (must be 0)")

    time("full c111 (status quo)")(
      graft.SparkEntry.queries("c111_code_switch")(spark, sfDir))
    spark.stop()
  }
}
