package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the payload of the most recent
  * right row with `rightTime <= leftTime` within the same key group —
  * the operator Spark's built-ins lack (time-series enrichment,
  * "state as of event time").
  *
  * Implemented with the union + last-non-null-window technique rather
  * than a range join: both sides are tagged and unioned, sorted within
  * each key by (time, side), and each left row picks up the running
  * `last(payload, ignoreNulls)` carried from right rows. This costs ONE
  * shuffle on the key (the window sort) regardless of time-range width —
  * a range-condition join would either broadcast-nested-loop or explode
  * per-bucket; at 100 TB the union-window shape is the only one that
  * holds (it is how production time-series stores implement as-of).
  */
object AsOfJoin {

  /** Backward as-of (the default direction): most recent right row with
    * `rightTime <= leftTime`; among right rows at the same timestamp the
    * LARGEST tie-break wins (the latest-issued record).
    *
    * @param payloadCols right-side columns to carry onto left rows
    *                    (null when no right row precedes the left row)
    * @param rightTieBreak extra right-side column ordering the winner
    *                      among right rows with equal timestamps */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           payloadCols: Seq[String], rightTieBreak: String): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, payloadCols,
      rightTieBreak, forward = false)

  /** Forward as-of: EARLIEST right row with `rightTime >= leftTime`
    * ("the next event after") — same one-shuffle union-window shape,
    * scanning time descending. Among right rows at the same timestamp
    * the SMALLEST tie-break wins (the first-issued record). */
  def asofForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  payloadCols: Seq[String], rightTieBreak: String): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, payloadCols,
      rightTieBreak, forward = true)

  /** Tolerance-bounded as-of (pandas `merge_asof(tolerance=...)`):
    * same match as [[asof]]/[[asofForward]], but a match farther than
    * `tolerance` (an interval literal body, e.g. "1 HOUR") from the
    * left time yields nulls — stale state is worse than no state.
    * Same one-shuffle union-window shape: the matched right TIME rides
    * inside the payload struct, and the tolerance test is a per-row
    * projection after the window — no second join, no extra shuffle. */
  def asofWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTime: String, rightTime: String,
                 payloadCols: Seq[String], rightTieBreak: String,
                 tolerance: String, forward: Boolean = false): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, payloadCols,
      rightTieBreak, forward = forward, tolerance = Some(tolerance))

  /** Nearest as-of (pandas `merge_asof(direction='nearest')`): the right
    * row minimizing |rightTime − leftTime| within the key group; an
    * equally near earlier and later row resolves BACKWARD (the earlier
    * row — state already in force beats state about to be). Among right
    * rows at the matched timestamp the backward tie rule applies on the
    * backward side (largest tie-break) and the forward rule on the
    * forward side (smallest).
    *
    * ONE tagged union, ONE shuffle on the keys: the backward running
    * payload (time ascending) and the forward one (time descending) are
    * two Window passes over the SAME hash partitioning, so Spark reuses
    * the exchange and pays only the second in-partition sort — never a
    * second shuffle, never a range join. */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTime: String, rightTime: String,
                  payloadCols: Seq[String], rightTieBreak: String,
                  tolerance: Option[String] = None): DataFrame = {
    val (unioned, leftCols) =
      taggedUnion(left, right, keys, leftTime, rightTime, payloadCols, rightTieBreak)
    val part = Window.partitionBy(keys.map(col): _*)
    val wB = part
      .orderBy(col("_t").asc_nulls_first, col("_side").asc,
        col("_tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = part
      .orderBy(col("_t").desc_nulls_first, col("_side").asc,
        col("_tie").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = unioned
      .withColumn("_back", last(col("_p"), ignoreNulls = true).over(wB))
      .withColumn("_fwd", last(col("_p"), ignoreNulls = true).over(wF))
      .filter(col("_side") === 1)
    val bRt = col("_back").getField("_rt")
    val fRt = col("_fwd").getField("_rt")
    // gaps compare in the time column's OWN arithmetic (timestamp −
    // timestamp is a comparable interval, long − long a long), keeping
    // the operator time-type-agnostic like the directional variants; a
    // left row at the same instant as a right row yields gap 0 on the
    // backward side, which wins the <= tie as documented
    val bGap = col("_t") - bRt
    val fGap = fRt - col("_t")
    val useBack = bRt.isNotNull && (fRt.isNull || bGap <= fGap)
    val chosen = when(useBack, col("_back")).otherwise(col("_fwd"))
    val within = tolerance.map { tol =>
      val gap = when(useBack, col("_t") - bRt).otherwise(fRt - col("_t"))
      gap <= expr(s"INTERVAL $tol")
    }.getOrElse(lit(true))
    windowed.select(leftCols.map(col) ++
      payloadCols.map(c =>
        when(within, chosen.getField(c)).as(s"asof_$c")): _*)
  }

  /** The tagged union both as-of shapes window over: left rows carry a
    * null payload struct, right rows carry (payload..., rightTime) as
    * `_p` with their tie-break; returns the union plus the original
    * left column list. */
  private def taggedUnion(left: DataFrame, right: DataFrame,
                          keys: Seq[String], leftTime: String,
                          rightTime: String, payloadCols: Seq[String],
                          rightTieBreak: String): (DataFrame, Seq[String]) = {
    val leftCols = left.columns.toSeq
    // The payload travels as ONE struct column: a struct of right-side
    // values is non-null even when every field is null, so
    // last(_p, ignoreNulls) atomically picks the latest right ROW —
    // per-column windows would stitch fields from different right rows
    // whenever payloads contain nulls.
    val structFields = payloadCols.map(c => right.schema(c).copy(name = c)) :+
      right.schema(rightTime).copy(name = "_rt")
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(null).cast("long"))
      .withColumn("_p", lit(null).cast(
        org.apache.spark.sql.types.StructType(structFields)))
    // A right row with an undefined timestamp can never satisfy <= / >=,
    // but if unioned it would sort FIRST (nulls_first) carrying a
    // non-null payload struct — and every matchless left row (and every
    // null-time left row) would inherit it. Drop such rows up front.
    val r = right.filter(col(rightTime).isNotNull).select(
      (keys.map(col) :+ col(rightTime).as("_t") :+ lit(0).as("_side") :+
        col(rightTieBreak).cast("long").as("_tie") :+
        struct(payloadCols.map(col) :+ col(rightTime).as("_rt"): _*).as("_p")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    (l.unionByName(r), leftCols)
  }

  private def asofImpl(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTime: String, rightTime: String,
                       payloadCols: Seq[String], rightTieBreak: String,
                       forward: Boolean,
                       tolerance: Option[String] = None): DataFrame = {
    val (unioned, leftCols) =
      taggedUnion(left, right, keys, leftTime, rightTime, payloadCols, rightTieBreak)
    // right rows (side 0) sort before left rows at equal time → inclusive
    // semantics in both directions; _tie orders concurrent right rows
    // deterministically. Forward scans time DESCENDING, so the running
    // last-non-null payload a left row sees is the smallest rightTime
    // that is still >= leftTime; _tie flips so the smallest tie wins.
    // NULL times sort FIRST in both directions: a row with an undefined
    // timestamp must see no prior payload (null result), not inherit
    // whichever extreme the scan happens to start from.
    val timeOrd = if (forward) col("_t").desc_nulls_first else col("_t").asc_nulls_first
    val tieOrd = if (forward) col("_tie").desc_nulls_last else col("_tie").asc_nulls_last
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("_side").asc, tieOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = unioned
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    // the tolerance gate is a pure projection on the carried right time
    val within = tolerance.map { tol =>
      val gap = if (forward) col("_asof").getField("_rt") - col("_t")
                else col("_t") - col("_asof").getField("_rt")
      gap <= expr(s"INTERVAL $tol")
    }.getOrElse(lit(true))
    windowed.select(leftCols.map(col) ++
      payloadCols.map(c =>
        when(within, col("_asof").getField(c)).as(s"asof_$c")): _*)
  }
}
