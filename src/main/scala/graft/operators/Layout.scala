package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * At 100 TB the dominant cost of a selective query is deciding which
  * files NOT to read. Parquet footers carry per-file min/max column
  * stats, but a layout sorted by ONE column makes that pruning perfect
  * on it and useless on every other dimension. Interleaving the bits of
  * two bucketized dimensions into a single sort key gives every output
  * file a narrow value range in BOTH dimensions at once — the layout
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`, reimplemented
  * here as plain declarative Spark (a stats aggregate, a codegen'd
  * bit-interleave projection, one range shuffle).
  *
  * Scale shape: the bounds pass is a min/max aggregate (columnar-stat
  * cheap, one row out, broadcast back); the bucket + interleave step is
  * a narrow whole-stage-codegen projection; the only shuffle is the
  * final `repartitionByRange` on the z key — which any layout rewrite
  * needs, and which AQE balances because the z histogram is sampled,
  * not assumed uniform.
  */
object Layout {

  /** Morton interleave of two bucket ids (each in `[0, 2^bits)`): bits
    * of `zx` occupy even output positions, bits of `zy` odd ones, so
    * z-adjacent rows are close in BOTH source dimensions. Pure integer
    * bit arithmetic — stays inside whole-stage codegen. */
  def mortonInterleave(zx: Column, zy: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(zx, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(zy, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduce(_ + _)

  /** Bucket `x` into `[0, 2^bits)` over `[lo, hi]`, clamped at both
    * ends (x == hi lands in the top bucket; a degenerate lo == hi
    * column collapses to bucket 0). */
  private def bucket(x: Column, lo: Column, hi: Column, bits: Int): Column = {
    val nb = 1 << bits
    when(hi <= lo, lit(0)).otherwise(
      least(greatest(floor((x - lo) * nb / (hi - lo)).cast("int"), lit(0)),
        lit(nb - 1)))
  }

  /** Z-order `df` by `(xCol, yCol)`: bucket both dimensions over their
    * own min/max (one exact stats aggregate — NOT a sampled sketch, so
    * the assignment is deterministic and replayable), Morton-interleave
    * the bucket ids into `zorder`, then range-partition + sort within
    * partitions so every output partition (→ file, on write) covers a
    * narrow range of both dimensions. Adds `zx`, `zy`, `zorder`. */
  def zorder(df: DataFrame, xCol: String, yCol: String, bits: Int = 4,
             numPartitions: Int = 0): DataFrame = {
    val bounds = df.agg(
      min(col(xCol)).cast("double").as("_xlo"),
      max(col(xCol)).cast("double").as("_xhi"),
      min(col(yCol)).cast("double").as("_ylo"),
      max(col(yCol)).cast("double").as("_yhi"))
    val z = df.crossJoin(broadcast(bounds))
      .withColumn("zx",
        bucket(col(xCol).cast("double"), col("_xlo"), col("_xhi"), bits))
      .withColumn("zy",
        bucket(col(yCol).cast("double"), col("_ylo"), col("_yhi"), bits))
      .withColumn("zorder", mortonInterleave(col("zx"), col("zy"), bits))
      .drop("_xlo", "_xhi", "_ylo", "_yhi")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    z.repartitionByRange(parts, col("zorder")).sortWithinPartitions("zorder")
  }

  /** Small-file compaction: rewrite a parquet directory into
    * ~`targetFileBytes`-sized files — the lake-maintenance pass that
    * keeps a 100 TB table from drowning its scans in per-file open
    * cost and its driver in listing metadata. The output file count is
    * ceil(input bytes / target), computed from the ACTUAL file listing
    * (metadata-scale work), not guessed.
    *
    * Scale shape: with no `sortCols`, the rewrite is a `coalesce` —
    * merging partitions moves NO data between executors (no shuffle;
    * each output task reads a set of input files and streams them
    * out); file sizes then mirror the merged inputs, which is the
    * right trade for pure compaction. With `sortCols`, the rewrite is
    * a range-partition + in-partition sort (one shuffle) so the
    * compacted files also carry narrow min/max stats on the sort key —
    * compaction and re-clustering in a single pass ([[zorder]] is the
    * 2-D version). Returns a 1-row summary (files/bytes before,
    * files target). */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     inDir: String, outDir: String,
                     targetFileBytes: Long = 128L << 20,
                     sortCols: Seq[String] = Nil): DataFrame = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(inDir)
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.coalesce(nOut)
    out.write.mode("overwrite").parquet(outDir)
    import spark.implicits._
    Seq((files.length.toLong, totalBytes, nOut.toLong))
      .toDF("files_before", "bytes_before", "files_target")
  }
}
