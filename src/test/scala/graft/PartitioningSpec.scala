package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Partitioned-directory layout behaviors that carry the 100 TB design:
  * partition pruning (a filtered query must read only matching
  * directories) and dynamic partition overwrite (idempotent per-
  * partition backfill without touching sibling partitions). */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("partition pruning: filter on the partition column prunes the scan") {
    val work = Files.createTempDirectory("graft_part").toString
    Tables.load(spark, dir, "documents")
      .write.partitionBy("lang").mode("overwrite").parquet(s"$work/docs")
    val q = spark.read.parquet(s"$work/docs").filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"no partition filter in scan:\n$scan")
    // only the lang=en directory is read
    val n = q.count()
    val direct = spark.read.parquet(s"$work/docs/lang=en").count()
    assert(n == direct && n > 0)
  }

  test("dynamic partition overwrite replaces only the written partition") {
    val work = Files.createTempDirectory("graft_dpo").toString
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val docs = Tables.load(spark, dir, "documents")
      docs.write.partitionBy("lang").mode("overwrite").parquet(s"$work/docs")
      val before = spark.read.parquet(s"$work/docs")
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // "backfill" the en partition with half its rows
      docs.filter(col("lang") === "en").filter(col("doc_id") % 2 === 0)
        .write.partitionBy("lang").mode("overwrite").parquet(s"$work/docs")
      val after = spark.read.parquet(s"$work/docs")
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(after("en") < before("en"))
      (before.keySet - "en").foreach(l => assert(after(l) == before(l),
        s"sibling partition $l changed: ${before(l)} -> ${after(l)}"))
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }

  test("morton interleave matches the reference bit math on all 4-bit pairs") {
    import spark.implicits._
    def ref(x: Int, y: Int): Int =
      (0 until 4).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum
    val pairs = for (x <- 0 until 16; y <- 0 until 16) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        operators.Layout.mortonInterleave(col("x"), col("y"), 4).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"interleave($x,$y)")
    }
    // the 256 z codes are a bijection of the 16x16 grid
    assert(got.values.toSet.size == 256)
    // hand-pinned: x=5 (0101) even bits, y=3 (0011) odd bits -> 27
    assert(got((5, 3)) == 27)
  }

  test("zorder layout: partition z-ranges are disjoint and sorted within") {
    val z = operators.Layout.zorder(
      Tables.load(spark, dir, "events"), "value", "user_id",
      bits = 4, numPartitions = 8)
    val perPart = z
      .select(spark_partition_id().as("pid"), col("zorder"))
      .groupBy("pid")
      .agg(min("zorder").as("lo"), max("zorder").as("hi"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
      .sortBy(_._1)
    assert(perPart.map(_._4).sum > 0)
    // range partitioning: ordered by pid, ranges must not overlap —
    // this is what makes every written file's (zx, zy) stats narrow
    perPart.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // deterministic: the same call yields the identical assignment
    val a = z.select("event_id", "zx", "zy", "zorder").collect().toSet
    val b = operators.Layout.zorder(
        Tables.load(spark, dir, "events"), "value", "user_id",
        bits = 4, numPartitions = 8)
      .select("event_id", "zx", "zy", "zorder").collect().toSet
    assert(a == b)
  }

  test("compactParquet: many small files merge to the computed target, no row lost") {
    import graft.operators.Layout
    val base = Files.createTempDirectory("compact").toString
    val in = s"$base/in"; val out = s"$base/out"
    val src = Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice")
    src.repartition(24).write.parquet(in)
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val nIn = parquetFiles(in).length
    assert(nIn == 24)
    val bytes = parquetFiles(in).map(_.length).sum
    val target = bytes / 3  // expect ceil(3.x) = 3 or 4 output files
    val summary = Layout.compactParquet(spark, in, out, target).collect().head
    assert(summary.getAs[Long]("files_before") == nIn.toLong)
    assert(summary.getAs[Long]("bytes_before") == bytes)
    val expect = math.ceil(bytes.toDouble / target).toLong
    assert(summary.getAs[Long]("files_target") == expect)
    // coalesce yields exactly the target count when inputs >= target
    assert(parquetFiles(out).length.toLong == expect)
    assert(spark.read.parquet(out).collect().toSet == src.collect().toSet)
  }

  test("compactParquet with sortCols: compacted files carry disjoint key ranges") {
    import graft.operators.Layout
    val base = Files.createTempDirectory("compactsort").toString
    val in = s"$base/in"; val out = s"$base/out"
    Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice")
      .repartition(16).write.parquet(in)
    val bytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    Layout.compactParquet(spark, in, out, bytes / 2, sortCols = Seq("o_orderkey"))
    // per-file [min,max] of the sort key must not overlap across files
    val ranges = new java.io.File(out).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("o_orderkey"), max("o_orderkey")).collect().head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2,
        s"file ranges overlap: $hi1 > $lo2")
      case _ =>
    }
  }
}
