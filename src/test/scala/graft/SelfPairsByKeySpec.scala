package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.SelfPairsByKey.selfPairsByKey

class SelfPairsByKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("equals the self-join idiom, value for value") {
    val banded = Seq(
      (0, 10L, 1L), (0, 10L, 2L), (0, 10L, 3L), // bucket of 3 → 3 pairs
      (0, 11L, 4L),                              // singleton → nothing
      (1, 10L, 1L), (1, 10L, 2L),                // same hash, other band
      (2, 12L, 5L), (2, 12L, 5L)                 // dup id in one bucket
    ).toDF("band_idx", "band_hash", "id")
    val ours = selfPairsByKey(banded, Seq("band_idx", "band_hash"), "id")
    val a = banded.select(col("id").as("id_a"), col("band_idx"), col("band_hash"))
    val b = banded.select(col("id").as("id_b"), col("band_idx"), col("band_hash"))
    val idiom = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    assert(ours.exceptAll(idiom).count() == 0 && idiom.exceptAll(ours).count() == 0)
    // including multiplicity across buckets: (1,2) appears twice
    assert(ours.filter(col("id_a") === 1 && col("id_b") === 2).count() == 2)
    // the duplicated id pairs with itself under the join idiom too? no —
    // id_a < id_b is strict, so (5,5) appears in neither
    assert(ours.filter(col("id_a") === col("id_b")).count() == 0)
  }

  test("plan: exactly one exchange, no join operator") {
    val banded = spark.range(2000).select(
      (col("id") % 64).cast("int").as("band_idx"),
      (col("id") % 100).as("band_hash"), col("id"))
    val df = selfPairsByKey(banded, Seq("band_idx", "band_hash"), "id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("SelfPairsByKey"), p)
    assert(!p.contains("Join"), s"join survived in:\n$p")
    val exchanges = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("ReusedExchange"))
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }

  test("maxBucket cap drops oversized buckets before pairing") {
    val banded = Seq(
      (0, 10L, 1L), (0, 10L, 2L), (0, 10L, 3L), (0, 10L, 4L), // size 4
      (0, 11L, 5L), (0, 11L, 6L)                               // size 2
    ).toDF("band_idx", "band_hash", "id")
    val capped = selfPairsByKey(banded, Seq("band_idx", "band_hash"), "id",
      maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((5L, 6L)))
  }

  test("null ids never pair (matching the equi-join's null semantics)") {
    val banded = Seq(
      (0, 10L, Some(1L)), (0, 10L, None), (0, 10L, Some(2L))
    ).toDF("band_idx", "band_hash", "id")
    val out = selfPairsByKey(banded, Seq("band_idx", "band_hash"), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("string ids order lexicographically; works on non-long types") {
    val banded = Seq((0, 1L, "beta"), (0, 1L, "alpha"), (0, 1L, "gamma"))
      .toDF("band_idx", "band_hash", "id")
    val out = selfPairsByKey(banded, Seq("band_idx", "band_hash"), "id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("alpha", "beta"), ("alpha", "gamma"), ("beta", "gamma")))
  }

  test("payload form carries each side's signature, named as requested") {
    import graft.plans.SelfPairsByKey.selfPairsByKeyWithPayload
    val banded = Seq(
      (0, 10L, 2L, 0xF0L), (0, 10L, 1L, 0x0FL), (0, 10L, 3L, 0xFFL)
    ).toDF("band_idx", "band_hash", "id", "sig")
    val out = selfPairsByKeyWithPayload(banded, Seq("band_idx", "band_hash"),
      "id", "sig", ("sa", "sb"))
    assert(out.columns.toSeq == Seq("id_a", "id_b", "sa", "sb"))
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // pairs ordered by id; payloads follow their own side
    assert(rows == Set((1L, 2L, 0x0FL, 0xF0L), (1L, 3L, 0x0FL, 0xFFL),
      (2L, 3L, 0xF0L, 0xFFL)))
  }

  test("plan: spillable sort below the exec (streaming-group memory bound)") {
    // the exec's memory contract rests on requiredChildOrdering: the
    // planner must insert a (spillable) sort on the bucket key so the
    // exec only ever buffers ONE bucket — pin that the sort is there
    val banded = spark.range(1000).select(
      (col("id") % 16).cast("int").as("band_idx"),
      (col("id") % 50).as("band_hash"), col("id"))
    val df = selfPairsByKey(banded, Seq("band_idx", "band_hash"), "id")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val selfPairsLine = p.linesIterator.indexWhere(_.contains("SelfPairsByKey"))
    val sortLine = p.linesIterator.indexWhere(_.contains("Sort "))
    assert(selfPairsLine >= 0 && sortLine > selfPairsLine,
      s"expected a Sort below SelfPairsByKey:\n$p")
  }

  test("skewed partition: mega-bucket streams through under maxBucket, " +
    "small buckets around it still pair") {
    // one viral bucket of 5 000 rows (dropped by the cap — and with the
    // streaming-group exec, never even BUFFERED past the cap) wedged
    // between small buckets that hash to the same partitions
    val mega = spark.range(5000).select(
      lit(0).as("band_idx"), lit(999L).as("band_hash"), col("id"))
    val small = Seq(
      (0, 1L, 100L), (0, 1L, 101L),
      (0, 2L, 200L), (0, 2L, 201L), (0, 2L, 202L),
      (1, 999L, 300L), (1, 999L, 301L) // same hash as mega, other band
    ).toDF("band_idx", "band_hash", "id")
    val banded = mega.unionAll(small)
    val out = selfPairsByKey(banded, Seq("band_idx", "band_hash"), "id",
      maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((100L, 101L), (200L, 201L), (200L, 202L),
      (201L, 202L), (300L, 301L)))
    // and uncapped, the same input yields exactly C(5000,2) + 5 pairs —
    // the group-boundary logic is exact even around the mega bucket
    val n = selfPairsByKey(banded, Seq("band_idx", "band_hash"), "id").count()
    assert(n == 5000L * 4999 / 2 + 5)
  }

  test("many buckets per partition group correctly (sort contiguity)") {
    // 200 buckets of 3 across 4 partitions — every bucket must emit
    // exactly its own 3 pairs, none bleeding into neighbours
    val banded = spark.range(600).select(
      (col("id") % 200).as("band_hash"), lit(0).as("band_idx"), col("id"))
    val out = selfPairsByKey(banded, Seq("band_idx", "band_hash"), "id")
    assert(out.count() == 600)
    val a = banded.select(col("id").as("id_a"), col("band_idx"), col("band_hash"))
    val b = banded.select(col("id").as("id_b"), col("band_idx"), col("band_hash"))
    val idiom = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
    assert(out.exceptAll(idiom).count() == 0 && idiom.exceptAll(out).count() == 0)
  }

  test("missing and ambiguous columns fail loudly") {
    val df = Seq((1, 2L)).toDF("k", "id")
    intercept[IllegalArgumentException] { selfPairsByKey(df, Seq("nope"), "id") }
    val a = Seq((1, 2L)).toDF("k", "id")
    val b = Seq((1, 3L)).toDF("k2", "id")
    val joined = a.join(b, a("k") === b("k2"))
    val e = intercept[IllegalArgumentException] {
      selfPairsByKey(joined, Seq("k"), "id")
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }
}
