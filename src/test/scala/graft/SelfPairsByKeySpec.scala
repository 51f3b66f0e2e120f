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
