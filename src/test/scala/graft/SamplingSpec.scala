package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("hashSplit: disjoint, exhaustive, proportions near weights") {
    val split = Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("_split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum
    assert(total == docs.count())  // exhaustive: every row assigned
    assert(counts.keySet == Set("train", "val", "test"))
    // hash uniformity: within ±5 percentage points at n=500
    assert(math.abs(counts("train").toDouble / total - 0.8) < 0.05)
    assert(math.abs(counts("val").toDouble / total - 0.1) < 0.05)
    assert(math.abs(counts("test").toDouble / total - 0.1) < 0.05)
  }

  test("hashSplit is stable across repartitioning (randomSplit is not)") {
    val w = Seq("train" -> 0.9, "test" -> 0.1)
    val a = Sampling.hashSplit(docs, "doc_id", w)
      .select("doc_id", "_split").as[(Long, String)].collect().toSet
    val b = Sampling.hashSplit(docs.repartition(13), "doc_id", w)
      .select("doc_id", "_split").as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("hashSplit: different seeds give different assignments") {
    val w = Seq("train" -> 0.5, "test" -> 0.5)
    val a = Sampling.hashSplit(docs, "doc_id", w, seed = 1)
      .filter($"_split" === "train").select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSplit(docs, "doc_id", w, seed = 2)
      .filter($"_split" === "train").select("doc_id").as[Long].collect().toSet
    assert(a != b)
  }

  test("hashSplit rejects weights that don't sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("stratifiedSample keeps roughly the requested fraction per stratum") {
    val langs = docs.select("lang").distinct().as[String].collect()
    val fractions = langs.map(_ -> 0.5).toMap
    val sampled = Sampling.stratifiedSample(docs, "lang", fractions, seed = 7L)
    val byLang = sampled.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val origByLang = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    langs.foreach { l =>
      val frac = byLang.getOrElse(l, 0L).toDouble / origByLang(l)
      assert(frac > 0.25 && frac < 0.75, s"stratum $l sampled at $frac, wanted ~0.5")
    }
    // dropped stratum: fraction 0 for one language removes it entirely
    val dropped = Sampling.stratifiedSample(docs, "lang",
      fractions - langs.head, seed = 7L)
    assert(dropped.filter($"lang" === langs.head).count() == 0)
  }

  test("quantileFilter keeps rows at or above the exact interpolated quantile") {
    val df = (1 to 8).map(i => (i.toLong, i)).toDF("id", "score")
    // P25 of 1..8 interpolates to 1 + 7*0.25 = 2.75 → keep 3..8
    val kept = Sampling.quantileFilter(df, "score", 0.25)
      .select("id").as[Long].collect().sorted
    assert(kept.sameElements(Array(3L, 4L, 5L, 6L, 7L, 8L)))
    // boundary inclusivity: P50 of 1..3 is exactly 2 → 2 stays
    val half = Sampling.quantileFilter(
        Seq((1L, 1), (2L, 2), (3L, 3)).toDF("id", "score"), "score", 0.5)
      .select("id").as[Long].collect().sorted
    assert(half.sameElements(Array(2L, 3L)))
    assertThrows[IllegalArgumentException] {
      Sampling.quantileFilter(df, "score", 1.0)
    }
  }

  test("weightedSample: deterministic, without replacement, weight-responsive") {
    val df = (1L to 1000L).map(i => (i, if (i <= 100) 100 else 1))
      .toDF("id", "w")
    def draw(seed: Long) = Sampling.weightedSample(df, "id", "w", 50, seed)
      .select("id").as[Long].collect().toSeq
    val a = draw(7L)
    // same seed → identical sample (including order); no duplicates
    assert(a == draw(7L))
    assert(a.distinct.length == 50)
    assert(draw(8L) != a, "different seeds should draw different samples")
    // the 10% of ids carrying 100× weight should dominate the sample
    // (each heavy id is ~100× likelier than each light one)
    val heavy = a.count(_ <= 100L)
    assert(heavy > 25, s"expected heavy-weight majority, got $heavy/50")
    // zero/negative weights are never sampled
    val z = Sampling.weightedSample(
      Seq((1L, 0), (2L, -3), (3L, 5)).toDF("id", "w"), "id", "w", 3, 1L)
      .select("id").as[Long].collect().toSeq
    assert(z == Seq(3L))
  }

  test("weightedSample plans as TakeOrderedAndProject, not a global sort") {
    val df = (1L to 100L).map(i => (i, 1)).toDF("id", "w")
    val plan = Sampling.weightedSample(df, "id", "w", 5, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("leakFreeSplit: clusters never straddle a boundary, fractions near weights") {
    import spark.implicits._
    // 300 clusters of 3 members each — member ids hash differently from
    // their rep, so a per-id split WOULD straddle; the rep-keyed split
    // must not
    val clusters = (0L until 900L).map(i => (i, i / 3 * 3))
      .toDF("doc_id", "cluster_rep")
    val out = Sampling.leakFreeSplit(clusters, "doc_id", "cluster_rep",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 11)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 900)
    val perCluster = out.groupBy(_._2).values
    assert(perCluster.forall(_.map(_._3).distinct.length == 1),
      "a cluster straddles a split boundary")
    val shares = out.groupBy(_._3).view.mapValues(_.length / 900.0)
    assert(math.abs(shares("train") - 0.8) < 0.08, shares.toMap.toString)
    assert(shares.getOrElse("val", 0.0) > 0.02 && shares.getOrElse("test", 0.0) > 0.02)
    assertThrows[IllegalArgumentException] {
      Sampling.leakFreeSplit(clusters, "doc_id", "cluster_rep",
        Seq("train" -> 0.5), seed = 1)
    }
  }
}
