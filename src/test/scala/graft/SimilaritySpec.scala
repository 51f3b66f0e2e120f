package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4-dim toy vectors: 1≈2 (identical direction), 3 orthogonal, 4 opposite
  private def vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(2.0f, 0.0f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Seq(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("bruteForcePairsTopK ranks the colinear pair first with cosine 1") {
    val top = Similarity.bruteForcePairsTopK(vecs, "vec_id", "embedding", 1)
      .collect().head
    assert(top.getLong(0) == 1L && top.getLong(1) == 2L)
    assert(math.abs(top.getDouble(2) - 1.0) < 1e-12)
  }

  test("bruteForceKnn finds vector 2 as nearest neighbor of 1") {
    val knn = Similarity.bruteForceKnn(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", 1).collect().head
    assert(knn.getAs[Long]("query_id") == 1L)
    assert(knn.getAs[Long]("nn_id") == 2L)
  }

  test("annPairsTopK finds the identical-direction pair") {
    val pairs = Similarity.annPairsTopK(vecs, "vec_id", "embedding", 3,
      nBits = 2, nTables = 4, dim = 4, seed = 7L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("cosine of opposite vectors is -1") {
    import org.apache.spark.sql.functions._
    val df = vecs.filter($"vec_id".isin(1L, 4L))
      .agg(collect_list($"embedding").as("vs"))
      .select(Similarity.cosine(
        element_at($"vs", 1).cast("array<double>"),
        element_at($"vs", 2).cast("array<double>")).as("c"))
    assert(math.abs(df.collect().head.getDouble(0) + 1.0) < 1e-12)
  }
}
