package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Quantize
import graft.functions.VectorFunctions.max_abs

/** int8 embedding quantization: scale math, clamping, the
  * reconstruction-error bound, and zero/empty-vector degradation. */
class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(0.5, -0.25, 0.125)),
    (2L, Array(1.0, -1.0, 0.0)),
    (3L, Array(0.003, 0.0017, -0.0042))
  ).toDF("id", "v")

  test("int8: scale = 127/max|x| and extremes land exactly on ±127") {
    val out = Quantize.int8(vecs, "id", "v").orderBy("id").collect()
    assert(out(0).getDouble(1) == 127.0 / 0.5)
    val q2 = out(1).getSeq[Byte](2)
    assert(q2 == Seq[Byte](127, -127, 0))
  }

  test("int8: values quantize to round-half-up of x*scale") {
    val out = Quantize.int8(vecs, "id", "v").orderBy("id").collect()
    val q1 = out(0).getSeq[Byte](2)
    // scale 254: 0.5*254=127, -0.25*254=-63.5 -> floor(-63)= -63, 0.125*254=31.75 -> 32
    assert(q1 == Seq[Byte](127, -63, 32))
  }

  test("int8WithError: max_err never exceeds the 0.5/scale bound") {
    val df = Seq.tabulate(50)(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 17 + j * 3.7) * (j + 1))))
      .toDF("id", "v")
    val bad = Quantize.int8WithError(df, "id", "v")
      .filter(col("max_err") > col("err_bound") * 1.0000001)
    assert(bad.count() == 0)
  }

  test("zero and empty vectors degrade to NULL scale/qvec, not an ANSI error") {
    val df = Seq(
      (1L, Array(0.0, 0.0)),
      (2L, Array.empty[Double]),
      (3L, Array(2.0, -4.0))
    ).toDF("id", "v")
    val out = Quantize.int8(df, "id", "v").orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
    assert(!out(2).isNullAt(2))
  }

  test("null array elements propagate to a NULL row, never read as 0") {
    // array<double> with containsNull=true and a planted null element:
    // max_abs and quantize_int8 must yield NULL for that row —
    // deliberately stricter than array_max (which skips nulls), because
    // a skipped dimension gives a plausible-but-wrong scale
    val df = Seq(
      (1L, Array[java.lang.Double](1.0, null, 3.0)),
      (2L, Array[java.lang.Double](2.0, -4.0, 1.0))
    ).toDF("id", "v")
    val out = Quantize.int8(df, "id", "v").orderBy("id").collect()
    assert(out(0).isNullAt(1) && out(0).isNullAt(2))
    assert(out(1).getDouble(1) == 127.0 / 4.0 && !out(1).isNullAt(2))
  }

  test("int8 retrieval: kNN over dequantized vectors, recall@10 >= 0.95 vs exact") {
    // the retrieval consequence of the 0.5/scale error bound: searching
    // the dequantized int8 corpus must surface (nearly) the same
    // neighbors as the full-precision corpus — this is what a serving
    // tier that ships int8 vectors actually runs
    import graft.operators.Similarity
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val k = 10
    val queries = e.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceKnn(e, queries, "vec_id", "embedding", k)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val deq = Quantize.int8(e, "vec_id", "embedding")
      .select(col("vec_id"),
        transform(col("qvec").cast("array<double>"),
          q => q / col("scale")).as("embedding"))
    val approx = Similarity.bruteForceKnn(deq, queries, "vec_id", "embedding", k)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"int8 retrieval recall $recall < 0.95")
  }

  test("max_abs matches the interpreted array_max(transform(abs)) form") {
    val df = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i + j) * (i - 10))))
      .toDF("id", "v")
    val diff = df
      .withColumn("a", max_abs(col("v")))
      .withColumn("b", array_max(transform(col("v"), x => abs(x))))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }
}
