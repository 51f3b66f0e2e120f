package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SURVEY §2.2 UDF/UDAF/UDTF row: the UDAF (Aggregator) is oracle-checked
  * via q37; this spec covers scalar UDF registration and the typed
  * generator (flatMap = UDTF shape). Built-ins are preferred in every
  * hot path (they codegen); UDFs remain the escape hatch and must at
  * least be correct. */
class UdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scalar udf registration: SQL + Column API agree with the built-in") {
    val tri = udf((s: String) => if (s == null) null else s.toLowerCase.take(3))
    spark.udf.register("tri3", tri)
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("udf_docs")
    val viaUdf = spark.sql("SELECT doc_id, tri3(text) t FROM udf_docs ORDER BY doc_id")
      .collect()
    val viaBuiltin = docs.select($"doc_id", substring(lower($"text"), 1, 3).as("t"))
      .orderBy("doc_id").collect()
    assert(viaUdf.sameElements(viaBuiltin))
  }

  test("sliding_min is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val m = spark.sql(
        "SELECT sliding_min(array(5L, 3L, 8L, 1L), 2) AS m")
      .collect().head.getSeq[Long](0)
    assert(m == Seq(3L, 3L, 1L), s"got $m")
  }

  test("typed flatMap generator (UDTF shape): one row per word with index") {
    val out = Seq((1L, "a b c"), (2L, "x")).toDF("id", "text")
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split(" ").zipWithIndex.map { case (w, i) => (id, i, w) }
      }
      .toDF("id", "pos", "word")
    assert(out.count() == 4)
    assert(out.filter($"id" === 1L && $"pos" === 2).select("word")
      .as[String].collect().sameElements(Array("c")))
  }
}
