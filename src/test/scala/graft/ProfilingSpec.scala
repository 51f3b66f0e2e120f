package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Profiling

class ProfilingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("profile: nulls, distinct, and NATIVE-type min/max per column") {
    val df = Seq(
      (Some(2), Some("b")), (Some(10), None), (None, Some("a")),
      (Some(10), Some("a"))
    ).toDF("n", "s")
    val out = Profiling.profile(df, Seq("n", "s"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    // numeric min/max on the NATIVE type: 2 < 10 (string order would
    // put "10" before "2")
    assert(out("n") == ((4L, 1L, 2L, "2", "10")))
    assert(out("s") == ((4L, 1L, 2L, "a", "b")))
  }

  test("profile: all-null column yields null min/max and zero distinct") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("id", "v")
    val r = Profiling.profile(df, Seq("v")).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }
}
