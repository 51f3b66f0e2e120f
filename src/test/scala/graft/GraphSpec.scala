package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // path a-b-c-d-e plus a cycle shortcut a-c, and x-y off to the side
  private def edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c"), ("x", "y")
  ).toDF("src", "dst")

  test("bfsHops: shortest hop counts, shortcut respected, unreachable absent") {
    val out = Graph.bfsHops(edges, "src", "dst", "a", maxHops = 10)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // a-c direct beats a-b-c; d is 2 via the shortcut, e is 3
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2, "e" -> 3))
  }

  test("bfsHops: maxHops truncates the frontier") {
    val out = Graph.bfsHops(edges, "src", "dst", "a", maxHops = 1)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 1))
  }

  test("bfsHops: edges are undirected (start on the dst side)") {
    val out = Graph.bfsHops(edges, "src", "dst", "e", maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("e" -> 0, "d" -> 1, "c" -> 2))
  }

  test("bfsHops: isolated start terminates with just itself") {
    val out = Graph.bfsHops(edges, "src", "dst", "zzz", maxHops = 5)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("zzz" -> 0))
  }
}
