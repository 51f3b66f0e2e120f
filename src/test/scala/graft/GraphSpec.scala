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

  private def ranksOf(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("pageRank: undirected star, two hand-computed iterations") {
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3")).toDF("src", "dst")
    // N=4, d=0.85, r0=0.25 each; r1(h)=0.0375+0.85*0.75=0.675,
    // r1(l)=0.0375+0.85*(0.25/3); r2(h)=0.0375+0.85*3*r1(l)=0.31375,
    // r2(l)=0.0375+0.85*(0.675/3)=0.22875; mean-normalized *4
    val out = ranksOf(Graph.pageRank(star, "src", "dst", iters = 2))
    assert(math.abs(out("h") - 1.255) < 1e-9)
    for (l <- Seq("l1", "l2", "l3")) assert(math.abs(out(l) - 0.915) < 1e-9)
  }

  test("pageRank: symmetric pair is uniform; total mass is conserved") {
    val out = ranksOf(Graph.pageRank(Seq(("a", "b")).toDF("src", "dst"),
      "src", "dst", iters = 5))
    assert(out.values.forall(v => math.abs(v - 1.0) < 1e-12))
    // undirected ⇒ no dangling mass: mean-normalized ranks sum to N
    val big = ranksOf(Graph.pageRank(edges, "src", "dst", iters = 5))
    assert(math.abs(big.values.sum - big.size) < 1e-9)
  }

  test("pageRank: directed mode keeps edge direction (dangling sink)") {
    // a -> b only: b never sends rank back; after 1 iter
    // r1(a)=0.075 (pure teleport), r1(b)=0.075+0.85*0.5=0.5; *2
    val out = ranksOf(Graph.pageRank(Seq(("a", "b")).toDF("src", "dst"),
      "src", "dst", iters = 1, undirected = false))
    assert(math.abs(out("a") - 0.15) < 1e-12)
    assert(math.abs(out("b") - 1.0) < 1e-12)
  }
}
