package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skyline

class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frontier(rows: Seq[(Int, Int)]): Set[(Int, Int)] =
    Skyline.pareto2d(rows.toDF("x", "y"), "x", "y")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet

  // reference: literal O(n²) dominance scan
  private def naive(rows: Seq[(Int, Int)]): Set[(Int, Int)] =
    rows.filter { case (x, y) =>
      !rows.exists { case (x2, y2) =>
        x2 >= x && y2 <= y && (x2 > x || y2 < y)
      }
    }.toSet

  test("hand-computed frontier: maximize x, minimize y") {
    // (5,4) dominates (3,6); (4,1) and (6,5) are incomparable with (5,4)
    val rows = Seq((5, 4), (3, 6), (4, 1), (6, 5), (1, 9))
    assert(frontier(rows) == Set((4, 1), (5, 4), (6, 5)))
  }

  test("ties: equal points survive together; same-x higher-y is dominated") {
    val rows = Seq((5, 3), (5, 3), (5, 7), (2, 3))
    // (5,7) loses to (5,3) (strict in y); (2,3) loses to (5,3) (strict
    // in x, y equal); BOTH (5,3) copies survive — neither dominates
    val out = Skyline.pareto2d(rows.toDF("x", "y"), "x", "y").collect()
    assert(out.length == 2)
    assert(out.forall(r => (r.getInt(0), r.getInt(1)) == ((5, 3))))
  }

  test("matches the quadratic definition on random data across partitions") {
    // 4 shuffle partitions in tests: 300 rows with ~150 distinct x spans
    // the range partitioner, exercising the cross-partition prefix path
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val rows = Seq.fill(300)((rnd.nextInt(150), rnd.nextInt(150)))
      assert(frontier(rows) == naive(rows), s"trial $trial")
    }
  }

  test("monotone chain: all points on the frontier stay; reversed chain keeps one") {
    // x and y both increasing: every point incomparable (higher x pays
    // higher y) — all survive
    val chain = (1 to 20).map(i => (i, i))
    assert(frontier(chain) == chain.toSet)
    // x increasing, y decreasing: (20, 1) dominates everything else
    val rev = (1 to 20).map(i => (i, 21 - i))
    assert(frontier(rev) == Set((20, 1)))
  }

  test("plan: no global sort, no cartesian — the scan is partition-local") {
    val df = Skyline.pareto2d(
      (1 to 500).map(i => (i % 97, i % 53)).toDF("x", "y"), "x", "y")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    // the only Sort nodes are partition-local (global flag false)
    val globalSorts = """Sort \[[^\]]*\], true,""".r.findAllIn(p).size
    assert(globalSorts == 0, s"global sort in skyline plan:\n$p")
  }
}
