package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, Dedup}

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asof picks the latest right ROW atomically — null fields never stitch") {
    // right rows for key 1: (t=1: p1=5, p2=7), (t=2: p1=9, p2=NULL);
    // a left row at t=3 must see (9, NULL), not (9, 7)
    val right = Seq((1L, 1L, Some(5), Some(7), 10L), (1L, 2L, Some(9), None, 11L))
      .toDF("k", "rt", "p1", "p2", "rid")
    val left = Seq((1L, 3L, "x"), (1L, 0L, "y")).toDF("k", "lt", "tag")
    val rows = AsOfJoin.asof(left, right, Seq("k"), "lt", "rt",
      Seq("p1", "p2"), "rid").collect()
      .map(r => r.getAs[String]("tag") ->
        (r.getAs[Any]("asof_p1"), r.getAs[Any]("asof_p2"))).toMap
    assert(rows("x") == ((9, null)))
    assert(rows("y") == ((null, null)))  // no right row at or before t=0
  }

  test("asof inclusive at equal timestamps, tie-broken by the tiebreak column") {
    val right = Seq((1L, 5L, 100, 1L), (1L, 5L, 200, 2L)).toDF("k", "rt", "p", "rid")
    val left = Seq((1L, 5L, "same_t")).toDF("k", "lt", "tag")
    val r = AsOfJoin.asof(left, right, Seq("k"), "lt", "rt", Seq("p"), "rid")
      .collect().head
    assert(r.getAs[Int]("asof_p") == 200)  // highest rid among equal times wins
  }

  test("asofForward picks the next right row, inclusive, smallest tie wins") {
    val right = Seq(
      (1L, 3L, 30, 1L), (1L, 7L, 70, 2L), (1L, 7L, 71, 3L), (2L, 9L, 90, 4L)
    ).toDF("k", "rt", "p", "rid")
    val left = Seq(
      (1L, 5L, "between"),   // next right is t=7 → smallest rid (2) wins → 70
      (1L, 7L, "equal"),     // inclusive: t=7 itself → 70
      (1L, 8L, "after_all"), // no right at or after t=8 for k=1 → null
      (2L, 1L, "other_key")  // k=2: next right t=9 → 90
    ).toDF("k", "lt", "tag")
    val rows = AsOfJoin.asofForward(left, right, Seq("k"), "lt", "rt", Seq("p"), "rid")
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[Any]("asof_p")).toMap
    assert(rows("between") == 70)
    assert(rows("equal") == 70)
    assert(rows("after_all") == null)
    assert(rows("other_key") == 90)
  }

  test("null right timestamps carry no payload in either direction") {
    // right has ONE null-time row per key plus a real row; a left row
    // with no real match (and a null-time left row) must get null, not
    // the null-time row's payload
    val right = Seq(
      (1L, Option.empty[Long], 666, 9L), // undefined time — must never match
      (1L, Some(5L), 50, 1L),
      (2L, Option.empty[Long], 777, 8L)  // k=2 has ONLY a null-time right row
    ).toDF("k", "rt", "p", "rid")
    val left = Seq(
      (1L, Some(3L), "before_real"), // backward: nothing at/before t=3 → null
      (1L, Some(6L), "after_real"),  // forward: nothing at/after t=6 → null
      (1L, Option.empty[Long], "null_left"),
      (2L, Some(4L), "only_null_right")
    ).toDF("k", "lt", "tag")
    val back = AsOfJoin.asof(left, right, Seq("k"), "lt", "rt", Seq("p"), "rid")
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[Any]("asof_p")).toMap
    assert(back("before_real") == null)
    assert(back("null_left") == null)
    assert(back("only_null_right") == null)
    assert(back("after_real") == 50)
    val fwd = AsOfJoin.asofForward(left, right, Seq("k"), "lt", "rt", Seq("p"), "rid")
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[Any]("asof_p")).toMap
    assert(fwd("after_real") == null)
    assert(fwd("null_left") == null)
    assert(fwd("only_null_right") == null)
    assert(fwd("before_real") == 50)
  }

  test("asofNearest: nearer side wins; equal distance resolves backward") {
    val right = Seq((1L, 3L, 30, 1L), (1L, 7L, 70, 2L)).toDF("k", "rt", "p", "rid")
    val left = Seq(
      (1L, 4L, "near_back"),  // |1| back vs |3| fwd → 30
      (1L, 6L, "near_fwd"),   // |3| back vs |1| fwd → 70
      (1L, 5L, "equidistant"),// |2| both → backward wins → 30
      (1L, 7L, "same_t"),     // gap 0 backward (inclusive) → 70
      (1L, 1L, "before_all"), // only forward exists → 30
      (1L, 9L, "after_all"),  // only backward exists → 70
      (2L, 5L, "no_right")    // no right rows for k=2 → null
    ).toDF("k", "lt", "tag")
    val rows = AsOfJoin.asofNearest(left, right, Seq("k"), "lt", "rt",
      Seq("p"), "rid").collect()
      .map(r => r.getAs[String]("tag") -> r.getAs[Any]("asof_p")).toMap
    assert(rows("near_back") == 30)
    assert(rows("near_fwd") == 70)
    assert(rows("equidistant") == 30)
    assert(rows("same_t") == 70)
    assert(rows("before_all") == 30)
    assert(rows("after_all") == 70)
    assert(rows("no_right") == null)
  }

  test("asofNearest: null timestamps match nothing on either side") {
    // null-time right rows are dropped in the tagged union; a null-time
    // left row sorts first under BOTH window orderings (nulls_first asc
    // and desc_nulls_first), so both running payloads are null
    val right = Seq(
      (1L, Option.empty[Long], 666, 9L), // undefined time — never a match
      (1L, Some(5L), 50, 1L)
    ).toDF("k", "rt", "p", "rid")
    val left = Seq(
      (1L, Some(4L), "real"),
      (1L, Option.empty[Long], "null_left"),
      (2L, Some(3L), "no_rights")
    ).toDF("k", "lt", "tag")
    val rows = AsOfJoin.asofNearest(left, right, Seq("k"), "lt", "rt",
      Seq("p"), "rid").collect()
      .map(r => r.getAs[String]("tag") -> r.getAs[Any]("asof_p")).toMap
    assert(rows("real") == 50)
    assert(rows("null_left") == null)
    assert(rows("no_rights") == null)
  }

  test("asofNearest tie rules per side: backward largest rid, forward smallest") {
    val right = Seq(
      (1L, 3L, 31, 1L), (1L, 3L, 32, 2L),  // backward candidates at t=3
      (1L, 9L, 91, 3L), (1L, 9L, 92, 4L)   // forward candidates at t=9
    ).toDF("k", "rt", "p", "rid")
    val left = Seq(
      (1L, 4L, "back_tie"),  // t=3 nearer → backward rule: largest rid → 32
      (1L, 8L, "fwd_tie")    // t=9 nearer → forward rule: smallest rid → 91
    ).toDF("k", "lt", "tag")
    val rows = AsOfJoin.asofNearest(left, right, Seq("k"), "lt", "rt",
      Seq("p"), "rid").collect()
      .map(r => r.getAs[String]("tag") -> r.getAs[Any]("asof_p")).toMap
    assert(rows("back_tie") == 32)
    assert(rows("fwd_tie") == 91)
  }

  test("jaccard threshold boundary survives float overshoot (J exactly = t)") {
    // A: 452 words -> 450 shingles; B: prefix of 245 words -> 243 shingles
    // intersection 243, union 450 -> J = 0.54 exactly; 450*0.54 overshoots
    // by 1 ulp in double, which must not reject the pair
    val wordsA = (0 until 452).map(i => s"w$i")
    val df = Seq((1L, wordsA.mkString(" ")), (2L, wordsA.take(245).mkString(" ")))
      .toDF("id", "text")
    for (f <- Seq(
      Dedup.ngramJaccardPairs(df, "id", "text", threshold = 0.54),
      Dedup.ngramJaccardPairsPrefix(df, "id", "text", threshold = 0.54))) {
      val pairs = f.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0.54),
        s"boundary pair missing: ${pairs.toSeq}")
    }
  }
}
