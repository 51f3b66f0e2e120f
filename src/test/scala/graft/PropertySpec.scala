package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.etl.SchemaTools
import graft.operators.Dedup

/** Property-based checks (SURVEY.md §5.2 item 4): algebraic identities
  * and round-trips over generated inputs. Raw ScalaCheck `Gen` with a
  * fixed seed (the scalatest bridge artifact is not in the offline
  * cache); 10 samples per property keeps the suite fast while varying
  * shapes. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 10): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.oneOf("spark", "data", "row", "join", "the", "fast", "x1", "y2")
  private val text = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  test("filter then project == project then filter") {
    samples(Gen.listOfN(30, Gen.chooseNum(-100, 100))).foreach { xs =>
      val df = xs.zipWithIndex.toDF("v", "i")
      val a = df.filter($"v" > 0).select("i").collect().map(_.getInt(0)).sorted
      val b = df.select("i", "v").filter($"v" > 0).select("i").collect().map(_.getInt(0)).sorted
      assert(a.sameElements(b))
    }
  }

  test("uppercase normalization round-trips values unchanged") {
    samples(Gen.listOfN(10, Gen.zip(Gen.chooseNum(1, 1000), Gen.alphaStr)), 5).foreach { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("id", "payload")
        val norm = SchemaTools.normalizeUppercase(df)
        assert(norm.columns.sameElements(Array("ID", "PAYLOAD")))
        assert(norm.collect().toSeq == df.collect().toSeq)
      }
    }
  }

  test("identical texts always pair at jaccard exactly 1.0") {
    samples(Gen.listOfN(3, text), 5).foreach { texts =>
      val docs = texts.zipWithIndex.flatMap { case (t, i) =>
        Seq((i.toLong, t), (i.toLong + 100, t))
      }.toDF("id", "text")
      val pairs = Dedup.ngramJaccardPairs(docs, "id", "text", threshold = 0.99)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      texts.indices.foreach { i =>
        assert(pairs.exists(p => p._1 == i && p._2 == i + 100 && p._3 == 1.0),
          s"missing identity pair for doc $i in ${pairs.toSeq}")
      }
    }
  }

  test("exactDedup output has no duplicate texts and covers all distinct texts") {
    samples(Gen.listOfN(12, text), 5).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val out = Dedup.exactDedup(docs, "id", "text").select("text").as[String].collect()
      assert(out.length == out.distinct.length)
      assert(out.toSet == texts.toSet)
    }
  }
}
