package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** One-off: decompose c42's wall time into train / encode / scan+rerank.
  * Not part of the library surface. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-profile-pq")
    val e = graft.Tables.load(spark, sfDir, "embeddings")
    e.write.format("noop").mode("overwrite").save() // warm the scan
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pq] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 3) {
      println(s"[pq] --- rep $rep")
      val books = t("pqTrain (m=8 ksub=16 frac=0.25)") {
        Similarity.pqTrain(e, "embedding", 64, 8, 16, 7L, 0.25)
      }
      assert(books.length == 8)
      t("full pqKnn (unbounded rerank)") {
        Similarity.pqKnn(e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
            5, dim = 64, m = 8, ksub = 16, rerank = Int.MaxValue, seed = 7L,
            trainFraction = 0.25)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
