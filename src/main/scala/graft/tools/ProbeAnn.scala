package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Round-12 probe: stage attribution for c14_ann_knn at sf0.1 — where
  * do ~4 steady seconds go on a 2 000-vector corpus? Stages replicate
  * annKnn's internals (signature explode → bucket join + distinct →
  * vector join + score + rank). Findings in PLANS.md (round 12). */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build("graft-probe-ann")
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, sfDir, "embeddings")
    val (nBits, nTables, dim, seed, k) = (4, 48, 64, 7L, 5)
    val planes = (0 until nTables).map(t => Similarity.hyperplanes(nBits, dim, seed + t))
    def sig(vc: org.apache.spark.sql.Column) =
      array(planes.map(p => Similarity.srpSignature(vc, p)): _*)
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"[ann] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val cv = e.select(col("vec_id").as("nn_id"),
        col("embedding").cast("array<double>").as("cv"))
      .withColumn("cn", Similarity.l2norm(col("cv")))
    val qv = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("qn", Similarity.l2norm(col("qv")))
    val c = cv.select(col("nn_id"), posexplode(sig(col("cv"))).as(Seq("table_idx", "bucket")))
    val q = qv.select(col("query_id"), posexplode(sig(col("qv"))).as(Seq("table_idx", "bucket")))
    time("corpus signatures only")(c)
    val cand = q.join(c, Seq("table_idx", "bucket"))
      .filter(col("query_id") =!= col("nn_id"))
      .select("query_id", "nn_id").distinct()
    time("through candidate distinct")(cand)
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("nn_id"))
    val full = cand.join(qv, Seq("query_id")).join(cv, Seq("nn_id"))
      .select(col("query_id"), col("nn_id"),
        Similarity.cosineOrNull(Similarity.dot(col("qv"), col("cv")),
          col("qn"), col("cn")).as("cosine"))
      .filter(col("cosine").isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    time("full annKnn shape")(full)
    spark.stop()
  }
}
