package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites (Test / fork := true → one JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    // local[4, 3]: 4 threads, 3 attempts per task — lets resilience
    // tests exercise retries; harmless for every other suite
    val s = SparkSession.builder()
      .master("local[4, 3]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // harness opt-in (the GraftSession pattern): suites exercise the
    // checkpoint lifecycle's deliberate unpersists hundreds of times
    graft.operators.Ckpt.quietDeliberateUnpersistWarnings()
    s
  }
}
