ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "quarkusetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The full-surface bench generates thousands of whole-stage-codegen
  // classes in one JVM; JDK 17's default 240 MB reserved code cache
  // fills late in the run, the JIT stops compiling, and everything
  // scheduled after that point (the alphabetically-late s*/s2/s4
  // block, c104's iterative peel reps) runs 2-6× its steady state —
  // measured round 9: streaming tier 89.9 s in-run vs ~45 s steady,
  // c104 18.2 s in-run vs 5.5 s standalone. 512 m demonstrably still
  // fell short in the round-9 driver run (372 vs 276 s at the same
  // HEAD, inflation concentrated late-run), so round 10 widens to 1 g
  // and Bench.scala now prints per-CodeHeap used/max at start+end so
  // the artifact itself proves whether the cache filled. Harmless for
  // small runs (reserved, not committed).
  "-XX:ReservedCodeCacheSize=1g",
  // Deliberately NO -Xms/-XX:+AlwaysPreTouch: this box demand-pages
  // fresh anon memory at millisecond-scale per fault (measured:
  // `java -Xms8g -XX:+AlwaysPreTouch -version` = 2.7-4 min wall,
  // 88 CPU-minutes of sys time, and a later JVM pays it again), so
  // pre-touching costs every forked JVM minutes at startup. The fault
  // tax is instead kept out of the BENCH numbers by Bench.scala's
  // per-query unmeasured warmup rep (see PLANS.md, q9 r5 regression).
)
