ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "processalphafold3outputsspark"
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
  // local[32] runs the whole "cluster" in this one JVM: storage for the
  // suite's persisted artifacts + 32 task threads' execution memory all
  // share the heap. 8g left the second bench lap GC-bound once ~125
  // queries' caches accumulated; at 248 queries the same pattern
  // returned at 28g (per-lap min/max swinging 2.8-29.7 s on the
  // shuffle-heavy dedup heads — eviction/recompute churn, not plan
  // cost). The box has 128 GiB; give the rig room.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "56g")}",
  // 248 queries x 4 bench laps of whole-stage-codegen classes overflow
  // the default 240 MB JIT code cache; once it fills, the compiler shuts
  // off and whichever query family JITs last runs interpreted — the
  // family-shifting 5-8x per-query swings between identical runs
  "-XX:ReservedCodeCacheSize=1g",
)
