ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "espkinesisspark"
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
// Persist failing test names/timestamps to target/test-failures.log so a
// one-off flake under load is nameable from the artifact (see
// graft.FailureLogReporter).
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-C", "graft.FailureLogReporter")
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
  // 24g default (was 8g): the single-JVM local[32] suite runs 63
  // queries x3 back to back, and at 8g the accumulated block-manager +
  // codegen + GC pressure inflated in-suite medians ~20% over isolated
  // runs (measured 65.9s -> 52.7s total at sf0.1 on identical code).
  // The box has 128 GiB; on a real cluster this is per-executor memory
  // sizing, which the partition-size guidance in PLANS.md covers.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
