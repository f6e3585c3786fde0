ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "autotabulargpuacceleratedetlschemainferencepipelinespark"
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
// Inherit stdout/stderr directly in forked runs: the driver parses the one
// bench JSON line from stdout, and sbt's default LoggedOutput would prefix
// it with "[info] " making it unparseable.
run / outputStrategy := Some(StdoutOutput)
// The driver parses the LAST stdout line as the bench result. sbt's
// "[success] Total time: …" epilogue prints AFTER the forked run's JSON
// line, so it must be suppressed everywhere (the setting is global).
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — silence the
// false-positive unused-setting lint so warnings stay meaningful.
Global / excludeLintKeys += showSuccess
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
)
// Heap is scoped: bench/verify runs (local[32], 32 concurrent tasks in one
// JVM on a 128 GiB host) were GC-bound at 8g; tests keep the modest default
// so the suite stays runnable on small dev machines.
run / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}"
Test / javaOptions += s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
