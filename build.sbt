ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dadospublicosetlspark"
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
)
Test / parallelExecution := false
// The round driver captures a ~2000-char stdout TAIL of its Bench run
// and parses the FINAL line as JSON. Invoked through sbt, two
// decorations break that contract even though Bench prints a compact
// self-contained summary last: the forked JVM's stdout is re-logged
// line-by-line under an "[info] " prefix, and sbt appends a
// "[success] Total time: ..." banner AFTER the main returns (so no
// in-process print can follow it). Stream forked run output verbatim
// and suppress the banner — Bench's compact JSON line is then the
// final stdout line under sbt exactly as it is bare-JVM.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not another setting —
// exclude it from the unused-key lint so load output stays clean
Global / excludeLintKeys += showSuccess
