ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parallelmapreducespark"
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
// Pass the forked JVM's stdout straight through un-prefixed: the bench
// driver parses Bench's one-line JSON from stdout, and sbt's default
// LoggedOutput strategy would wrap it in "[info] ".
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[N] puts the driver AND all executor state (execution +
  // storage memory, localCheckpoint blocks) in ONE heap. 8g left the
  // block manager competing with execution memory on the
  // checkpoint-heavy stretch of the 124-query suite — the exact
  // queries the r6 official bench recorded 3-9x slower while isolated
  // reruns were fast. The container has 128 GiB; 16g keeps storage
  // eviction and GC out of the measured windows.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 123 queries x (warmup + measured) x ~5-15 generated classes each:
  // the JDK-17 default 240m JIT code cache fills mid-suite, after which
  // HotSpot stops compiling and everything later runs interpreted —
  // the r5 bench showed 2x slowdowns on queries whose code hadn't
  // changed. One long-lived JVM running hundreds of codegen'd plans is
  // exactly the executor profile this library targets.
  "-XX:ReservedCodeCacheSize=512m",
)
