ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nsdbspark"
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
run / connectInput := true // interactive stdin for graft.Cli
// Bench/Verify print machine-parsed JSON lines on stdout. sbt's default
// LoggedOutput wraps forked-process stdout as "[info] ..." and appends a
// "[success] Total time..." line AFTER the program's last line — which is
// why every BENCH_r*.json so far has `parsed: null`: no raw JSON line ever
// reached the driver. StdoutOutput passes the forked process's streams
// through untouched, and showSuccess/showTiming=false drop the trailing
// [success] line, so the program's final println IS the process's final
// stdout line.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / showTiming := false
// consumed by sbt commands, not tasks — lintUnused false-positives
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  // a bench/verify run compiles generated code for ~80 query plans; the
  // default 240m code cache fills, the JIT shuts off, and later queries
  // run interpreted (observed 6-10x slowdowns that worsen over a run)
  "-XX:ReservedCodeCacheSize=1g",
)
