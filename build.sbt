ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "quickstreamspark"
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
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the logger prefixes every line with "[info] ", which breaks any caller
// that greps a bare JSON line out of `sbt runMain graft.Bench` output
// (every BENCH_r*.json so far has "parsed": null for exactly this reason).
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 531-query board compiles enough whole-stage-codegen classes to
  // run the segmented code cache at ~75% of the JDK-17 default 240 MB
  // (Bench prints a [bench-jit] report) — sweeping hot methods under
  // that pressure reads as a broad ~1.1-1.3x per-query drift. Headroom
  // is cheap: the cache is reserved, committed only as used.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // Dev affordance: extra JVM flags for the forked run (e.g.
  // -Dspark.eventLog.enabled=true to capture an event log for a perf
  // investigation) without editing this file. Spark reads spark.* system
  // properties into the session conf. Unset in normal/driver runs.
  sys.env.get("GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split("\\s+"))
