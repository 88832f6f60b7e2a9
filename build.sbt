ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduceassignmentsspark"
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
// Pass the forked JVM's stdout straight through (no "[info] " log prefix):
// Bench prints one machine-parseable JSON line that must survive verbatim.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
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
  // A full gate/bench run compiles ~1500 stages of whole-stage-codegen
  // classes; at the JVM's default 240 MB ReservedCodeCacheSize the JIT
  // silently stops compiling mid-suite and later CPU-dense queries run
  // interpreted at ~3x cost (measured: the 47-query 100x prefix fell
  // 339 s -> 215 s total, q_lm_score_bounded 62 s -> 34.8 s — its
  // isolated-run value — with this flag alone). 1 GB is reserved
  // address space, not resident memory.
  "-XX:ReservedCodeCacheSize=1g",
) ++
  // ad-hoc profiling/tuning flags for a forked run (e.g. event logs:
  // SPARK_GRAFT_EXTRA_JAVA_OPTS="-Dspark.eventLog.enabled=true
  // -Dspark.eventLog.dir=/tmp/sparklogs") — empty in normal runs.
  // LIMITATION: flags are split on single spaces, so a flag VALUE may not
  // contain spaces (no shell-style quoting) — point such values at
  // space-free paths instead.
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
    .map(_.split(" ").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
