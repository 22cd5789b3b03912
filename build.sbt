ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wrenenginespark"
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
// The perf driver captures only the LAST ~2000 chars of `sbt "runMain
// graft.Bench"` output and parses the final JSON line. sbt's default forked-run
// output strategy (LoggedOutput) routes the child's stdout through the logger,
// prefixing every line with "[info] " — which defeated that parser in every
// round to date (BENCH_r01–r15 all stamp `parsed: null`). StdoutOutput hands
// the forked JVM the real stdout, so graft.Bench's println-last compact line
// lands raw; sbt's own "[success] ..." trailer (~80 chars) still follows it,
// which the 2000-char tail budget in Bench.scala accounts for.
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
  // The default is PINNED at 32g: round-13's three same-binary bench runs
  // silently differed 8g vs 90g driver heap, and the perf gate could not tell
  // regression from configuration. graft.Bench records the actual heap and
  // stamps `driver_mem_pinned:false` when a run overrides this.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
