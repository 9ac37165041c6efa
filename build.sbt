ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datasketchesspark"
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
  // the bench sweeps ~60 distinct codegen'd plans x 6 iterations; the
  // default 240m JIT code cache flushes hot compiled methods between a
  // query's visits, so later sweeps re-run interpreted (2-4x medians)
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // ad-hoc profiling hook: GRAFT_EXTRA_JAVA_OPTS="-Dspark.eventLog.enabled=true ..."
  // lets a measurement run turn on Spark event logs (or any -D) without
  // touching the bench harness or the driver contract
  sys.env.get("GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))

// Pass forked-run stdout through unprefixed: the bench/verify harness
// emits one machine-parsed JSON line, and sbt's default LoggedOutput
// decorates it with "[info] ", breaking downstream json parsing.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
