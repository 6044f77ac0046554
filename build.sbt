ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "phenoxtractspark"
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
// Forked run output goes straight to stdout (no "[info] " decoration) —
// the bench/verify JSON lines must be machine-parseable from the log.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress sbt's trailing "[success] Total time: …" line so the bench
// JSON line is the LAST line of stdout (the driver parses the tail).
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // The 150+-query bench/verify mains load thousands of janino-generated
  // classes in one JVM. The default MetaspaceSize high-water mark
  // (~21 MB) makes EVERY expansion past it trigger a G1 concurrent
  // cycle — observed as a class-unloading GC storm (a concurrent cycle
  // every ~3 s, 6 marking threads busy, late queries 10-40x slower the
  // longer the JVM lives). A high initial threshold defers the first
  // metaspace-triggered cycle past anything the suite actually loads.
  "-XX:MetaspaceSize=2g",
)
