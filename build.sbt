ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "financialdatasciencespark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. By default sbt wraps forked output with an `[info] ` prefix
// and appends a `[success] Total time: ...` trailer, so the otherwise
// correct final JSON line never reaches the parser verbatim.
// StdoutOutput passes the forked process's stdout through unprefixed;
// showSuccess := false drops the trailer.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
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
  // local[32] runs 32 concurrent tasks in ONE JVM: an 8g heap caused
  // multi-second GC stalls (observed as 10s RPC timeouts) once a long
  // bench run accumulated cached blocks. The box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Catalyst whole-stage codegen emits hundreds of generated classes over
  // a 76-query run; the JDK default 240 MB JIT code cache fills mid-run,
  // the JIT stops compiling, and later queries run partly interpreted
  // (measured: the same query 4-30x slower late in a session). 1 GB keeps
  // every hot loop compiled for the whole catalog.
  "-XX:ReservedCodeCacheSize=1g",
  // Spark's Janino source->class cache holds only 100 entries by default
  // (static conf): the 88-query catalog emits several codegen units per
  // plan, so a full bench pass evicts everything and EVERY pass
  // re-compiles every query (~1.3 s per pass for the widest plans).
  // Measured with 5000 entries: full-catalog bench 48.0 s -> 34.6 s,
  // every query faster, none slower. Heap cost is bounded (weak-ref'd
  // generated classes) and the 1 GB JIT cache above keeps them compiled.
  "-Dspark.sql.codegen.cache.maxEntries=5000",
) ++ sys.env.get("EXTRA_JAVA_OPTS").toSeq.flatMap(_.split("\\s+"))
