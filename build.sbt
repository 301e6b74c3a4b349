ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hillviewspark"
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
// Re-emit the bench JSON as the true LAST stdout line of the sbt process
// (r15 verdict #1). The perf driver tail-parses the stdout of
// `sbt "runMain graft.Bench"` for the one-line bench JSON, but sbt prints
// its "[success] Total time: ..." footer AFTER the forked program's
// output, so the last line has never been the JSON and the driver's
// per-query comparison (PERF per_query / scaling) has been empty since
// ~r12. sbt offers no post-footer hook, but a JVM shutdown hook fires
// after all command processing — including the footer — so it can print
// the JSON as the genuinely final line. The hook stays completely silent
// unless THIS invocation (re)wrote a bench_out*.json (mtime >= sbt JVM
// start): compile/test/probe invocations emit nothing, the "[success]"
// footers that success-greps may rely on are untouched, and the JSON
// printed is byte-identical to the one the Bench main already printed
// and persisted — a reporting-visibility fix, not a measurement change.
val benchJsonTailHook: Unit = {
  val sbtStart = System.currentTimeMillis()
  java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
    try {
      val fresh = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("bench_out") &&
          f.getName.endsWith(".json") && f.lastModified() >= sbtStart)
      if (fresh.nonEmpty) {
        val line = new String(java.nio.file.Files.readAllBytes(
          fresh.maxBy(_.lastModified()).toPath), "UTF-8").trim
        if (line.startsWith("{") && line.endsWith("}")) {
          System.out.println(line)
          System.out.flush()
        }
      }
    } catch { case _: Throwable => () }
  }))
}
