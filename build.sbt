ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mspr2backspark"
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
// Forked-run stdout passes through VERBATIM (default LoggedOutput prefixes
// every line with "[info] ", which broke the driver's bench-JSON line parse
// for eight straight rounds — BENCH_r0*.json parsed:null): the driver needs
// Bench's bare one-line JSON exactly as printed.
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
)
// Xms == Xmx everywhere: G1 never uncommits, so heap pages fault in ONCE.
// This box class has pathological anonymous-memory first-touch (measured
// round 7: 650 MB/s single-thread collapsing to 53 MB/s under 8-way
// concurrent faulting) — letting the heap shrink and re-expand re-pays
// that cost inside timed queries.
//
// Heap SIZE is scoped per task (round-9 finding): committing+pre-touching
// a 32 GiB heap is itself what flips this box into its reclaim storm —
// back-to-back full benches measured first-touch at 66-74 MB/s with a 32g
// heap and 940 MB/s with a 12g one in the same hour, and the 12g run was
// the round's first all-reps-clean artifact (BENCH_LOCAL_r09). The
// run-scope mains (Bench/Verify, cache cleared per query) get 12g; the
// test suite keeps 32g (many concurrent suites share the JVM).
def heapOpts(defaultGb: String): Seq[String] = {
  val m = sys.env.getOrElse("SPARK_DRIVER_MEM", defaultGb)
  Seq(s"-Xmx$m", s"-Xms$m")
}
run / javaOptions ++= heapOpts("12g")
Test / javaOptions ++= heapOpts("32g")
