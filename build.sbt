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
// ... and sbt's own "[success] Total time: ..." footer must not print AFTER
// the JSON line (round-9 finding: the footer trailed the bare JSON, so the
// driver's "last stdout line" parse still yielded parsed:null). With
// showSuccess off, the JSON/GRAFT_BENCH_SUMMARY lines are the final stdout.
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by another setting —
// exclude it from the unused-key lint so load stays warning-free.
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
// Run-scope heap is CLAMPED (round-9 verdict #1): the driver environment
// supplies SPARK_DRIVER_MEM=89g-class values, which re-created the very
// reclaim storm the 12g default was chosen to avoid (BENCH_r09: heap_gb 89,
// pretouch 64.8 MB/s, rep_storm all true). An env request above the ceiling
// is ignored unless SPARK_GRAFT_ALLOW_BIG_HEAP=1 explicitly opts in; the
// resulting heap_gb is stamped into every bench artifact, so a clamp is
// machine-visible. The test scope keeps the env override un-clamped: many
// concurrent suites share one JVM and a too-small heap there just OOMs.
def parseGb(v: String): Double = {
  val t = v.trim.toLowerCase
  val digits = t.takeWhile(c => c.isDigit || c == '.')
  val n =
    try digits.toDouble
    catch { case _: NumberFormatException => return Double.MaxValue }
  t.drop(digits.length) match {
    case "g" | "gb" | "" => n
    case "m" | "mb"      => n / 1024.0
    case "k" | "kb"      => n / (1024.0 * 1024.0)
    case _               => Double.MaxValue // unparseable => treat as too big
  }
}
val runHeapCapGb = 16.0
def heapOpts(defaultGb: String, capGb: Option[Double]): Seq[String] = {
  val allowBig = sys.env.get("SPARK_GRAFT_ALLOW_BIG_HEAP").contains("1")
  val m = sys.env.get("SPARK_DRIVER_MEM") match {
    case Some(r) if allowBig || capGb.forall(parseGb(r) <= _) => r
    case Some(r) =>
      println(s"[build] SPARK_DRIVER_MEM=$r exceeds run-scope cap " +
        s"${capGb.get.toInt}g; clamping to $defaultGb " +
        "(set SPARK_GRAFT_ALLOW_BIG_HEAP=1 to override)")
      defaultGb
    case None => defaultGb
  }
  Seq(s"-Xmx$m", s"-Xms$m")
}
run / javaOptions ++= heapOpts("12g", Some(runHeapCapGb))
Test / javaOptions ++= heapOpts("32g", None)
