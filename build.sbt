ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gigapiquerierspark"
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
// forked runMain output goes straight to stdout, WITHOUT sbt's
// "[info] " line prefix — the driver machine-parses Bench's one-line
// JSON record, and the prefix was defeating its line match every round
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and sbt's closing "[success] Total time: ..." banner printed AFTER
// the forked process exits was still defeating a tail-line parse of that
// record. Suppress it so the JSON line is the LAST line of stdout.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not another task —
// exclude it from the unused-key lint so batch output stays clean
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
  // 24g default on the 128 GiB container: the 8-way concurrent bench
  // pass accumulates localCheckpoint blocks + shuffle buffers across
  // 127 queries, and an 8g heap GC-thrashes exactly in that last pass
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Xms = Xmx: ZGC allocation stalls on heap GROWTH showed up as
  // multi-second spikes on checkpoint-heavy queries (q89 seq 2.6 s →
  // 7.6 s in the r10 sweep); pre-committing removes the growth path
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // single-JVM local[32] runs the DRIVER's scheduling loop and 32
  // executor threads in one process: G1's pauses block job dispatch,
  // which is the measured bottleneck of the 8-way concurrent bench
  // pass (machine ~30% busy, wall = Σconc/admission). ZGC's sub-ms
  // pauses cut the same suite's concurrent wall 25.0 s → 18.2 s
  // (SCALE.md round-10 notes) at a ~10% seq-throughput tax.
  // SPARK_GRAFT_GC=g1 flips to G1 for A/B runs — JDK 17's ZGC is
  // non-generational and can allocation-stall under explode-heavy
  // allocation rates (the round-10 seq storm hypothesis; the bench's
  // census now counts those stalls from the GC log either way).
  sys.env.getOrElse("SPARK_GRAFT_GC", "zgc") match {
    case "g1" => "-XX:+UseG1GC"
    case _    => "-XX:+UseZGC"
  },
  // ~171 queries × several Janino codegen units × 3 passes exhaust
  // the default 240 MB JIT code cache in whichever pass runs LAST —
  // compilation stops and CPU-light queries inflate 5–10× (measured:
  // q93 conc 10.2 s → 0.7 s with the larger cache)
  "-XX:ReservedCodeCacheSize=1g",
  // GC log DEFAULT-ON (round-10 verdict ask): a bench record whose
  // wall might be a GC pathology must carry its own GC evidence —
  // Bench's census parses this file per pass for ZGC allocation /
  // relocation stalls and publishes the counts in the record. The
  // forked JVM's cwd is the project base, so the default lands in
  // the gitignored target/. %p expands to the JVM's pid (verified
  // bare-pid on 17.0.20; Bench expands it the same way), giving
  // every forked JVM its OWN file — round-11 advice: a shared path
  // let concurrent forks (tests beside a bench) truncate/interleave
  // the log and corrupt the census's byte-offset windows.
  // Override: SPARK_GRAFT_GCLOG=/path (may itself contain %p).
  s"-Xlog:gc*:file=${sys.env.getOrElse("SPARK_GRAFT_GCLOG", "target/gc-%p.log")}:time,uptime",
)
