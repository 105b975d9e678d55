ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "metaiterativemapreducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites must run sequentially: SparkSpec.planOnly and the streaming
// specs mutate JVM-global state (Exec.planOnlyHook, session conf)
// around the shared SparkSession. Forked sbt tests run suites
// sequentially by default; pin it so enabling a parallel runner can't
// silently break that invariant.
Test / parallelExecution := false
run / fork := true
// Emit the forked JVM's stdout RAW instead of through sbt's logger:
// the driver parses the bench JSON line from captured stdout, and the
// logger's "[info] " prefix broke that parse in rounds 1-3
// (BENCH_r0{1,2,3}.json all record parsed=null).
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
  // A 351-query single-JVM bench sweep generates thousands of
  // whole-stage-codegen classes; the JDK 17 default 240 MB code cache
  // can fill ("CodeCache is full. Compiler has been disabled."), after
  // which regex/expression-heavy map stages run INTERPRETED — the
  // round-11 driver-box signature (q249 0.43→12 s with untouched
  // code). Reserved ≠ committed, so the larger reservation costs
  // nothing until used. Bench.scala logs per-pool occupancy to the
  // mirror so a recurrence is diagnosable from artifacts.
  "-XX:ReservedCodeCacheSize=1g",
  // 32 executor threads doing direct-buffer/JNI-critical parquet and
  // shuffle I/O under allocation pressure starve G1's GCLocker: the
  // JDK default retries an allocation only twice around a locked GC
  // epoch before throwing a SPURIOUS OutOfMemoryError with free heap
  // remaining ("Retried waiting for GCLocker too often" immediately
  // precedes every such OOM — the r13 sf10 rehearsal hit it at 8, 16
  // AND 24 GiB on a working set that fits in 8). More retries cost
  // nothing when the locker isn't contended.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
