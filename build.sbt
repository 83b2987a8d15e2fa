ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datapipelinespark"
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
// The driver greps `runMain graft.Bench`'s stdout for the one-line
// result JSON. Through sbt's default LoggedOutput every forked-process
// line gets an `[info] ` prefix and sbt appends its own `[success]
// Total time …` line after it — so the JSON is neither the last stdout
// line nor does any line start with `{`, and the driver records
// "parsed": null. StdoutOutput streams the forked process's stdout raw
// (Spark logs go to stderr and are unaffected), and showSuccess drops
// the trailing [success] line, making the JSON the final raw stdout
// line exactly where a parser looks for it.
run / outputStrategy := Some(StdoutOutput)
showSuccess := false
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
  // JDK 17 GCLocker retry starvation: 32 task threads reading spill
  // files through NIO (JNI critical sections pin the GCLocker) while
  // others allocate makes tiny allocations fail after the default TWO
  // retries — the round-15 streaming pressure sweep saw spill-heavy
  // st8 die with java.lang.OutOfMemoryError "allocating 3 words" on an
  // 8 GiB heap that was mostly free (STRESS_spill_r15_streaming.json;
  // the log's GCLocker warnings name the mechanism). The standard
  // mitigation until the GCLocker's JDK-21+ removal (the knob is
  // diagnostic, hence the unlock):
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
)
