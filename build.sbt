ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "remoteshufflespark"
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
// Per-test durations in the output (-oD): the suite's wall budget is a
// driver-facing contract (VERIFY tests_ok timed out in r13) — every run
// should show where the time goes so slow tests are caught when added.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// KryoSpec and CodecSpec build their own SparkSessions with context-level
// core settings (serializer / shuffle codec + encryption) — one SparkContext
// per JVM, so each runs in its own forked test JVM while every other suite
// shares the default-session JVM.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val (kryo, rest0) = tests.partition(_.name.contains("KryoSpec"))
  val (codec, rest1) = rest0.partition(_.name.contains("CodecSpec"))
  // SweepTmmSpec constrains the memory manager (spark.testing.memory) —
  // context-level, so it gets its own JVM like the serializer suites
  val (sweepTmm, rest) = rest1.partition(_.name.contains("SweepTmmSpec"))
  Seq(
    Tests.Group("kryo", kryo,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))),
    Tests.Group("codec", codec,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))),
    Tests.Group("sweepTmm", sweepTmm,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))),
    Tests.Group("default", rest,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))),
  ).filter(_.tests.nonEmpty)
}
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
  // Whole-stage codegen emits a new class per (query, stage); the JVM default
  // 240m code cache fills after ~25 query executions in one session, the JIT
  // shuts off, and everything runs interpreted (observed 10-30x per-query
  // slowdowns in graft.Bench). Size it so long sessions stay compiled.
  "-XX:ReservedCodeCacheSize=2g",
  "-XX:+UseCodeCacheFlushing",
)
