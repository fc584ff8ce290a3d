ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tankerspark"
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
  // local[32] with cached signature/vector frames + 32 concurrent
  // shuffle tasks GC-thrashes an 8g heap; the box has 125 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Bench calls System.gc() between timed queries so the
  // ContextCleaner reclaims dead checkpoint/broadcast blocks before
  // they force a stop-the-world full GC mid-query; make that call a
  // concurrent cycle instead of a full STW pause
  "-XX:+ExplicitGCInvokesConcurrent",
)

// Per-suite wall-clock in the test report (ScalaTest -oD), so slow
// suites are visible in any captured log.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")

// The suite is LATENCY-bound, not CPU-bound: a full sequential run
// measures ~17 min wall but only ~22 min user on 32 cores (~1.3 cores
// busy) — hundreds of tiny Spark jobs and parquet round-trips, each
// waiting on scheduling or file IO. Forked JVM GROUPS run suites in
// parallel with full isolation: each group gets its own JVM and hence
// its own SparkSession, which keeps the session-conf mutations
// (BrinSpec/TxnSpec `spark.graft.brin.zones`, OpsSpec scratchDir
// toggles) and the Dedup/Sample process-global caches private to a
// group. Suites within a group still run sequentially. Groups are
// balanced by measured suite duration (-oD report).
Test / testGrouping := {
  val tests = (Test / definedTests).value
  // smaller per-group heap: each JVM hosts a subset of the suites (the
  // whole suite fit one 32g heap with room to spare)
  val opts = (Test / javaOptions).value.toVector
    .filterNot(_.startsWith("-Xmx")) :+
    s"-Xmx${sys.env.getOrElse("SPARK_GRAFT_TEST_MEM", "10g")}"
  val groupOf = Map(
    "OpsSpec" -> "ops",
    "PipelineOpsSpec" -> "pipeline", "PlanSpec" -> "pipeline",
    "CliSpec" -> "cli", "WebSpec" -> "cli",
    "TxnSpec" -> "store", "BrinSpec" -> "store",
    "BucketSpec" -> "store", "ConcurrencySpec" -> "store",
    "StreamingSpec" -> "sources", "PropertySpec" -> "sources",
    "CorpusSpec" -> "sources", "WarcSpec" -> "sources",
  ).withDefaultValue("relational") // Expr/Read/Write/Acl/Types/Time
  tests.groupBy(t => groupOf(t.name.split('.').last)).map { case (g, ts) =>
    Tests.Group(g, ts,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }.toSeq
}

// sbt caps concurrently-running forked test groups at 1 by default;
// allow the six groups to actually run side by side.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(math.max(8, java.lang.Runtime.getRuntime.availableProcessors)),
)
