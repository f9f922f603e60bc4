ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "apitoamtdatalakespark"
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
// Per-suite timing reports (target/test-reports/TEST-*.xml): the evidence
// for balancing the forked test groups below.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-u", "target/test-reports")
// Forked test GROUPS, run in parallel: the serial suite crossed the
// driver's sbt-test window (~24-27 min; VERIFY_r12 tests_ok:false with
// zero failures in the tail). Suites are packed into six groups balanced
// by measured wall time (test-reports), each a separate JVM with the
// session's local[4] — 6 groups x 4 cores fits the 32-core box. Every
// suite still runs with all assertions; only the packaging changed.
// Weights = measured wall under 6-way contention (the regime that
// matters), LPT-packed; the first 6-way run's straggler was the default
// group because PlanSpec costs ~741 s contended, not the ~24 s a partial
// report suggested. Max bin ≈ QueriesSpec alone (834 s contended, and it
// gets the tail's idle cores) — measured full-suite wall 17:01 before
// this rebalance, ~14 min after.
val testGroupOf: String => String = {
  val explicit = Map(
    "graft.QueriesSpec" -> "g1-queries",      // 834 s contended
    "graft.VerifySpec" -> "g2-verify",        // 744 s
    "graft.BehaviorSpec" -> "g2-verify",      //  17 s
    "graft.PlanSpec" -> "g3-plan",            // 741 s
    "graft.MultimodalSpec" -> "g3-plan",      //   9 s
    "graft.LakeSpec" -> "g3-plan",            //   1 s
    "graft.AmtViewsSpec" -> "g4-views",       // 597 s
    "graft.PropertySpec" -> "g4-views",       // 130 s
    "graft.BloomSpec" -> "g4-views",          //  24 s
    "graft.DedupSpec" -> "g5-dedup",          // 564 s
    "graft.TextOpsSpec" -> "g5-dedup",        // 153 s
    "graft.SimilaritySpec" -> "g5-dedup",     //  59 s
  )
  // rest: WebGraph 342, Ops 255, Ranks 72, Streaming 63, Sampling 46,
  // Ingest ~0 — ≈ 778 s
  name => explicit.getOrElse(name, "g6-graph")
}
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val base = ForkOptions()
    .withWorkingDirectory(Option((Test / baseDirectory).value))
    .withOutputStrategy((Test / outputStrategy).value)
    .withEnvVars((Test / envVars).value)
  (Test / definedTests).value.groupBy(t => testGroupOf(t.name)).map {
    case (group, tests) =>
      // per-group warehouse/derby dirs: suites used to share one JVM
      // sequentially; in parallel each group gets its own on-disk state
      Tests.Group(group, tests, Tests.SubProcess(base.withRunJVMOptions(
        opts ++ Vector(
          s"-Dspark.sql.warehouse.dir=target/warehouse-$group",
          s"-Dderby.system.home=target/derby-$group"))))
  }.toSeq
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(16),
)
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
