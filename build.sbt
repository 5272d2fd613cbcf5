ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoopwebbrowsinglogsspark"
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
// The bench driver parses the metric JSON line from the tail of the sbt
// output. sbt's default LoggedOutput prefixes every forked-stdout line
// with "[info] ", which defeats a parser expecting a raw JSON line —
// pass the child's stdout/stderr through untouched instead, and drop
// the "[success] Total time" epilogue so the metric line printed by
// graft.Bench is the last thing on stdout.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // This box's ext4 serializes concurrent file creates/deletes badly:
  // with shuffle.partitions=32 <= bypassMergeThreshold (200), every SQL
  // exchange took BypassMergeSortShuffleWriter's 32-temp-files-per-map
  // path = ~1k creates per shuffle, and thread dumps showed all 32
  // executor threads RUNNABLE inside FileOutputStream.open0 /
  // File.exists — q131 (15 shuffles/run) measured 5-60s of which <1s
  // was compute. Shuffle scratch goes to tmpfs and the bypass path is
  // disabled; both match real-cluster behavior (clusters run hundreds
  // of reduce partitions, far past the bypass threshold, on fast local
  // disks). Measured: q131 5-60s noisy -> 3.9-5.0s stable.
  "-Dspark.local.dir=/dev/shm/spark-local",
  "-Dspark.shuffle.sort.bypassMergeThreshold=1",
)
