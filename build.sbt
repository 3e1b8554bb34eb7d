ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "redmapspark"
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
  // 16g default on the 128 GiB driver box: the 65-query bench loop at
  // local[32] ran GC-pressured at 8g (VERDICT r2 finding #1 listed heap
  // pressure among the cross-query inflation suspects).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // JDK17 reserves 240 MB of JIT code cache. 76 queries compile
  // thousands of generated classes; once the cache fills, HotSpot stops
  // compiling (flushing buys little under continuous churn) and late
  // queries with the widest generated stages run partly interpreted —
  // the prime suspect for sim_knn_graph timing 5.8x its isolated cost
  // ONLY inside the full suite (VERDICT r3 finding #1).
  "-XX:ReservedCodeCacheSize=1g",
)
// Ad-hoc forked-JVM flags (e.g. -Dspark.graft.broadcast.rowCap=0 to
// drive the SizeGate degraded path through Verify/Bench at real SFs).
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_OPTS")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
