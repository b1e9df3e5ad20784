ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "casscdcpgspark"
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
// The driver parses the LAST line of `sbt "runMain graft.Bench"` stdout
// as JSON. Two sbt decorations break that: the logger prefixes every
// forked-process line with `[info] `, and the `[success] Total time …`
// epilogue displaces the headline from last place. StdoutOutput passes
// the forked JVM's stdout through RAW (no logger, no prefix);
// showSuccess drops the epilogue.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // The container's nameserver blackholes (zero egress); any lookup that
  // escapes /etc/hosts stalls Spark RPC for minutes. Cache negative DNS
  // results forever and prefer IPv4 loopback.
  "-Dsun.net.inetaddr.negative.ttl=-1",
  "-Djava.net.preferIPv4Stack=true",
  // local[32] on a 128 GiB box: 8g thrashes GC on the shuffle-heavy
  // queries (measured 5-10x slowdowns); 48g leaves headroom for the
  // driver-side tooling.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
