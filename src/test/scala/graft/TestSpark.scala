package graft

import org.apache.spark.sql.SparkSession

/** One shared session for every suite: suites run sequentially in a single
  * forked JVM and SparkSession.getOrCreate returns the first-built session,
  * so per-suite configs would silently depend on suite order. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    JsonFunctions.registerAll(s)
    s
  }
}
