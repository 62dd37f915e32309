package graft

import org.apache.spark.sql.SparkSession

/** One shared session for every suite: suites run sequentially in a single
  * forked JVM and SparkSession.getOrCreate returns the first-built session,
  * so per-suite configs would silently depend on suite order. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4)
}
