package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-query timing harness for local iteration:
  * `sbt "runMain graft.QueryBench q_containment [samples]"` (first arg
  * may be a comma-separated list of verify-query names).
  * Same methodology as [[Bench]] — warmup pass at sf0.001, then
  * min-of-N at SPARK_GRAFT_SF_DIR with every output column forced
  * through one xxhash64 aggregate — so numbers here predict what the
  * full bench will record, without paying for the other ~150 queries. */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(sys.error("usage: QueryBench <query>[,<query>...] [samples]"))
    val samples = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.select(xxhash64(df.columns.map(col): _*).as("h"))
        .agg(expr("bit_xor(h)")).head()
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
        try force(fn(spark, warmDir)) catch { case _: Throwable => () }
      val times = (1 to samples).map { _ =>
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QUERYBENCH $name: min ${times.min}%.3f s " +
        f"(samples ${times.map(t => f"$t%.3f").mkString(", ")}) at $sfDir")
    }
    spark.stop()
  }
}
