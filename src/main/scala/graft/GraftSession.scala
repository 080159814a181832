package graft

import org.apache.spark.sql.SparkSession

/**
 * Recommended session configuration for the engine. Encodes the tuning the
 * operators assume:
 *
 *  - shuffle partitions sized to the executor core count (the Spark default
 *    of 200 is wrong for small clusters and far too low at 100 TB — size to
 *    2–3× total cores in production)
 *  - AQE on (runtime coalescing + skew-join splitting)
 *  - nanosecond parquet timestamps surfaced as longs (the engine's
 *    timestamp encoding is epoch millis in a long)
 *  - the native graft functions injected for every session incl. pure SQL
 */
object GraftSession {

  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftSparkExtensions")

  /** local development/test session. */
  def local(cores: Int = 4): SparkSession = {
    val s = builder(cores).master(s"local[$cores]").config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
