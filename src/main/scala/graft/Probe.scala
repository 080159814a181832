package graft

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostics main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("events", "lineitem", "orders", "documents", "embeddings")) {
      try {
        val df = spark.read.parquet(s"$dir/$t.parquet")
        println(s"== $t: ${df.schema.simpleString}")
        df.show(3, 60, vertical = false)
      } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(500)}") }
    }
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.select(min(col("ts")), max(col("ts")), count(lit(1))).show(false)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    li.select(min(col("l_shipdate")), max(col("l_shipdate"))).show(false)
    // null counts per table
    for (t <- Seq("events", "lineitem", "orders", "documents")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      val nc = df.select(df.columns.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c)).toIndexedSeq: _*)
      println(s"-- nulls in $t"); nc.show(false)
    }
    spark.stop()
  }
}
