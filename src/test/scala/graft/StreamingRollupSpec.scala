package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Rollup
import graft.streaming.{StatefulMonitors, StreamingRollup}

case class RollEv(k: String, ts: Long, v: Double)
case class JoinEv(k: String, ts: Timestamp, tag: String)

/** Streaming rollup maintenance (segment log = incremental facet upkeep)
  * and the watermarked stream-stream interval join. */
class StreamingRollupSpec extends SparkTestBase {

  import spark.implicits._

  private val events = Seq(
    RollEv("x", 5L, 2.0), RollEv("x", 9L, 4.0), RollEv("y", 25L, 7.0),
    RollEv("x", 7L, 6.0), RollEv("y", 12L, 1.0), RollEv("x", 21L, 3.0))

  "StreamingRollup.maintain" should "converge the segment log to a full batch recompute" in {
    implicit val sqlc = spark.sqlContext
    val input = MemoryStream[RollEv]
    val dir   = Files.createTempDirectory("graft_roll_").toString
    val stats = s"$dir/stats"
    val q = StreamingRollup.maintain(input.toDF(), Seq("k"), "ts", "v", 10L,
      stats, s"$dir/cp", flushIntervalMs = 50L)
    try {
      input.addData(events.take(3): _*); q.processAllAvailable()
      input.addData(events.drop(3): _*); q.processAllAvailable()
      val streamed = Rollup.serve(StreamingRollup.read(spark, stats))
        .orderBy("k", "bucket").collect().map(_.toSeq)
      val full = Rollup.serve(Rollup.build(events.toDF("k", "ts", "v"), Seq("k"), "ts", "v", 10L))
        .orderBy("k", "bucket").collect().map(_.toSeq)
      streamed shouldBe full
      // compaction folds segments without changing the answer
      StreamingRollup.compact(spark, stats)
      Rollup.serve(StreamingRollup.read(spark, stats))
        .orderBy("k", "bucket").collect().map(_.toSeq) shouldBe full
      // a replayed (duplicate) segment under the same batch id is dropped
      spark.read.parquet(stats).filter(col("__batch") === -1L).limit(1)
        .write.mode("append").parquet(stats)
      Rollup.serve(StreamingRollup.read(spark, stats))
        .orderBy("k", "bucket").collect().map(_.toSeq) shouldBe full
    } finally q.stop()
  }

  it should "recover a crash between the compaction renames" in {
    val dir   = Files.createTempDirectory("graft_rollrec_").toString
    val stats = s"$dir/stats"
    Rollup.build(events.toDF("k", "ts", "v"), Seq("k"), "ts", "v", 10L)
      .withColumn("__batch", lit(0L)).write.parquet(stats)
    val expect = Rollup.serve(StreamingRollup.read(spark, stats))
      .orderBy("k", "bucket").collect().map(_.toSeq)
    // simulate: log moved aside, promote never happened
    new java.io.File(stats).renameTo(new java.io.File(stats + ".old")) shouldBe true
    StreamingRollup.recover(stats)
    Rollup.serve(StreamingRollup.read(spark, stats))
      .orderBy("k", "bucket").collect().map(_.toSeq) shouldBe expect
  }

  "StatefulMonitors.enrichWithin" should "join right rows inside the lookback, same key only" in {
    implicit val sqlc = spark.sqlContext
    val convs   = MemoryStream[JoinEv]
    val touches = MemoryStream[JoinEv]
    val cp = Files.createTempDirectory("graft_ssj_").toString
    val joined = StatefulMonitors.enrichWithin(
      convs.toDF(), touches.toDF(), "k", "ts", lookbackMs = 5000L)
    val q = joined.writeStream.format("memory").queryName("ssj").outputMode("append")
      .option("checkpointLocation", s"$cp/cp").start()
    try {
      def t(ms: Long) = new Timestamp(ms)
      touches.addData(
        JoinEv("u1", t(1000), "ad"),    // inside the 5 s lookback of conv@4000
        JoinEv("u1", t(8000), "ad2"),   // AFTER the conversion: no match
        JoinEv("u2", t(3000), "ad"))    // other key: no match
      convs.addData(JoinEv("u1", t(4000), "buy"))
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .select(col("k"), col("left_row.tag"), col("right_row.tag")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      rows shouldBe Array(("u1", "buy", "ad"))
    } finally q.stop()
  }
}
