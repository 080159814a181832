package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plan.TimeContext

/** Example driver: registers the `events` test table as a metric and runs
  * dialect queries through the public engine API. Doubles as a manual
  * verification surface (`sbt "runMain graft.Demo"`). */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev     = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val engine = new GraftEngine(spark)
    // integer division: float division loses precision on epoch-nanos (> 2^53)
    engine.registerMetric("tsdb", "prod", "events", ev,
      expr("ts div 1000000"), col("value"),
      tags = Set("event_type", "user_id"), drop = Set("ts"))

    implicit val tc: TimeContext = TimeContext(1706657176221L)

    def show(q: String): Unit = {
      println(s"\n>>> $q")
      engine.sql("tsdb", "prod", q) match {
        case Right(df) => df.show(6, truncate = false)
        case Left(err) => println(s"ERROR: $err")
      }
    }

    show("select * from events where value > 190 order by event_id limit 3")
    show("select count(*), sum(*), avg(*) from events")
    show("select sum(value) from events group by event_type order by value desc")
    show("select count(distinct user_id) from events")
    show("select count(*) from events where timestamp > now - 10 d group by interval 1 d")
    show("select first(value) from events group by event_type order by event_type limit 3")
    show("select distinct event_type from events")
    // error paths
    show("select sum(value) from events group by props")
    show("select nope from events")
    show("select sum(value from events")
    show("select count(*) from events since 1 h")

    println("\nPLAN CHECK (pushdown):")
    engine.sql("tsdb", "prod", "select event_id from events where value > 190")
      .foreach(_.explain("formatted"))

    // ---- warehouse lifecycle: insert → query → shard pruning → delete → drop
    val root = java.nio.file.Files.createTempDirectory("graft_demo_wh_").toString
    val whEngine = new GraftEngine(spark, root)
    def wsql(q: String): Unit = {
      println(s"\nWH> $q")
      whEngine.sql("db", "ns", q) match {
        case Right(df) => df.show(10, truncate = false)
        case Left(err) => println(s"ERROR: $err")
      }
    }
    wsql("insert into cpu ts=86400100 dim(host=web1) tags(region=eu) val=0.71")
    wsql("insert into cpu ts=86400200 dim(host=web2) tags(region=us) val=0.42")
    wsql("insert into cpu ts=172800300 dim(host=web1) tags(region=eu) val=0.99")
    wsql("select * from cpu order by timestamp")
    wsql("select sum(value) from cpu group by region order by region")
    println("\nSHARD PRUNING CHECK (expect a single shard partition):")
    whEngine.sql("db", "ns", "select * from cpu where timestamp in (86400000, 86500000)")
      .foreach { df =>
        val files = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
        println("plan reads shard=1 only: " + (files.contains("shard") && !files.contains("shard=2")))
        df.show(5, truncate = false)
      }
    wsql("delete from cpu where value > 0.9")
    wsql("select * from cpu order by timestamp")
    whEngine.command("db", "ns", graft.sql.Ast.ShowMetrics).foreach(m => println(s"metrics: $m"))
    wsql("drop metric cpu")
    wsql("select * from cpu")
    spark.stop()
  }
}
