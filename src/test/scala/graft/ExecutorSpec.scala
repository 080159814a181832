package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

import graft.plan.TimeContext

/**
 * End-to-end query specs over a small fixture (same spirit as the
 * reference's ReadCoordinator specs over `mockedData/MockedData.scala`:
 * records at timestamps 1..10, a string tag, a numeric dimension).
 */
class ExecutorSpec extends SparkTestBase {

  import spark.implicits._

  private implicit val tc: TimeContext = TimeContext(10000L)

  // (timestamp, value, name dim, surname dim, country tag, age tag)
  private lazy val fixture = Seq(
    (1000L, 1.5, "john", "doe", "uk", 15L),
    (2000L, 2.5, "frank", "poe", "it", 15L),
    (4000L, 3.5, "frankie", "poe", "it", 20L),
    (6000L, 4.5, "john", "doe", "fr", 20L),
    (8000L, 5.5, "jack", "doe", "it", 30L),
    (10000L, 6.5, "fred", null, "uk", 30L)
  ).toDF("timestamp", "value", "name", "surname", "country", "age")

  private lazy val engine: GraftEngine = {
    val e = new GraftEngine(spark)
    e.registerMetric("db", "ns", "people", fixture, col("timestamp"), col("value"),
      tags = Set("country", "age"))
    e
  }

  private def run(q: String): Seq[Row] =
    engine.sql("db", "ns", q).fold(err => fail(err), _.collect().toSeq)

  "the engine" should "execute select star ordered" in {
    val rows = run("select * from people order by timestamp")
    rows.size shouldBe 6
    rows.head.getAs[Long]("timestamp") shouldBe 1000L
    // canonical column order: timestamp, value, then dims/tags sorted
    rows.head.schema.fieldNames.toSeq shouldBe Seq("timestamp", "value", "age", "country", "name", "surname")
  }

  it should "project requested fields plus timestamp and value" in {
    val rows = run("select name from people order by timestamp limit 2")
    rows.map(_.schema.fieldNames.toSeq).distinct shouldBe Seq(Seq("timestamp", "value", "name"))
    rows.map(_.getAs[String]("name")) shouldBe Seq("john", "frank")
  }

  it should "apply equality, like, range, null and comparison predicates" in {
    run("select * from people where name = john").size shouldBe 2
    run("select * from people where name like $ran$").map(_.getAs[String]("name")).toSet shouldBe
      Set("frank", "frankie")
    run("select * from people where name like fran$").map(_.getAs[String]("name")).toSet shouldBe
      Set("frank", "frankie")
    run("select * from people where timestamp in (2000, 6000)").size shouldBe 3
    run("select * from people where surname is null").size shouldBe 1
    run("select * from people where surname is not null").size shouldBe 5
    run("select * from people where value >= 2.5 and value < 4.5").size shouldBe 2
  }

  it should "treat NOT as null-safe (missing fields match negated predicates)" in {
    // surname = doe does not match the null-surname row; NOT(surname = doe) must
    run("select * from people where not surname = doe").map(_.getAs[String]("name")).toSet shouldBe
      Set("frank", "frankie", "fred")
  }

  it should "resolve NOW against the injected time context" in {
    // now = 10000; now - 4s = 6000
    run("select * from people where timestamp <= now").size shouldBe 6
    run("select * from people where timestamp > now - 4 s").size shouldBe 2
  }

  it should "execute select distinct on a single field" in {
    run("select distinct country from people").map(_.getString(0)).toSet shouldBe Set("uk", "it", "fr")
  }

  it should "execute global aggregations" in {
    val row = run("select count(*), sum(*), min(*), max(*), avg(*) from people").head
    row.getAs[Long]("count") shouldBe 6L
    row.getAs[Double]("sum") shouldBe 24.0
    row.getAs[Double]("min") shouldBe 1.5
    row.getAs[Double]("max") shouldBe 6.5
    row.getAs[Double]("avg") shouldBe 4.0
  }

  it should "clamp a global count at the limit" in {
    run("select count(*) from people limit 4").head.getAs[Long]("count") shouldBe 4L
  }

  it should "execute count distinct globally and per group" in {
    run("select count(distinct country) from people").head.getAs[Long]("count_distinct") shouldBe 3L
    val perAge = run("select count(distinct country) from people group by age order by age")
    perAge.map(r => (r.getAs[Long]("age"), r.getAs[Long]("value"))) shouldBe
      Seq((15L, 2L), (20L, 2L), (30L, 2L))
  }

  it should "mix plain fields with global aggregations" in {
    val rows = run("select name, count(*) from people order by timestamp limit 3")
    rows.size shouldBe 3
    rows.map(_.getAs[Long]("count")).distinct shouldBe Seq(3L)
    rows.map(_.getAs[String]("name")) shouldBe Seq("john", "frank", "frankie")
  }

  it should "execute group by tag aggregations" in {
    val sums = run("select sum(value) from people group by country order by country")
    sums.map(r => (r.getAs[String]("country"), r.getAs[Double]("value"))) shouldBe
      Seq(("fr", 4.5), ("it", 11.5), ("uk", 8.0))
    val counts = run("select count(*) from people group by age order by age")
    counts.map(r => (r.getAs[Long]("age"), r.getAs[Long]("value"))) shouldBe
      Seq((15L, 2L), (20L, 2L), (30L, 2L))
  }

  it should "execute first/last per group" in {
    val first = run("select first(value) from people group by country order by country")
    first.map(r => (r.getAs[String]("country"), r.getAs[Long]("timestamp"), r.getAs[Double]("value"))) shouldBe
      Seq(("fr", 6000L, 4.5), ("it", 2000L, 2.5), ("uk", 1000L, 1.5))
    val last = run("select last(value) from people group by country order by country")
    last.map(r => (r.getAs[String]("country"), r.getAs[Long]("timestamp"), r.getAs[Double]("value"))) shouldBe
      Seq(("fr", 6000L, 4.5), ("it", 8000L, 5.5), ("uk", 10000L, 6.5))
  }

  it should "order groups by value with limit (top-k)" in {
    val rows = run("select sum(value) from people group by country order by value desc limit 2")
    rows.map(_.getAs[String]("country")) shouldBe Seq("it", "uk")
  }

  it should "execute temporal aggregation with backward-anchored buckets" in {
    // where timestamp in (1,10), interval 4 → buckets [1,2], (2,6], (6,10]
    val rows = run("select count(*) from people where timestamp in (1000, 10000) group by interval 4 s")
      .map(r => (r.getAs[Long]("lowerBound"), r.getAs[Long]("upperBound"), r.getAs[Long]("value")))
    rows shouldBe Seq((1000L, 2000L, 2L), (2000L, 6000L, 2L), (6000L, 10000L, 2L))
  }

  it should "derive temporal bounds from the data when the where clause has none" in {
    // data bounds [1,10], interval 4 → buckets [1,2], (2,6], (6,10]
    val rows = run("select sum(*) from people group by interval 4 s")
      .map(r => (r.getAs[Long]("upperBound"), r.getAs[Double]("value")))
    rows shouldBe Seq((2000L, 4.0), (6000L, 8.0), (10000L, 12.0))
  }

  it should "keep the last buckets when limiting a temporal query" in {
    val rows = run("select count(*) from people where timestamp in (1000, 10000) group by interval 4 s limit 2")
      .map(_.getAs[Long]("upperBound"))
    rows shouldBe Seq(6000L, 10000L) // last two buckets, ascending
  }

  it should "apply the grace period to temporal queries" in {
    // now=10, since 4s → only [6, 10] remains
    val rows = run("select count(*) from people where timestamp in (1000, 10000) group by interval 4 s since 4 s")
    rows.map(_.getAs[Long]("value")).sum shouldBe 3L // ts 6000, 8000, 10000
  }

  it should "enrich statements with API-level conditions and time ranges (P10)" in {
    import graft.sql.{Ast, SqlParser}
    val stmt = SqlParser.parse("db", "ns", "select * from people where value > 2") match {
      case Right(s: Ast.SelectStatement) => s
      case other                         => fail(other.toString)
    }
    // the API layer ANDs extra filters + a [from,to] range into the WHERE
    val enriched = stmt
      .enrichWithTimeRange("timestamp", 2000L, 8000L)
      .addCondition(Ast.EqPred("country", Ast.AbsValue("it")))
    val rows = engine.executeStatement(enriched).fold(fail(_), _.collect())
    rows.map(_.getAs[Double]("value")).sorted.toSeq shouldBe Seq(2.5, 3.5, 5.5)
  }

  it should "handle unicode and special characters in values" in {
    import org.apache.spark.sql.functions.col
    val uni = Seq(
      (1000L, 1.0, "città", "ελλάδα"),
      (2000L, 2.0, "日本語", "uk"),
      (3000L, 3.0, "plain", "uk")
    ).toDF("timestamp", "value", "name", "country")
    val e = new GraftEngine(spark)
    e.registerMetric("db", "ns", "uni", uni, col("timestamp"), col("value"), tags = Set("country"))
    e.sql("db", "ns", "select * from uni where name = 'città'").fold(fail(_), _.count()) shouldBe 1
    e.sql("db", "ns", "select * from uni where country = 'ελλάδα'").fold(fail(_), _.count()) shouldBe 1
    e.sql("db", "ns", "select * from uni where name like $語$").fold(fail(_), _.count()) shouldBe 1
  }

  it should "handle negative numeric comparisons" in {
    import org.apache.spark.sql.functions.col
    val neg = Seq((1000L, -5.5, "a"), (2000L, -1.0, "b"), (3000L, 2.0, "c"))
      .toDF("timestamp", "value", "tagx")
    val e = new GraftEngine(spark)
    e.registerMetric("db", "ns", "neg", neg, col("timestamp"), col("value"), tags = Set("tagx"))
    e.sql("db", "ns", "select * from neg where value < -1.0").fold(fail(_), _.count()) shouldBe 1
    e.sql("db", "ns", "select * from neg where value in (-6, -1)").fold(fail(_), _.count()) shouldBe 2
    e.sql("db", "ns", "select sum(*) from neg").fold(fail(_), _.head().getDouble(0)) shouldBe -4.5
  }

  it should "serve concurrent queries from multiple threads" in {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val queries = Seq(
      "select count(*) from people",
      "select sum(value) from people group by country order by country",
      "select * from people where value > 2 order by timestamp",
      "select count(*) from people where timestamp in (1000, 10000) group by interval 4 s",
      "select distinct country from people order by country"
    )
    // HTTP/CLI hit one engine from many threads — 4 waves of all queries
    val futures = (1 to 4).flatMap(_ => queries).map(q => Future(run(q).length))
    val counts  = Await.result(Future.sequence(futures), 120.seconds)
    counts.grouped(queries.size).toSeq.distinct.size shouldBe 1 // same answers every wave
  }

  it should "execute avg per bucket" in {
    val rows = run("select avg(value) from people where timestamp in (1000, 10000) group by interval 4 s")
      .map(r => (r.getAs[Long]("upperBound"), r.getAs[Double]("value")))
    rows shouldBe Seq((2000L, 2.0), (6000L, 4.0), (10000L, 6.0))
  }
}
