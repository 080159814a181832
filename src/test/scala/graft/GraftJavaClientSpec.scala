package graft

import java.nio.file.Files
import java.util.concurrent.{CompletableFuture, TimeUnit}

import graft.catalog.Warehouse
import graft.client.GraftJavaClient

/**
 * Java facade specs (reference `nsdb-java-api` parity): the builder chain
 * driven EXACTLY as a Java caller would — boxed `java.lang` arguments,
 * `CompletableFuture.get`, results inspected through getter methods and
 * `java.util` collections, no Scala sugar anywhere — plus a reflective
 * sweep asserting the public surface exposes no Scala-only types.
 */
class GraftJavaClientSpec extends SparkTestBase {

  private def newClient(): GraftJavaClient = {
    val root = Files.createTempDirectory("graft_jclient_").toString
    GraftJavaClient.connect(new GraftEngine(spark, Some(new Warehouse(spark, root))))
      .get(30, TimeUnit.SECONDS)
  }

  "GraftJavaClient" should "write boxed bits and query them back through CompletableFutures" in {
    val nsdb = newClient()

    val bit: GraftJavaClient.Bit = nsdb.db("root").namespace("registry").bit("people")
      .timestamp(java.lang.Long.valueOf(1000L))
      .value(java.lang.Double.valueOf(13.0))
      .dimension("city", "Mouseton")
      .dimension("gate", java.lang.Integer.valueOf(7))
      .tag("country", "IT")
    val ins = nsdb.write(bit).get(60, TimeUnit.SECONDS)
    ins.isCompletedSuccessfully shouldBe true
    ins.getErrors shouldBe ""

    nsdb.write(nsdb.db("root").namespace("registry").bit("people")
      .timestamp(java.lang.Long.valueOf(2000L))
      .value(new java.math.BigDecimal("2.5")) // scale > 0 → double (reference rule)
      .tag("country", "FR")).get(60, TimeUnit.SECONDS).isCompletedSuccessfully shouldBe true

    val res = nsdb.executeStatement(
      nsdb.db("root").namespace("registry").metric("people")
        .query("select sum(value) from people group by country order by country"))
      .get(60, TimeUnit.SECONDS)
    res.isCompletedSuccessfully shouldBe true
    res.getDb shouldBe "root"
    res.getNamespace shouldBe "registry"
    val records: java.util.List[java.util.Map[String, Object]] = res.getRecords
    records.size() shouldBe 2
    records.get(0).get("country") shouldBe "FR"
    records.get(0).get("value") shouldBe java.lang.Double.valueOf(2.5)
    records.get(1).get("country") shouldBe "IT"
    records.get(1).get("value") shouldBe java.lang.Double.valueOf(13.0)

    nsdb.showMetrics("root", "registry").get(60, TimeUnit.SECONDS) shouldBe java.util.List.of("people")
  }

  it should "land failures in the result object, never a failed future" in {
    val nsdb = newClient()
    // a bit without a value: client-side reject, future still completes
    val ins = nsdb.write(nsdb.db("d").namespace("n").bit("m").timestamp(java.lang.Long.valueOf(1L)))
      .get(60, TimeUnit.SECONDS)
    ins.isCompletedSuccessfully shouldBe false
    ins.getErrors should include("no value")
    // a bad statement: reason carried in the QueryResult
    val res = nsdb.executeStatement(nsdb.db("d").namespace("n").metric("m").query("select nope from m"))
      .get(60, TimeUnit.SECONDS)
    res.isCompletedSuccessfully shouldBe false
    res.getReason should not be empty
    res.getRecords.isEmpty shouldBe true
  }

  it should "init metrics from duration-semantic strings, reference MetricInfo-style" in {
    val nsdb = newClient()
    val info = nsdb.db("root").namespace("registry").metric("sensors")
      .shardInterval("1h").retention("2d")
    nsdb.initMetric(info).get(60, TimeUnit.SECONDS).isCompletedSuccessfully shouldBe true
    nsdb.showMetrics("root", "registry").get(60, TimeUnit.SECONDS) shouldBe java.util.List.of("sensors")
    // a write lands in the pre-initialized metric
    nsdb.write(nsdb.db("root").namespace("registry").bit("sensors")
      .timestamp(java.lang.Long.valueOf(1L)).value(java.lang.Double.valueOf(0.5)))
      .get(60, TimeUnit.SECONDS).isCompletedSuccessfully shouldBe true
    // malformed duration: failure in the result object, future completes
    val bad = nsdb.initMetric(
      nsdb.db("root").namespace("registry").metric("m2").shardInterval("soon"))
      .get(60, TimeUnit.SECONDS)
    bad.isCompletedSuccessfully shouldBe false
    bad.getErrors should include("soon")
    // conflicting re-init is rejected too
    nsdb.initMetric(nsdb.db("root").namespace("registry").metric("sensors").shardInterval("2h"))
      .get(60, TimeUnit.SECONDS).isCompletedSuccessfully shouldBe false
    // zero/overflowing durations also land in the result object — the
    // future never completes exceptionally
    nsdb.initMetric(nsdb.db("root").namespace("registry").metric("m3").shardInterval("0s"))
      .get(60, TimeUnit.SECONDS).isCompletedSuccessfully shouldBe false
    nsdb.initMetric(nsdb.db("root").namespace("registry").metric("m3")
      .shardInterval("99999999999999999999999999d"))
      .get(60, TimeUnit.SECONDS).isCompletedSuccessfully shouldBe false
  }

  it should "expose a Java-clean public surface (futures and java.util types only)" in {
    // reflective sweep: no public method of the facade or its result types
    // mentions a scala.* type — the Java-compatibility contract itself
    val classes = Seq(
      classOf[GraftJavaClient], classOf[GraftJavaClient.Bit],
      classOf[GraftJavaClient.MetricInfo],
      classOf[GraftJavaClient.InsertResult], classOf[GraftJavaClient.QueryResult])
    for {
      c <- classes
      // skip compiler-generated lambda bridges ($anonfun$…) — not part of
      // the surface javac resolves against
      m <- c.getDeclaredMethods.toSeq
        if java.lang.reflect.Modifier.isPublic(m.getModifiers) && !m.getName.contains("$")
      t <- m.getReturnType +: m.getParameterTypes.toSeq
    } withClue(s"${c.getSimpleName}.${m.getName}: $t") {
      t.getName should not startWith "scala."
    }
    // and the async verbs answer CompletableFuture, invoked reflectively
    // exactly as javac-generated code would resolve them
    classOf[GraftJavaClient].getMethod("write", classOf[GraftJavaClient.Bit])
      .getReturnType shouldBe classOf[CompletableFuture[_]]
    classOf[GraftJavaClient].getMethod("executeStatement", classOf[GraftJavaClient.SQLStatement])
      .getReturnType shouldBe classOf[CompletableFuture[_]]
  }
}
