package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.catalog.Warehouse
import graft.http.HttpApi

/** REST surface specs: query (with from/to enrichment), ingest, commands —
  * driven through a real HTTP client against the embedded server. */
class HttpApiSpec extends SparkTestBase {

  private lazy val client = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json")
      .build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  private def get(port: Int, path: String): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build()
    val res = client.send(req, HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  "HttpApi" should "serve the full ingest + query + commands lifecycle" in {
    val root   = Files.createTempDirectory("graft_http_").toString
    val engine = new GraftEngine(spark, Some(new Warehouse(spark, root)))
    val api    = new HttpApi(engine)
    val port   = api.start()
    try {
      // ingest two records
      val (s1, b1) = post(port, "/data",
        """{"db":"db","namespace":"ns","metric":"temps","bit":{"timestamp":1000,"value":21.5,"dimensions":{"node":"a"},"tags":{"room":"kitchen"}}}""")
      s1 shouldBe 200
      b1 should include("inserted")
      post(port, "/data",
        """{"db":"db","namespace":"ns","metric":"temps","bit":{"timestamp":2000,"value":23.5,"dimensions":{"node":"b"},"tags":{"room":"cellar"}}}""")._1 shouldBe 200

      // metric listing
      val (sc, bc) = get(port, "/commands/db/ns/metrics")
      sc shouldBe 200
      bc should include("temps")

      // query
      val (sq, bq) = post(port, "/query",
        """{"db":"db","namespace":"ns","queryString":"select sum(value) from temps group by room order by room"}""")
      sq shouldBe 200
      bq should include(""""room":"cellar"""")
      bq should include(""""value":23.5""")

      // from/to enrichment narrows the result
      val (se, be) = post(port, "/query",
        """{"db":"db","namespace":"ns","queryString":"select * from temps","from":1500,"to":2500}""")
      se shouldBe 200
      be should include(""""timestamp":2000""")
      be should not include """"timestamp":1000"""

      // error surfaces as 400 with a message
      val (sb, bb) = post(port, "/query",
        """{"db":"db","namespace":"ns","queryString":"select nope from temps"}""")
      sb shouldBe 400
      bb should include("does not exist")
    } finally api.stop()
  }
}
