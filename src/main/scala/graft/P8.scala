package graft
import graft.catalog.Warehouse
import graft.http.HttpApi
object P8 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(2)
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft_agg_probe_").toString
    val api = new HttpApi(new GraftEngine(spark, Some(new Warehouse(spark, root))), 18425)
    api.start(); println("HTTP_READY"); Thread.sleep(90000); api.stop(); spark.stop()
  }
}
