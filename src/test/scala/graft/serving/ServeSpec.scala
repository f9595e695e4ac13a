package graft.serving

import java.net.{HttpURLConnection, URI}
import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.etl.EtlJob

/** The HTTP shell must return exactly what the underlying DataFrame
  * functions return — same rows, same JSON encoding — plus the Flask
  * surface's contract details (health probe, 400 on missing param,
  * 404 on unknown route).
  */
class ServeSpec extends AnyFunSuite with SparkSpec {

  lazy val star = EtlJob.run(spark, referenceDataDir)
  lazy val server = Serve.start(star, port = 0) // ephemeral port

  private def get(path: String): (Int, String) = {
    val url = URI.create(
      s"http://localhost:${server.getAddress.getPort}$path").toURL
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val stream = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = Source.fromInputStream(stream, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("health probe answers like the reference's /health") {
    assert(get("/health") == (200, """{"status":"running"}"""))
  }

  test("metric endpoint body == jsonRecords of the DataFrame it wraps") {
    val (code, body) = get("/api/total_cases")
    assert(code == 200)
    val direct = graft.Warehouse
      .jsonRecords(graft.queries.ServingQueries.totalCases(star))
      .collect().mkString("[", ",", "]")
    assert(body == direct)
  }

  test("paged endpoint honors page/limit query params") {
    val (code, body) = get("/api/weekly_statistics_total?page=2&limit=5")
    assert(code == 200)
    val direct = graft.Warehouse
      .jsonRecords(graft.queries.ServingQueries
        .weeklyStatisticsTotal(star, page = 2, limit = 5))
      .collect().mkString("[", ",", "]")
    assert(body == direct)
    assert(body.count(_ == '{') == 5) // LIMIT bounds the payload
  }

  test("missing required param is a 400, unknown route a 404") {
    assert(get("/api/weekly_statistics_by_country")._1 == 400)
    assert(get("/api/does_not_exist")._1 == 404)
  }
}
