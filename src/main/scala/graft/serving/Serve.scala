package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Warehouse
import graft.etl.StarSchema
import graft.queries.ServingQueries

/** Thin HTTP shell over the serving layer — the analog of the reference's
  * Flask app (app/main.py:27-43 registers blueprints whose route bodies are
  * SQL; here each route body is a `ServingQueries` function and Spark's
  * planner replaces Postgres's).
  *
  * Deliberately ZERO framework: the engine's contract is
  * `(SparkSession, params) => DataFrame`, and this demonstrates that the
  * contract composes into the reference's REST shape with nothing but the
  * JDK's built-in `com.sun.net.httpserver` — proof the library stays
  * embeddable in whatever serving stack a user already runs (the realistic
  * production topology is a long-lived SparkSession behind exactly this
  * kind of router, with every endpoint bounded: aggregates, top-k, or
  * LIMIT/OFFSET pages — never an unbounded collect).
  *
  * Responses are JSON arrays of row objects via [[Warehouse.jsonRecords]]
  * (`df.toJSON` — Spark's own row→JSON encoding, computed distributed and
  * only then collected, bounded by each endpoint's own LIMIT semantics).
  */
object Serve {

  /** Route table, reference paths preserved (app/routes/data.py:63-331).
    * Each value: query-params => bounded DataFrame.
    */
  def routes(star: StarSchema): Map[String, Map[String, String] => DataFrame] = Map(
    "/api/total_cases" -> (_ => ServingQueries.totalCases(star)),
    "/api/total_deaths" -> (_ => ServingQueries.totalDeaths(star)),
    "/api/total_vaccines" -> (_ => ServingQueries.totalVaccines(star)),
    "/api/weekly_statistics_total" -> (p =>
      ServingQueries.weeklyStatisticsTotal(
        star,
        page = p.getOrElse("page", "1").toInt,
        limit = p.getOrElse("limit", "100").toInt)),
    "/api/weekly_statistics_by_country" -> (p =>
      ServingQueries.weeklyStatisticsByCountry(star, p("country_code"))),
    "/api/covid_cases_evolution" -> (_ => ServingQueries.covidCasesEvolution(star)),
    "/api/vaccinations_evolution" -> (_ => ServingQueries.vaccinationsEvolution(star)),
    "/api/worldmap/cases" -> (_ => ServingQueries.worldmapCases(star)),
    "/api/worldmap/deaths" -> (_ => ServingQueries.worldmapDeaths(star)),
    "/api/worldmap/vaccinated" -> (_ => ServingQueries.worldmapVaccinated(star)),
  )

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split("&").toSeq).getOrElse(Seq.empty)
      .map(_.split("=", 2))
      .collect { case Array(k, v) => k -> java.net.URLDecoder.decode(v, "UTF-8") }
      .toMap

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    try ex.getResponseBody.write(bytes)
    finally ex.close()
  }

  /** Bind and start; port 0 picks an ephemeral port (tests). */
  def start(star: StarSchema, port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/health", (ex: HttpExchange) =>
      respond(ex, 200, """{"status":"running"}"""))
    val table = routes(star)
    server.createContext("/api", (ex: HttpExchange) => {
      table.get(ex.getRequestURI.getPath) match {
        case Some(fn) =>
          try {
            val rows = Warehouse.jsonRecords(fn(queryParams(ex))).collect()
            respond(ex, 200, rows.mkString("[", ",", "]"))
          } catch {
            case e: NoSuchElementException =>
              respond(ex, 400, s"""{"error":"missing parameter: ${e.getMessage}"}""")
            case e: Exception =>
              respond(ex, 500, s"""{"error":"${e.getClass.getSimpleName}"}""")
          }
        case None => respond(ex, 404, """{"error":"no such route"}""")
      }
    })
    server.start()
    server
  }

  /** Demo main: ETL the committed reference CSVs, serve on :8080. */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dataDir = if (args.nonEmpty) args(0) else "/root/reference/app/data/data_covid"
    val star = graft.etl.EtlJob.run(spark, dataDir)
    val server = start(star, args.drop(1).headOption.map(_.toInt).getOrElse(8080))
    println(s"serving on :${server.getAddress.getPort} — GET /health, " +
      routes(star).keys.toSeq.sorted.mkString(", "))
  }
}
