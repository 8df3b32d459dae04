package graft

import java.io.File
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import graft.server.QueryServer
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end HTTP protocol surface (reference server.go contract). */
class QueryServerSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private lazy val (server, port) = {
    import spark.implicits._
    val dir = Files.createTempDirectory(
      new File("target").toPath.toAbsolutePath, "srvlake").toFile
    val d = new File(dir, "mydb/weather"); d.mkdirs()
    Seq((1672531200000000000L, "sea", 11.5), (1672617600000000000L, "pdx", 7.25))
      .toDF("time", "location", "temperature")
      .coalesce(1).write.mode("overwrite").parquet(d.getAbsolutePath)
    val engine = new Engine(spark, new Catalog(dir.getAbsolutePath))
    val s = new QueryServer(engine, 0) // ephemeral port
    s.start()
    (s, s.boundPort)
  }

  private val client = HttpClient.newHttpClient()
  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("health endpoint") {
    val r = client.send(HttpRequest.newBuilder(
      URI.create(s"http://localhost:$port/health")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200 && r.body().contains("\"status\":\"ok\""))
  }

  test("query with db.table + time filter; int64 rendered as string") {
    val r = post("/query",
      """{"query":"SELECT time, location, temperature FROM mydb.weather WHERE time >= '2023-01-02T00:00:00Z' ORDER BY time"}""")
    assert(r.statusCode() == 200)
    assert(r.body() == """{"results":[{"time":"1672617600000000000","location":"pdx","temperature":7.25}]}""")
  }

  test("ndjson format + db param precedence") {
    val r = post("/query?db=mydb&format=ndjson",
      """{"query":"SELECT location FROM weather ORDER BY location","db":"ignored"}""")
    assert(r.statusCode() == 200)
    assert(r.body().trim.split("\n").toSeq ==
      Seq("""{"location":"pdx"}""", """{"location":"sea"}"""))
  }

  test("SHOW DATABASES and fallback SQL") {
    assert(post("/query", """{"query":"SHOW DATABASES"}""").body()
      .contains("\"database_name\":\"mydb\""))
    assert(post("/query", """{"query":"SELECT 1 AS one"}""").body() ==
      """{"results":[{"one":1}]}""")
  }

  test("pipeline kernels are callable over the HTTP SQL surface") {
    // the Compat-registered dedup/text kernels work through the same
    // /query endpoint a reference client uses — over a lake table,
    // with the int64-as-string JSON contract applying to the hash
    val r = post("/query",
      """{"query":"SELECT location, simhash64(token_grams(location, 1, true)) AS sh FROM mydb.weather ORDER BY location LIMIT 1"}""")
    assert(r.statusCode() == 200, r.body())
    val expected = spark
      .sql("SELECT simhash64(token_grams('pdx', 1, true)) AS sh")
      .collect()(0).getLong(0)
    assert(r.body() ==
      s"""{"results":[{"location":"pdx","sh":"$expected"}]}""")
    // a mistyped call fails at ANALYSIS with the error contract, not
    // as an executor-side ClassCastException
    val bad = post("/query",
      """{"query":"SELECT simhash64(location) FROM mydb.weather"}""")
    assert(bad.statusCode() == 400)
    assert(bad.body().contains("DATATYPE_MISMATCH"), bad.body())
    // the winnow selection kernel is registered on the same surface
    val winnowed = spark
      .sql("SELECT winnow_select(array(50L, 40L, 30L, 20L), 2) AS w")
      .collect()(0).getSeq[Long](0)
    assert(winnowed == Seq(40L, 30L, 20L))
  }

  test("arrow format: IPC stream readable, time forced to ns-UTC") {
    val r = client.send(HttpRequest.newBuilder(
      URI.create(s"http://localhost:$port/query?format=arrow"))
      .POST(HttpRequest.BodyPublishers.ofString(
        """{"query":"SELECT time, location FROM mydb.weather ORDER BY time"}"""))
      .build(), HttpResponse.BodyHandlers.ofByteArray())
    assert(r.statusCode() == 200)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(r.body()), alloc)
    try {
      assert(reader.loadNextBatch())
      val root = reader.getVectorSchemaRoot
      assert(root.getSchema.getFields.get(0).getName == "time")
      assert(root.getSchema.getFields.get(0).getType.toString.contains("NANOSECOND"))
      assert(root.getRowCount == 2)
      assert(root.getVector("time").asInstanceOf[
        org.apache.arrow.vector.TimeStampNanoTZVector].get(0) == 1672531200000000000L)
    } finally { reader.close(); alloc.close() }
  }

  test("explain mode returns the physical plan, not rows") {
    val r = post("/query?explain=true",
      """{"query":"SELECT count(*) AS n FROM mydb.weather WHERE time >= '2023-01-02T00:00:00Z'"}""")
    assert(r.statusCode() == 200)
    assert(r.body().contains("\"plan\""))
    assert(r.body().contains("PushedFilters") || r.body().contains("Scan parquet"))
    assert(!r.body().contains("\"results\""))
  }

  test("embedded UI served at /") {
    val r = client.send(HttpRequest.newBuilder(
      URI.create(s"http://localhost:$port/")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200 && r.body().contains("<title>graft query</title>"))
  }

  test("DISABLE_UI serves 404 at / while /query stays live (README.md:50)") {
    val engine = new Engine(spark, new Catalog(
      Files.createTempDirectory(new File("target").toPath.toAbsolutePath,
        "nouilake").toFile.getAbsolutePath))
    val s = new QueryServer(engine, 0, disableUi = true)
    s.start()
    try {
      val p = s.boundPort
      val ui = client.send(HttpRequest.newBuilder(
        URI.create(s"http://localhost:$p/")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(ui.statusCode() == 404)
      val r = client.send(HttpRequest.newBuilder(URI.create(s"http://localhost:$p/query"))
        .POST(HttpRequest.BodyPublishers.ofString("""{"query":"SELECT 1 AS one"}"""))
        .build(), HttpResponse.BodyHandlers.ofString())
      assert(r.body() == """{"results":[{"one":1}]}""")
    } finally s.stop()
  }

  test("error contract: bad SQL and missing query") {
    val bad = post("/query", """{"query":"SELEKT"}""")
    assert(bad.statusCode() == 400 && bad.body().contains("\"error\""))
    val missing = post("/query", "{}")
    assert(missing.statusCode() == 400 &&
      missing.body() == """{"error":"missing query"}""")
  }
}
