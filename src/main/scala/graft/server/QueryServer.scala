package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.Engine
import graft.encoders.ResultEncoder

/**
 * HTTP query endpoint — the reference's server surface
 * (/root/reference/querier/server.go:142-230):
 *
 *  - `POST /query` body `{"query": "...", "db": "..."}`;
 *    `?db=` overrides body db, body db overrides default "mydb"
 *    (server.go:183-189); `?format=json|ndjson` (server.go:159-168);
 *  - errors as `{"error": "..."}` with appropriate status;
 *  - CORS headers on all responses;
 *  - `GET /health` → `{"status":"ok","timestamp":…}`;
 *  - embedded UI at `/` unless `disableUi` (reference `DISABLE_UI`,
 *    README.md:50).
 */
class QueryServer(engine: Engine, port: Int = 8080,
                  disableUi: Boolean = false) {
  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  private def cors(ex: HttpExchange): Unit = {
    val h = ex.getResponseHeaders
    h.add("Access-Control-Allow-Origin", "*")
    h.add("Access-Control-Allow-Methods", "POST, GET, OPTIONS")
    h.add("Access-Control-Allow-Headers", "Content-Type")
  }

  private def respond(ex: HttpExchange, code: Int, body: String,
                      ctype: String = "application/json"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.add("Content-Type", ctype)
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  def start(): Unit = {
    server = HttpServer.create(new InetSocketAddress(port), 0)

    server.createContext("/query", (ex: HttpExchange) => {
      cors(ex)
      try {
        if (ex.getRequestMethod == "OPTIONS") respond(ex, 204, "")
        else if (ex.getRequestMethod != "POST")
          respond(ex, 405, """{"error":"method not allowed"}""")
        else {
          val params = queryParams(ex)
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val node = if (body.nonEmpty) mapper.readTree(body) else mapper.createObjectNode()
          val q = Option(node.get("query")).map(_.asText()).getOrElse("")
          if (q.isEmpty) respond(ex, 400, """{"error":"missing query"}""")
          else {
            // db precedence: ?db= > body db > default (server.go:183-189)
            val db = params.getOrElse("db",
              Option(node.get("db")).map(_.asText()).getOrElse(""))
            // per-request FAIR pool: under FAIR scheduling, jobs in ONE
            // pool are FIFO — without this a 2-task point query queues
            // behind a concurrent scan's hundreds of tasks (measured
            // ~80× latency amplification in the bench harness). With
            // the default FIFO scheduler the property is inert.
            engine.spark.sparkContext.setLocalProperty(
              "spark.scheduler.pool", "req-" + Thread.currentThread().getId)
            val df = engine.query(q, db)
            if (params.get("explain").exists(v => v == "true" || v == "1")) {
              val plan = df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              respond(ex, 200, mapper.writeValueAsString(
                mapper.createObjectNode().put("plan", plan)))
            } else params.getOrElse("format", "json") match {
              case "ndjson" =>
                respond(ex, 200, ResultEncoder.toNdjsonString(df), "application/x-ndjson")
              case "arrow" => // Arrow IPC stream (FlightSQL data-plane bytes)
                // Force PLANNING before committing the 200 (analysis/
                // planning errors still surface as a clean {"error"}),
                // then chunked-stream the batches — the driver never
                // holds more than one record batch. Errors during
                // EXECUTION (after headers) can only be signalled by
                // aborting the connection — the client sees a truncated
                // IPC stream — so the inner catch closes the exchange
                // instead of letting the outer handler crash on a
                // second sendResponseHeaders.
                df.queryExecution.executedPlan // force planning errors here
                ex.getResponseHeaders.add("Content-Type", "application/vnd.apache.arrow.stream")
                ex.sendResponseHeaders(200, 0L) // 0 ⇒ chunked
                val os = ex.getResponseBody
                try { graft.encoders.ArrowEncoder.writeStream(df, os); os.close() }
                catch { case _: Throwable => ex.close() } // mid-stream: abort
              case _ =>
                respond(ex, 200, ResultEncoder.toJsonString(df))
            }
          }
        }
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.toString)
          respond(ex, 400, mapper.writeValueAsString(
            mapper.createObjectNode().put("error", msg)))
      } finally ex.close()
    })

    // minimal embedded browser UI (reference O20 — served inline
    // instead of from an embedded zip); DISABLE_UI turns it off
    server.createContext("/", (ex: HttpExchange) => {
      cors(ex)
      try {
        if (ex.getRequestURI.getPath == "/" && !disableUi)
          respond(ex, 200, QueryServer.UI_HTML, "text/html; charset=utf-8")
        else respond(ex, 404, """{"error":"not found"}""")
      } finally ex.close()
    })

    server.createContext("/health", (ex: HttpExchange) => {
      cors(ex)
      try respond(ex, 200,
        s"""{"status":"ok","timestamp":"${java.time.Instant.now()}"}""")
      finally ex.close()
    })

    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
  }

  def stop(): Unit = if (server != null) server.stop(0)
  def boundPort: Int = server.getAddress.getPort
}

/** CLI one-shot mode (reference main.go:22-57): --query … --db … */
object QueryServer {
  private[server] val UI_HTML: String =
    """<!doctype html><html><head><meta charset="utf-8"><title>graft query</title>
      |<style>body{font-family:monospace;margin:2rem;max-width:70rem}
      |textarea{width:100%;height:6rem}table{border-collapse:collapse;margin-top:1rem}
      |td,th{border:1px solid #999;padding:2px 8px;text-align:left}
      |.meta{color:#666;margin-top:.5rem}</style></head><body>
      |<h3>graft query</h3>
      |<textarea id="q">SELECT 1 AS one, version() AS v</textarea><br>
      |db: <input id="db" value="mydb"> <button onclick="run()">run</button>
      |<div class="meta" id="meta"></div><div id="out"></div>
      |<script>
      |async function run(){
      |  const t0=performance.now();
      |  const r=await fetch('/query',{method:'POST',
      |    body:JSON.stringify({query:document.getElementById('q').value,
      |                         db:document.getElementById('db').value})});
      |  const txt=await r.text();const dt=(performance.now()-t0).toFixed(0);
      |  document.getElementById('meta').textContent=
      |    r.status+' · '+dt+' ms · '+txt.length+' bytes';
      |  let data;try{data=JSON.parse(txt)}catch(e){data={error:txt}}
      |  const out=document.getElementById('out');out.innerHTML='';
      |  if(data.error){out.textContent=data.error;return}
      |  const rows=data.results||[];if(!rows.length){out.textContent='(empty)';return}
      |  const cols=Object.keys(rows[0]);
      |  const tb=document.createElement('table');
      |  tb.innerHTML='<tr>'+cols.map(c=>'<th>'+c+'</th>').join('')+'</tr>'+
      |    rows.map(r=>'<tr>'+cols.map(c=>'<td>'+r[c]+'</td>').join('')+'</tr>').join('');
      |  out.appendChild(tb);
      |}
      |</script></body></html>""".stripMargin
  def main(args: Array[String]): Unit = {
    val argMap = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      // FAIR + the per-request pools set in the /query handler: without
      // them concurrent requests run FIFO and point queries starve
      // behind scans (reference serves concurrently too, server.go:142)
      .config("spark.scheduler.mode", "FAIR")
      // static conf, default 100 entries: a gateway serving a varied
      // query mix cycles the codegen LRU to a ~0% hit rate and Janino
      // recompilation serializes concurrent requests (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.LogNoise.silenceFairPoolWarnings()
    // GIGAPI_LAYERS_<i>_* env config (reference README.md:27-31,
    // layerDesc.go): s3 layers register per-bucket fs.s3a.* credentials
    // on the session; the first fs layer can supply the lake root.
    // Root precedence: --root arg > DATA_DIR env > first fs layer URL
    // > default.
    val layers = graft.Layers.registerFromEnv(spark)
    val fsRoot = layers.collectFirst { case graft.Layers.FsLayer(_, p) => p }
    val root = argMap.get("root")
      .orElse(sys.env.get("DATA_DIR"))
      .orElse(fsRoot)
      .getOrElse("/tmp/graft-lake")
    val engine = new Engine(spark, new graft.Catalog(root))
    argMap.get("query") match {
      case Some(q) => // one-shot CLI mode
        println(ResultEncoder.toJsonString(
          engine.query(q, argMap.getOrElse("db", ""))))
        spark.stop()
      case None => // server mode
        // port precedence: --port arg > PORT env > 8080; DISABLE_UI
        // (any non-empty value) turns off the embedded UI — both from
        // the reference's configuration surface (README.md:45-50)
        val port = argMap.get("port").orElse(sys.env.get("PORT")) match {
          case Some(p) => p.trim.toIntOption.filter(v => v > 0 && v <= 65535)
            .getOrElse(sys.error(
              s"invalid port '$p' (from --port/PORT): expected 1-65535"))
          case None => 8080
        }
        val srv = new QueryServer(engine, port,
          disableUi = sys.env.get("DISABLE_UI").exists(_.nonEmpty))
        srv.start()
        println(s"graft query server on :${srv.boundPort} (root=$root)")
        Thread.currentThread().join()
    }
  }
}
