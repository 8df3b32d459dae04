package graft

import org.apache.spark.sql.SparkSession

/**
 * Storage layers: named fs/s3 tiers, the reference's
 * `GIGAPI_LAYERS_*` mechanism (/root/reference/querier/layerDesc.go:21-67,
 * README.md:27-31). An s3 layer URL carries credentials and addressing
 * style: `s3://KEY:SECRET@endpoint/bucket?url_style=path`.
 *
 * Where the reference registers a DuckDB `CREATE OR REPLACE SECRET`
 * per layer (queryClient.go:691-708), the Spark analog is per-bucket
 * `fs.s3a.bucket.<name>.*` Hadoop configuration — credentials scoped
 * to the bucket, so different layers can point at different stores in
 * one session. Paths then resolve to `s3a://bucket/...` URIs that the
 * parquet reader consumes like any other.
 */
object Layers {

  sealed trait Layer { def name: String }
  case class FsLayer(name: String, root: String) extends Layer
  case class S3Layer(name: String, endpoint: String, bucket: String,
                     accessKey: String, secret: String,
                     pathStyle: Boolean) extends Layer {
    /** s3a URI for a lake-relative path (queryClient.go:682-689 analog). */
    def uri(rel: String): String = s"s3a://$bucket/${rel.stripPrefix("/")}"
  }

  /** Parse `s3://key:secret@endpoint/bucket?url_style=path`
    * (layerDesc.go:38-67). */
  def parseS3(name: String, url: String): S3Layer = {
    val u = new java.net.URI(url)
    require(u.getScheme == "s3", s"expected s3:// url, got $url")
    val (key, secret) = Option(u.getUserInfo).map(_.split(":", 2)) match {
      case Some(Array(k, s)) => (k, s)
      case Some(Array(k)) => (k, "") // key with no secret part
      case _ => ("", "")
    }
    val pathStyle = Option(u.getQuery).exists(_.split("&")
      .exists(p => p == "url_style=path"))
    S3Layer(name, u.getHost + (if (u.getPort > 0) s":${u.getPort}" else ""),
      u.getPath.stripPrefix("/").split("/").head, key, secret, pathStyle)
  }

  /**
   * Parse `GIGAPI_LAYERS_<i>_{NAME,TYPE,URL,AUTH_KEY,AUTH_SECRET}`
   * environment entries — the reference's indexed env-config
   * convention (README.md:27-31: `GIGAPI_LAYERS_0_NAME=default`,
   * `GIGAPI_LAYERS_0_TYPE=fs`, `GIGAPI_LAYERS_0_URL=file:///data`;
   * layerDesc.go:21-67). Matching the reference: credentials embedded
   * in the URL's userinfo take precedence over the AUTH_* entries
   * (layerDesc.go:55-60), an fs URL drops its `file://` prefix
   * (layerDesc.go:31-36), and an unsupported TYPE fails loudly
   * (layerDesc.go:28). Layers come back in index order.
   */
  def fromEnv(env: Map[String, String]): Seq[Layer] = {
    val prefix = "GIGAPI_LAYERS_([0-9]+)_".r
    val indices = env.keys.flatMap(k =>
      prefix.findPrefixMatchOf(k).map(_.group(1).toInt)).toSeq.distinct.sorted
    indices.map { i =>
      val p = s"GIGAPI_LAYERS_${i}_"
      val name = env.getOrElse(p + "NAME", s"layer$i")
      val url = env.getOrElse(p + "URL",
        throw new IllegalArgumentException(s"${p}URL is required"))
      env.getOrElse(p + "TYPE", "fs") match {
        case "fs" => FsLayer(name, url.stripPrefix("file://"))
        case "s3" =>
          val parsed = parseS3(name, url)
          if (parsed.accessKey.nonEmpty) parsed
          else parsed.copy(
            accessKey = env.getOrElse(p + "AUTH_KEY", ""),
            secret = env.getOrElse(p + "AUTH_SECRET", ""))
        case other =>
          throw new IllegalArgumentException(s"Unsupported layer type: $other")
      }
    }
  }

  /** Parse layers from the env and register every s3 layer's
    * per-bucket credentials on the session — the server-startup hook
    * (the reference runs the same loop in QueryClient.Initialize,
    * queryClient.go:53-61). Returns the parsed layers so the caller
    * can derive the lake root from the first fs layer. */
  def registerFromEnv(spark: SparkSession,
                      env: Map[String, String] = sys.env): Seq[Layer] = {
    val layers = fromEnv(env)
    layers.foreach {
      case s: S3Layer => register(spark, s)
      case _: FsLayer => ()
    }
    layers
  }

  /** Scope credentials to the layer's bucket (CREATE SECRET analog). */
  def register(spark: SparkSession, layer: S3Layer): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = s"fs.s3a.bucket.${layer.bucket}"
    conf.set(s"$p.endpoint", layer.endpoint)
    conf.set(s"$p.access.key", layer.accessKey)
    conf.set(s"$p.secret.key", layer.secret)
    conf.set(s"$p.path.style.access", layer.pathStyle.toString)
  }

  /** Resolve a catalog entry to a concrete scan URI (buildFilesList
    * analog, queryClient.go:669-690). */
  def resolve(layer: Layer, db: String, table: String, entryPath: String): String =
    layer match {
      case FsLayer(_, root) => s"$root/$db/$table/data/$entryPath"
      case s: S3Layer => s.uri(s"$db/$table/$entryPath")
    }
}
