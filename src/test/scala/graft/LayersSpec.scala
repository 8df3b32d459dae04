package graft

import org.scalatest.funsuite.AnyFunSuite

class LayersSpec extends AnyFunSuite {
  test("s3 layer url parse (layerDesc.go:38-67 forms)") {
    val l = Layers.parseS3("cold",
      "s3://AKID:sEcr3t@minio.local:9000/lakebucket?url_style=path")
    assert(l == Layers.S3Layer("cold", "minio.local:9000", "lakebucket",
      "AKID", "sEcr3t", pathStyle = true))
    assert(l.uri("db/tbl/x.parquet") == "s3a://lakebucket/db/tbl/x.parquet")
    val v = Layers.parseS3("warm", "s3://K:S@s3.amazonaws.com/b2")
    assert(!v.pathStyle && v.endpoint == "s3.amazonaws.com")
    // userinfo without a colon: key with empty secret, not a MatchError
    val noSecret = Layers.parseS3("iam", "s3://ROLEKEY@minio:9000/b3")
    assert(noSecret.accessKey == "ROLEKEY" && noSecret.secret == "")
    // no userinfo at all (instance-profile style)
    val anon = Layers.parseS3("anon", "s3://minio:9000/b4")
    assert(anon.accessKey == "" && anon.secret == "")
  }

  test("per-bucket hadoop config registration") {
    val spark = GraftTestSession.spark
    Layers.register(spark,
      Layers.parseS3("cold", "s3://K:S@minio:9000/bkt?url_style=path"))
    val conf = spark.sparkContext.hadoopConfiguration
    assert(conf.get("fs.s3a.bucket.bkt.endpoint") == "minio:9000")
    assert(conf.get("fs.s3a.bucket.bkt.access.key") == "K")
    assert(conf.get("fs.s3a.bucket.bkt.path.style.access") == "true")
  }

  test("fs layer path resolution (queryClient.go:680)") {
    assert(Layers.resolve(Layers.FsLayer("hot", "/data"), "mydb", "meas", "f.parquet")
      == "/data/mydb/meas/data/f.parquet")
  }

  test("GIGAPI_LAYERS_* env parse (README.md:27-31, layerDesc.go:21-67)") {
    val env = Map(
      "GIGAPI_LAYERS_0_NAME" -> "default",
      "GIGAPI_LAYERS_0_TYPE" -> "fs",
      "GIGAPI_LAYERS_0_URL" -> "file:///data",
      "GIGAPI_LAYERS_1_NAME" -> "cold",
      "GIGAPI_LAYERS_1_TYPE" -> "s3",
      "GIGAPI_LAYERS_1_URL" -> "s3://minio.local:9000/coldbkt?url_style=path",
      "GIGAPI_LAYERS_1_AUTH_KEY" -> "AKID",
      "GIGAPI_LAYERS_1_AUTH_SECRET" -> "sEcr3t",
      "UNRELATED" -> "x")
    val layers = Layers.fromEnv(env)
    assert(layers == Seq(
      Layers.FsLayer("default", "/data"),
      Layers.S3Layer("cold", "minio.local:9000", "coldbkt",
        "AKID", "sEcr3t", pathStyle = true)))
    // URL userinfo beats AUTH_* (layerDesc.go:55-60)
    val urlWins = Layers.fromEnv(Map(
      "GIGAPI_LAYERS_0_TYPE" -> "s3",
      "GIGAPI_LAYERS_0_URL" -> "s3://UK:US@h/b",
      "GIGAPI_LAYERS_0_AUTH_KEY" -> "EK"))
    assert(urlWins == Seq(Layers.S3Layer("layer0", "h", "b", "UK", "US",
      pathStyle = false)))
    // unsupported type fails loudly (layerDesc.go:28)
    val err = intercept[IllegalArgumentException] {
      Layers.fromEnv(Map("GIGAPI_LAYERS_0_TYPE" -> "gcs",
        "GIGAPI_LAYERS_0_URL" -> "gs://x"))
    }
    assert(err.getMessage.contains("Unsupported layer type"))
    // no layer entries → no layers (server falls back to DATA_DIR)
    assert(Layers.fromEnv(Map("PATH" -> "/usr/bin")).isEmpty)
  }

  test("registerFromEnv wires per-bucket s3a conf onto the session") {
    val spark = GraftTestSession.spark
    val layers = Layers.registerFromEnv(spark, Map(
      "GIGAPI_LAYERS_0_TYPE" -> "fs",
      "GIGAPI_LAYERS_0_URL" -> "file:///root/testdata/sf0.001",
      "GIGAPI_LAYERS_1_NAME" -> "archive",
      "GIGAPI_LAYERS_1_TYPE" -> "s3",
      "GIGAPI_LAYERS_1_URL" -> "s3://envminio:9000/envbkt?url_style=path",
      "GIGAPI_LAYERS_1_AUTH_KEY" -> "EK",
      "GIGAPI_LAYERS_1_AUTH_SECRET" -> "ES"))
    val conf = spark.sparkContext.hadoopConfiguration
    assert(conf.get("fs.s3a.bucket.envbkt.endpoint") == "envminio:9000")
    assert(conf.get("fs.s3a.bucket.envbkt.access.key") == "EK")
    assert(conf.get("fs.s3a.bucket.envbkt.secret.key") == "ES")
    assert(conf.get("fs.s3a.bucket.envbkt.path.style.access") == "true")
    // the first fs layer supplies the lake root the server would use
    assert(layers.collectFirst { case Layers.FsLayer(_, p) => p }
      .contains("/root/testdata/sf0.001"))
  }
}
