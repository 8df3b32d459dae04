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
}
