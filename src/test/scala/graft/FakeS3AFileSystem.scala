package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/**
 * Test double for the `s3a://` scheme: a Hadoop FileSystem that maps
 * `s3a://bucket/key` onto local files under
 * `<graft.fake.s3.root>/bucket/key`, registered via `fs.s3a.impl`
 * exactly as the real S3AFileSystem would be. No aws/hadoop-aws jars
 * exist in this image (the environment-blocker on O7), so this is the
 * closest drivable surface: it exercises scheme resolution, bucket
 * authority handling, the parquet committer's rename/list protocol,
 * and the per-bucket `fs.s3a.bucket.<name>.*` credential propagation
 * (recorded in [[FakeS3AFileSystem.bucketCreds]] for assertions).
 */
class FakeS3AFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var bucket: String = _
  private var rootPath: String = _
  private var local: RawLocalFileSystem = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    bucket = name.getAuthority
    fsUri = URI.create(s"s3a://$bucket")
    val root = conf.get("graft.fake.s3.root")
    require(root != null, "graft.fake.s3.root must be set")
    rootPath = new java.io.File(root, bucket).getAbsolutePath
    local = new RawLocalFileSystem()
    local.initialize(URI.create("file:///"), conf)
    // replicate S3A's per-bucket config propagation so the spec can
    // assert Layers.register's scoped credentials reached the FS
    FakeS3AFileSystem.bucketCreds.put(bucket,
      (conf.get(s"fs.s3a.bucket.$bucket.access.key", ""),
        conf.get(s"fs.s3a.bucket.$bucket.endpoint", "")))
  }

  override def getUri: URI = fsUri
  override def getScheme: String = "s3a"

  private def toLocal(p: Path): Path =
    new Path("file://" + rootPath + p.toUri.getPath)

  private def toS3(p: Path): Path = {
    val rel = p.toUri.getPath.stripPrefix(rootPath)
    new Path(fsUri.toString + (if (rel.isEmpty) "/" else rel))
  }

  private def conv(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, toS3(st.getPath))

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(f), bufferSize)
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    local.create(toLocal(f), permission, overwrite, bufferSize,
      replication, blockSize, progress)
  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    local.append(toLocal(f), bufferSize, progress)
  override def rename(src: Path, dst: Path): Boolean =
    local.rename(toLocal(src), toLocal(dst))
  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(f), recursive)
  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(conv)
  override def setWorkingDirectory(newDir: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path(fsUri.toString + "/")
  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)
  override def getFileStatus(f: Path): FileStatus =
    conv(local.getFileStatus(toLocal(f)))
}

object FakeS3AFileSystem {
  /** bucket → (access key, endpoint) seen at FS initialization. */
  val bucketCreds =
    new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
}
