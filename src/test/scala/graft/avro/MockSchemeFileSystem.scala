package graft.avro

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.fs.permission.FsPermission

/** A `mock://` scheme backed by the local filesystem — the standard
  * Hadoop-test trick for proving code is scheme-agnostic. The sandbox
  * ships no hadoop-aws jar, so the S3 story (the reference's actual
  * deployment, `repair-avro.ts:37-40,106-124`) can't be exercised
  * against real S3A; registering this class under `fs.mock.impl` and
  * driving every pipeline entry point through `mock://` URIs proves no
  * code path assumes `file:` — the residual S3 gap is then purely
  * environmental (credentials + connector jar), not architectural.
  *
  * Statuses are materialized with eager default permissions because
  * RawLocalFileSystem's lazy permission loader does `new File(uri)`,
  * which throws on any non-`file:` scheme. */
class MockSchemeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = URI.create("mock:///")
  override def getScheme: String = "mock"

  private def eager(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      if (st.isDirectory) FsPermission.getDirDefault
      else FsPermission.getFileDefault,
      "mock", "mock", st.getPath)

  override def getFileStatus(f: Path): FileStatus =
    eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}
