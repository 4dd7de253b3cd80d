package graft.util

import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test FileSystems that model an S3-class OBJECT STORE over the local
  * disk, for the manifest-protocol specs:
  *
  *  - `banfs://`  — [[BanRenameFs]]: every `rename()` outside a
  *    writer-local `_temporary/` staging tree and every `append()`
  *    THROWS. Running a full index lifecycle on it mechanically proves
  *    the manifest protocol needs neither — the rename-free claim
  *    pinned forever against a future "convenient rename" regression.
  *    (Task-commit renames under `_temporary/` are allowed because
  *    they need NO atomicity for protocol correctness: a data dir is
  *    invisible garbage until a manifest names it; a real object-store
  *    deployment points Spark at a rename-free committer for the same
  *    reason.) Advertises the conditional-create capability so
  *    manifest publishes resolve on a non-local scheme.
  *  - `condfs://` — [[CondCreateFs]]: `create(path, overwrite=false)`
  *    NEVER fails at create time — the object materializes only at
  *    close(), where an `If-None-Match`-style precondition fires if
  *    the path appeared meanwhile (the real S3 conditional-PUT shape,
  *    HADOOP-19256). A `beforeClose` hook lets a spec inject the
  *    racing writer in the exact window client-side check-then-PUT
  *    cannot defend.
  *  - `unsafefs://` — [[UnsafeCreateFs]]: an object store with NO
  *    atomicity story at all (no conditional-create capability, not an
  *    HDFS-semantics scheme). The protocol must refuse to publish on
  *    it — loudly, with the config pointer.
  *
  * All three translate paths to an inner [[RawLocalFileSystem]] and
  * re-qualify results, so Spark reads/writes them like any remote FS.
  */
abstract class ObjectStoreFs extends FileSystem {
  protected def scheme: String

  protected var innerFs: RawLocalFileSystem = _
  private var uri0: URI = _
  private var wd: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    innerFs = new RawLocalFileSystem()
    innerFs.initialize(URI.create("file:///"), conf)
    uri0 = URI.create(s"$scheme:///")
    wd = new Path(s"$scheme:///")
  }

  override def getScheme: String = scheme
  override def getUri: URI = uri0

  protected def toInner(p: Path): Path = new Path(p.toUri.getPath)
  private def fromInner(p: Path): Path =
    new Path(scheme, null, p.toUri.getPath)
  private def wrap(st: FileStatus): FileStatus = {
    val c = new FileStatus(st)
    c.setPath(fromInner(st.getPath))
    c
  }

  /** The single create funnel every public overload (plain create,
    * EnumSet create, the createFile builder's build()) reaches.
    */
  protected def doCreate(p: Path, overwrite: Boolean, bufferSize: Int,
                         progress: Progressable): FSDataOutputStream =
    innerFs.create(toInner(p), overwrite, bufferSize,
      innerFs.getDefaultReplication(toInner(p)),
      innerFs.getDefaultBlockSize(toInner(p)), progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    doCreate(f, overwrite, bufferSize, progress)

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    innerFs.open(toInner(f), bufferSize)

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      s"append() is banned on $scheme:// (object stores have no append)" +
        s" — path $f")

  override def rename(src: Path, dst: Path): Boolean =
    innerFs.rename(toInner(src), toInner(dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    innerFs.delete(toInner(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    innerFs.listStatus(toInner(f)).map(wrap)

  override def getFileStatus(f: Path): FileStatus =
    wrap(innerFs.getFileStatus(toInner(f)))

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    innerFs.mkdirs(toInner(f), permission)

  override def setWorkingDirectory(dir: Path): Unit = { wd = dir }
  override def getWorkingDirectory: Path = wd
}

object ObjectStoreFs {
  /** Register a scheme's impl class on a Hadoop conf (idempotent). */
  def install(conf: Configuration): Unit = {
    conf.set("fs.banfs.impl", classOf[BanRenameFs].getName)
    conf.set("fs.condfs.impl", classOf[CondCreateFs].getName)
    conf.set("fs.unsafefs.impl", classOf[UnsafeCreateFs].getName)
  }
}

object BanRenameFs {
  val bannedRenames = new AtomicLong(0)
  val allowedStagingRenames = new AtomicLong(0)
  val manifestCreates = new ConcurrentHashMap[String, java.lang.Boolean]()
  def reset(): Unit = {
    bannedRenames.set(0); allowedStagingRenames.set(0)
    manifestCreates.clear()
  }
}

class BanRenameFs extends ObjectStoreFs {
  override protected def scheme: String = "banfs"

  override def rename(src: Path, dst: Path): Boolean = {
    // writer-local committer staging is the ONLY legal rename: those
    // paths are unpublished (no manifest names them), so their rename
    // needs no atomicity — everything else is a protocol violation
    if (!src.toString.contains("_temporary") &&
        !dst.toString.contains("_temporary")) {
      BanRenameFs.bannedRenames.incrementAndGet()
      throw new UnsupportedOperationException(
        s"rename() outside _temporary/ is banned on banfs:// — the " +
          s"manifest protocol must never rely on it ($src -> $dst)")
    }
    BanRenameFs.allowedStagingRenames.incrementAndGet()
    super.rename(src, dst)
  }

  override protected def doCreate(p: Path, overwrite: Boolean,
                                  bufferSize: Int,
                                  progress: Progressable): FSDataOutputStream = {
    if (p.toString.contains("_manifests/")) {
      BanRenameFs.manifestCreates.put(p.toString, overwrite)
      ()
    }
    super.doCreate(p, overwrite, bufferSize, progress)
  }

  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability == ManifestCommit.ConditionalCreateCapability ||
      super.hasPathCapability(path, capability)
}

object CondCreateFs {
  /** Injected between a publish's create() and its close() — the
    * conditional-PUT race window. Cleared after firing once.
    */
  @volatile var beforeClose: Path => Unit = null
  val builderCreates = new AtomicLong(0)
  val plainCreates = new AtomicLong(0)
  def reset(): Unit = {
    beforeClose = null; builderCreates.set(0); plainCreates.set(0)
  }
}

class CondCreateFs extends ObjectStoreFs {
  override protected def scheme: String = "condfs"

  override def hasPathCapability(path: Path, capability: String): Boolean =
    capability == ManifestCommit.ConditionalCreateCapability ||
      super.hasPathCapability(path, capability)

  override def createFile(p: Path): FSDataOutputStreamBuilder[_, _] = {
    CondCreateFs.builderCreates.incrementAndGet()
    super.createFile(p)
  }

  override def create(f: Path, b: Boolean): FSDataOutputStream = {
    CondCreateFs.plainCreates.incrementAndGet()
    super.create(f, b)
  }

  override protected def doCreate(p: Path, overwrite: Boolean,
                                  bufferSize: Int,
                                  progress: Progressable): FSDataOutputStream = {
    if (overwrite || !p.toString.contains("_manifests/"))
      return super.doCreate(p, overwrite, bufferSize, progress)
    // the object-store PUT model: create() succeeds unconditionally
    // (no namespace entry is taken), bytes buffer locally, and the
    // object materializes at close() — where the If-None-Match
    // precondition fires if the path appeared meanwhile
    val buf = new java.io.ByteArrayOutputStream()
    val sink = new java.io.OutputStream {
      private var closed = false
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        if (closed) return
        closed = true
        val hook = CondCreateFs.beforeClose
        if (hook != null) { CondCreateFs.beforeClose = null; hook(p) }
        val ip = toInner(p)
        val in = innerFs
        if (in.exists(ip))
          throw new java.io.IOException(
            s"PreconditionFailed: If-None-Match on $p (HTTP 412)")
        val out = in.create(ip, false)
        try out.write(buf.toByteArray) finally out.close()
      }
    }
    new FSDataOutputStream(sink, null)
  }

}

class UnsafeCreateFs extends ObjectStoreFs {
  override protected def scheme: String = "unsafefs"
  // no conditional-create capability, not an HDFS-semantics scheme:
  // the protocol must refuse to publish here
}
