package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

/** Hadoop-FileSystem shim for the IVF index sidecars (the `CURRENT`
  * generation pointer, the `meta.props` commit file, the write lock,
  * and vacuum's listings). The index of a 100 TB corpus lives wherever
  * the corpus lives — HDFS or an object store — so the sidecar
  * machinery cannot be `java.nio` local-FS calls. Every operation
  * resolves the FileSystem from the path itself (`file:///`,
  * `hdfs://`, `s3a://`, ...); a scheme-less local path resolves to
  * LocalFileSystem, so the existing local layout works unchanged and
  * the test suite exercises the exact code a cluster runs.
  *
  * Atomicity: [[replace]] is tmp-write + `FileContext.rename(OVERWRITE)`
  * — atomic on HDFS and on the local FS. On S3-class stores a rename is
  * copy+delete (non-atomic), but the window is a one-line sidecar file
  * and readers retry ([[Similarity]] readMeta). The write lease
  * deliberately needs NO atomic create: it is a proposal election over
  * uniquely-named objects (Similarity.withWriteLock), safe even where
  * `create(overwrite=false)` is exists-check-then-truncate. The
  * FileSystem objects come from Hadoop's per-scheme cache — do not
  * close them.
  */
private[pipeline] object IndexFs {

  // delegate to StoreFs's session-cached conf: newHadoopConf() CLONES
  // the full config per call (~10 ms classpath-XML parse — was paid on
  // every sidecar op here), and the StoreFs cache also returns the
  // factory-shipped DRIVER conf on executor threads, so sidecar I/O is
  // conf-faithful on credentialed remote schemes exactly like store I/O
  private def conf: Configuration = graft.spark.StoreFs.conf

  private def fs(p: String): (FileSystem, HPath) = {
    val hp = new HPath(p)
    (hp.getFileSystem(conf), hp)
  }

  def exists(p: String): Boolean = { val (f, hp) = fs(p); f.exists(hp) }

  def mkdirs(p: String): Unit = { val (f, hp) = fs(p); f.mkdirs(hp); () }

  def mtime(p: String): Long =
    { val (f, hp) = fs(p); f.getFileStatus(hp).getModificationTime }

  def readBytes(p: String): Array[Byte] = {
    val (f, hp) = fs(p)
    val len = f.getFileStatus(hp).getLen
    require(len <= (1L << 20), s"sidecar $p unexpectedly large ($len bytes)")
    val buf = new Array[Byte](len.toInt)
    scala.util.Using.resource(f.open(hp))(_.readFully(0, buf))
    buf
  }

  def readString(p: String): String =
    new String(readBytes(p), java.nio.charset.StandardCharsets.UTF_8)

  /** Plain create-overwrite — for fresh files no reader races. */
  def writeBytes(p: String, bytes: Array[Byte]): Unit = {
    val (f, hp) = fs(p)
    scala.util.Using.resource(f.create(hp, true))(_.write(bytes))
  }

  /** create(overwrite = false); false when the object already exists.
    * Mutual exclusion through this is sound ONLY on schemes whose
    * no-overwrite create is ATOMIC (HDFS's namenode lease; conditional
    * PUTs) — RawLocal/legacy-S3 implement it as exists-check-then-
    * truncate, which admits two same-moment writers. Callers gate on
    * scheme (Similarity.withWriteLock's atomic-scheme set). */
  def createExclusive(p: String, bytes: Array[Byte]): Boolean = {
    val (f, hp) = fs(p)
    val out =
      try f.create(hp, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => return false
        case _: java.nio.file.FileAlreadyExistsException => return false
        case _: java.io.IOException if f.exists(hp) => return false
      }
    // The object now exists and is OURS. A write/close failure past this
    // point must not be mistaken for "a rival already holds it" (the old
    // `if f.exists(hp)` guard saw our OWN partial file): a half-written
    // orphan would read as a live holder and refuse every writer for the
    // whole stale window. Remove it and surface the real error.
    try { scala.util.Using.resource(out)(_.write(bytes)); true }
    catch { case e: Throwable =>
      try f.delete(hp, false) catch { case _: java.io.IOException => () }
      throw e
    }
  }

  /** Reader-visible atomic replace: write a tmp sibling, then rename
    * over the destination (FileContext supports OVERWRITE, unlike
    * FileSystem.rename on some schemes). */
  def replace(p: String, bytes: Array[Byte]): Unit = {
    val hp = new HPath(p)
    val tmp = new HPath(hp.getParent, s".${hp.getName}.${java.util.UUID.randomUUID}.tmp")
    writeBytes(tmp.toString, bytes)
    FileContext.getFileContext(hp.toUri, conf)
      .rename(tmp, hp, Options.Rename.OVERWRITE)
  }

  /** No-overwrite rename (directories included) — the meta parquet
    * swap's move steps. Returns false when the FS refuses (dst exists
    * or src missing). */
  def rename(src: String, dst: String): Boolean =
    { val (f, s) = fs(src); f.rename(s, new HPath(dst)) }

  def delete(p: String): Unit = { val (f, hp) = fs(p); f.delete(hp, false); () }

  def deleteTree(p: String): Unit = { val (f, hp) = fs(p); f.delete(hp, true); () }

  /** Direct children as (name, mtime) — empty when `p` is absent. */
  def list(p: String): Seq[(String, Long)] = {
    val (f, hp) = fs(p)
    if (!f.exists(hp)) Seq.empty
    else f.listStatus(hp).toSeq.map(s => (s.getPath.getName, s.getModificationTime))
  }

  /** Newest mtime anywhere under `p` (files recursive + the dirs one
    * level down; vacuum's "has this tree gone silent" probe).
    * Long.MaxValue on listing errors — the caller treats the tree as
    * still live and skips it. */
  def newestMtime(p: String): Long =
    try {
      val (f, hp) = fs(p)
      var newest = f.getFileStatus(hp).getModificationTime
      val it = f.listFiles(hp, true)
      while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
      newest
    } catch { case _: java.io.IOException => Long.MaxValue }
}
