package graft.spark

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

/** Hadoop-FileSystem layer for ALL of [[SparkStore]]'s manifest /
  * catalog / staging / sidecar I/O — the array store's production
  * posture is "the catalog lives wherever the data lives" (the
  * reference ships remote store backends behind scheme dispatch,
  * `/root/reference/README.md:16-19`, `src/io/mandoline/impl.clj:77-119`),
  * and a 100 TB corpus does not sit on one node's disk. Every operation
  * resolves its FileSystem from the path itself: `file:///` and
  * scheme-less paths hit LocalFileSystem (so the existing local layout
  * and the whole test suite exercise exactly the code a cluster runs),
  * `hdfs://` / `s3a://` / any configured scheme hit their remote FS.
  *
  * Same shim design as [[graft.pipeline.IndexFs]] (the IVF sidecars'
  * layer) — kept separate because the store needs a wider surface
  * (tree walks, dir mtimes, no-overwrite dir renames) and IndexFs is
  * deliberately private to the pipeline package.
  *
  * Atomicity notes: [[moveInto]]/[[moveReplace]] are
  * `FileContext.rename` — atomic on HDFS and the local FS; on S3-class
  * stores rename is copy+delete and the commit-file pattern degrades
  * to small-window non-atomicity exactly as every parquet table format
  * does there. [[FileSystem]] instances come from Hadoop's per-scheme
  * cache — never closed here.
  */
private[graft] object StoreFs {

  def conf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fs(p: String): (FileSystem, HPath) = {
    val hp = new HPath(p)
    (hp.getFileSystem(conf), hp)
  }

  /** Child path under `p` (single segment or a relative subpath). */
  def child(p: String, name: String): String = new HPath(p, name).toString

  /** Last path segment. */
  def name(p: String): String = new HPath(p).getName

  def parent(p: String): String = new HPath(p).getParent.toString

  def exists(p: String): Boolean = { val (f, hp) = fs(p); f.exists(hp) }

  def isDirectory(p: String): Boolean = {
    val (f, hp) = fs(p)
    try f.getFileStatus(hp).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  }

  def mkdirs(p: String): Unit = { val (f, hp) = fs(p); f.mkdirs(hp); () }

  def mtime(p: String): Long =
    { val (f, hp) = fs(p); f.getFileStatus(hp).getModificationTime }

  def setMtimeNow(p: String): Unit = {
    val (f, hp) = fs(p)
    f.setTimes(hp, System.currentTimeMillis(), -1)
  }

  def size(p: String): Long = { val (f, hp) = fs(p); f.getFileStatus(hp).getLen }

  /** Direct children as (fullPath, name, mtime, isDir); empty when `p`
    * is absent. */
  def list(p: String): Seq[(String, String, Long, Boolean)] = {
    val (f, hp) = fs(p)
    if (!f.exists(hp)) Seq.empty
    else f.listStatus(hp).toSeq.map(s =>
      (s.getPath.toString, s.getPath.getName, s.getModificationTime,
        s.isDirectory))
  }

  /** Every FILE under `p`, recursive, as full paths (empty when absent). */
  def filesUnder(p: String): Seq[String] = {
    val (f, hp) = fs(p)
    if (!f.exists(hp)) Seq.empty
    else {
      val out = Seq.newBuilder[String]
      val it = f.listFiles(hp, true)
      while (it.hasNext) out += it.next().getPath.toString
      out.result()
    }
  }

  /** Sum of file sizes under `p` (0 when absent). */
  def treeSize(p: String): Long = {
    val (f, hp) = fs(p)
    if (!f.exists(hp)) 0L
    else {
      var total = 0L
      val it = f.listFiles(hp, true)
      while (it.hasNext) total += it.next().getLen
      total
    }
  }

  /** Newest mtime anywhere in the tree (the "has this staging dir gone
    * silent" probe). Long.MaxValue on listing errors — callers treat
    * the tree as still live. */
  def newestMtime(p: String): Long =
    try {
      val (f, hp) = fs(p)
      var newest = f.getFileStatus(hp).getModificationTime
      val it = f.listFiles(hp, true)
      while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
      newest
    } catch { case _: java.io.IOException => Long.MaxValue }

  def readString(p: String): String = {
    val (f, hp) = fs(p)
    val len = f.getFileStatus(hp).getLen
    require(len <= (64L << 20), s"metadata file $p unexpectedly large ($len bytes)")
    val buf = new Array[Byte](len.toInt)
    scala.util.Using.resource(f.open(hp))(_.readFully(0, buf))
    new String(buf, java.nio.charset.StandardCharsets.UTF_8)
  }

  def readLines(p: String): Seq[String] =
    readString(p).split('\n').toSeq.filter(_.nonEmpty)

  /** Raw create-overwrite output stream (executor-side staged-fragment
    * writers). On executors there is no active SparkSession, so the
    * Configuration falls back to classpath defaults — correct for
    * file:// and for clusters that ship core-site on the executor
    * classpath (the standard deployment). */
  def createStream(p: String): java.io.OutputStream = {
    val (f, hp) = fs(p)
    f.create(hp, true)
  }

  /** Plain create-overwrite (for paths no reader races). */
  def writeString(p: String, s: String): Unit = {
    val (f, hp) = fs(p)
    scala.util.Using.resource(f.create(hp, true))(
      _.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Atomic create-no-overwrite empty file (completion markers). Throws
    * IOException when it already exists or cannot be created. */
  def createMarker(p: String): Unit = {
    val (f, hp) = fs(p)
    scala.util.Using.resource(f.create(hp, false))(_ => ())
  }

  /** Rename with NO overwrite — both files and whole directory trees.
    * Returns false when dst already exists or src is missing — the
    * no-clobber commit primitive. Deliberately FileContext, not
    * FileSystem.rename: the latter silently moves src INTO an existing
    * dst directory (POSIX mv semantics), which would turn a lost
    * publish race into nested garbage instead of a clean refusal. */
  def moveInto(src: String, dst: String): Boolean = {
    val d = new HPath(dst)
    try {
      FileContext.getFileContext(d.toUri, conf)
        .rename(new HPath(src), d, Options.Rename.NONE)
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: java.io.FileNotFoundException => false
      case e: java.io.IOException
        if exists(dst) || !exists(src) => false
    }
  }

  /** Rename that REPLACES an existing destination file atomically
    * (FileContext supports OVERWRITE; FileSystem.rename does not on
    * some schemes). */
  def moveReplace(src: String, dst: String): Unit = {
    val d = new HPath(dst)
    FileContext.getFileContext(d.toUri, conf)
      .rename(new HPath(src), d, Options.Rename.OVERWRITE)
  }

  def copyFile(src: String, dst: String): Unit = {
    val (sf, sp) = fs(src)
    val (df, dp) = fs(dst)
    org.apache.hadoop.fs.FileUtil.copy(sf, sp, df, dp,
      /*deleteSource=*/ false, /*overwrite=*/ true, conf)
    ()
  }

  /** Delete one file; missing is fine, IO errors propagate. */
  def delete(p: String): Unit = { val (f, hp) = fs(p); f.delete(hp, false); () }

  def deleteIfExists(p: String): Unit =
    try delete(p) catch { case _: java.io.IOException => () }

  /** Recursive tree delete; missing is fine. */
  def deleteTree(p: String): Unit = { val (f, hp) = fs(p); f.delete(hp, true); () }
}
