package graft.testfs

import java.io.{ByteArrayOutputStream, IOException, OutputStream}
import java.net.{HttpURLConnection, InetSocketAddress, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentSkipListMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-process LOOPBACK-HTTP object store + Hadoop FileSystem client — the
  * "minio-style stand-in" that lets RealObjectStoreSpec's conformance
  * legs EXECUTE in this offline sandbox instead of cancelling (r17
  * verdict item 4). Unlike mockfs (local-disk-backed), state lives in a
  * SERVER the client only reaches over real sockets, so the legs
  * exercise a genuinely remote key-value object protocol:
  *
  *  - whole-object PUT/GET/DELETE, per-object-atomic visibility (a PUT
  *    swaps the server's map entry in one step — readers see old or new
  *    bytes, never a torn object);
  *  - NO atomic create-if-absent: create(overwrite=false) is
  *    check-then-act (HEAD then PUT), exactly the s3a behavior the
  *    commit protocol must survive;
  *  - rename = per-object server-side COPY + DELETE in sorted order —
  *    never an atomic move; rename onto an existing destination reports
  *    false;
  *  - directories are pure inference (a marker object or any key below
  *    the prefix), as on S3;
  *  - listings are strongly consistent (modern S3), scheduled lag stays
  *    a mockfs-only tool.
  *
  * The protocol (all keys URL-encoded in the path):
  *   PUT /k (+x-dir:1 → marker; +x-copy-from:src → server-side copy)
  *   GET /k | HEAD /k (x-dir/x-mtime headers) | DELETE /k
  *   GET /?list=prefix → TSV lines `childName\tsize\tmtime\tF|D`
  */
object InProcessObjectStoreServer {
  private final case class Obj(bytes: Array[Byte], mtime: Long)
  private val objects = new ConcurrentSkipListMap[String, Obj]()
  private val dirs = new ConcurrentSkipListMap[String, java.lang.Long]()

  @volatile private var started: com.sun.net.httpserver.HttpServer = _

  /** Lazily start the shared server; returns `hos://127.0.0.1:<port>`. */
  def endpoint(): String = synchronized {
    if (started == null) {
      val srv = com.sun.net.httpserver.HttpServer
        .create(new InetSocketAddress("127.0.0.1", 0), 0)
      srv.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
      srv.createContext("/", handler)
      srv.start()
      started = srv
    }
    s"hos://127.0.0.1:${started.getAddress.getPort}"
  }

  private def readBody(ex: com.sun.net.httpserver.HttpExchange): Array[Byte] = {
    val in = ex.getRequestBody
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def send(ex: com.sun.net.httpserver.HttpExchange, code: Int,
      body: Array[Byte] = Array.emptyByteArray): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  /** Immediate children of `prefix` over objects ∪ dir markers. */
  private def children(prefix: String): Seq[(String, Long, Long, Boolean)] = {
    val p = if (prefix.isEmpty) "" else prefix + "/"
    val out = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Long, Boolean)]
    def walk(keys: java.util.NavigableSet[String],
        info: String => Option[(Long, Long)], isDirMap: Boolean): Unit = {
      val it = keys.tailSet(p, true).iterator()
      var go = true
      while (go && it.hasNext) {
        val k = it.next()
        if (!k.startsWith(p)) go = false
        else if (k != prefix) {
          val rest = k.substring(p.length)
          val slash = rest.indexOf('/')
          if (slash < 0) {
            val (sz, mt) = info(k).getOrElse((0L, 0L))
            // a marker key with children stays a dir
            if (!out.contains(rest))
              out(rest) = if (isDirMap) (0L, mt, true) else (sz, mt, false)
          } else {
            val d = rest.substring(0, slash)
            if (!out.get(d).exists(_._3)) out(d) = (0L, 0L, true)
          }
        }
      }
    }
    walk(objects.navigableKeySet(),
      k => Option(objects.get(k)).map(o => (o.bytes.length.toLong, o.mtime)),
      isDirMap = false)
    walk(dirs.navigableKeySet(),
      k => Option(dirs.get(k)).map(m => (0L, m.longValue())), isDirMap = true)
    out.toSeq.map { case (n, (sz, mt, d)) => (n, sz, mt, d) }
  }

  private[testfs] def isDir(key: String): Boolean =
    key.isEmpty || dirs.containsKey(key) || {
      val p = key + "/"
      val o = objects.ceilingKey(p); val d = dirs.ceilingKey(p)
      (o != null && o.startsWith(p)) || (d != null && d.startsWith(p))
    }

  private val handler = new com.sun.net.httpserver.HttpHandler {
    override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = try {
      val raw = ex.getRequestURI.getRawPath.stripPrefix("/")
      val key = java.net.URLDecoder.decode(raw, UTF_8)
      val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      ex.getRequestMethod match {
        case "GET" if q.startsWith("list=") =>
          val prefix = java.net.URLDecoder.decode(q.stripPrefix("list="), UTF_8)
          if (!isDir(prefix)) send(ex, 404)
          else {
            val body = children(prefix).map { case (n, sz, mt, d) =>
              s"$n\t$sz\t$mt\t${if (d) "D" else "F"}"
            }.mkString("\n")
            send(ex, 200, body.getBytes(UTF_8))
          }
        case "GET" =>
          val o = objects.get(key)
          if (o == null) send(ex, 404) else send(ex, 200, o.bytes)
        case "HEAD" =>
          val o = objects.get(key)
          if (o != null) {
            ex.getResponseHeaders.set("x-mtime", o.mtime.toString)
            ex.getResponseHeaders.set("x-size", o.bytes.length.toString)
            send(ex, 200)
          } else if (isDir(key)) {
            ex.getResponseHeaders.set("x-dir", "1")
            ex.getResponseHeaders.set("x-mtime",
              Option(dirs.get(key)).map(_.toString).getOrElse("0"))
            send(ex, 200)
          } else send(ex, 404)
        case "PUT" =>
          val h = ex.getRequestHeaders
          if (h.containsKey("X-dir")) {
            readBody(ex)
            dirs.put(key, java.lang.Long.valueOf(System.currentTimeMillis()))
            send(ex, 201)
          } else if (h.containsKey("X-copy-from")) {
            readBody(ex)
            val src = java.net.URLDecoder.decode(h.getFirst("X-copy-from"), UTF_8)
            val o = objects.get(src)
            if (o == null) send(ex, 404)
            else { // atomic map swap = per-object-atomic COPY visibility
              objects.put(key, Obj(o.bytes, System.currentTimeMillis()))
              send(ex, 201)
            }
          } else {
            val body = readBody(ex)
            objects.put(key, Obj(body, System.currentTimeMillis()))
            send(ex, 201)
          }
        case "DELETE" =>
          val had = objects.remove(key) != null | dirs.remove(key) != null
          send(ex, if (had) 204 else 404)
        case _ => send(ex, 405)
      }
    } catch {
      case t: Throwable =>
        try send(ex, 500, String.valueOf(t.getMessage).getBytes(UTF_8))
        catch { case _: Throwable => () }
    }
  }
}

/** Hadoop FileSystem speaking the loopback object protocol (scheme
  * `hos://host:port/...`). Registered via META-INF/services and the
  * session's `fs.hos.impl` / `fs.AbstractFileSystem.hos.impl` keys.
  * Reads fetch the whole object at open (test-scale objects; every byte
  * still crosses the socket); writes buffer locally and PUT at close —
  * the whole-object, no-append model of a real object store. */
class HttpObjectStoreFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var workDir: Path = new Path("/")

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    require(uri.getHost != null && uri.getPort > 0,
      s"hos:// URIs must carry host:port — got $uri")
    fsUri = URI.create(s"hos://${uri.getHost}:${uri.getPort}")
    setConf(conf)
  }
  override def getScheme: String = "hos"
  override def getUri: URI = fsUri
  // a positive default port is REQUIRED by AbstractFileSystem when
  // authority is mandatory (DelegateToFileSystem passes it through);
  // every real hos:// URI still carries its explicit server port
  override def getDefaultPort: Int = 9000

  private def key(p: Path): String = {
    val abs = makeQualified(p).toUri.getPath
    abs.stripPrefix("/").stripSuffix("/")
  }
  private def http(method: String, k: String, query: String = null,
      headers: Map[String, String] = Map.empty,
      body: Array[Byte] = null): (Int, Array[Byte], Map[String, String]) = {
    val enc = k.split('/').map(URLEncoder.encode(_, UTF_8)).mkString("/")
    val url = new java.net.URL(
      s"http://${fsUri.getHost}:${fsUri.getPort}/$enc" +
        (if (query == null) "" else s"?$query"))
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    headers.foreach { case (hk, hv) => c.setRequestProperty(hk, hv) }
    if (body != null) {
      c.setDoOutput(true)
      val os = c.getOutputStream; os.write(body); os.close()
    } else if (method == "PUT") { c.setDoOutput(true); c.getOutputStream.close() }
    val code = c.getResponseCode
    val bytes =
      try {
        val in = if (code >= 400) c.getErrorStream else c.getInputStream
        if (in == null) Array.emptyByteArray
        else {
          val out = new ByteArrayOutputStream()
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          in.close(); out.toByteArray
        }
      } catch { case _: IOException => Array.emptyByteArray }
    import scala.jdk.CollectionConverters._
    val hs = c.getHeaderFields.asScala.collect {
      case (hk, hv) if hk != null && !hv.isEmpty => hk.toLowerCase -> hv.get(0)
    }.toMap
    c.disconnect()
    (code, bytes, hs)
  }

  private def statusOf(k: String, p: Path): FileStatus = {
    val (code, _, hs) = http("HEAD", k)
    if (code == 404) throw new java.io.FileNotFoundException(s"hos: no such object $k")
    val isDir = hs.contains("x-dir")
    val mtime = hs.get("x-mtime").map(_.toLong).getOrElse(0L)
    val size = hs.get("x-size").map(_.toLong).getOrElse(0L)
    new FileStatus(if (isDir) 0L else size, isDir, 1,
      getDefaultBlockSize(p), mtime, mtime,
      if (isDir) HttpObjectStoreFileSystem.DirPerm
      else HttpObjectStoreFileSystem.FilePerm,
      System.getProperty("user.name"), System.getProperty("user.name"),
      makeQualified(p))
  }

  override def getFileStatus(f: Path): FileStatus = statusOf(key(f), f)

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    val self = statusOf(k, f) // throws FileNotFoundException when absent
    if (!self.isDirectory) return Array(self)
    val (code, body, _) = http("GET", "",
      query = "list=" + URLEncoder.encode(k, UTF_8))
    if (code == 404) throw new java.io.FileNotFoundException(s"hos: no such object $k")
    if (code != 200) throw new IOException(s"hos: list $k failed ($code)")
    val text = new String(body, UTF_8)
    if (text.isEmpty) Array.empty
    else text.linesIterator.map { line =>
      val Array(n, sz, mt, fd) = line.split('\t')
      val child = new Path(makeQualified(f), n)
      val d = fd == "D"
      new FileStatus(if (d) 0L else sz.toLong, d, 1,
        getDefaultBlockSize(child), mt.toLong, mt.toLong,
        if (d) HttpObjectStoreFileSystem.DirPerm
        else HttpObjectStoreFileSystem.FilePerm,
        System.getProperty("user.name"), System.getProperty("user.name"),
        child)
    }.toArray.sortBy(_.getPath.getName)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val k = key(f)
    val (code, bytes, _) = http("GET", k)
    if (code == 404) throw new java.io.FileNotFoundException(s"hos: no such object $k")
    if (code != 200) throw new IOException(s"hos: GET $k failed ($code)")
    new FSDataInputStream(new HosSeekableBytes(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    // NO atomic create: existence is check-then-act, like a real object
    // store — the window between HEAD and PUT is the protocol's problem
    if (!overwrite) {
      val (code, _, hs) = http("HEAD", k)
      if (code == 200 && !hs.contains("x-dir"))
        throw new FileAlreadyExistsException(s"hos: $k already exists")
    }
    val buf = new ByteArrayOutputStream()
    val out: OutputStream = new OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = {
        val (code, _, _) = http("PUT", k, body = buf.toByteArray)
        if (code / 100 != 2) throw new IOException(s"hos: PUT $k failed ($code)")
      }
    }
    new FSDataOutputStream(out, statistics)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      "hos: object stores do not append")

  /** Copy+delete, per object, sorted — never an atomic move. Existing
    * destination reports false (no implicit replace). */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src); val dk = key(dst)
    val sSt = try Some(getFileStatus(src)) catch {
      case _: java.io.FileNotFoundException => None }
    if (sSt.isEmpty) return false
    if ((try { getFileStatus(dst); true } catch {
      case _: java.io.FileNotFoundException => false })) return false
    def copyObj(from: String, to: String): Unit = {
      val (code, _, _) = http("PUT", to,
        headers = Map("x-copy-from" -> from))
      if (code / 100 != 2) throw new IOException(s"hos: COPY $from->$to ($code)")
    }
    if (!sSt.get.isDirectory) {
      copyObj(sk, dk)
      http("DELETE", sk)
    } else {
      http("PUT", dk, headers = Map("x-dir" -> "1"))
      val kids = listStatus(src).sortBy(_.getPath.getName)
      kids.foreach { st =>
        val child = st.getPath.getName
        if (!rename(new Path(src, child), new Path(dst, child)))
          throw new IOException(s"hos: partial directory rename at $child")
      }
      http("DELETE", sk)
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    val st = try getFileStatus(f) catch {
      case _: java.io.FileNotFoundException => return false }
    if (st.isDirectory) {
      val kids = listStatus(f)
      if (kids.nonEmpty && !recursive)
        throw new IOException(s"hos: directory $k is not empty")
      kids.foreach(c => delete(c.getPath, recursive))
    }
    http("DELETE", k)
    true
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val (code, _, _) = http("PUT", key(f), headers = Map("x-dir" -> "1"))
    code / 100 == 2
  }

  override def setWorkingDirectory(d: Path): Unit = { workDir = d }
  override def getWorkingDirectory: Path = workDir
}

object HttpObjectStoreFileSystem {
  val FilePerm: FsPermission = FsPermission.valueOf("-rw-rw-rw-")
  val DirPerm: FsPermission = FsPermission.valueOf("drwxrwxrwx")
}

/** Whole-object bytes with Hadoop's seek surface (the object was fetched
  * over the socket once at open). */
private[testfs] class HosSeekableBytes(bytes: Array[Byte])
  extends FSInputStream {
  private var pos = 0
  override def seek(p: Long): Unit = {
    if (p < 0 || p > bytes.length) throw new java.io.EOFException(s"seek $p")
    pos = p.toInt
  }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(): Int =
    if (pos >= bytes.length) -1
    else { val b = bytes(pos) & 0xff; pos += 1; b }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= bytes.length) return -1
    val n = math.min(len, bytes.length - pos)
    System.arraycopy(bytes, pos, b, off, n)
    pos += n
    n
  }
  override def available(): Int = bytes.length - pos
}

/** FileContext adapter (`fs.AbstractFileSystem.hos.impl`) — the store's
  * no-clobber commit renames resolve AbstractFileSystem, not FileSystem. */
class HttpObjectStoreAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new HttpObjectStoreFileSystem, conf,
    "hos", /*authorityNeeded=*/ true)
