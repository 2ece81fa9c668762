package graft.store

import graft.api.GraftStore
import scala.collection.concurrent.TrieMap

/** URI-scheme → backend dispatch — the analog of the reference's dynamic
  * backend resolution (reference: src/io/mandoline/impl.clj:77-119,34-51,
  * `scheme://root/dataset-name`). Built-ins: `mem://<root>` (testing) and
  * `file://<path>` (Parquet via graft.spark.SparkStore, opened through
  * SparkRegistry to keep this module Spark-free). Additional providers
  * register by scheme.
  */
object StoreRegistry {

  /** Parsed `scheme://root/dataset` spec (dataset optional). */
  final case class StoreSpec(scheme: String, root: String, dataset: Option[String])

  /** Schemes whose stores are Spark-native (graft.spark.SparkStore over
    * the Hadoop FileSystem layer): the FULL uri is the store root —
    * `new SparkStore(spark, uri)` — since every SparkStore operation
    * resolves its FileSystem from the path itself. Any Hadoop-configured
    * scheme works; these are the ones we name in docs and parse below. */
  val sparkNativeSchemes: Set[String] = Set("file", "hdfs", "s3a", "abfss", "gs")

  def parse(uri: String): StoreSpec = {
    val m = "([a-z0-9+.-]+)://(.*)".r
    uri match {
      case m(scheme, rest) =>
        if (scheme == "file") {
          // file URIs: the whole remainder is a filesystem path; the
          // dataset segment is resolved by the caller against the path
          StoreSpec(scheme, "/" + rest.stripPrefix("/"), None)
        } else if (sparkNativeSchemes(scheme)) {
          // remote Hadoop-FS stores keep the scheme in the root: the
          // SparkStore path layer needs it to resolve the FileSystem
          StoreSpec(scheme, uri, None)
        } else {
          rest.split("/", 2) match {
            case Array(root) => StoreSpec(scheme, root, None)
            case Array(root, ds) => StoreSpec(scheme, root, Some(ds).filter(_.nonEmpty))
          }
        }
      case _ => throw new IllegalArgumentException(s"not a store URI: $uri")
    }
  }

  private val providers = TrieMap.empty[String, String => Backend]
  register("mem", root => MemBackend.forRoot(root))

  def register(scheme: String, factory: String => Backend): Unit =
    providers.put(scheme, factory)

  /** Open a protocol-level Backend for a URI (mem:// and any registered
    * scheme). Hadoop-FS stores (file://, hdfs://, s3a://, …) are
    * Spark-native — open those with
    * `new graft.spark.SparkStore(spark, parse(uri).root)` instead; the
    * store's whole manifest/commit layer resolves its FileSystem from
    * the root's scheme. */
  def backend(uri: String): Backend = {
    val spec = parse(uri)
    providers.get(spec.scheme) match {
      case Some(f) => f(spec.root)
      case None => throw new IllegalArgumentException(
        s"no backend registered for scheme ${spec.scheme}://")
    }
  }

  def open(uri: String): GraftStore = new GraftStore(backend(uri))
}
