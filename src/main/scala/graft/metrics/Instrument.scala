package graft.metrics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, LongAdder}

/** Opt-in metrics instrumentation — the analog of the reference's
  * `instrument!` timer wrapping (reference: src/io/mandoline.clj:312-321,
  * utils.clj:15-32), Spark-first: a QueryExecutionListener records every
  * Spark SQL execution, and `timed` wraps engine hot paths.
  */
object Instrument {

  final class Timer {
    private[metrics] val count = new LongAdder
    private[metrics] val totalNanos = new LongAdder
    private[metrics] val maxNanos = new AtomicLong(0L)
    def record(nanos: Long): Unit = {
      count.increment(); totalNanos.add(nanos)
      maxNanos.accumulateAndGet(nanos, math.max(_, _))
    }
    def snapshot: Map[String, Double] = Map(
      "count" -> count.sum.toDouble,
      "totalSec" -> totalNanos.sum / 1e9,
      "maxSec" -> maxNanos.get / 1e9)
  }

  private val timers = new ConcurrentHashMap[String, Timer]()
  @volatile private var enabled = false

  def timer(name: String): Timer =
    timers.computeIfAbsent(name, _ => new Timer)

  /** Wrap a hot path; no-op overhead of one volatile read when disabled. */
  def timed[T](name: String)(f: => T): T =
    if (!enabled) f
    else {
      val t0 = System.nanoTime()
      try f finally timer(name).record(System.nanoTime() - t0)
    }

  // one listener per session, tracked so enable is idempotent and
  // disable actually detaches it
  private val listeners =
    new ConcurrentHashMap[SparkSession, QueryExecutionListener]()

  /** Enable and attach the SQL-execution listener (idempotent per
    * session). Every DataFrame action is recorded under its action name
    * (`sql.count`, `sql.collect`, …). */
  def enable(spark: SparkSession): Unit = {
    enabled = true
    listeners.computeIfAbsent(spark, { s =>
      val l = new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          if (enabled) timer(s"sql.$funcName").record(durationNs)
        override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
          if (enabled) timer(s"sql.$funcName.failed").record(0L)
      }
      s.listenerManager.register(l)
      l
    })
  }

  def disable(): Unit = {
    enabled = false
    listeners.forEach((spark, l) => spark.listenerManager.unregister(l))
    listeners.clear()
  }

  def snapshot: Map[String, Map[String, Double]] = {
    val b = Map.newBuilder[String, Map[String, Double]]
    timers.forEach((k, v) => b += (k -> v.snapshot))
    b.result()
  }

  def reset(): Unit = timers.clear()
}
