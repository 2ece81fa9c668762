/*
 * In-package accessor for Spark's `private[sql]` state-store registry —
 * the same technique connector libraries use for private[sql] surfaces.
 * Kept to the narrowest possible surface: ONE delegating method.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Deterministic state-store unload for bounded gate/bench streams.
  *
  * A STOPPED streaming query's executor-side state-store providers (and
  * their in-memory version maps) stay registered until the periodic
  * maintenance task notices the query is inactive (default interval
  * 60 s). A suite that runs many bounded streams in one JVM — the
  * correctness gates, the bench — accumulates loaded providers that are
  * pure dead weight for whatever runs next, and their unload timing is
  * nondeterministic, which is poison for timed benchmarks. This exposes
  * the registry's own `unloadAll()` so harnesses can drop them at a
  * deterministic point; a later streaming query reloads providers on
  * demand (checkpoint state is on disk — nothing is lost).
  */
object StateStoreHygiene {
  def unloadAll(): Unit = StateStore.unloadAll()
}
