package graft

import graft.api.GraftStore
import graft.core._
import graft.meta.{DatasetMeta, VariableDef}
import graft.metrics.Instrument
import graft.store.MemBackend
import org.scalatest.funsuite.AnyFunSuite

class InstrumentSpec extends AnyFunSuite {
  test("timers record engine hot paths when enabled, no-op when disabled") {
    Instrument.reset()
    val store = new GraftStore(new MemBackend)
    store.create("ds")
    val meta = DatasetMeta(Map("x" -> 4L), Map("x" -> 2L),
      Map("v" -> VariableDef("int", Vector("x"), 0.0)))
    val w = store.writer("ds").addVersion(meta)
    w.write("v", Seq(Slab.fromDoubles(DType.INT, Slice(Seq(0L), Seq(4L)), Seq(1, 2, 3, 4))))
    w.finishVersion()
    // disabled: nothing recorded
    store.reader("ds").onLastVersion().getSlice("v", Slice(Seq(0L), Seq(4L)))
    assert(!Instrument.snapshot.contains("engine.getSlice"))
    // enabled: counts + durations
    Instrument.enable(SparkTestSession.spark)
    store.reader("ds").onLastVersion().getSlice("v", Slice(Seq(0L), Seq(4L)))
    store.reader("ds").onLastVersion().getSlice("v", Slice(Seq(0L), Seq(2L)))
    val snap = Instrument.snapshot("engine.getSlice")
    assert(snap("count") == 2.0 && snap("totalSec") >= 0.0)
    // spark executions show up via the listener (async bus: poll bounded)
    SparkTestSession.spark.range(10).count()
    val deadline = System.nanoTime() + 10e9.toLong
    while (!Instrument.snapshot.keys.exists(_.startsWith("sql.")) &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(Instrument.snapshot.keys.exists(_.startsWith("sql.")))
    // double enable must not double-count
    Instrument.enable(SparkTestSession.spark)
    val before = Instrument.snapshot.get("sql.count").map(_("count")).getOrElse(0.0)
    SparkTestSession.spark.range(10).count()
    val d2 = System.nanoTime() + 10e9.toLong
    while (Instrument.snapshot.get("sql.count").map(_("count")).getOrElse(0.0) <= before &&
        System.nanoTime() < d2) Thread.sleep(50)
    assert(Instrument.snapshot("sql.count")("count") == before + 1.0)
    Instrument.disable()
  }
}
