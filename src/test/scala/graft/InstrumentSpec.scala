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
    // spark executions show up via the listener
    SparkTestSession.spark.range(10).count()
    Thread.sleep(1500) // let the async listener bus drain
    assert(Instrument.snapshot.keys.exists(_.startsWith("sql.")))
    Instrument.disable()
  }
}
