package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev aid (guide §1): attribute where a SparkEntry query's wall time
  * goes — per-job wall clock + per-stage task totals (run time, shuffle
  * read/write bytes, input bytes, spill) — so optimization targets the
  * measured cost, not the guessed one.
  *
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <name>[,<name>] [reps]
  * Env: SPARK_GRAFT_CPUS (default 32) to match the bench session shape.
  */
object ProfileQuery {

  final class Acc extends SparkListener {
    case class St(var name: String = "", var runMs: Long = 0, var cpuMs: Long = 0,
        var tasks: Int = 0, var input: Long = 0, var shRead: Long = 0,
        var shWrite: Long = 0, var spill: Long = 0, var gcMs: Long = 0)
    val stages = scala.collection.concurrent.TrieMap.empty[Int, St]
    val jobs = scala.collection.concurrent.TrieMap.empty[Int, (Long, Long, String)]
    override def onJobStart(e: SparkListenerJobStart): Unit =
      jobs(e.jobId) = (e.time, -1L,
        Option(e.properties).map(_.getProperty("spark.job.description", "")).getOrElse(""))
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs.get(e.jobId).foreach { case (s, _, d) => jobs(e.jobId) = (s, e.time, d) }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val st = stages.getOrElseUpdate(e.stageInfo.stageId, St())
      st.name = e.stageInfo.name.takeWhile(_ != '\n').take(80)
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val st = stages.getOrElseUpdate(e.stageId, St())
      val m = e.taskMetrics
      if (m != null) {
        st.runMs += m.executorRunTime; st.cpuMs += m.executorCpuTime / 1000000
        st.tasks += 1; st.input += m.inputMetrics.bytesRead
        st.shRead += m.shuffleReadMetrics.totalBytesRead
        st.shWrite += m.shuffleWriteMetrics.bytesWritten
        st.spill += m.memoryBytesSpilled; st.gcMs += m.jvmGCTime
      }
    }
    def report(): String = {
      val sb = new StringBuilder
      val js = jobs.toSeq.sortBy(_._1)
      val wall = js.collect { case (_, (s, e, _)) if e > 0 => e - s }.sum
      sb.append(f"jobs=${js.size} summed-job-wall=${wall}ms%n")
      js.foreach { case (id, (s, e, d)) =>
        if (e > 0 && e - s >= 20)
          sb.append(f"  job $id%4d ${e - s}%6d ms  $d%n")
      }
      val ss = stages.toSeq.sortBy(-_._2.runMs).take(25)
      sb.append("top stages by summed task run time:\n")
      ss.foreach { case (id, st) =>
        sb.append(f"  stage $id%4d run=${st.runMs}%7d cpu=${st.cpuMs}%7d gc=${st.gcMs}%5d " +
          f"tasks=${st.tasks}%4d in=${st.input / 1024}%8dK sr=${st.shRead / 1024}%7dK " +
          f"sw=${st.shWrite / 1024}%7dK spill=${st.spill / 1024}%6dK  ${st.name}%n")
      }
      sb.toString
    }
  }

  /** Poor-man's async-profiler: sample all live threads every ~60 ms,
    * bucket executor-task samples by their deepest "interesting" frame.
    * Enabled with SPARK_GRAFT_PROFILE_STACKS=1. */
  final class Sampler extends Thread {
    setDaemon(true)
    @volatile var halted = false
    val hits = scala.collection.concurrent.TrieMap.empty[String, Int]
    private def interesting(tr: Array[StackTraceElement]): String = {
      // the top-most frame plus the first frame mentioning spark/graft
      val top = tr.headOption.map(_.toString).getOrElse("<empty>")
      val anchor = tr.find { f =>
        val c = f.getClassName
        (c.startsWith("org.apache.spark.sql.execution") ||
          c.startsWith("graft.")) && !c.contains("Sampler")
      }.map(_.toString).getOrElse("")
      s"$top || $anchor"
    }
    override def run(): Unit = while (!halted) {
      val all = Thread.getAllStackTraces
      all.forEach { (t, tr) =>
        if ((t.getName.startsWith("Executor task launch") ||
              t.getName.startsWith("stream execution")) &&
            tr.nonEmpty && t.getState != Thread.State.WAITING) {
          // skip idle pool threads parked in queue take
          val topC = tr.headOption.map(_.getClassName).getOrElse("")
          val idle = topC.contains("Unsafe") && tr.exists(
            _.getClassName.contains("ThreadPoolExecutor"))
          if (!idle) {
            val key = t.getName.take(22) + " :: " + interesting(tr)
            hits.updateWith(key) { case Some(n) => Some(n + 1); case None => Some(1) }
          }
        }
      }
      Thread.sleep(60)
    }
    def report(top: Int = 30): String =
      hits.toSeq.sortBy(-_._2).take(top)
        .map { case (k, n) => f"$n%5d  $k" }.mkString("\n")
  }

  /** Per-micro-batch phase durations from the streaming progress events —
    * the driver-gap attribution the stage metrics cannot see
    * (queryPlanning / walCommit / commitOffsets / addBatch / getBatch
    * are driver-side phases). Printed per progress when
    * SPARK_GRAFT_PROFILE_STREAM=1. */
  final class StreamProgress extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val p = e.progress
      val d = p.durationMs
      val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
        "walCommit", "commitOffsets", "addBatch", "latestOffset")
      val parts = keys.flatMap(k => Option(d.get(k)).map(v => s"$k=$v"))
      val st = p.stateOperators.map(s =>
        s"commit=${s.allUpdatesTimeMs}/${s.commitTimeMs}ms rows=${s.numRowsTotal}")
        .mkString(" | ")
      println(s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
        parts.mkString(" ") + (if (st.nonEmpty) s"  state: $st" else ""))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("q_pipe_novelty")
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    // extra session confs for A/B probes: SPARK_GRAFT_PROFILE_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.queries.ArrayFixtures.get(spark, sfDir) catch { case _: Throwable => () }
    val sampleStacks = sys.env.get("SPARK_GRAFT_PROFILE_STACKS").contains("1")
    if (sys.env.get("SPARK_GRAFT_PROFILE_STREAM").contains("1"))
      spark.streams.addListener(new StreamProgress)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      for (r <- 0 until reps) {
        val acc = new Acc
        spark.sparkContext.addSparkListener(acc)
        val sampler = if (sampleStacks && r == reps - 1) {
          val s = new Sampler; s.start(); Some(s)
        } else None
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        sampler.foreach { s =>
          s.halted = true
          println(s"---- stack samples for $n ----")
          println(s.report())
        }
        // listenerBus is private[spark]; a short poll lets task-end events drain
        Thread.sleep(400)
        spark.sparkContext.removeSparkListener(acc)
        println(f"==== $n rep $r: $dt%.3f s ====")
        println(acc.report())
      }
    }
    spark.stop()
  }
}
