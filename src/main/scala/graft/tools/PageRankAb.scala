package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev aid: same-window A/B of q_pipe_pagerank's events-JSON-parse
  * fan-out (round-18 change, flagged perf-weak by two driver windows).
  * Runs the fanned and unfanned variants in ALTERNATING warm reps inside
  * one session so machine drift hits both arms equally.
  *
  * Usage: runMain graft.tools.PageRankAb [sfDir] [reps]
  */
object PageRankAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pagerank-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BYPASS_THRESHOLD", "1"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gate(fanned: Boolean): DataFrame = {
      val ev0 = graft.queries.EventTime.readEvents(spark, sfDir)
      val ev = if (fanned)
        graft.operators.FanOut.byKey(ev0, col("event_id")) else ev0
      val pairs = ev
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k").isNotNull)
        .distinct()
      val fwd = pairs.select(col("user_id").as("src"),
        (col("k") + 1000000L).as("dst"))
      val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      graft.operators.Graph.pageRank(edges, iters = 3)
        .select(col("id"),
          when(col("id") >= 1000000L, lit("item"))
            .otherwise(lit("user")).as("kind"),
          col("r"))
        .orderBy(col("r").desc, col("id")).limit(30)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // one untimed warm rep per arm (JIT + parquet footers)
    gate(fanned = true).write.format("noop").mode("overwrite").save()
    gate(fanned = false).write.format("noop").mode("overwrite").save()
    val (fOn, fOff) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (r <- 0 until reps) {
      fOn += time(gate(fanned = true).write.format("noop").mode("overwrite").save())
      fOff += time(gate(fanned = false).write.format("noop").mode("overwrite").save())
      println(f"rep $r: fanned=${fOn.result().last}%.3f unfanned=${fOff.result().last}%.3f")
    }
    def stats(xs: Seq[Double]): String =
      f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.length / 2)}%.3f " +
        xs.map(x => f"$x%.2f").mkString("[", ", ", "]")
    println(s"fanned:   ${stats(fOn.result().toIndexedSeq)}")
    println(s"unfanned: ${stats(fOff.result().toIndexedSeq)}")
    spark.stop()
  }
}
